"""Per-stage isolated timing for the eval path (dev tool).

Each stage's input is materialized on device first; the stage then runs in
its own jit whose output is reduced to ONE scalar that is fetched with
device_get every window — the relay cannot elide or defer work feeding a
fetched scalar. A per-call jitter keeps (program, args) pairs unique.
"""
import os
import time

os.environ.setdefault("DETECTINBLUR_PRECISION", "default")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
from detectinblur_tpu.models.detection_transform import preprocess_batch
from detectinblur_tpu.models.rpn import run_rpn
from detectinblur_tpu.ops.blur import batched_blur
from detectinblur_tpu.ops.psf import sample_psf
from detectinblur_tpu.data.batching import model_bucket_for_batch

B = 8
src_h, src_w = 480, 640
bucket = model_bucket_for_batch([[src_h, src_w]] * B)
print("bucket", bucket, "backend", jax.default_backend(), "jax", jax.__version__, flush=True)

cfg = FasterRCNNConfig()
model = FasterRCNN(cfg)
params = model.init(jax.random.key(0), bucket=bucket)

rng = np.random.default_rng(0)
images = jnp.asarray(rng.random((B, src_h, src_w, 3), np.float32))
hw = jnp.tile(jnp.asarray([[src_h, src_w]]), (B, 1))
keys = jax.random.split(jax.random.key(1), B)
psfs = jax.vmap(lambda k: sample_psf(k, expl=0.005, fraction=0.5))(keys)
blurring = jnp.ones((B,), bool)

use_pallas, rps, wy = model._pallas_pool_plan(bucket)
print("pallas plan:", use_pallas, rps, wy, flush=True)

# ---------------------------------------------------------- staged inputs
chw = jnp.transpose(images, (0, 3, 1, 2))
blurred = jax.jit(lambda x: batched_blur(x, psfs, blurring))(chw)
imgs_hwc = jnp.transpose(blurred, (0, 2, 3, 1))
batched, new_hw = jax.jit(
    lambda x: preprocess_batch(x, hw, bucket, None, None, cfg.min_size,
                               cfg.max_size))(imgs_hwc)
feats = jax.jit(
    lambda p, x: model._features(p, x, None, None, None, False)[0]
)(params, batched)
rpn_out = jax.jit(
    lambda p, f: run_rpn(p["rpn_head"], model.rpn_head, f, new_hw,
                         training=False, cfg=cfg.rpn)
)(params, feats)
proposals = jnp.where(rpn_out.proposal_valid[..., None], rpn_out.proposals, 0.0)
feats = jax.block_until_ready(feats)
proposals = jax.block_until_ready(proposals)
print("staged", flush=True)


def s_blur(j, _p, **_):
    return jnp.sum(batched_blur(chw + j, psfs, blurring))


def s_pre(j, _p, **_):
    out, nhw = preprocess_batch(imgs_hwc + j, hw, bucket, None, None,
                                cfg.min_size, cfg.max_size)
    return jnp.sum(out) + jnp.sum(nhw)


def s_feats(j, p, **_):
    f = model._features(p, batched + j, None, None, None, False)[0]
    return sum(jnp.sum(x.astype(jnp.float32)) for x in f)


def s_rpn(j, p, feats=None, **_):
    f = [(x + j).astype(x.dtype) for x in feats]
    r = run_rpn(p["rpn_head"], model.rpn_head, f, new_hw,
                training=False, cfg=cfg.rpn)
    return (jnp.sum(r.proposals) + jnp.sum(r.proposal_valid) +
            jnp.sum(r.objectness))


def s_rpn_head(j, p, feats=None, **_):
    f = [(x + j).astype(x.dtype) for x in feats]
    logits, deltas = model.rpn_head.apply({"params": p["rpn_head"]}, f)
    return (sum(jnp.sum(x) for x in logits) +
            sum(jnp.sum(x) for x in deltas))


def s_roi(j, p, feats=None, proposals=None, **_):
    from detectinblur_tpu.ops.roi_align_pallas import sharded_multiscale_roi_align
    pooled = sharded_multiscale_roi_align(
        [(x + j).astype(x.dtype) for x in feats[:4]], proposals,
        rois_per_step=rps, win_y=wy, win_x=wy + 8)
    return jnp.sum(pooled.astype(jnp.float32))


def s_boxhead(j, p, pooled_in=None, **_):
    pooled = jax.vmap(lambda pi: model._head_from_pooled(p, pi))
    # head from staged pooled output shape [B, R, 7, 7, C]
    logits, deltas = pooled(pooled_in + j)
    return jnp.sum(logits) + jnp.sum(deltas)


def s_full(j, p, **_):
    det = model.predict(p, imgs_hwc + j, hw, bucket=bucket)
    return (jnp.sum(det.boxes) + jnp.sum(det.scores) +
            jnp.sum(det.labels) + jnp.sum(det.valid))


from detectinblur_tpu.ops.roi_align_pallas import sharded_multiscale_roi_align
pooled_in = jax.block_until_ready(jax.jit(
    lambda f, pr: sharded_multiscale_roi_align(
        f, pr, rois_per_step=rps, win_y=wy, win_x=wy + 8)
)(feats[:4], proposals))

kw = dict(feats=tuple(feats), proposals=proposals, pooled_in=pooled_in)
stages = [
    ("blur", s_blur),
    ("preprocess", s_pre),
    ("backbone/FPN", s_feats),
    ("RPN head only", s_rpn_head),
    ("RPN head+NMS", s_rpn),
    ("RoIAlign", s_roi),
    ("box head", s_boxhead),
    ("FULL predict", s_full),
]

iters = 10
ji = 1
for name, fn in stages:
    f = jax.jit(fn)
    out = jax.device_get(f(jnp.float32(0.0), params, **kw))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(jnp.float32(1e-6 * ji), params, **kw)
            ji += 1
        _ = jax.device_get(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1000)
    print(f"{name:>14}: {best:8.2f} ms", flush=True)
