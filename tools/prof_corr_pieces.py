"""Time the oversized-correction pieces standalone (dev tool)."""
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
from detectinblur_tpu.data.batching import model_bucket_for_batch
from detectinblur_tpu.ops.roi_align import _assign_levels, _flat_sample
import detectinblur_tpu.ops.roi_align_pallas as rap

B = 8
src_h, src_w = 480, 640
bucket = model_bucket_for_batch([[src_h, src_w]] * B)
cfg = FasterRCNNConfig()
model = FasterRCNN(cfg)
params = model.init(jax.random.key(0), bucket=bucket)
rh = dict(params["rpn_head"])
rh["bbox_pred"] = {k: jnp.zeros_like(v) for k, v in rh["bbox_pred"].items()}
params = dict(params); params["rpn_head"] = rh

rng = np.random.default_rng(0)
images = jnp.asarray(rng.random((B, src_h, src_w, 3), np.float32))
hw = jnp.tile(jnp.asarray([[src_h, src_w]]), (B, 1))
batched, new_hw = jax.jit(
    lambda x: preprocess_batch(x, hw, bucket, None, None, cfg.min_size,
                               cfg.max_size))(images)
feats = jax.jit(
    lambda p, x: model._features(p, x, None, None, None, False)[0]
)(params, batched)
rpn_out = jax.jit(
    lambda p, f: run_rpn(p["rpn_head"], model.rpn_head, f, new_hw,
                         training=False, cfg=cfg.rpn)
)(params, feats)
proposals = jnp.where(rpn_out.proposal_valid[..., None],
                      rpn_out.proposals, 0.0)
feats = tuple(jax.block_until_ready(f) for f in feats[:4])
proposals = jax.block_until_ready(proposals)

sizes = np.array([[f.shape[1], f.shape[2]] for f in feats], np.int32)
scales = np.array([0.25, 0.125, 0.0625, 0.03125], np.float32)
R = proposals.shape[1]
N = B * R
k = 64
out0 = jax.block_until_ready(jnp.zeros((N, 7, 7, 256), jnp.bfloat16))


def timed(fn, tag):
    f = jax.jit(fn)
    out = jax.device_get(f(feats, proposals, jnp.float32(0.0)))
    best = float("inf")
    ji = 1
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(feats, proposals, jnp.float32(1e-6 * ji)); ji += 1
        _ = jax.device_get(out)
        best = min(best, (time.perf_counter() - t0) / 10 * 1000)
    print(f"{tag}: {best:7.2f} ms", flush=True)


def geom(pr):
    fb = pr.reshape(N, 4)
    img_idx = jnp.arange(N, dtype=jnp.int32) // R
    _, _, _, _, _, ov, _ = rap._window_geometry(fb, sizes, scales,
                                                40, 48, 7, 2)
    return fb, img_idx, ov


def p_geom(fs, pr, j):
    fb, img_idx, ov = geom(pr + j)
    return jnp.sum(ov)


def p_flat_sample(fs, pr, j):
    fb, img_idx, ov = geom(pr + j)
    lvl = _assign_levels(fb, 224, 4)
    _, idx = jax.lax.top_k(ov.astype(jnp.float32), k)
    sub = _flat_sample([(x + j).astype(x.dtype) for x in fs], lvl[idx],
                       img_idx[idx], fb[idx], scales, 7, 2, jnp.bfloat16)
    return jnp.sum(sub.astype(jnp.float32))


def p_placement(fs, pr, j):
    fb, img_idx, ov = geom(pr + j)
    _, idx = jax.lax.top_k(ov.astype(jnp.float32), k)
    sub = jnp.full((k, 7, 7, 256), j, jnp.bfloat16)
    onehot = (idx[None, :] == jnp.arange(N)[:, None])
    placed = jnp.matmul(onehot.astype(sub.dtype), sub.reshape(k, -1),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    placed = placed.reshape(out0.shape).astype(jnp.bfloat16)
    return jnp.sum(jnp.where(ov[:, None, None, None], placed, out0)
                   .astype(jnp.float32))


def p_cond_identity(fs, pr, j):
    fb, img_idx, ov = geom(pr + j)
    o = out0 + jnp.asarray(j, jnp.bfloat16)
    o2 = jax.lax.cond(jnp.any(ov), lambda o_: o_ * 2, lambda o_: o_, o)
    return jnp.sum(o2.astype(jnp.float32))


timed(p_geom, "geometry+oversized mask ")
timed(p_flat_sample, "  + topk + _flat_sample")
timed(p_placement, "  + topk + placement   ")
timed(p_cond_identity, "  + cond (trivial body)")
