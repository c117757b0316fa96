"""Split RoIAlign cost: tier-1 kernel alone vs full (kernel + correction)."""
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
feats = [jax.block_until_ready(f) for f in feats[:4]]
proposals = jax.block_until_ready(proposals)

sizes = np.array([[f.shape[1], f.shape[2]] for f in feats], np.int32)
scales = np.array([0.25, 0.125, 0.0625, 0.03125], np.float32)
N = B * proposals.shape[1]


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


def kernel_only(fs, pr, j):
    fb = pr.reshape(N, 4)
    img_idx = jnp.arange(N, dtype=jnp.int32) // pr.shape[1]
    out, ov, _, _ = rap._kernel_pass(
        [(x + j).astype(x.dtype) for x in fs], fb, img_idx, sizes, scales,
        jnp.bfloat16, jnp.bfloat16, 4, 40, 48, 7, 2)
    return jnp.sum(out.astype(jnp.float32)) + jnp.sum(ov)


def full(fs, pr, j):
    out = rap.pallas_multiscale_roi_align(
        tuple(x + j for x in fs), pr, 7, 2, 4, 40, 48)
    return jnp.sum(out.astype(jnp.float32))


timed(kernel_only, "tier-1 kernel only")
timed(full, "full (kernel+corr)")
