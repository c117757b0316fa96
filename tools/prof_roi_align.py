"""Diagnose RoIAlign cost on bench-distribution proposals (dev tool)."""
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
from detectinblur_tpu.ops.roi_align_pallas import (
    _window_geometry, sharded_multiscale_roi_align)

B = 8
src_h, src_w = 480, 640
bucket = model_bucket_for_batch([[src_h, src_w]] * B)
cfg = FasterRCNNConfig()
model = FasterRCNN(cfg)
params = model.init(jax.random.key(0), bucket=bucket)
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
proposals = jnp.where(rpn_out.proposal_valid[..., None], rpn_out.proposals, 0.0)
use_pallas, rps, wy = model._pallas_pool_plan(bucket)
win_y, win_x = wy, wy + 8

sizes = np.array([[f.shape[1], f.shape[2]] for f in feats[:4]], np.int32)
scales = np.array([0.25, 0.125, 0.0625, 0.03125], np.float32)
N = B * proposals.shape[1]
flat = proposals.reshape(N, 4)

lvl, y0, x0, ty, tx, oversized, (ey, ex) = jax.jit(
    lambda fb: _window_geometry(fb, sizes, scales, win_y, win_x, 7, 2)
)(flat)
lvl, oversized, ey, ex = map(np.asarray, (lvl, oversized, ey, ex))
wy2, wx2 = max(8, win_y - 16), max(8, win_x - 16)
small = (ey <= wy2 - 2) & (ex <= wx2 - 2) & ~oversized
print("valid proposals:", int(np.asarray(rpn_out.proposal_valid).sum()), "/", N)
print("oversized:", int(oversized.sum()), "of", N)
print("class1 (small):", int(small.sum()), " class2:", int((~small & ~oversized).sum()))
for li in range(4):
    m = lvl == li
    print(f"  level {li}: n={m.sum():5d} oversized={int((oversized & m).sum()):4d} "
          f"class2={int((~small & ~oversized & m).sum()):5d} "
          f"ey_max={ey[m].max() if m.any() else -1} ex_max={ex[m].max() if m.any() else -1}")

# Timing: bench proposals vs a trained-like small-roi set.
rng2 = np.random.default_rng(1)
cx = rng2.uniform(100, 980, (B, 1000))
cy = rng2.uniform(100, 730, (B, 1000))
w_ = rng2.uniform(20, 120, (B, 1000))
h_ = rng2.uniform(20, 120, (B, 1000))
small_rois = jnp.asarray(
    np.stack([cx - w_ / 2, cy - h_ / 2, cx + w_ / 2, cy + h_ / 2], -1),
    jnp.float32)


def timed(rois, tag):
    f = jax.jit(lambda fs, r, j: jnp.sum(sharded_multiscale_roi_align(
        [x + j for x in fs], r, rois_per_step=rps, win_y=win_y,
        win_x=win_x).astype(jnp.float32)))
    out = jax.device_get(f(feats[:4], rois, jnp.float32(0.0)))
    best = float("inf")
    ji = 1
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(feats[:4], rois, jnp.float32(1e-6 * ji)); ji += 1
        _ = jax.device_get(out)
        best = min(best, (time.perf_counter() - t0) / 10 * 1000)
    print(f"{tag}: {best:.2f} ms", flush=True)


timed(proposals, "bench proposals  ")
timed(small_rois, "trained-like rois")
