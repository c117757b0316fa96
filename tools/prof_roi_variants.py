"""Time pallas RoIAlign variants (rps x window) on anchor-shaped proposals.

Run on the chip: PYTHONPATH=/root/repo:/root/.axon_site python tools/prof_roi_variants.py
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
from detectinblur_tpu.data.batching import model_bucket_for_batch
from detectinblur_tpu.ops.roi_align_pallas import (
    pallas_multiscale_roi_align, _window_geometry)

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
flat = proposals.reshape(N, 4)
for (wy, wx) in [(40, 48), (32, 40)]:
    lvl, y0, x0, ty, tx, ov, (ey, ex) = jax.jit(
        lambda fb: _window_geometry(fb, sizes, scales, wy, wx, 7, 2)
    )(flat)
    ov = np.asarray(ov); ey = np.asarray(ey); ex = np.asarray(ex)
    wy2, wx2 = max(8, wy - 16), max(8, wx - 16)
    small = (ey <= wy2 - 2) & (ex <= wx2 - 2) & ~ov
    print(f"win ({wy},{wx}): oversized={int(ov.sum())} "
          f"class1={int(small.sum())} class2={int((~small & ~ov).sum())}",
          flush=True)

import ast
variants = ast.literal_eval(os.environ.get(
    "ROI_VARIANTS",
    "[(4, 40, 48), (6, 40, 48), (8, 40, 48),"
    " (4, 32, 40), (6, 32, 40), (8, 32, 40)]"))
for rps, wy, wx in variants:
    try:
        f = jax.jit(lambda fs, r, j, _rps=rps, _wy=wy, _wx=wx: jnp.sum(
            pallas_multiscale_roi_align(
                tuple(x + j for x in fs), r, 7, 2, _rps, _wy, _wx)
            .astype(jnp.float32)))
        out = jax.device_get(f(feats, proposals, jnp.float32(0.0)))
        best = float("inf")
        ji = 1
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                out = f(feats, proposals, jnp.float32(1e-6 * ji)); ji += 1
            _ = jax.device_get(out)
            best = min(best, (time.perf_counter() - t0) / 10 * 1000)
        print(f"rps={rps} win=({wy},{wx}): {best:7.2f} ms  sum={out:.1f}",
              flush=True)
    except Exception as e:
        print(f"rps={rps} win=({wy},{wx}): FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
