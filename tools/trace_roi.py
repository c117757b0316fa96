"""Capture a jax.profiler trace of the full RoIAlign program (dev tool)."""
import os
import glob
import gzip
import json
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
feats = tuple(jax.block_until_ready(f) for f in feats[:4])
proposals = jax.block_until_ready(proposals)

f = jax.jit(lambda fs, r, j: jnp.sum(rap.pallas_multiscale_roi_align(
    tuple(x + j for x in fs), r, 7, 2, 4, 40, 48).astype(jnp.float32)))
out = jax.device_get(f(feats, proposals, jnp.float32(0.0)))

with jax.profiler.trace("/tmp/roitrace"):
    for i in range(3):
        out = f(feats, proposals, jnp.float32(1e-6 * (i + 1)))
    _ = jax.device_get(out)

# Find and summarize the trace.
time.sleep(2)
paths = glob.glob("/tmp/roitrace/**/*.trace.json.gz", recursive=True)
print("trace files:", paths, flush=True)
for p in paths:
    with gzip.open(p, "rt") as fh:
        data = json.load(fh)
    evs = [e for e in data.get("traceEvents", [])
           if e.get("ph") == "X" and e.get("dur", 0) > 0]
    # Keep device-side lanes only (TPU pid names contain 'TPU'/'/device').
    by_name = {}
    for e in evs:
        n = e.get("name", "?")
        by_name.setdefault(n, [0, 0.0])
        by_name[n][0] += 1
        by_name[n][1] += e["dur"]
    top = sorted(by_name.items(), key=lambda kv: -kv[1][1])[:40]
    print(f"== {p}")
    for n, (c, d) in top:
        print(f"  {d/1000:9.3f} ms  x{c:<4d} {n[:110]}")
