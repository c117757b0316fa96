"""jax.profiler op-summary of the RPN head + train/eval NMS (dev tool).

prof_eval_stages reads ~8 ms for the RPN head convs alone — ~6% MXU
utilization for ~89 GFLOP of 3x3x256x256 convs — which smells like
layout copies, not conv time. The trace says which.
"""
import glob
import gzip
import json
import os
import sys
import time

os.environ.setdefault("DETECTINBLUR_PRECISION", "default")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from detectinblur_tpu.data.batching import model_bucket_for_batch
from detectinblur_tpu.models.detection_transform import preprocess_batch
from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
from detectinblur_tpu.models.rpn import run_rpn

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
feats = tuple(jax.block_until_ready(f) for f in feats)
print("feat dtypes/shapes:", [(str(f.dtype), f.shape) for f in feats],
      flush=True)


def head_only(p, f, j):
    f = tuple((x + j).astype(x.dtype) for x in f)
    logits, deltas = model.rpn_head.apply({"params": p["rpn_head"]}, f)
    return (sum(jnp.sum(x.astype(jnp.float32)) for x in logits)
            + sum(jnp.sum(x.astype(jnp.float32)) for x in deltas))


def head_nms(p, f, j):
    f = tuple((x + j).astype(x.dtype) for x in f)
    r = run_rpn(p["rpn_head"], model.rpn_head, f, new_hw,
                training=False, cfg=cfg.rpn)
    return jnp.sum(r.proposals) + jnp.sum(r.proposal_valid)


for tag, fn in (("head_only", head_only), ("head_nms", head_nms)):
    jf = jax.jit(fn)
    out = jax.device_get(jf(params, feats, jnp.float32(0.0)))
    tdir = f"/tmp/rpntrace_{tag}"
    with jax.profiler.trace(tdir):
        for i in range(3):
            out = jf(params, feats, jnp.float32(1e-6 * (i + 1)))
        _ = jax.device_get(out)
    time.sleep(2)
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    for p in paths:
        with gzip.open(p, "rt") as fh:
            data = json.load(fh)
        evs = [e for e in data.get("traceEvents", [])
               if e.get("ph") == "X" and e.get("dur", 0) > 0]
        by_name = {}
        for e in evs:
            n = e.get("name", "?")
            by_name.setdefault(n, [0, 0.0])
            by_name[n][0] += 1
            by_name[n][1] += e["dur"]
        top = sorted(by_name.items(), key=lambda kv: -kv[1][1])[:25]
        print(f"== {tag} {p}")
        for n, (c, d) in top:
            print(f"  {d/1000:9.3f} ms  x{c:<4d} {n[:110]}", flush=True)
