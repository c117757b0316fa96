"""Trace the full bench program (blur+predict) and summarize device ops."""
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
from detectinblur_tpu.ops.blur import batched_blur
from detectinblur_tpu.ops.psf import sample_psf
from detectinblur_tpu.data.batching import model_bucket_for_batch

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
keys = jax.random.split(jax.random.key(1), B)
psfs = jax.vmap(lambda k: sample_psf(k, expl=0.005, fraction=0.5))(keys)
blurring = jnp.ones((B,), bool)


@jax.jit
def blur_detect(params, images, jitter, hw, psfs, blurring):
    chw = jnp.transpose(images + jitter, (0, 3, 1, 2))
    blurred = batched_blur(chw, psfs, blurring)
    imgs = jnp.transpose(blurred, (0, 2, 3, 1))
    det = model.predict(params, imgs, hw, bucket=bucket)
    return det.boxes, det.scores, det.labels, det.valid


out = blur_detect(params, images, jnp.float32(0.0), hw, psfs, blurring)
jax.block_until_ready(out)

with jax.profiler.trace("/tmp/fulltrace"):
    for i in range(3):
        out = blur_detect(params, images, jnp.float32(1e-6 * (i + 1)),
                          hw, psfs, blurring)
    jax.block_until_ready(out)

time.sleep(2)
paths = sorted(glob.glob("/tmp/fulltrace/**/*.trace.json.gz", recursive=True))
p = paths[-1]
with gzip.open(p, "rt") as fh:
    data = json.load(fh)
evs = [e for e in data.get("traceEvents", [])
       if e.get("ph") == "X" and e.get("dur", 0) > 0
       and not str(e.get("name", "")).startswith("$")]
by_name = {}
for e in evs:
    n = e.get("name", "?")
    by_name.setdefault(n, [0, 0.0])
    by_name[n][0] += 1
    by_name[n][1] += e["dur"]
top = sorted(by_name.items(), key=lambda kv: -kv[1][1])[:60]
print(f"== {p} (3 iters; divide by 3)")
for n, (c, d) in top:
    print(f"  {d/1000:9.3f} ms  x{c:<4d} {n[:110]}")
