"""jax.profiler op-summary of the train sampling+RoI+boxhead forward.

prof_train_stages v2 reads 55.7 ms for this stage where known pieces
(run_rpn train 15.6, RoIAlign fwd ~10 at 4096 rois, box head ~5,
sampling ~2) sum to ~33 — trace the ops to find the gap.
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
from detectinblur_tpu.models.faster_rcnn import (
    FasterRCNN,
    FasterRCNNConfig,
    fastrcnn_loss,
    resize_boxes,
    select_training_samples,
)
from detectinblur_tpu.models.rpn import run_rpn
from detectinblur_tpu.ops.roi_align_pallas import multiscale_roi_align_fused

B, G = 8, 16
src_h, src_w = 480, 640
bucket = model_bucket_for_batch([[src_h, src_w]] * B)
cfg = FasterRCNNConfig()
model = FasterRCNN(cfg)
params = model.init(jax.random.key(0), bucket=bucket)

rng = np.random.default_rng(0)
images = jnp.asarray(rng.random((B, src_h, src_w, 3), np.float32))
hw = jnp.tile(jnp.asarray([[src_h, src_w]]), (B, 1))
boxes = np.zeros((B, G, 4), np.float32)
boxes[..., 0] = rng.uniform(0, src_w // 2, (B, G))
boxes[..., 1] = rng.uniform(0, src_h // 2, (B, G))
boxes[..., 2] = boxes[..., 0] + rng.uniform(8, src_w // 3, (B, G))
boxes[..., 3] = boxes[..., 1] + rng.uniform(8, src_h // 3, (B, G))
gt_boxes = jnp.asarray(boxes)
gt_labels = jnp.asarray(rng.integers(1, 91, (B, G)).astype(np.int32))
gt_valid = jnp.ones((B, G), bool)
key = jax.random.key(7)

batched, new_hw = jax.jit(
    lambda x: preprocess_batch(x, hw, bucket, None, None, cfg.min_size,
                               cfg.max_size))(images)
feats = jax.jit(
    lambda p, x: model._features(p, x, None, None, None, False, train=True)[0]
)(params, batched)
feats = jax.block_until_ready(tuple(feats))


def stage(p, f, j):
    f = tuple((x + j).astype(x.dtype) for x in f)
    gt_resized = jax.vmap(resize_boxes)(gt_boxes, hw, new_hw)
    rpn_out = run_rpn(p["rpn_head"], model.rpn_head, f, new_hw,
                      training=True, cfg=cfg.rpn)
    keys = jax.random.split(key, (B, 2))
    rois, roi_labels, reg_targets, roi_valid = jax.vmap(
        lambda k, r, rv, gb, gl, gv: select_training_samples(
            k, r, rv, gb, gl, gv, cfg.box)
    )(keys[:, 1], rpn_out.proposals, rpn_out.proposal_valid, gt_resized,
      gt_labels, gt_valid)
    rois = jnp.where(roi_valid[..., None], rois, 0.0)
    use_pallas, rps, wy = model._pallas_pool_plan(bucket)
    pooled = multiscale_roi_align_fused(f[:4], rois, 7, 2, rps, wy, wy + 8)
    logits, deltas = jax.vmap(lambda pi: model._head_from_pooled(p, pi))(pooled)
    ce, bx, n = jax.vmap(fastrcnn_loss)(logits, deltas, roi_labels,
                                        reg_targets)
    return jnp.sum(ce) + jnp.sum(bx) + jnp.sum(n)


jf = jax.jit(stage)
out = jax.device_get(jf(params, feats, jnp.float32(0.0)))
tdir = "/tmp/trace_sample_roi"
with jax.profiler.trace(tdir):
    for i in range(3):
        out = jf(params, feats, jnp.float32(1e-6 * (i + 1)))
    _ = jax.device_get(out)
time.sleep(2)
for p in glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True):
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
    top = sorted(by_name.items(), key=lambda kv: -kv[1][1])[:35]
    print(f"== {p}")
    for n, (c, d) in top:
        print(f"  {d/1000:9.3f} ms  x{c:<4d} {n[:110]}", flush=True)
