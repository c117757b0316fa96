"""Per-stage isolated timing for the TRAIN path (dev tool).

Same forced-fetch methodology as prof_eval_stages.py (each stage's output
reduces to one fetched scalar; per-call jitter defeats relay elision).
Stage split for the fused train step (~143 ms at batch 8, r5):

  * loss fwd              — whole forward incl. losses
  * grad wrt FEATS        — heads-only fwd+bwd (RPN loss, sampling,
                            fused RoIAlign fwd+bwd, box head fwd+bwd);
                            backbone excluded (feats are the input)
  * grad wrt params       — everything; minus the heads number ~= the
                            backbone's fwd+bwd share
  * train NMS             — run_rpn training=True (2000-proposal budget)

Run with DIB_ZERO_RPN_DELTA=1 for steady-state proposal shapes.
"""
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
from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
from detectinblur_tpu.models.detection_transform import preprocess_batch
from detectinblur_tpu.models.rpn import run_rpn

B, G = 8, 16
src_h, src_w = 480, 640
bucket = model_bucket_for_batch([[src_h, src_w]] * B)
print("bucket", bucket, "backend", jax.default_backend(),
      "jax", jax.__version__, flush=True)

cfg = FasterRCNNConfig()
model = FasterRCNN(cfg)
params = model.init(jax.random.key(0), bucket=bucket)
if os.environ.get("DIB_ZERO_RPN_DELTA", "0") == "1":
    params = dict(params)
    rh = dict(params["rpn_head"])
    rh["bbox_pred"] = {k: jnp.zeros_like(v) for k, v in rh["bbox_pred"].items()}
    params["rpn_head"] = rh
    print("RPN delta head zeroed", flush=True)

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

# Staged inputs: preprocessed batch + train-mode features.
batched, new_hw = jax.jit(
    lambda x: preprocess_batch(x, hw, bucket, None, None, cfg.min_size,
                               cfg.max_size))(images)
feats = jax.jit(
    lambda p, x: model._features(p, x, None, None, None, False, train=True)[0]
)(params, batched)
feats = jax.block_until_ready(tuple(feats))
print("staged", flush=True)


def total_loss_from(p, imgs, j):
    losses, _ = model.loss(p, key, imgs + j, hw, gt_boxes, gt_labels,
                           gt_valid, bucket)
    return sum(jnp.sum(v) for v in losses.values())


def s_loss_fwd(j, p, imgs, f):
    del f
    return total_loss_from(p, imgs, j)


def heads_loss(p, f, j):
    # model.loss from the features down, re-deriving the same internals.
    from detectinblur_tpu.models.faster_rcnn import (
        fastrcnn_loss,
        resize_boxes,
        rpn_loss,
        select_training_samples,
    )

    f = tuple((x + j).astype(x.dtype) for x in f)
    gt_resized = jax.vmap(resize_boxes)(gt_boxes, hw, new_hw)
    rpn_out = run_rpn(p["rpn_head"], model.rpn_head, f, new_hw,
                      training=True, cfg=cfg.rpn)
    keys = jax.random.split(key, (B, 2))
    rpn_box_l, rpn_obj_l, rpn_n = jax.vmap(
        lambda k, obj, dlt, gb, gv: rpn_loss(
            k, obj, dlt, rpn_out.anchors, gb, gv, cfg.rpn)
    )(keys[:, 0], rpn_out.objectness, rpn_out.pred_deltas, gt_resized,
      gt_valid)
    rois, roi_labels, reg_targets, roi_valid = jax.vmap(
        lambda k, r, rv, gb, gl, gv: select_training_samples(
            k, r, rv, gb, gl, gv, cfg.box)
    )(keys[:, 1], rpn_out.proposals, rpn_out.proposal_valid, gt_resized,
      gt_labels, gt_valid)
    rois = jnp.where(roi_valid[..., None], rois, 0.0)
    from detectinblur_tpu.ops.roi_align_pallas import (
        multiscale_roi_align_fused,
    )

    use_pallas, rps, wy = model._pallas_pool_plan(bucket)
    pooled = multiscale_roi_align_fused(f[:4], rois, 7, 2, rps, wy, wy + 8)
    logits, deltas = jax.vmap(lambda pi: model._head_from_pooled(p, pi))(pooled)
    ce_sum, box_sum, n = jax.vmap(fastrcnn_loss)(logits, deltas, roi_labels,
                                                 reg_targets)
    return (jnp.sum(rpn_obj_l) + jnp.sum(rpn_box_l) + jnp.sum(ce_sum)
            + jnp.sum(box_sum)) / jnp.maximum(jnp.sum(n), 1)


def s_heads_fwdbwd(j, p, imgs, f):
    del imgs
    g = jax.grad(lambda ff: heads_loss(p, ff, j))(f)
    return sum(jnp.sum(x.astype(jnp.float32)) for x in g)


def s_full_fwdbwd(j, p, imgs, f):
    del f
    g = jax.grad(lambda q: total_loss_from(q, imgs, j))(p)
    return sum(jnp.sum(x.astype(jnp.float32))
               for x in jax.tree.leaves(g))


def s_train_nms(j, p, imgs, f):
    del imgs
    f = tuple((x + j).astype(x.dtype) for x in f)
    r = run_rpn(p["rpn_head"], model.rpn_head, f, new_hw,
                training=True, cfg=cfg.rpn)
    return jnp.sum(r.proposals) + jnp.sum(r.objectness.astype(jnp.float32))


def s_rpn_loss_only(j, p, imgs, f):
    """run_rpn (train) + anchor assignment + rpn_loss, forward only."""
    del imgs
    from detectinblur_tpu.models.faster_rcnn import resize_boxes, rpn_loss

    f = tuple((x + j).astype(x.dtype) for x in f)
    gt_resized = jax.vmap(resize_boxes)(gt_boxes, hw, new_hw)
    rpn_out = run_rpn(p["rpn_head"], model.rpn_head, f, new_hw,
                      training=True, cfg=cfg.rpn)
    keys = jax.random.split(key, (B, 2))
    box_l, obj_l, n = jax.vmap(
        lambda k, obj, dlt, gb, gv: rpn_loss(
            k, obj, dlt, rpn_out.anchors, gb, gv, cfg.rpn)
    )(keys[:, 0], rpn_out.objectness, rpn_out.pred_deltas, gt_resized,
      gt_valid)
    return jnp.sum(box_l) + jnp.sum(obj_l) + jnp.sum(n)


def s_sample_roi_head(j, p, imgs, f):
    """proposal sampling + fused RoIAlign fwd + box head + fastrcnn_loss
    (uses train-NMS proposals; subtract s_train_nms for the net cost)."""
    del imgs
    from detectinblur_tpu.models.faster_rcnn import (
        fastrcnn_loss,
        resize_boxes,
        select_training_samples,
    )
    from detectinblur_tpu.ops.roi_align_pallas import (
        multiscale_roi_align_fused,
    )

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


stages = [
    ("train NMS (head+2000)", s_train_nms),
    ("rpn assign+loss fwd", s_rpn_loss_only),
    ("sample+roi+boxhead fwd", s_sample_roi_head),
    ("loss fwd", s_loss_fwd),
    ("heads fwd+bwd", s_heads_fwdbwd),
    ("FULL fwd+bwd", s_full_fwdbwd),
]

iters = 10
ji = 1
for name, fn in stages:
    jf = jax.jit(fn)
    out = jax.device_get(jf(jnp.float32(0.0), params, images, feats))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jf(jnp.float32(1e-6 * ji), params, images, feats)
            ji += 1
        _ = jax.device_get(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1000)
    print(f"{name:>22}: {best:8.2f} ms", flush=True)
