"""Fast R-CNN RoI heads, fixed-shape, matching torchvision semantics.

Covers what the reference uses from torchvision's RoIHeads via
models/faster_rcnn.py:204-292: MultiScaleRoIAlign (featmaps 0-3, 7x7,
sampling 2) -> TwoMLPHead(1024) -> FastRCNNPredictor(num_classes), fg/bg
IoU 0.5/0.5, 512 proposals per image at 0.25 positive fraction, score
threshold 0.05, class-aware NMS 0.5, 100 detections per image.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectinblur_tpu.ops.boxes import (
    box_iou,
    clip_boxes_to_image,
    decode_boxes,
    encode_boxes,
)
from detectinblur_tpu.ops.nms import batched_nms, NEG_INF
from detectinblur_tpu.ops.roi_align import multiscale_roi_align
from detectinblur_tpu.models.rpn import balanced_sample, smooth_l1

BOX_CODER_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


class TwoMLPHead(nn.Module):
    representation_size: int = 1024

    @nn.compact
    def __call__(self, x):
        from detectinblur_tpu.models.resnet import (
            ACT_DTYPE, CONV_PRECISION as prec,
            TORCH_LINEAR_KERNEL_INIT as kinit, torch_linear_bias_init)
        x = x.reshape(x.shape[0], -1)
        # torch nn.Linear default init (the reference's TwoMLPHead has no
        # custom init, models/faster_rcnn.py:253-257).
        x = nn.relu(nn.Dense(self.representation_size, name="fc6",
                             dtype=ACT_DTYPE, precision=prec,
                             kernel_init=kinit,
                             bias_init=torch_linear_bias_init(x.shape[-1]))(x))
        x = nn.relu(nn.Dense(self.representation_size, name="fc7",
                             dtype=ACT_DTYPE, precision=prec,
                             kernel_init=kinit,
                             bias_init=torch_linear_bias_init(
                                 self.representation_size))(x))
        return x


class FastRCNNPredictor(nn.Module):
    num_classes: int = 91

    @nn.compact
    def __call__(self, x):
        from detectinblur_tpu.models.resnet import (
            ACT_DTYPE, CONV_PRECISION as prec,
            TORCH_LINEAR_KERNEL_INIT as kinit, torch_linear_bias_init)
        # torch nn.Linear default init (reference FastRCNNPredictor,
        # models/faster_rcnn.py:280-290, adds no custom init).
        binit = torch_linear_bias_init(x.shape[-1])
        scores = nn.Dense(self.num_classes, name="cls_score",
                          dtype=ACT_DTYPE, precision=prec,
                          kernel_init=kinit, bias_init=binit)(x)
        deltas = nn.Dense(self.num_classes * 4, name="bbox_pred",
                          dtype=ACT_DTYPE, precision=prec,
                          kernel_init=kinit, bias_init=binit)(x)
        # f32 for softmax/threshold/NMS and box decode downstream.
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)


class BoxHeadConfig(NamedTuple):
    num_classes: int = 91
    fg_iou_thresh: float = 0.5
    bg_iou_thresh: float = 0.5
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_img: int = 100
    # Static NMS candidate pool after score threshold (see postprocess).
    nms_pool: int = 4096


def select_training_samples(
    key: jax.Array,
    proposals: jax.Array,     # [P, 4]
    proposal_valid: jax.Array,  # [P]
    gt_boxes: jax.Array,      # [G, 4] padded
    gt_labels: jax.Array,     # [G]
    gt_valid: jax.Array,      # [G]
    cfg: BoxHeadConfig,
):
    """torchvision RoIHeads.select_training_samples for one image.

    GT boxes are appended to the proposal set (add_gt_proposals), matching
    at IoU 0.5/0.5 without low-quality matches; 512 rois sampled at 25% fg.
    Returns fixed-size (rois [S,4], labels [S], reg_targets [S,4],
    sampled_valid [S]) with S = batch_size_per_image.
    """
    all_boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    all_valid = jnp.concatenate([proposal_valid, gt_valid], axis=0)

    iou = box_iou(gt_boxes, all_boxes)                   # [G, P+G]
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    iou = jnp.where(all_valid[None, :], iou, -1.0)

    matched_vals = jnp.max(iou, axis=0)
    matches = jnp.argmax(iou, axis=0)

    # labels_per_roi: gt class for fg, 0 for bg, -1 for invalid rois.
    fg = matched_vals >= cfg.fg_iou_thresh
    labels = jnp.where(fg, gt_labels[matches], 0)
    labels = jnp.where(all_valid, labels, 0)
    match_tag = jnp.where(fg, 1, 0)
    match_tag = jnp.where(all_valid, match_tag, -1)

    any_gt = jnp.any(gt_valid)
    match_tag = jnp.where(any_gt, match_tag, jnp.where(all_valid, 0, -1))
    labels = jnp.where(any_gt, labels, 0)

    sel_pos, sel_neg = balanced_sample(
        key, match_tag, cfg.batch_size_per_image, cfg.positive_fraction
    )
    sampled = sel_pos | sel_neg

    # Compact the sampled rois into S fixed slots (positives first).
    prio = jnp.where(sel_pos, 0, jnp.where(sel_neg, 1, 2))
    order = jnp.argsort(prio, stable=True)
    slots = order[: cfg.batch_size_per_image]

    rois = all_boxes[slots]
    roi_labels = labels[slots]
    roi_matched_gt = gt_boxes[matches[slots]]
    roi_valid = sampled[slots]
    reg_targets = encode_boxes(roi_matched_gt, rois, BOX_CODER_WEIGHTS)
    roi_labels = jnp.where(roi_valid, roi_labels, -1)
    return rois, roi_labels, reg_targets, roi_valid


def fastrcnn_loss(
    class_logits: jax.Array,   # [S, C]
    box_deltas: jax.Array,     # [S, C*4]
    labels: jax.Array,         # [S] (-1 = padding)
    reg_targets: jax.Array,    # [S, 4]
):
    """torchvision fastrcnn_loss sums for one image: CE over all sampled
    rois, smooth_l1 (beta=1/9) over positives. Returns (ce_sum, box_sum, n)
    so the caller can normalize across the whole batch exactly as
    torchvision does (mean CE over all sampled, box / total sampled)."""
    valid = labels >= 0
    n = jnp.sum(valid)

    logp = jax.nn.log_softmax(class_logits, axis=-1)
    safe_labels = jnp.clip(labels, 0)
    ce = -jnp.take_along_axis(logp, safe_labels[:, None], axis=1)[:, 0]
    ce_sum = jnp.sum(jnp.where(valid, ce, 0.0))

    pos = labels > 0
    S, C4 = box_deltas.shape
    deltas_per_class = box_deltas.reshape(S, -1, 4)
    picked = jnp.take_along_axis(
        deltas_per_class, safe_labels[:, None, None].repeat(4, -1), axis=1
    )[:, 0]
    l1 = jnp.sum(smooth_l1(picked - reg_targets, 1.0 / 9), axis=-1)
    box_sum = jnp.sum(jnp.where(pos, l1, 0.0))
    return ce_sum, box_sum, n


def postprocess_detections(
    class_logits: jax.Array,    # [P, C]
    box_deltas: jax.Array,      # [P, C*4]
    proposals: jax.Array,       # [P, 4]
    proposal_valid: jax.Array,  # [P]
    image_hw: jax.Array,        # (h, w)
    cfg: BoxHeadConfig,
):
    """torchvision RoIHeads.postprocess_detections for one image.

    Returns fixed-size (boxes [D,4], scores [D], labels [D], valid [D]).
    """
    P, C = class_logits.shape
    scores = jax.nn.softmax(class_logits, axis=-1)
    boxes = decode_boxes(box_deltas.reshape(P, C, 4), proposals[:, None, :],
                         BOX_CODER_WEIGHTS)
    boxes = clip_boxes_to_image(boxes, image_hw[0], image_hw[1])

    # Drop background column; flatten (proposal, class) pairs.
    fg_scores = scores[:, 1:].reshape(-1)                  # [P*(C-1)]
    fg_boxes = boxes[:, 1:, :].reshape(-1, 4)
    fg_labels = jnp.tile(jnp.arange(1, C, dtype=jnp.int32)[None], (P, 1)).reshape(-1)

    ok = fg_scores > cfg.score_thresh
    ok &= jnp.repeat(proposal_valid, C - 1)
    # remove_small_boxes(min_size=1e-2)
    ok &= (fg_boxes[:, 2] - fg_boxes[:, 0]) >= 1e-2
    ok &= (fg_boxes[:, 3] - fg_boxes[:, 1]) >= 1e-2
    masked = jnp.where(ok, fg_scores, NEG_INF)

    # Static candidate pool for NMS; anything beyond nms_pool by score could
    # only enter the top-100 if >nms_pool-100 higher-scoring boxes were all
    # suppressed — practically impossible and irrelevant at 0.05 thresh.
    pool = min(cfg.nms_pool, masked.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked, pool)
    keep, valid = batched_nms(
        fg_boxes[top_idx], top_scores, fg_labels[top_idx],
        cfg.nms_thresh, cfg.detections_per_img,
    )
    sel = top_idx[keep]
    return (
        fg_boxes[sel],
        jnp.where(valid, fg_scores[sel], 0.0),
        jnp.where(valid, fg_labels[sel], 0),
        valid,
    )


def run_box_head(
    params,
    features: Sequence[jax.Array],   # P2..P5 for one image, [H_l, W_l, C]
    rois: jax.Array,                 # [R, 4]
    head: TwoMLPHead,
    predictor: FastRCNNPredictor,
):
    """RoIAlign + head + predictor for one image's rois."""
    pooled = multiscale_roi_align(features, rois)          # [R, 7, 7, C]
    # torch flattens CHW; our pooled is HWC — reorder so fc6 weights map.
    pooled = jnp.transpose(pooled, (0, 3, 1, 2))
    x = head.apply({"params": params["box_head"]}, pooled)
    return predictor.apply({"params": params["box_predictor"]}, x)
