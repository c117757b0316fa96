"""Region Proposal Network, fixed-shape, matching torchvision semantics.

Replaces torchvision's RegionProposalNetwork (the configuration the
reference vendors at models/faster_rcnn.py:150-202 and drives from
models/generalized_rcnn.py:147): anchor matching at IoU 0.7/0.3 with
low-quality matches allowed, 256 sampled anchors at 0.5 positive fraction,
pre-NMS top-1000/2000 per level, level-aware NMS at 0.7, post-NMS
top-1000/2000 — but expressed over padded arrays with validity masks, no
dynamic shapes anywhere.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from detectinblur_tpu.models.anchors import grid_anchors
from detectinblur_tpu.ops.boxes import box_iou, clip_boxes_to_image, decode_boxes, encode_boxes
from detectinblur_tpu.ops.nms import grouped_nms_presorted, NEG_INF


class RPNHead(nn.Module):
    """3x3 conv + 1x1 objectness / box-delta heads, shared across levels."""

    in_channels: int = 256
    num_anchors: int = 3

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]):
        from detectinblur_tpu.models.resnet import ACT_DTYPE, CONV_PRECISION as prec
        # torchvision RPNHead init: every conv N(0, 0.01), bias 0 — an
        # untrained head then predicts near-zero deltas (proposals stay at
        # the anchors) instead of decoding wild slivers.
        init = nn.initializers.normal(stddev=0.01)
        conv = nn.Conv(self.in_channels, (3, 3), padding=[(1, 1), (1, 1)],
                       name="conv", dtype=ACT_DTYPE, precision=prec,
                       kernel_init=init)
        cls = nn.Conv(self.num_anchors, (1, 1), name="cls_logits",
                      dtype=ACT_DTYPE, precision=prec, kernel_init=init)
        bbox = nn.Conv(self.num_anchors * 4, (1, 1), name="bbox_pred",
                       dtype=ACT_DTYPE, precision=prec, kernel_init=init)
        logits, deltas = [], []
        for f in features:
            t = nn.relu(conv(f))
            # Heads emit f32: objectness feeds top-k/NMS ordering and the
            # deltas feed box decode, where bf16 step noise is visible.
            logits.append(cls(t).astype(jnp.float32))
            deltas.append(bbox(t).astype(jnp.float32))
        return logits, deltas


class RPNConfig(NamedTuple):
    pre_nms_top_n_train: int = 2000
    pre_nms_top_n_test: int = 1000
    post_nms_top_n_train: int = 2000
    post_nms_top_n_test: int = 1000
    nms_thresh: float = 0.7
    fg_iou_thresh: float = 0.7
    bg_iou_thresh: float = 0.3
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    min_size: float = 1e-3


def _flatten_level(x: jax.Array, per_anchor: int) -> jax.Array:
    """[H, W, A*k] -> [H*W*A, k]; NHWC reshape matches the (y, x, anchor)
    anchor ordering from anchors.grid_anchors."""
    h, w, _ = x.shape
    return x.reshape(h * w * (x.shape[-1] // per_anchor), per_anchor)


def filter_proposals(
    proposals: jax.Array,      # [sum_A, 4] decoded, this image
    objectness: jax.Array,     # [sum_A]
    anchors_per_level: Tuple[int, ...],
    image_hw: jax.Array,       # (h, w) valid image size
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float,
    min_size: float,
):
    """torchvision RegionProposalNetwork.filter_proposals for one image.

    Levels never suppress each other (torchvision runs batched_nms with the
    level as the category id), so NMS runs per level — grouped, vmapped,
    presorted (top_k emits descending scores) — instead of one NMS over the
    level-offset concatenation: ~4x fewer IoU pairs and 1/5 the sequential
    block steps at the eval candidate counts (ops/nms.py
    grouped_nms_presorted; also closer to torchvision, which dispatches to
    the per-group vanilla path above 4k boxes).

    Returns (boxes [post_nms_top_n, 4], valid [post_nms_top_n]).
    """
    # Per-level top-k by objectness, padded to a common K per level.
    kmax = max(min(pre_nms_top_n, n) for n in anchors_per_level)
    sel_scores, sel_boxes = [], []
    start = 0
    for n in anchors_per_level:
        k = min(pre_nms_top_n, n)
        sc = objectness[start : start + n]
        bx = proposals[start : start + n]
        top_sc, top_idx = jax.lax.top_k(sc, k)
        if k < kmax:   # padding tail keeps the descending-score precondition
            top_sc = jnp.concatenate([top_sc, jnp.full((kmax - k,), NEG_INF)])
            top_idx = jnp.concatenate(
                [top_idx, jnp.zeros((kmax - k,), top_idx.dtype)])
        sel_scores.append(top_sc)
        sel_boxes.append(bx[top_idx])
        start += n

    scores = jnp.stack(sel_scores)                   # [L, kmax]
    boxes = jnp.stack(sel_boxes)                     # [L, kmax, 4]

    boxes = clip_boxes_to_image(boxes, image_hw[0], image_hw[1])

    # Remove small boxes (min_size 1e-3): mask scores instead of filtering.
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    keep = (ws >= min_size) & (hs >= min_size)
    scores = jnp.where(keep, scores, NEG_INF)

    idxs, valid = grouped_nms_presorted(boxes, scores, nms_thresh,
                                        post_nms_top_n)
    return boxes.reshape(-1, 4)[idxs], valid


def assign_targets_to_anchors(
    anchors: jax.Array,      # [A, 4]
    gt_boxes: jax.Array,     # [G, 4] padded
    gt_valid: jax.Array,     # [G] bool
    fg_iou: float,
    bg_iou: float,
):
    """torchvision Matcher(0.7, 0.3, allow_low_quality_matches=True).

    Returns (labels [A] in {-1 ignore, 0 bg, 1 fg}, matches [A] gt index).
    """
    iou = box_iou(gt_boxes, anchors)                     # [G, A]
    iou = jnp.where(gt_valid[:, None], iou, -1.0)

    matched_vals = jnp.max(iou, axis=0)
    matches = jnp.argmax(iou, axis=0)

    labels = jnp.where(matched_vals >= fg_iou, 1, -1)
    labels = jnp.where(matched_vals < bg_iou, 0, labels)

    # Low-quality matches: any anchor achieving a gt's best IoU becomes fg.
    best_per_gt = jnp.max(iou, axis=1, keepdims=True)     # [G, 1]
    is_best = (iou == best_per_gt) & gt_valid[:, None] & (best_per_gt > 0)
    low_quality = jnp.any(is_best, axis=0)
    # Restore pre-threshold match for those anchors (argmax already is it).
    labels = jnp.where(low_quality, 1, labels)

    any_gt = jnp.any(gt_valid)
    labels = jnp.where(any_gt, labels, 0)
    return labels, matches


def balanced_sample(
    key: jax.Array,
    labels: jax.Array,       # [A] in {-1, 0, 1}
    batch_size: int,
    positive_fraction: float,
):
    """BalancedPositiveNegativeSampler: returns (pos_mask, neg_mask).

    A uniformly-random n-subset of a mask is everything at or below the
    n-th smallest of i.i.d. uniform keys, so a k-bounded ``top_k`` finds
    the threshold directly — no full argsort and, critically, no rank
    scatter (the [A]-sized scatters were ~24 ms/step on v5e at 260k
    anchors; the 256-bounded top_k is ~1 ms)."""
    pos = labels == 1
    neg = labels == 0
    kp, kn = jax.random.split(key)
    max_pos = int(batch_size * positive_fraction)

    def pick(mask, cap, n_take, k):
        cap = min(cap, labels.shape[0])   # tiny anchor grids: A < budget
        r = jax.random.uniform(k, labels.shape)
        r = jnp.where(mask, r, jnp.inf)
        # Mark exactly the first n_take of the cap-smallest indices (f32
        # keys collide at ~260k draws, so a threshold compare over-selects;
        # a 256-update scatter of the top_k indices is exact and cheap).
        _, idxs = jax.lax.top_k(-r, cap)
        sel = jnp.zeros(labels.shape, bool).at[idxs].set(
            jnp.arange(cap) < n_take)
        return sel & mask

    num_pos = jnp.minimum(jnp.sum(pos), max_pos)
    sel_pos = pick(pos, max_pos, num_pos, kp)
    num_neg = jnp.minimum(jnp.sum(neg), batch_size - num_pos)
    sel_neg = pick(neg, batch_size, num_neg, kn)
    return sel_pos, sel_neg


def smooth_l1(x: jax.Array, beta: float) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def rpn_loss(
    key: jax.Array,
    objectness: jax.Array,       # [A]
    pred_deltas: jax.Array,      # [A, 4]
    anchors: jax.Array,          # [A, 4]
    gt_boxes: jax.Array,
    gt_valid: jax.Array,
    cfg: RPNConfig,
):
    """Per-image RPN loss (engine sums over the batch and divides by the
    total sampled count, matching torchvision's compute_loss)."""
    labels, matches = assign_targets_to_anchors(
        anchors, gt_boxes, gt_valid, cfg.fg_iou_thresh, cfg.bg_iou_thresh
    )
    sel_pos, sel_neg = balanced_sample(key, labels, cfg.batch_size_per_image,
                                       cfg.positive_fraction)
    sampled = sel_pos | sel_neg

    # Box regression only touches the <=128 sampled positives: compact them
    # into fixed slots instead of materializing [A, 4] targets (the full
    # matched-gt gather + encode over 260k anchors was ~10 ms/step).
    max_pos = min(int(cfg.batch_size_per_image * cfg.positive_fraction),
                  sel_pos.shape[0])
    pos_f, pos_idx = jax.lax.top_k(sel_pos.astype(jnp.float32), max_pos)
    pos_ok = pos_f > 0
    targets = encode_boxes(gt_boxes[matches[pos_idx]], anchors[pos_idx],
                           (1.0, 1.0, 1.0, 1.0))
    box_l = jnp.sum(
        jnp.where(pos_ok[:, None],
                  smooth_l1(pred_deltas[pos_idx] - targets, 1.0 / 9), 0.0)
    )
    obj_t = labels.astype(jnp.float32)
    bce = jnp.maximum(objectness, 0) - objectness * obj_t + jnp.log1p(jnp.exp(-jnp.abs(objectness)))
    obj_l = jnp.sum(jnp.where(sampled, bce, 0.0))
    n = jnp.maximum(jnp.sum(sampled), 1)
    return box_l, obj_l, n


class RPNOutputs(NamedTuple):
    proposals: jax.Array       # [B, P, 4]
    proposal_valid: jax.Array  # [B, P]
    objectness: jax.Array      # [B, sum_A]
    pred_deltas: jax.Array     # [B, sum_A, 4]
    anchors: jax.Array         # [sum_A, 4]
    anchors_per_level: Tuple[int, ...]


def run_rpn(
    head_params,
    head: RPNHead,
    features: Sequence[jax.Array],   # levels, [B, H_l, W_l, C]
    image_hw: jax.Array,             # [B, 2] valid sizes
    training: bool,
    cfg: RPNConfig = RPNConfig(),
    first_level_stride: int = 4,
    anchor_sizes=None,
    anchor_ratios=None,
) -> RPNOutputs:
    """Run the RPN over a batch. For the FPN detector ``features`` is
    P2..P6 (stride 4 first); single-feature-map backbones pass one level
    with its stride and a one-level anchor spec."""
    logits, deltas = head.apply({"params": head_params}, features)

    feat_shapes = tuple((f.shape[1], f.shape[2]) for f in features)
    image_size = (int(features[0].shape[1] * first_level_stride),
                  int(features[0].shape[2] * first_level_stride))
    kw = {}
    if anchor_sizes is not None:
        kw = dict(sizes=anchor_sizes, ratios=anchor_ratios)
    anchors_np = grid_anchors(feat_shapes, image_size, **kw)
    anchors = jnp.asarray(np.concatenate(anchors_np, axis=0))
    anchors_per_level = tuple(a.shape[0] for a in anchors_np)

    def flatten_batch(xs, k):
        return jnp.concatenate(
            [jax.vmap(lambda t: _flatten_level(t, k))(x) for x in xs], axis=1
        )

    objectness = flatten_batch(logits, 1)[..., 0]          # [B, sum_A]
    pred_deltas = flatten_batch(deltas, 4)                 # [B, sum_A, 4]

    pre_n = cfg.pre_nms_top_n_train if training else cfg.pre_nms_top_n_test
    post_n = cfg.post_nms_top_n_train if training else cfg.post_nms_top_n_test

    def per_image(obj, dlt, hw):
        props = decode_boxes(jax.lax.stop_gradient(dlt), anchors, (1.0, 1.0, 1.0, 1.0))
        return filter_proposals(
            props, jax.lax.stop_gradient(obj),
            anchors_per_level, hw, pre_n, post_n, cfg.nms_thresh, cfg.min_size,
        )

    boxes, valid = jax.vmap(per_image)(objectness, pred_deltas, image_hw)
    return RPNOutputs(boxes, valid, objectness, pred_deltas, anchors, anchors_per_level)
