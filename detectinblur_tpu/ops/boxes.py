"""Box utilities: IoU, encode/decode, clipping, PSF-driven expansion.

Fixed-shape, mask-aware JAX counterparts of the reference box machinery:
  * ``expand_boxes_by_psf`` / ``fix_box_squeeze`` — utils.py:360-434
  * ``box_iou`` — torchvision ops.box_iou semantics (used by matchers)
  * ``encode_boxes`` / ``decode_boxes`` — torchvision BoxCoder semantics
    (dx,dy weights then dw,dh; log-scale clamp at log(1000/16)) which the
    vendored Faster R-CNN depends on for RPN and box-head regression.

All functions operate on padded arrays with validity masks instead of
variable-length lists, so they are jittable and batchable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# torchvision's bbox_xform_clip.
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def box_area(boxes: jax.Array) -> jax.Array:
    """Area of [N, 4] xyxy boxes."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Pairwise IoU between [N, 4] and [M, 4] xyxy boxes -> [N, M]."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def xyxy_to_xywh(boxes: jax.Array) -> jax.Array:
    """utils.py:356-358 (COCO result format)."""
    x1, y1, x2, y2 = jnp.moveaxis(boxes, -1, 0)
    return jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)


def xywh_to_xyxy(boxes: jax.Array) -> jax.Array:
    x, y, w, h = jnp.moveaxis(boxes, -1, 0)
    return jnp.stack([x, y, x + w, y + h], axis=-1)


def clip_boxes_to_image(boxes: jax.Array, height: jax.Array, width: jax.Array) -> jax.Array:
    """Clamp xyxy boxes to [0, width] x [0, height] (torchvision semantics)."""
    x1 = jnp.clip(boxes[..., 0], 0, width)
    y1 = jnp.clip(boxes[..., 1], 0, height)
    x2 = jnp.clip(boxes[..., 2], 0, width)
    y2 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def encode_boxes(reference: jax.Array, proposals: jax.Array, weights) -> jax.Array:
    """Encode ``reference`` (gt) boxes relative to ``proposals`` (anchors)."""
    wx, wy, ww, wh = weights
    px1, py1, px2, py2 = jnp.moveaxis(proposals, -1, 0)
    gx1, gy1, gx2, gy2 = jnp.moveaxis(reference, -1, 0)

    pw = px2 - px1
    ph = py2 - py1
    pcx = px1 + 0.5 * pw
    pcy = py1 + 0.5 * ph

    gw = gx2 - gx1
    gh = gy2 - gy1
    gcx = gx1 + 0.5 * gw
    gcy = gy1 + 0.5 * gh

    dx = wx * (gcx - pcx) / pw
    dy = wy * (gcy - pcy) / ph
    dw = ww * jnp.log(gw / pw)
    dh = wh * jnp.log(gh / ph)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(deltas: jax.Array, boxes: jax.Array, weights) -> jax.Array:
    """Apply regression ``deltas`` [..., 4] to ``boxes`` [..., 4] xyxy."""
    wx, wy, ww, wh = weights
    x1, y1, x2, y2 = jnp.moveaxis(boxes, -1, 0)
    w = x2 - x1
    h = y2 - y1
    cx = x1 + 0.5 * w
    cy = y1 + 0.5 * h

    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(deltas[..., 3] / wh, BBOX_XFORM_CLIP)

    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h

    return jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1
    )


def fix_box_squeeze(boxes: jax.Array, height: jax.Array, width: jax.Array) -> jax.Array:
    """Clamp boxes into the image and repair degenerate (x1>=x2 / y1>=y2)
    boxes by pushing the edges 1px apart, exactly as
    ``fix_bounding_box_squeeze`` (utils.py:395-434)."""
    def clamp(b):
        x1 = jnp.clip(b[..., 0], 0, width - 1)
        y1 = jnp.clip(b[..., 1], 0, height - 1)
        x2 = jnp.clip(b[..., 2], 0, width - 1)
        y2 = jnp.clip(b[..., 3], 0, height - 1)
        return jnp.stack([x1, y1, x2, y2], axis=-1)

    boxes = clamp(boxes)
    bad_x = boxes[..., 0] >= boxes[..., 2]
    boxes = boxes.at[..., 2].add(jnp.where(bad_x, 1.0, 0.0))
    boxes = boxes.at[..., 0].add(jnp.where(bad_x, -1.0, 0.0))
    bad_y = boxes[..., 1] >= boxes[..., 3]
    boxes = boxes.at[..., 3].add(jnp.where(bad_y, 1.0, 0.0))
    boxes = boxes.at[..., 1].add(jnp.where(bad_y, -1.0, 0.0))
    return clamp(boxes)


def expand_boxes_by_psf(
    boxes: jax.Array,
    psf: jax.Array,
    blurring: jax.Array,
    height: jax.Array,
    width: jax.Array,
) -> jax.Array:
    """Expand GT boxes to cover the blur smear of a 128x128 PSF.

    Matches ``expand_targets`` (utils.py:360-392): the expansion of each edge
    equals the corresponding extent of the PSF's nonzero support relative to
    pixel (63, 63); non-blurring images pass through unchanged; boxes are
    then clamped/repaired with the squeeze fix.
    """
    assert psf.shape[-1] == 128, "expand is only defined for 128-wide PSFs"
    mask = psf > 0
    ys = jax.lax.broadcasted_iota(jnp.float32, psf.shape, 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, psf.shape, 1)
    big = jnp.float32(1e9)
    left = jnp.min(jnp.where(mask, xs, big)) - 63.0
    right = jnp.max(jnp.where(mask, xs, -big)) - 63.0
    top = jnp.min(jnp.where(mask, ys, big)) - 63.0
    bottom = jnp.max(jnp.where(mask, ys, -big)) - 63.0

    expanded = jnp.stack(
        [
            boxes[..., 0] + left,
            boxes[..., 1] + top,
            boxes[..., 2] + right,
            boxes[..., 3] + bottom,
        ],
        axis=-1,
    )
    expanded = fix_box_squeeze(expanded, height, width)
    return jnp.where(blurring, expanded, boxes)


def update_boxes_from_masks(boxes, masks, threshold: float = 0.1):
    """Recompute each box as the extents of its mask's >threshold support
    (utils.py:436-458). Empty masks keep their original box. Fixed-shape:
    boxes [N, 4], masks [N, H, W]; index extents via masked min/max, so it
    jits (no data-dependent nonzero).

    Exposed-but-uncalled parity: the reference defines this helper and
    never calls it anywhere either (grep: utils.py:436 is the only hit);
    it is public API surface, available for the same manual workflows."""
    masks = jnp.asarray(masks)
    boxes = jnp.asarray(boxes)
    on = masks > threshold
    ys = jax.lax.broadcasted_iota(jnp.float32, masks.shape, 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, masks.shape, 2)
    big = jnp.float32(1e9)
    min_x = jnp.min(jnp.where(on, xs, big), axis=(1, 2))
    max_x = jnp.max(jnp.where(on, xs, -big), axis=(1, 2))
    min_y = jnp.min(jnp.where(on, ys, big), axis=(1, 2))
    max_y = jnp.max(jnp.where(on, ys, -big), axis=(1, 2))
    new = jnp.stack([min_x, min_y, max_x, max_y], axis=-1)
    empty = ~jnp.any(on, axis=(1, 2))
    return jnp.where(empty[:, None], boxes, new)
