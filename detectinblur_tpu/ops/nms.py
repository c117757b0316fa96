"""Fixed-shape NMS for TPU.

torchvision's CUDA NMS (a hard dependency of the reference model layer,
SURVEY.md §2.4 "native-component obligations") is replaced by an exact
sequential NMS expressed as a ``lax.scan`` with static iteration count:
each step picks the highest remaining score and suppresses overlaps with an
O(N) vector IoU — no N^2 matrix, no dynamic shapes, no host round-trips.

Returns padded index arrays plus validity masks, the framework-wide idiom
for variable-length results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def _iou_one_vs_all(box: jax.Array, boxes: jax.Array) -> jax.Array:
    """IoU of one [4] xyxy box against [N, 4] boxes (torchvision semantics)."""
    area1 = (box[2] - box[0]) * (box[3] - box[1])
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    return inter / jnp.maximum(area1 + areas - inter, 1e-12)


@functools.partial(jax.jit, static_argnames=("max_outputs",))
def nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float | jax.Array,
    max_outputs: int,
):
    """Exact greedy NMS.

    Args:
      boxes: [N, 4] xyxy.
      scores: [N]; entries already invalid should be set to -inf by the
        caller (padding idiom).
      iou_threshold: suppress boxes with IoU strictly greater than this.
      max_outputs: static number of selections.

    Returns:
      (indices [max_outputs] int32, valid [max_outputs] bool) where invalid
      slots carry index 0 and valid=False. Selections are in descending
      score order, matching torchvision NMS output ordering.
    """
    live0 = jnp.where(scores <= NEG_INF, NEG_INF, scores.astype(jnp.float32))

    def step(live, _):
        idx = jnp.argmax(live)
        best = live[idx]
        valid = best > NEG_INF
        ious = _iou_one_vs_all(boxes[idx], boxes)
        suppress = ious > iou_threshold
        live = jnp.where(suppress, NEG_INF, live)
        live = live.at[idx].set(NEG_INF)
        return live, (jnp.where(valid, idx, 0).astype(jnp.int32), valid)

    _, (idxs, valids) = jax.lax.scan(step, live0, None, length=max_outputs)
    return idxs, valids


@functools.partial(jax.jit, static_argnames=("max_outputs",))
def batched_nms(
    boxes: jax.Array,
    scores: jax.Array,
    categories: jax.Array,
    iou_threshold: float | jax.Array,
    max_outputs: int,
):
    """Category-aware NMS via the coordinate-offset trick (torchvision
    batched_nms): boxes of different categories never overlap."""
    max_coord = jnp.max(jnp.where(scores > NEG_INF, jnp.max(boxes, axis=-1), 0.0))
    offsets = categories.astype(jnp.float32) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    return nms(shifted, scores, iou_threshold, max_outputs)
