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
def nms_sequential(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float | jax.Array,
    max_outputs: int,
):
    """Exact greedy NMS as a pick-argmax scan (one device step per output).

    Simple and exact, but each of the ``max_outputs`` scan iterations costs
    fixed device overhead — ~10 ms for a 1000-output RPN NMS on v5e. Kept
    as the reference implementation; ``nms`` (blocked) is the fast default.
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


_BLOCK = 128


@functools.partial(jax.jit, static_argnames=("max_outputs",))
def nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float | jax.Array,
    max_outputs: int,
):
    """Exact greedy NMS, blocked (the TF-TPU non_max_suppression_padded
    strategy): boxes are score-sorted and processed in blocks of 128 —
    within-block suppression runs a fixpoint of the rank-masked suppression
    operator (converges to the greedy solution), then the block's survivors
    suppress all later boxes in one vectorized pass. O(N/128) device steps
    instead of O(max_outputs).

    Args:
      boxes: [N, 4] xyxy.
      scores: [N]; invalid entries = -inf (padding idiom).
      iou_threshold: suppress boxes with IoU strictly greater than this.
      max_outputs: static number of selections.

    Returns:
      (indices [max_outputs] int32, valid [max_outputs] bool), selections
      in descending score order (torchvision NMS output ordering).
    """
    N = boxes.shape[0]
    thr = jnp.asarray(iou_threshold, jnp.float32)

    order = jnp.argsort(-scores.astype(jnp.float32), stable=True)
    sboxes = boxes[order].astype(jnp.float32)
    salive = scores[order] > NEG_INF

    n_blocks = (N + _BLOCK - 1) // _BLOCK
    pad = n_blocks * _BLOCK - N
    if pad:
        sboxes = jnp.concatenate([sboxes, jnp.zeros((pad, 4), jnp.float32)])
        salive = jnp.concatenate([salive, jnp.zeros((pad,), bool)])

    Np = n_blocks * _BLOCK
    rank = jnp.arange(Np)

    def iou_mat(a, b):
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
        rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = jnp.clip(rb - lt, 0.0)
        inter = wh[..., 0] * wh[..., 1]
        return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter,
                                   1e-12)

    tri = (jnp.arange(_BLOCK)[:, None] < jnp.arange(_BLOCK)[None, :])

    def outer(alive, i):
        blk = jax.lax.dynamic_slice(sboxes, (i * _BLOCK, 0), (_BLOCK, 4))
        blk_alive = jax.lax.dynamic_slice(alive, (i * _BLOCK,), (_BLOCK,))

        sup = (iou_mat(blk, blk) > thr) & tri   # [r, c]: r suppresses c, r<c

        def self_cond(state):
            a, prev = state
            return jnp.any(a != prev)

        def self_body(state):
            a, _ = state
            killed = jnp.any(a[:, None] & sup, axis=0)
            return (blk_alive & ~killed, a)

        a0 = blk_alive
        a1 = blk_alive & ~jnp.any(a0[:, None] & sup, axis=0)
        blk_final, _ = jax.lax.while_loop(self_cond, self_body, (a1, a0))

        # Survivors of this block suppress every later box.
        cross = jnp.any(
            blk_final[:, None] & (iou_mat(blk, sboxes) > thr), axis=0
        )
        later = rank >= (i + 1) * _BLOCK
        alive = alive & ~(cross & later)
        # Write back the block's final aliveness.
        alive = jax.lax.dynamic_update_slice(alive, blk_final, (i * _BLOCK,))
        return alive, None

    alive, _ = jax.lax.scan(outer, salive, jnp.arange(n_blocks))

    # Top max_outputs surviving boxes, in score order.
    sel_key = jnp.where(alive, -rank.astype(jnp.float32), -jnp.inf)
    _, picked = jax.lax.top_k(sel_key, max_outputs)
    valid = alive[picked]
    idxs = jnp.where(valid, order[jnp.minimum(picked, N - 1)], 0).astype(jnp.int32)
    return idxs, valid


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
