"""RoIAlign and multi-scale (FPN) RoIAlign as pure XLA gathers.

torchvision's CUDA RoIAlign (used by the reference's MultiScaleRoIAlign,
models/faster_rcnn.py:204-208) is replaced with a fully vectorized
gather + bilinear-interpolate formulation:

  * every (roi, bin, sample, corner) index is computed in closed form,
  * all four FPN levels are flattened into one [sum(H_l*W_l), C] buffer so a
    per-roi *dynamic* level choice becomes a plain offset into one gather —
    no lax.switch, no per-level masking passes,
  * semantics match torch roi_align with ``aligned=False`` (legacy offset,
    roi size clamped to >= 1, sample points outside [-1, size] contribute 0),
    which is what the vendored torchvision version uses.

Level assignment follows torchvision's LevelMapper: ``floor(4 +
log2(sqrt(area)/224 + 1e-6))`` clamped to [2, 5].
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def _bilinear_params(coord: jax.Array, size: jax.Array):
    """torch roi_align bilinear sampling along one axis.

    Returns (low, high, w_low, w_high, in_range) where ``in_range`` is False
    when coord < -1 or coord > size (contribution forced to 0).
    """
    in_range = (coord >= -1.0) & (coord <= size.astype(coord.dtype))
    c = jnp.maximum(coord, 0.0)
    low = jnp.floor(c).astype(jnp.int32)
    low = jnp.minimum(low, (size - 1).astype(jnp.int32))
    high = jnp.minimum(low + 1, (size - 1).astype(jnp.int32))
    # When low == size-1, torch sets the fractional coordinate to low.
    frac = jnp.where(low >= size - 1, 0.0, c - low.astype(c.dtype))
    return low, high, 1.0 - frac, frac, in_range


def roi_align_single_level(
    feature: jax.Array,
    boxes: jax.Array,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jax.Array:
    """RoIAlign of [H, W, C] features for [R, 4] xyxy boxes -> [R, s, s, C]."""
    H, W, C = feature.shape
    feats = feature.reshape(-1, C)
    sizes = jnp.array([[H, W]], jnp.int32)
    return _roi_align_flat(
        feats,
        jnp.zeros((boxes.shape[0],), jnp.int32),
        jnp.array([0], jnp.int32),
        sizes,
        jnp.array([spatial_scale], jnp.float32),
        boxes,
        output_size,
        sampling_ratio,
    )


def _roi_align_flat(
    flat_feats: jax.Array,      # [sum(H_l*W_l), C]
    levels: jax.Array,          # [R] int32 level index per roi
    level_offsets: jax.Array,   # [L] int32 start row of each level
    level_sizes: jax.Array,     # [L, 2] (H_l, W_l)
    level_scales: jax.Array,    # [L] spatial scale per level
    boxes: jax.Array,           # [R, 4] xyxy in input coordinates
    output_size: int,
    sampling_ratio: int,
) -> jax.Array:
    R = boxes.shape[0]
    s = output_size
    g = sampling_ratio
    C = flat_feats.shape[-1]

    scale = level_scales[levels]                      # [R]
    Hl = level_sizes[levels, 0]                       # [R]
    Wl = level_sizes[levels, 1]
    off = level_offsets[levels]

    x1 = boxes[:, 0] * scale
    y1 = boxes[:, 1] * scale
    x2 = boxes[:, 2] * scale
    y2 = boxes[:, 3] * scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / s
    bin_h = roi_h / s

    # Sample coordinates: [R, s, g] per axis.
    bin_idx = jnp.arange(s, dtype=jnp.float32)
    samp_idx = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    ys = (y1[:, None, None]
          + bin_idx[None, :, None] * bin_h[:, None, None]
          + samp_idx[None, None, :] * bin_h[:, None, None])   # [R, s, g]
    xs = (x1[:, None, None]
          + bin_idx[None, :, None] * bin_w[:, None, None]
          + samp_idx[None, None, :] * bin_w[:, None, None])

    y_lo, y_hi, wy_lo, wy_hi, y_ok = _bilinear_params(ys, Hl[:, None, None])
    x_lo, x_hi, wx_lo, wx_hi, x_ok = _bilinear_params(xs, Wl[:, None, None])

    # Broadcast to the full sample grid [R, s, g, s, g].
    def by(a):  # y-axis quantities -> [R, s, g, 1, 1]
        return a[:, :, :, None, None]

    def bx(a):  # x-axis quantities -> [R, 1, 1, s, g]
        return a[:, None, None, :, :]

    ok = (by(y_ok) & bx(x_ok))
    base = off[:, None, None, None, None]
    wrow = Wl[:, None, None, None, None]

    # x_lo and x_lo+1 are adjacent rows of the flattened level buffer, so
    # one (2, C)-slice gather fetches both x-corners contiguously — 2
    # gathers per sample point instead of 4, each a contiguous 2C read.
    # (XLA's row-gather lowering dominated the whole detector before:
    # 130ms -> this formulation; x_hi weights are 0 wherever the pair
    # would straddle a row edge, so the extra fetched row is harmless.)
    # In fast-precision mode the gather runs in bf16: it halves both the
    # scattered-read traffic and the [N_samples, 2, C] intermediates.
    from detectinblur_tpu.models.resnet import CONV_PRECISION

    gather_dtype = (jnp.bfloat16 if CONV_PRECISION == jax.lax.Precision.DEFAULT
                    else flat_feats.dtype)
    padded = jnp.concatenate(
        [flat_feats, jnp.zeros((1, C), flat_feats.dtype)], axis=0
    ).astype(gather_dtype)

    def gather_pair(yi):
        idx = (base + yi * wrow + bx(x_lo)).reshape(-1)
        out = jax.vmap(
            lambda i: jax.lax.dynamic_slice(padded, (i, 0), (2, C))
        )(idx)
        return out.reshape(*ok.shape, 2, C)

    top = gather_pair(by(y_lo))       # [R, s, g, s, g, 2, C]
    bot = gather_pair(by(y_hi))

    wx = jnp.stack([bx(wx_lo), bx(wx_hi)], axis=-1) * jnp.ones_like(by(wy_lo))[..., None]
    val = (top.astype(jnp.float32) * by(wy_lo)[..., None, None]
           + bot.astype(jnp.float32) * by(wy_hi)[..., None, None])
    val = (val * wx[..., None]).sum(axis=-2)
    val = jnp.where(ok[..., None], val, 0.0)
    # Average the g*g samples per bin: [R, s, g, s, g, C] -> [R, s, s, C].
    return val.mean(axis=(2, 4)).astype(flat_feats.dtype)


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                              "canonical_scale", "canonical_level"))
def multiscale_roi_align(
    features: Sequence[jax.Array],
    boxes: jax.Array,
    output_size: int = 7,
    sampling_ratio: int = 2,
    canonical_scale: int = 224,
    canonical_level: int = 4,
) -> jax.Array:
    """FPN RoIAlign over levels P2..P5.

    Args:
      features: 4 arrays [H_l, W_l, C] at strides 4/8/16/32 (single image).
      boxes: [R, 4] xyxy in (resized) input-image coordinates.

    Returns [R, output_size, output_size, C].
    """
    assert len(features) == 4
    C = features[0].shape[-1]
    sizes = jnp.array([[f.shape[0], f.shape[1]] for f in features], jnp.int32)
    counts = [f.shape[0] * f.shape[1] for f in features]
    offsets = jnp.array([0, counts[0], counts[0] + counts[1],
                         counts[0] + counts[1] + counts[2]], jnp.int32)
    scales = jnp.array([0.25, 0.125, 0.0625, 0.03125], jnp.float32)
    flat = jnp.concatenate([f.reshape(-1, C) for f in features], axis=0)

    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    area = jnp.clip(w, 0) * jnp.clip(h, 0)
    lvl = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(area) / canonical_scale + 1e-6))
    lvl = jnp.clip(lvl, 2, 5).astype(jnp.int32) - 2

    return _roi_align_flat(flat, lvl, offsets, sizes, scales, boxes,
                           output_size, sampling_ratio)
