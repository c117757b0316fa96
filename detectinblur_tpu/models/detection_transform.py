"""Device-side GeneralizedRCNNTransform: normalize + resize + static batch.

The reference normalizes per image (optionally with per-image
"blur-conditional" mean/std overrides), resizes so min side = 800 / max side
<= 1333 with torch bilinear (align_corners=False), and pads the batch to a
/32 shape (models/net_transforms.py:58-316). Dynamic output shapes don't
exist under XLA, so here:

  * every image lives in a fixed [Hb, Wb, C] bucket with its valid (h, w)
    carried alongside,
  * the resize is a ``jax.image.scale_and_translate`` with *per-image*
    dynamic scale into a static model bucket — equivalent to resize +
    zero-pad-to-batch in one op,
  * box rescaling uses the same per-image ratios (resize_boxes semantics).

This keeps exactly one compiled graph per (input bucket, model bucket) pair
instead of one per image shape.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def resize_scale(h: jax.Array, w: jax.Array, min_size: int, max_size: int) -> jax.Array:
    """torchvision _resize_image_and_masks scale: min_size/min clamped so
    max side stays <= max_size."""
    h = h.astype(jnp.float32)
    w = w.astype(jnp.float32)
    mn = jnp.minimum(h, w)
    mx = jnp.maximum(h, w)
    scale = jnp.minimum(min_size / mn, max_size / mx)
    return scale


def resize_valid(
    image: jax.Array,        # [Hb0, Wb0, C] valid region at top-left
    hw: jax.Array,           # (h, w) valid size
    new_hw: jax.Array,       # (new_h, new_w) target valid size
    out_shape: Tuple[int, int],
) -> jax.Array:
    """Resize the valid [h, w] region to exactly [new_h, new_w] inside a
    zero-padded static [Ho, Wo] bucket (half-pixel bilinear)."""
    Ho, Wo = out_shape
    new_h, new_w = new_hw[0], new_hw[1]

    # Upscaling samples up to one pixel beyond the valid region; torch
    # clamps to the image edge, the bucket holds zeros there. Replicate the
    # last valid row/col one pixel outward (row first so the corner fills).
    last_row = jax.lax.dynamic_slice_in_dim(image, hw[0] - 1, 1, axis=0)
    image = jax.lax.dynamic_update_slice_in_dim(image, last_row, hw[0], axis=0)
    last_col = jax.lax.dynamic_slice_in_dim(image, hw[1] - 1, 1, axis=1)
    image = jax.lax.dynamic_update_slice_in_dim(image, last_col, hw[1], axis=1)
    eff_sy = new_h.astype(jnp.float32) / hw[0]
    eff_sx = new_w.astype(jnp.float32) / hw[1]

    # scale_and_translate uses half-pixel sample centers internally, so a
    # zero translation IS torch's align_corners=False convention (verified
    # against F.interpolate in tests/test_torch_parity.py).
    out = jax.image.scale_and_translate(
        image.astype(jnp.float32),
        (Ho, Wo, image.shape[-1]),
        (0, 1, 2),
        jnp.array([eff_sy, eff_sx, 1.0]),
        jnp.zeros(3),
        method="linear",
        antialias=False,
    )
    # Zero outside the new valid region (scale_and_translate smears edges).
    ys = jnp.arange(Ho)[:, None, None]
    xs = jnp.arange(Wo)[None, :, None]
    mask = (ys < new_h) & (xs < new_w)
    return jnp.where(mask, out, 0.0)


def resize_into_bucket(
    image: jax.Array,        # [Hb0, Wb0, C] valid region at top-left
    hw: jax.Array,           # (h, w) valid size
    scale: jax.Array,        # scalar
    out_shape: Tuple[int, int],
) -> Tuple[jax.Array, jax.Array]:
    """Resize the valid region by ``scale`` into a zero-padded static bucket.

    Returns (bucketed image [Ho, Wo, C], new valid size [2]).
    Uses half-pixel (align_corners=False) bilinear like torch interpolate
    with recompute_scale_factor semantics: output size = floor(size*scale),
    then the *effective* scale is out/in per axis.

    If the resized extent would overflow the bucket (an off-aspect image in
    a source-bucket-derived model bucket), the scale shrinks so the image
    still fits WITH its aspect ratio intact — the reference never distorts
    (net_transforms.py:151-175), so squashing one axis is never correct.
    Eval paths avoid even the shrink by sizing buckets per batch
    (data/batching.py model_bucket_for_batch).
    """
    Ho, Wo = out_shape
    scale = jnp.minimum(
        scale,
        jnp.minimum(Ho / hw[0].astype(jnp.float32),
                    Wo / hw[1].astype(jnp.float32)),
    )
    new_h = jnp.minimum(jnp.floor(hw[0] * scale).astype(jnp.int32), Ho)
    new_w = jnp.minimum(jnp.floor(hw[1] * scale).astype(jnp.int32), Wo)
    new_hw = jnp.stack([new_h, new_w])
    return resize_valid(image, hw, new_hw, out_shape), new_hw


def normalize_image(image: jax.Array, mean=None, std=None) -> jax.Array:
    mean = jnp.asarray(IMAGENET_MEAN if mean is None else mean, jnp.float32)
    std = jnp.asarray(IMAGENET_STD if std is None else std, jnp.float32)
    return (image - mean) / std


def resize_boxes(boxes: jax.Array, orig_hw: jax.Array, new_hw: jax.Array) -> jax.Array:
    """torchvision resize_boxes: independent x/y ratios."""
    ry = new_hw[0].astype(jnp.float32) / orig_hw[0]
    rx = new_hw[1].astype(jnp.float32) / orig_hw[1]
    x1, y1, x2, y2 = jnp.moveaxis(boxes, -1, 0)
    return jnp.stack([x1 * rx, y1 * ry, x2 * rx, y2 * ry], axis=-1)


@functools.partial(jax.jit, static_argnames=(
    "out_shape", "min_size", "max_size", "normalize", "crop_images"))
def preprocess_batch(
    images: jax.Array,      # [B, Hb0, Wb0, 3] raw 0..1, valid at top-left
    hw: jax.Array,          # [B, 2]
    out_shape: Tuple[int, int],
    means: jax.Array | None = None,   # [B, 3] per-image override or None
    stds: jax.Array | None = None,
    min_size: int = 800,
    max_size: int = 1333,
    normalize: bool = True,
    crop_images: bool = False,
):
    """Batched normalize+resize into the model bucket.

    ``normalize=False`` skips mean/std normalization (the reference's
    ``normalize_images`` constructor toggle, net_transforms.py:70-80,
    112-118). ``crop_images=True`` batches by cropping every image to the
    smallest resized extent floored to /32 instead of padding to the largest
    (net_transforms.py:218-247): under static bucket shapes that means the
    content beyond the common extent is zeroed and every image reports the
    same valid size.

    Returns (batched [B, Ho, Wo, 3], new_hw [B, 2]).
    """
    B = images.shape[0]
    if means is None:
        means = jnp.tile(jnp.asarray(IMAGENET_MEAN, jnp.float32)[None], (B, 1))
        stds = jnp.tile(jnp.asarray(IMAGENET_STD, jnp.float32)[None], (B, 1))

    def one(img, s, m, sd):
        if normalize:
            img = normalize_image(img, m, sd)
        sc = resize_scale(s[0], s[1], min_size, max_size)
        out, new_hw = resize_into_bucket(img, s, sc, out_shape)
        return out, new_hw

    out, new_hw = jax.vmap(one)(images, hw, means, stds)
    if crop_images:
        mh = (jnp.min(new_hw[:, 0]) // 32) * 32
        mw = (jnp.min(new_hw[:, 1]) // 32) * 32
        ys = jnp.arange(out.shape[1])[None, :, None, None]
        xs = jnp.arange(out.shape[2])[None, None, :, None]
        out = jnp.where((ys < mh) & (xs < mw), out, 0.0)
        new_hw = jnp.tile(jnp.stack([mh, mw])[None], (B, 1))
    return out, new_hw


def postprocess_boxes(boxes: jax.Array, resized_hw: jax.Array, orig_hw: jax.Array) -> jax.Array:
    """Rescale detection boxes from resized to original image coordinates
    (net_transforms.py:251-271)."""
    return resize_boxes(boxes, resized_hw, orig_hw)
