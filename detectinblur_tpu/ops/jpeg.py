"""Differentiable JPEG compression (models/jpeg/ equivalent).

Same signal path as the reference's DiffJPEG (which follows Shin &
Song 2017): RGB->YCbCr (JPEG matrix, x255 domain), 2x2 average-pool chroma
subsampling, 8x8 block DCT-II, quantization with the standard luma/chroma
tables scaled by quality_to_factor, differentiable rounding
round(x) + (x - round(x))^3, then the inverse path with nearest (repeat)
chroma upsampling and a 0..255 clamp.

All of it is dense 8x8x8x8 tensordots — MXU food — applied batched under
jit; used for --add_jpeg_artefacts (blur_functions.py:84-87,
transforms.py:467-493: quality ~ U(20, 90) with prob 0.65, image padded to
/16 with reflect first).
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np

Y_TABLE = np.array(
    [[16, 11, 10, 16, 24, 40, 51, 61],
     [12, 12, 14, 19, 26, 58, 60, 55],
     [14, 13, 16, 24, 40, 57, 69, 56],
     [14, 17, 22, 29, 51, 87, 80, 62],
     [18, 22, 37, 56, 68, 109, 103, 77],
     [24, 35, 55, 64, 81, 104, 113, 92],
     [49, 64, 78, 87, 103, 121, 120, 101],
     [72, 92, 95, 98, 112, 100, 103, 99]], np.float32)

C_TABLE = np.full((8, 8), 99, np.float32)
C_TABLE[:4, :4] = np.array(
    [[17, 18, 24, 47], [18, 21, 26, 66], [24, 26, 56, 99], [47, 66, 99, 99]],
    np.float32)

_RGB2YCBCR = np.array(
    [[0.299, 0.587, 0.114],
     [-0.168736, -0.331264, 0.5],
     [0.5, -0.418688, -0.081312]], np.float32).T
_YCBCR_SHIFT = np.array([0.0, 128.0, 128.0], np.float32)
_YCBCR2RGB = np.array(
    [[1.0, 0.0, 1.402],
     [1.0, -0.344136, -0.714136],
     [1.0, 1.772, 0.0]], np.float32).T


def _dct_tensor():
    t = np.zeros((8, 8, 8, 8), np.float32)
    for x, y, u, v in itertools.product(range(8), repeat=4):
        t[x, y, u, v] = np.cos((2 * x + 1) * u * np.pi / 16) * np.cos(
            (2 * y + 1) * v * np.pi / 16)
    alpha = np.array([1.0 / np.sqrt(2)] + [1.0] * 7, np.float32)
    scale = np.outer(alpha, alpha) * 0.25
    return t, scale


_DCT_T, _DCT_SCALE = _dct_tensor()


def diff_round(x: jax.Array) -> jax.Array:
    r = jnp.round(x)
    return r + (x - r) ** 3


def quality_to_factor(quality) -> jax.Array:
    quality = jnp.asarray(quality, jnp.float32)
    q = jnp.where(quality < 50, 5000.0 / quality, (200.0 - quality * 2) + 0.01)
    return q / 100.0


def _blocks(x: jax.Array) -> jax.Array:
    """[H, W] -> [H/8 * W/8, 8, 8]."""
    H, W = x.shape
    return (x.reshape(H // 8, 8, W // 8, 8)
             .transpose(0, 2, 1, 3)
             .reshape(-1, 8, 8))


def _unblocks(b: jax.Array, H: int, W: int) -> jax.Array:
    return (b.reshape(H // 8, W // 8, 8, 8)
             .transpose(0, 2, 1, 3)
             .reshape(H, W))


def _dct(b: jax.Array) -> jax.Array:
    out = jnp.tensordot(b - 128.0, jnp.asarray(_DCT_T), axes=[(1, 2), (0, 1)])
    return out * jnp.asarray(_DCT_SCALE)[None]


def _idct(b: jax.Array) -> jax.Array:
    b = b * jnp.asarray(_DCT_SCALE)[None]
    out = jnp.tensordot(b, jnp.asarray(_DCT_T), axes=[(1, 2), (2, 3)])
    return out + 128.0


@functools.partial(jax.jit, static_argnames=("differentiable",))
def jpeg_compress_decompress(
    image: jax.Array,            # [H, W, 3] float 0..1, H and W % 16 == 0
    quality: jax.Array | float = 80.0,
    differentiable: bool = True,
) -> jax.Array:
    rounding = diff_round if differentiable else jnp.round
    factor = quality_to_factor(quality)
    H, W = image.shape[:2]

    ycbcr = image * 255.0 @ jnp.asarray(_RGB2YCBCR) + jnp.asarray(_YCBCR_SHIFT)
    y, cb, cr = ycbcr[..., 0], ycbcr[..., 1], ycbcr[..., 2]

    def sub(c):   # 2x2 average pooling
        return c.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))

    comps = []
    for c, table, full in ((y, Y_TABLE, True), (sub(cb), C_TABLE, False),
                           (sub(cr), C_TABLE, False)):
        t = jnp.asarray(table) * factor
        q = rounding(_dct(_blocks(c)) / t[None])
        d = _idct(q * t[None])
        h, w = (H, W) if full else (H // 2, W // 2)
        rec = _unblocks(d, h, w)
        if not full:
            rec = jnp.repeat(jnp.repeat(rec, 2, axis=0), 2, axis=1)
        comps.append(rec)

    ycbcr_rec = jnp.stack(comps, axis=-1) - jnp.asarray(_YCBCR_SHIFT)
    rgb = ycbcr_rec @ jnp.asarray(_YCBCR2RGB)
    return jnp.clip(rgb, 0.0, 255.0) / 255.0


def add_jpeg_artifact(image: jax.Array, quality) -> jax.Array:
    """transforms.add_jpeg_artifact_to_image: reflect-pad to /16, compress,
    crop back. image [H, W, 3] float 0..1."""
    H, W = image.shape[:2]
    # The reference computes 16 - H%16, which pads a full 16 even for
    # already-aligned sizes (transforms.py:473-474) — match that.
    ph = 16 - H % 16
    pw = 16 - W % 16
    top, bottom = ph // 2, ph - ph // 2
    left, right = pw // 2, pw - pw // 2
    padded = jnp.pad(image, ((top, bottom), (left, right), (0, 0)), mode="reflect")
    out = jpeg_compress_decompress(padded, quality)
    return out[top : top + H, left : left + W]
