"""The "Squint" affine feature warper.

Re-implements models/warper.py:13-52 + its use in
models/generalized_rcnn.py:131-141: per-image 3x3 scale/rotation matrices
built from the PSF principal components (theta, lambda1, lambda2), composed
as inv(R·T) · inv(S) · (R·T), applied through the torch
``affine_grid``/``grid_sample`` convention (align_corners=False, bilinear,
zero padding). Inputs are warped with (theta, lam1, lam2) before the
backbone and each FPN level is warped back with (theta, 1/lam1, 1/lam2).

The reference runs this in fp16 as a GPU perf hack; here everything is f32
(cheap on VPU) and layout is NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def squint_matrix(theta: jax.Array, lam1: jax.Array, lam2: jax.Array,
                  height: int, width: int) -> jax.Array:
    """The 2x3 normalized-coordinate affine used by torch affine_grid.

    The reference (warper.py:25-46) composes transposed 3x3 matrices (its
    ``torch.stack(..., dim=2)`` builds each written matrix's TRANSPOSE) and
    double-inverts: inv(inv(R'T') S' (R'T')). Algebraically that reduces to
    the translation-free conjugation R2 diag(1/l1, 1/l2) R2^T with
    R2 = [[cos(-t), sin(-t)], [-sin(-t), cos(-t)]] — verified to f64
    accuracy against the torch composition — so we build it in closed form
    instead of inverting ill-conditioned 3x3s in f32 on device.
    """
    th = -theta
    c, s = jnp.cos(th), jnp.sin(th)
    i1, i2 = 1.0 / lam1, 1.0 / lam2
    a11 = c * c * i1 + s * s * i2
    a22 = s * s * i1 + c * c * i2
    a12 = c * s * (i2 - i1)
    zero = jnp.zeros_like(a11)
    return jnp.stack([
        jnp.stack([a11, a12, zero]),
        jnp.stack([a12, a22, zero]),
    ])


def affine_grid_sample(x: jax.Array, theta23: jax.Array) -> jax.Array:
    """torch F.affine_grid + F.grid_sample (bilinear, zeros,
    align_corners=False) for one NHWC-less image [H, W, C]."""
    H, W, C = x.shape
    # Normalized output coords, align_corners=False: (2i+1)/N - 1.
    ys = (2.0 * jnp.arange(H, dtype=jnp.float32) + 1.0) / H - 1.0
    xs = (2.0 * jnp.arange(W, dtype=jnp.float32) + 1.0) / W - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    src = jnp.einsum("rc,hwc->hwr", theta23, jnp.stack([gx, gy, ones], axis=-1))
    sx, sy = src[..., 0], src[..., 1]

    # Unnormalize (align_corners=False): ix = (gx + 1) * W / 2 - 0.5.
    ix = (sx + 1.0) * W / 2.0 - 0.5
    iy = (sy + 1.0) * H / 2.0 - 0.5

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx1 = ix - x0
    wy1 = iy - y0

    def fetch(yi, xi):
        inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        v = x[yc, xc]
        return jnp.where(inside[..., None], v, 0.0)

    v00 = fetch(y0, x0)
    v01 = fetch(y0, x0 + 1)
    v10 = fetch(y0 + 1, x0)
    v11 = fetch(y0 + 1, x0 + 1)

    top = v00 * (1 - wx1)[..., None] + v01 * wx1[..., None]
    bot = v10 * (1 - wx1)[..., None] + v11 * wx1[..., None]
    return top * (1 - wy1)[..., None] + bot * wy1[..., None]


def squint_warp(images: jax.Array, thetas: jax.Array, lam1s: jax.Array,
                lam2s: jax.Array) -> jax.Array:
    """Warp a batch [B, H, W, C] with per-image squint parameters."""
    H, W = images.shape[1], images.shape[2]

    def one(img, t, l1, l2):
        m = squint_matrix(t, l1, l2, H, W)
        return affine_grid_sample(img, m)

    return jax.vmap(one)(images, thetas, lam1s, lam2s)
