"""PSF rasterization and analysis, TPU-native.

Re-implements the behavior of the reference PSF pipeline
(``motion_blur/generate_PSF.py:31-148`` and the PSF principal-component
extraction in ``transforms.py:364-385``) as vectorized, jittable JAX ops:

  * ``rasterize_psf``: integrate a trajectory into a PSF canvas with bilinear
    (triangle-function) splatting — a single ``scatter-add`` over all time
    steps instead of the reference's Python loop.
  * ``center_psf``: roll the PSF so its center of mass sits at canvas/2.
  * ``find_offsets``: nonzero support extents, used for target-box expansion.
  * ``psf_principal_components``: eigen-decomposition of the support
    covariance -> (theta_rad, scale_factor_lambda1, scale_factor_lambda2)
    used by the "Squint" feature warper and blur-conditional normalization.
  * ``sample_psf``: full key->PSF pipeline (trajectory -> rasterize -> center
    -> crop), vmap-able for on-device PSF-bank generation.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from detectinblur_tpu.ops.trajectory import sample_trajectory


@functools.partial(jax.jit, static_argnames=("canvas",))
def rasterize_psf(
    positions: jax.Array,
    canvas: int,
    fraction: float | jax.Array,
    prev_fraction: float | jax.Array = 0.0,
) -> jax.Array:
    """Rasterize trajectory ``positions`` [T, 2] into a [canvas, canvas] PSF.

    ``fraction`` is the exposure fraction: only the first ``fraction * T``
    samples contribute (with fractional end-sample weighting exactly as the
    reference's t_proportion logic, generate_PSF.py:44-56). The result is
    normalized by T, so it sums to ~fraction (before any renormalization).
    """
    T = positions.shape[0]
    t = jnp.arange(T, dtype=jnp.float32)
    f = jnp.asarray(fraction, jnp.float32) * T
    p = jnp.asarray(prev_fraction, jnp.float32) * T

    # Reference elif-chain for the per-sample exposure weight.
    c1 = (f >= t) & (p < t - 1)
    c2 = (f >= t - 1) & (p < t - 1)
    c3 = (f >= t) & (p < t)
    c4 = (f >= t - 1) & (p < t)
    t_prop = jnp.where(
        c1, 1.0,
        jnp.where(c2, f - (t - 1),
                  jnp.where(c3, t - p,
                            jnp.where(c4, f - p, 0.0))),
    )

    px = positions[:, 0]
    py = positions[:, 1]
    m2 = jnp.clip(jnp.floor(px), 1, canvas - 1).astype(jnp.int32)
    m1 = jnp.clip(jnp.floor(py), 1, canvas - 1).astype(jnp.int32)
    M2 = m2 + 1
    M1 = m1 + 1

    def tri(x):
        return jnp.maximum(0.0, 1.0 - jnp.abs(x))

    w_mm = t_prop * tri(px - m2) * tri(py - m1)
    w_mM = t_prop * tri(px - M2) * tri(py - m1)
    w_Mm = t_prop * tri(px - m2) * tri(py - M1)
    w_MM = t_prop * tri(px - M2) * tri(py - M1)

    rows = jnp.concatenate([m1, m1, M1, M1])
    cols = jnp.concatenate([m2, M2, m2, M2])
    ws = jnp.concatenate([w_mm, w_mM, w_Mm, w_MM])

    psf = jnp.zeros((canvas, canvas), jnp.float32)
    psf = psf.at[rows, cols].add(ws, mode="drop")
    return psf / T


@jax.jit
def center_psf(psf: jax.Array) -> jax.Array:
    """Roll the PSF so its (mass-weighted) centroid is at canvas/2.

    Matches ``PSF.centerPSF`` (generate_PSF.py:106-123): integer offsets,
    truncated toward zero, circular roll.
    """
    canvas = psf.shape[0]
    total = jnp.sum(psf)
    ys = jax.lax.broadcasted_iota(jnp.float32, psf.shape, 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, psf.shape, 1)
    w = jnp.where(psf > 0, psf, 0.0) / jnp.maximum(total, 1e-20)
    cx = jnp.sum(xs * w)
    cy = jnp.sum(ys * w)
    off_x = jnp.trunc(cx - canvas / 2.0).astype(jnp.int32)
    off_y = jnp.trunc(cy - canvas / 2.0).astype(jnp.int32)
    psf = jnp.roll(psf, -off_x, axis=1)
    psf = jnp.roll(psf, -off_y, axis=0)
    return psf


@jax.jit
def find_offsets(psf: jax.Array) -> jax.Array:
    """Nonzero support extents [left, top, right, bottom] relative to the
    pixel (canvas/2 - 1, canvas/2 - 1), as in PSF.findOffsets
    (generate_PSF.py:125-148). Used for GT box expansion.
    """
    canvas = psf.shape[0]
    half = canvas / 2.0 - 1.0
    mask = psf > 0
    ys = jax.lax.broadcasted_iota(jnp.float32, psf.shape, 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, psf.shape, 1)
    off_x = xs - half
    off_y = ys - half
    neg_inf = -jnp.inf
    right = jnp.maximum(jnp.max(jnp.where(mask & (off_x > 0), off_x, neg_inf)), 0.0)
    left = jnp.maximum(jnp.max(jnp.where(mask & (off_x <= 0), -off_x, neg_inf)), 0.0)
    bottom = jnp.maximum(jnp.max(jnp.where(mask & (off_y > 0), off_y, neg_inf)), 0.0)
    top = jnp.maximum(jnp.max(jnp.where(mask & (off_y <= 0), -off_y, neg_inf)), 0.0)
    return jnp.stack([left, top, right, bottom])


class PSFComponents(NamedTuple):
    theta_rad: jax.Array
    scale_factor_lambda1: jax.Array
    scale_factor_lambda2: jax.Array


@jax.jit
def psf_principal_components(psf: jax.Array) -> PSFComponents:
    """PCA of the PSF *support* (unweighted nonzero coordinates), producing
    the Squint warp parameters. Matches transforms.py:364-385:

      lambda1/2   eigenvalues of the 2x2 support covariance
      theta_rad   = -atan2(lambda1 - varX, -cov)
      scale_f     = 1 - (sigmoid(sqrt(lambda)/10) - 0.5) * 0.6
    """
    mask = (psf > 0).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    ys = jax.lax.broadcasted_iota(jnp.float32, psf.shape, 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, psf.shape, 1)
    mean_x = jnp.sum(xs * mask) / n
    mean_y = jnp.sum(ys * mask) / n
    dx = (xs - mean_x) * mask
    dy = (ys - mean_y) * mask
    var_x = jnp.sum(dx * dx) / n
    var_y = jnp.sum(dy * dy) / n
    cov = jnp.sum(dx * dy) / n

    mid = (var_x + var_y) / 2.0
    root = jnp.sqrt(((var_x - var_y) / 2.0) ** 2 + cov**2)
    lam1 = mid + root
    lam2 = mid - root

    def scale_factor(lam):
        s = jax.nn.sigmoid(jnp.sqrt(jnp.maximum(lam, 0.0)) / 10.0)
        return 1.0 - (s - 0.5) * 0.6

    theta = -jnp.arctan2(lam1 - var_x, -cov)
    return PSFComponents(theta, scale_factor(lam1), scale_factor(lam2))


def crop_center(psf: jax.Array, size: int) -> jax.Array:
    """Crop the central [size, size] window (256 -> 128 in the reference,
    transforms.py:334-335)."""
    c = psf.shape[0]
    off = (c - size) // 2
    return psf[off : off + size, off : off + size]


@functools.partial(
    jax.jit, static_argnames=("canvas", "iters", "max_len", "center", "crop_to")
)
def sample_psf(
    key: jax.Array,
    expl: float | jax.Array,
    fraction: float | jax.Array,
    canvas: int = 256,
    iters: int = 2000,
    max_len: float = 96.0,
    center: bool = True,
    crop_to: int | None = 128,
) -> jax.Array:
    """End-to-end PSF generation: trajectory -> rasterize -> center -> crop.

    Defaults match the on-the-fly generation in the reference BlurImage
    transform (transforms.py:316-335): canvas 256, max_len 96, centered,
    cropped to the central 128x128.
    """
    traj = sample_trajectory(key, canvas=canvas, iters=iters, max_len=max_len, expl=expl)
    psf = rasterize_psf(traj.positions, canvas=canvas, fraction=fraction)
    if center:
        psf = center_psf(psf)
    if crop_to is not None and crop_to < canvas:
        psf = crop_center(psf, crop_to)
    return psf


@jax.jit
def dilate_psf(psf: jax.Array, sigma: jax.Array) -> jax.Array:
    """Defocus dilation (transforms.py:338-342): filter the PSF with a
    Gaussian of (traced) sigma ~ U(0, 3), then normalize by the max.

    Separable conv with a fixed-radius kernel whose weights depend on the
    traced sigma (radius 13 covers 4*sigma_max)."""
    radius = 13
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    s = jnp.maximum(sigma, 1e-6)
    k = jnp.exp(-0.5 * (xs / s) ** 2)
    k = k / jnp.sum(k)
    # sigma ~ 0 degenerates to (almost) a delta kernel: identity filter.
    pad = [(radius, radius), (0, 0)]
    out = jnp.pad(psf, pad, mode="constant")
    out = jax.lax.conv_general_dilated(
        out[None, None], k[None, None, :, None], (1, 1), "VALID")[0, 0]
    out = jnp.pad(out, [(0, 0), (radius, radius)], mode="constant")
    out = jax.lax.conv_general_dilated(
        out[None, None], k[None, None, None, :], (1, 1), "VALID")[0, 0]
    return out / jnp.maximum(jnp.max(out), 1e-20)


# The grids used throughout the reference (transforms.py:248-249,
# evaluate.py:299-310).
BLUR_PARAMS: Sequence[float] = (0.005, 0.001, 0.00005)
BLUR_FRACTIONS: Sequence[float] = (1 / 18, 1 / 10, 1 / 5, 1 / 2, 1.0)
EVAL_PARAMS: Sequence[float] = (0.01, 0.005, 0.001, 0.00005)
EVAL_FRACTIONS: Sequence[float] = (1 / 100, 1 / 25, 1 / 10, 1 / 5, 1 / 2, 1.0)
