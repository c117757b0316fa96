"""On-device motion-blur application.

The reference applies a 128x128 (or 256x256) PSF to an image either with a
CPU Fourier-domain convolution in dataloader workers
(``motion_blur/blur_image.py:104-154``) or with a GPU loop of
``output += roll(image, (py-63, px-63)) * psf[py, px]`` over the PSF's
nonzero coordinates (``models/blur_functions.py:11-89``).

The roll loop is exactly a *circular* convolution of the padded image with
the PSF centered at (63, 63) — so on TPU we compute it as one batched
FFT-domain multiply (rfft2 -> multiply -> irfft2), which is both exact
(bit-for-bit up to float error, including the reference's subtle wraparound
at the padded border) and maps the O(nnz * H * W) loop onto O(H W log HW)
device-wide work with no host involvement.

Padding semantics match the reference:
  * k=128: pad (left, right, top, bottom) = (63, 64, 63, 64); 'reflect' if
    both spatial dims >= 64 else zero-fill ('constant').
  * k=256: pad (127, 128, 127, 128); 'replicate' (edge) always.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_mode(k: int, h: int, w: int) -> str:
    if k > 129:
        return "edge"
    return "reflect" if (h >= 64 and w >= 64) else "constant"


def _fast_fft_size(n: int) -> int:
    """Next 2/3/5-smooth size >= n (TPU FFT is fastest on smooth sizes)."""
    best = 1 << (n - 1).bit_length()
    m = n
    while m <= best:
        k = m
        for p in (2, 3, 5):
            while k % p == 0:
                k //= p
        if k == 1:
            return m
        m += 1
    return best


def fft_blur(
    image: jax.Array,
    psf: jax.Array,
    exact: bool = False,
) -> jax.Array:
    """Blur ``image`` [..., H, W] with ``psf`` [k, k] (k in {128, 256}).

    ``exact=True`` reproduces the reference roll-loop circularity exactly
    (padded size H+k-1); ``exact=False`` rounds the FFT size up to a
    2/3/5-smooth value for speed (differs from the reference only in the
    wraparound treatment of the outermost pixel ring).
    """
    k = psf.shape[-1]
    h, w = image.shape[-2], image.shape[-1]
    c = k // 2 - 1  # 63 for k=128, 127 for k=256
    pads = (c, k - c - 1)  # (63, 64) / (127, 128)
    mode = _pad_mode(k, h, w)

    pad_width = [(0, 0)] * (image.ndim - 2) + [pads, pads]
    padded = jnp.pad(image, pad_width, mode=mode)
    hp, wp = padded.shape[-2], padded.shape[-1]

    if not exact:
        fh, fw = _fast_fft_size(hp), _fast_fft_size(wp)
        if (fh, fw) != (hp, wp):
            extra = [(0, 0)] * (image.ndim - 2) + [(0, fh - hp), (0, fw - wp)]
            # Extra padding uses the same mode; it only shifts where the
            # circular wrap lands (inside the cropped-away margin).
            padded = jnp.pad(padded, extra, mode="edge" if mode != "constant" else "constant")
            hp, wp = fh, fw

    kern = jnp.zeros((hp, wp), psf.dtype)
    kern = kern.at[:k, :k].set(psf)
    # Center tap (c, c) of the PSF must land at index (0, 0).
    kern = jnp.roll(kern, (-c, -c), axis=(0, 1))

    img_f = jnp.fft.rfft2(padded.astype(jnp.float32))
    kern_f = jnp.fft.rfft2(kern.astype(jnp.float32))
    out = jnp.fft.irfft2(img_f * kern_f, s=(hp, wp))
    return out[..., c : c + h, c : c + w].astype(image.dtype)


def _dft_mats(n: int, dtype):
    k = jnp.arange(n, dtype=jnp.float32)
    ang = 2.0 * jnp.pi * (k[:, None] * k[None, :]) / n
    return jnp.cos(ang).astype(dtype), jnp.sin(ang).astype(dtype)


def dft_blur(image: jax.Array, psf: jax.Array) -> jax.Array:
    """``fft_blur(exact=True)`` computed as MXU matmuls instead of FFT.

    XLA:TPU's FFT is ~4x slower than the equivalent dense DFT on the MXU at
    detector image sizes (~600x770 padded), so throughput mode evaluates the
    circular convolution as Y = F_H x F_W (DFT matrices are symmetric; all
    complex algebra is expanded into real matmuls with f32 accumulation).
    bf16 operand rounding matches the reference's own fp16 blur transfer
    (engine.py:79-98 moves images to the GPU as .half()).
    """
    k = psf.shape[-1]
    h, w = image.shape[-2], image.shape[-1]
    c = k // 2 - 1
    pads = (c, k - c - 1)
    mode = _pad_mode(k, h, w)
    pad_width = [(0, 0)] * (image.ndim - 2) + [pads, pads]
    padded = jnp.pad(image, pad_width, mode=mode)
    hp, wp = padded.shape[-2], padded.shape[-1]

    kern = jnp.zeros((hp, wp), jnp.float32).at[:k, :k].set(
        psf.astype(jnp.float32))
    kern = jnp.roll(kern, (-c, -c), axis=(0, 1))

    dtype = jnp.bfloat16
    ch, sh = _dft_mats(hp, dtype)
    cw, sw = _dft_mats(wp, dtype)

    def mm(a, b):
        return jnp.matmul(a.astype(dtype), b.astype(dtype),
                          preferred_element_type=jnp.float32)

    def fwd(x):                       # real [., hp, wp] -> (Xr, Xi)
        a = mm(ch, x)
        b = mm(sh, x)
        return mm(a, cw) - mm(b, sw), -(mm(a, sw) + mm(b, cw))

    xr, xi = fwd(padded)
    kr, ki = fwd(kern)
    yr = xr * kr - xi * ki
    yi = xr * ki + xi * kr
    # Inverse: y = (1/HW) * Re[(C_H + iS_H) Y (C_W + iS_W)].
    u = mm(ch, yr) - mm(sh, yi)
    v = mm(ch, yi) + mm(sh, yr)
    out = (mm(u, cw) - mm(v, sw)) / (hp * wp)
    return out[..., c : c + h, c : c + w].astype(image.dtype)


def apply_psf_blur(image: jax.Array, psf: jax.Array, normalize: bool = True,
                   exact: bool = False) -> jax.Array:
    """Blur one image [C, H, W] with a PSF, normalizing the PSF to unit sum
    first (as blur_image_list does, blur_functions.py:98)."""
    if normalize:
        psf = psf / jnp.maximum(jnp.sum(psf), 1e-20)
    from detectinblur_tpu.models.resnet import CONV_PRECISION

    if (not exact and CONV_PRECISION == jax.lax.Precision.DEFAULT
            and jax.default_backend() in ("tpu", "axon")):
        return dft_blur(image, psf)
    return fft_blur(image, psf, exact=exact)


@functools.partial(jax.jit, static_argnames=("exact",))
def batched_blur(
    images: jax.Array,
    psfs: jax.Array,
    blurring: jax.Array,
    exact: bool = False,
) -> jax.Array:
    """Blur a batch: images [B, C, H, W], psfs [B, k, k], blurring [B] bool.

    Non-blurring entries pass through unchanged (blur_functions.py:92-100).
    Entire batch runs as one fused device computation — this is the op that
    replaces the reference's per-image Python dispatch so the input pipeline
    never chokes the host (README.md:8).
    """
    def one(img, psf, on):
        blurred = apply_psf_blur(img, psf, exact=exact)
        return jnp.where(on, blurred, img)

    return jax.vmap(one)(images, psfs, blurring)
