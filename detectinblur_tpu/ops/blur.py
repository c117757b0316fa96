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


def _reflect_idx(x: jax.Array, n) -> jax.Array:
    """np.pad('reflect') source index for any integer coordinate ``x`` into
    an ``n``-long axis (period 2n-2, no edge repeat); n may be traced."""
    p = jnp.maximum(2 * n - 2, 1)
    m = jnp.mod(x, p)
    return jnp.where(m < n, m, p - m)


def pad_for_blur(image: jax.Array, k: int, hw=None) -> jax.Array:
    """Blur padding for one image [C, Hc, Wc] -> [C, Hc+k-1, Wc+k-1].

    ``hw=None``: the whole canvas is the image (static jnp.pad, the
    original path). ``hw=(h, w)`` (traced): the image occupies the
    top-left [h, w] of the canvas and the PADDING IS COMPUTED AGAINST THE
    VALID REGION, not the canvas — reflect (k=128, h,w >= 64) / zero
    (k=128, small) / edge (k=256) indices relative to (h, w), exactly as
    the reference pads each image at its own size before blurring
    (blur_functions.py:43-69). Without this, a batched canvas blur pulls
    the canvas' zero padding into the bottom/right image edges — up to a
    64px-deep band darkens and detections there drift off the reference.

    One caveat vs the per-image oracle: the circular wrap of the Fourier
    convolution lands at canvas+k-1 instead of h+k-1. Only taps on the
    PSF's outermost ring (row/col k-1, i.e. offset +k/2) can reach the
    wrapped border at all, and sampled camera-shake trajectories carry
    ~zero mass there, so the difference is below float noise in practice.
    """
    c = k // 2 - 1
    C, Hc, Wc = image.shape
    if hw is None:
        pads = (c, k - c - 1)
        mode = _pad_mode(k, Hc, Wc)
        return jnp.pad(image, [(0, 0), pads, pads], mode=mode)
    h, w = hw[0], hw[1]
    xs_r = jnp.arange(Hc + k - 1) - c
    xs_c = jnp.arange(Wc + k - 1) - c
    if k > 129:
        ridx = jnp.clip(xs_r, 0, h - 1)
        cidx = jnp.clip(xs_c, 0, w - 1)
        return image[:, ridx][:, :, cidx]
    refl = (h >= 64) & (w >= 64)
    ridx = jnp.where(refl, _reflect_idx(xs_r, h), jnp.clip(xs_r, 0, h - 1))
    cidx = jnp.where(refl, _reflect_idx(xs_c, w), jnp.clip(xs_c, 0, w - 1))
    g = image[:, ridx][:, :, cidx]
    # Small images pad with zeros (constant mode), not clamped edges.
    inb = ((xs_r >= 0) & (xs_r < h))[:, None] & ((xs_c >= 0) & (xs_c < w))
    return jnp.where(refl | inb[None], g, 0.0).astype(image.dtype)


def fft_blur(
    image: jax.Array,
    psf: jax.Array,
    exact: bool = False,
    hw=None,
) -> jax.Array:
    """Blur ``image`` [C, H, W] with ``psf`` [k, k] (k in {128, 256}).

    ``exact=True`` reproduces the reference roll-loop circularity exactly
    (padded size H+k-1); ``exact=False`` rounds the FFT size up to a
    2/3/5-smooth value for speed (differs from the reference only in the
    wraparound treatment of the outermost pixel ring). ``hw`` marks the
    valid top-left region when the canvas is larger than the image (see
    pad_for_blur).
    """
    k = psf.shape[-1]
    h, w = image.shape[-2], image.shape[-1]
    c = k // 2 - 1  # 63 for k=128, 127 for k=256
    mode = _pad_mode(k, h, w)

    padded = pad_for_blur(image, k, hw)
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


def dft_blur(image: jax.Array, psf: jax.Array, hw=None) -> jax.Array:
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
    padded = pad_for_blur(image, k, hw)
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
                   exact: bool = False, hw=None) -> jax.Array:
    """Blur one image [C, H, W] with a PSF, normalizing the PSF to unit sum
    first (as blur_image_list does, blur_functions.py:98). ``hw`` marks the
    valid top-left region for canvas-batched images (pad_for_blur)."""
    if normalize:
        psf = psf / jnp.maximum(jnp.sum(psf), 1e-20)
    from detectinblur_tpu.models.resnet import CONV_PRECISION

    if (not exact and CONV_PRECISION == jax.lax.Precision.DEFAULT
            and jax.default_backend() in ("tpu", "axon")):
        return dft_blur(image, psf, hw=hw)
    return fft_blur(image, psf, exact=exact, hw=hw)


@functools.partial(jax.jit, static_argnames=("exact",))
def batched_blur(
    images: jax.Array,
    psfs: jax.Array,
    blurring: jax.Array,
    exact: bool = False,
    hw: jax.Array = None,
) -> jax.Array:
    """Blur a batch: images [B, C, H, W], psfs [B, k, k], blurring [B] bool.

    Non-blurring entries pass through unchanged (blur_functions.py:92-100).
    Entire batch runs as one fused device computation — this is the op that
    replaces the reference's per-image Python dispatch so the input pipeline
    never chokes the host (README.md:8).

    ``hw`` [B, 2] gives each image's valid extent on the canvas: the blur
    pads against the VALID region like the reference's per-image blur
    (pad_for_blur), and the canvas outside it is re-zeroed afterwards (the
    blurred reflect-extension must not leak into the batch padding, which
    downstream resize/normalize assume is zero, like torchvision's
    batch_images zero fill).
    """
    if hw is None:
        def one(img, psf, on):
            blurred = apply_psf_blur(img, psf, exact=exact)
            return jnp.where(on, blurred, img)

        return jax.vmap(one)(images, psfs, blurring)

    Hc, Wc = images.shape[-2], images.shape[-1]
    rows = jnp.arange(Hc)
    cols = jnp.arange(Wc)

    def one(img, psf, on, hwi):
        blurred = apply_psf_blur(img, psf, exact=exact, hw=hwi)
        valid = (rows < hwi[0])[:, None] & (cols < hwi[1])
        return jnp.where(on & valid[None], blurred, img)

    return jax.vmap(one)(images, psfs, blurring, hw)
