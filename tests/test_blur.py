import math

import jax
import jax.numpy as jnp
import numpy as np

from detectinblur_tpu.ops.blur import fft_blur, apply_psf_blur, batched_blur
from detectinblur_tpu.ops.psf import sample_psf


def numpy_roll_blur_oracle(image, psf):
    """Independent numpy implementation of the documented GPU sparse blur
    semantics (blur_functions.py:11-69): pad, circular roll-accumulate over
    PSF nonzeros, crop."""
    k = psf.shape[0]
    c = k // 2 - 1
    C, H, W = image.shape
    if k > 129:
        mode = "edge"
    else:
        mode = "reflect" if (H >= 64 and W >= 64) else "constant"
    padded = np.pad(image, ((0, 0), (c, k - c - 1), (c, k - c - 1)), mode=mode)
    out = np.zeros_like(padded)
    ys, xs = np.nonzero(psf)
    for y, x in zip(ys, xs):
        out += np.roll(padded, shift=(y - c, x - c), axis=(1, 2)) * psf[y, x]
    return out[:, c : c + H, c : c + W]


def _rand_sparse_psf(rng, k=128, n=25):
    psf = np.zeros((k, k), np.float32)
    ys = rng.integers(40, 90, n)
    xs = rng.integers(40, 90, n)
    psf[ys, xs] = rng.random(n).astype(np.float32)
    return psf / psf.sum()


def test_fft_blur_exact_matches_roll_oracle(rng):
    img = rng.random((3, 70, 81), dtype=np.float32)
    psf = _rand_sparse_psf(rng)
    ours = np.asarray(fft_blur(jnp.asarray(img), jnp.asarray(psf), exact=True))
    oracle = numpy_roll_blur_oracle(img, psf)
    np.testing.assert_allclose(ours, oracle, atol=2e-5)


def test_fft_blur_small_image_constant_pad(rng):
    # Images smaller than 64 px use zero padding (blur_functions.py:55-58).
    img = rng.random((3, 50, 50), dtype=np.float32)
    psf = _rand_sparse_psf(rng)
    ours = np.asarray(fft_blur(jnp.asarray(img), jnp.asarray(psf), exact=True))
    oracle = numpy_roll_blur_oracle(img, psf)
    np.testing.assert_allclose(ours, oracle, atol=2e-5)


def test_fft_blur_256_replicate_pad(rng):
    img = rng.random((1, 70, 70), dtype=np.float32)
    psf = np.zeros((256, 256), np.float32)
    psf[120:135, 125:130] = rng.random((15, 5)).astype(np.float32)
    psf /= psf.sum()
    ours = np.asarray(fft_blur(jnp.asarray(img), jnp.asarray(psf), exact=True))
    oracle = numpy_roll_blur_oracle(img, psf)
    np.testing.assert_allclose(ours, oracle, atol=2e-5)


def test_fast_mode_close_to_exact(rng):
    img = rng.random((3, 100, 117), dtype=np.float32)
    psf = _rand_sparse_psf(rng)
    exact = np.asarray(fft_blur(jnp.asarray(img), jnp.asarray(psf), exact=True))
    fast = np.asarray(fft_blur(jnp.asarray(img), jnp.asarray(psf), exact=False))
    # Interior must agree; only the outer ring may differ via wraparound.
    np.testing.assert_allclose(exact[:, 2:-2, 2:-2], fast[:, 2:-2, 2:-2], atol=1e-4)


def test_identity_psf_is_noop(rng):
    img = rng.random((3, 80, 80), dtype=np.float32)
    psf = np.zeros((128, 128), np.float32)
    psf[63, 63] = 1.0  # center tap
    out = np.asarray(fft_blur(jnp.asarray(img), jnp.asarray(psf), exact=True))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_blur_preserves_mean(rng):
    # Unit-sum PSF + reflect padding preserves overall brightness closely.
    img = rng.random((3, 128, 128), dtype=np.float32)
    psf = np.asarray(sample_psf(jax.random.key(0), expl=0.005, fraction=0.5, iters=300))
    psf = psf / psf.sum()
    out = np.asarray(fft_blur(jnp.asarray(img), jnp.asarray(psf)))
    assert abs(out.mean() - img.mean()) < 0.02


def test_batched_blur_passthrough(rng):
    imgs = rng.random((2, 3, 72, 72), dtype=np.float32)
    psfs = np.stack([_rand_sparse_psf(rng), np.zeros((128, 128), np.float32)])
    blurring = np.array([True, False])
    out = np.asarray(batched_blur(jnp.asarray(imgs), jnp.asarray(psfs), jnp.asarray(blurring)))
    # Second image untouched.
    np.testing.assert_allclose(out[1], imgs[1], atol=1e-6)
    # First image actually blurred.
    assert np.abs(out[0] - imgs[0]).max() > 1e-3


def test_apply_psf_blur_normalizes(rng):
    img = rng.random((3, 70, 70), dtype=np.float32)
    psf = _rand_sparse_psf(rng) * 7.3  # unnormalized
    a = np.asarray(apply_psf_blur(jnp.asarray(img), jnp.asarray(psf), normalize=True, exact=True))
    b = np.asarray(fft_blur(jnp.asarray(img), jnp.asarray(psf / psf.sum()), exact=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_dft_blur_matches_fft(rng):
    """The MXU DFT-matmul blur equals the exact FFT blur (f32 math on CPU;
    on TPU throughput mode it runs in bf16, matching the reference's fp16
    blur transfer)."""
    import jax.numpy as jnp
    from detectinblur_tpu.ops.blur import dft_blur, fft_blur

    img = jnp.asarray(rng.random((3, 96, 128), dtype=np.float32))
    psf = np.zeros((128, 128), np.float32)
    psf[60:70, 58:72] = rng.random((10, 14))
    psf /= psf.sum()
    psf = jnp.asarray(psf)

    a = np.asarray(dft_blur(img, psf))
    b = np.asarray(fft_blur(img, psf, exact=True))
    # bf16 operand rounding inside dft_blur bounds the difference.
    np.testing.assert_allclose(a, b, atol=2e-2)
    assert abs(a.mean() - b.mean()) < 1e-3


def test_engine_default_blur_is_exact_in_parity_mode():
    """DETECTINBLUR_PRECISION=highest (the default, and this suite's env)
    must route apply_blur_and_expand through the exact circular conv
    (VERDICT r1 weak-5): engine default == exact_blur=True bit-for-bit."""
    import jax

    import __graft_entry__ as ge
    from detectinblur_tpu.models.resnet import CONV_PRECISION
    from detectinblur_tpu.train.engine import apply_blur_and_expand

    assert CONV_PRECISION == jax.lax.Precision.HIGHEST
    batch = ge._tiny_batch(1, 70, 70, seed=3)
    batch = batch._replace(blurring=jnp.ones(1, bool))
    default = apply_blur_and_expand(batch, False)
    exact = apply_blur_and_expand(batch, False, exact_blur=True)
    np.testing.assert_array_equal(np.asarray(default.images),
                                  np.asarray(exact.images))


def test_batched_blur_valid_region_matches_per_image_oracle(rng):
    """Canvas-batched blur with hw pads against the VALID region, not the
    canvas (pad_for_blur): each image on a larger zero-padded canvas blurs
    exactly like the reference's per-image blur at its own size
    (blur_functions.py:43-69), and the canvas outside stays zero. Without
    valid-region padding the canvas' zeros bleed ~64px into the image's
    bottom/right edges."""
    canvas_h, canvas_w = 128, 160
    shapes = [(110, 150), (96, 128), (128, 160), (70, 90)]
    psfs = np.stack([_rand_sparse_psf(rng) for _ in shapes])
    imgs = np.zeros((len(shapes), 3, canvas_h, canvas_w), np.float32)
    per_image = []
    for i, (h, w) in enumerate(shapes):
        raw = rng.random((3, h, w), dtype=np.float32)
        imgs[i, :, :h, :w] = raw
        per_image.append(numpy_roll_blur_oracle(raw, psfs[i]))

    out = np.asarray(batched_blur(
        jnp.asarray(imgs), jnp.asarray(psfs),
        jnp.ones(len(shapes), bool), exact=True,
        hw=jnp.asarray(shapes)))
    for i, (h, w) in enumerate(shapes):
        np.testing.assert_allclose(out[i, :, :h, :w], per_image[i],
                                   atol=3e-5)
        # Outside the valid region the canvas is re-zeroed.
        if h < canvas_h:
            assert np.abs(out[i, :, h:, :]).max() == 0.0
        if w < canvas_w:
            assert np.abs(out[i, :, :, w:]).max() == 0.0


def test_batched_blur_valid_region_full_canvas_unchanged(rng):
    """hw == canvas must reproduce the hw=None path bit-for-bit."""
    imgs = rng.random((2, 3, 70, 81), dtype=np.float32)
    psfs = np.stack([_rand_sparse_psf(rng) for _ in range(2)])
    on = jnp.ones(2, bool)
    a = np.asarray(batched_blur(jnp.asarray(imgs), jnp.asarray(psfs), on,
                                exact=True))
    b = np.asarray(batched_blur(jnp.asarray(imgs), jnp.asarray(psfs), on,
                                exact=True,
                                hw=jnp.asarray([[70, 81], [70, 81]])))
    np.testing.assert_allclose(a, b, atol=1e-6)
