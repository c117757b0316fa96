import io

import numpy as np
import pytest

from detectinblur_tpu.ops.jpeg import (
    add_jpeg_artifact,
    diff_round,
    jpeg_compress_decompress,
    quality_to_factor,
)

import jax.numpy as jnp


def test_quality_to_factor():
    np.testing.assert_allclose(float(quality_to_factor(50.0)), 1.0001, atol=1e-4)
    np.testing.assert_allclose(float(quality_to_factor(10.0)), 5.0)
    np.testing.assert_allclose(float(quality_to_factor(90.0)), 0.2001, atol=1e-4)


def test_diff_round_near_integers():
    x = jnp.asarray([1.0, 1.4, 1.5001, 2.0])
    r = np.asarray(diff_round(x))
    np.testing.assert_allclose(r[0], 1.0)
    np.testing.assert_allclose(r[3], 2.0)
    assert 1.0 < r[1] < 1.4  # pulled toward round(x) but differentiable


def test_high_quality_roundtrip(rng):
    # Random noise is JPEG's worst case (chroma subsampling alone loses a
    # lot); a smooth gradient image must round-trip nearly losslessly.
    ys, xs = np.mgrid[0:32, 0:32].astype(np.float32)
    img = np.stack([xs / 31, ys / 31, (xs + ys) / 62], -1)
    out = np.asarray(jpeg_compress_decompress(jnp.asarray(img), 95.0))
    assert np.abs(out - img).mean() < 0.02


def test_quality_monotonic(rng):
    # Smooth image: reconstruction error grows as quality drops.
    ys, xs = np.mgrid[0:32, 0:32]
    img = np.stack([np.sin(xs / 5), np.cos(ys / 7), xs / 32.0], -1).astype(np.float32)
    img = (img - img.min()) / (img.max() - img.min())
    errs = []
    for q in (90.0, 50.0, 20.0):
        out = np.asarray(jpeg_compress_decompress(jnp.asarray(img), q))
        errs.append(np.abs(out - img).mean())
    assert errs[0] < errs[1] < errs[2]


def test_matches_real_jpeg_statistically(rng):
    """Our differentiable JPEG should land close to PIL's real JPEG."""
    PIL = pytest.importorskip("PIL.Image")
    img = (rng.random((48, 48, 3)) * 0.5 + 0.25).astype(np.float32)
    ours = np.asarray(jpeg_compress_decompress(jnp.asarray(img), 50.0,
                                               differentiable=False))
    buf = io.BytesIO()
    PIL.fromarray((img * 255).astype(np.uint8)).save(buf, "JPEG", quality=50)
    buf.seek(0)
    real = np.asarray(PIL.open(buf), np.float32) / 255.0
    # Both should be similarly-lossy reconstructions of the same image.
    assert np.abs(ours - real).mean() < 0.05


def test_add_jpeg_artifact_shape(rng):
    img = rng.random((37, 53, 3)).astype(np.float32)
    out = np.asarray(add_jpeg_artifact(jnp.asarray(img), 60.0))
    assert out.shape == img.shape
    assert np.isfinite(out).all()
    assert 0 <= out.min() and out.max() <= 1
