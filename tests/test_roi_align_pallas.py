"""Pallas RoIAlign kernel vs the XLA gather path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from detectinblur_tpu.ops.roi_align import multiscale_roi_align
from detectinblur_tpu.ops.roi_align_pallas import (
    pallas_multiscale_roi_align,
    window_multiscale_roi_align,
)


def _feats(rng, B, C=8):
    return [
        jnp.asarray(rng.random((B, 64, 80, C), dtype=np.float32)),
        jnp.asarray(rng.random((B, 32, 40, C), dtype=np.float32)),
        jnp.asarray(rng.random((B, 16, 20, C), dtype=np.float32)),
        jnp.asarray(rng.random((B, 8, 10, C), dtype=np.float32)),
    ]


def test_pallas_matches_xla(rng):
    B, R = 2, 6
    feats = _feats(rng, B)
    boxes = np.zeros((B, R, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, 200, (B, R))
    boxes[..., 1] = rng.uniform(0, 150, (B, R))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(8, 100, (B, R))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(8, 100, (B, R))
    boxes = jnp.asarray(boxes)

    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(pallas_multiscale_roi_align(feats, boxes))

    expected = np.stack([
        np.asarray(multiscale_roi_align(tuple(f[b] for f in feats), boxes[b]))
        for b in range(B)
    ])
    np.testing.assert_allclose(ours, expected, atol=2e-5)


def test_pallas_oversized_roi_fallback(rng):
    """A giant box (clamped to P5, extent > 30 cells) must take the exact
    XLA fallback and still match."""
    B, R = 1, 4
    feats = _feats(rng, B)
    boxes = np.array([[[0, 0, 250, 310],        # spans nearly the image
                       [10, 10, 60, 60],
                       [5, 5, 1200, 1200],      # absurdly big -> P5 clamp
                       [30, 40, 100, 90]]], np.float32)
    boxes = jnp.asarray(boxes)

    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(pallas_multiscale_roi_align(feats, boxes))

    expected = np.asarray(
        multiscale_roi_align(tuple(f[0] for f in feats), boxes[0])
    )[None]
    np.testing.assert_allclose(ours, expected, atol=2e-5)


def test_window_xla_matches_gather(rng):
    B, R = 2, 6
    feats = _feats(rng, B)
    boxes = np.zeros((B, R, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, 200, (B, R))
    boxes[..., 1] = rng.uniform(0, 150, (B, R))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(8, 100, (B, R))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(8, 100, (B, R))
    # include one giant box to hit the fallback branch
    boxes[0, 0] = [0, 0, 1200, 1200]
    boxes = jnp.asarray(boxes)

    ours = np.asarray(window_multiscale_roi_align(feats, boxes))
    expected = np.stack([
        np.asarray(multiscale_roi_align(tuple(f[b] for f in feats), boxes[b]))
        for b in range(B)
    ])
    np.testing.assert_allclose(ours, expected, atol=2e-5)
