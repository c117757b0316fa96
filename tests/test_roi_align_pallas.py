"""Pallas RoIAlign kernel vs the XLA gather path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from detectinblur_tpu.ops.roi_align import multiscale_roi_align
from detectinblur_tpu.ops.roi_align_pallas import pallas_multiscale_roi_align


def _feats(rng, B, C=8):
    return [
        jnp.asarray(rng.random((B, 64, 80, C), dtype=np.float32)),
        jnp.asarray(rng.random((B, 32, 40, C), dtype=np.float32)),
        jnp.asarray(rng.random((B, 16, 20, C), dtype=np.float32)),
        jnp.asarray(rng.random((B, 8, 10, C), dtype=np.float32)),
    ]


def _expected(feats, boxes):
    return np.stack([
        np.asarray(multiscale_roi_align(tuple(f[b] for f in feats), boxes[b]))
        for b in range(boxes.shape[0])
    ])


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

    np.testing.assert_allclose(ours, _expected(feats, boxes), atol=2e-5)


def test_pallas_orientation_and_fallback(rng):
    """Tall and wide slivers exceed the tier-1 window in one axis and must
    take the exact compacted-quad correction; giants exercise the P5
    clamp."""
    B, R = 1, 8
    feats = _feats(rng, B)
    boxes = np.array([[[0, 0, 250, 310],      # spans nearly the image
                       [10, 10, 60, 60],      # square
                       [5, 5, 1200, 1200],    # absurdly big -> P5 clamp
                       [30, 40, 100, 90],     # wide-ish
                       [100, 0, 118, 250],    # tall sliver (transposed path)
                       [0, 120, 310, 140],    # wide sliver (fallback)
                       [50, 50, 51, 51],      # sub-pixel
                       [200, 5, 206, 230]]],  # extreme tall sliver
                     np.float32)
    boxes = jnp.asarray(boxes)

    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(pallas_multiscale_roi_align(feats, boxes))

    np.testing.assert_allclose(ours, _expected(feats, boxes), atol=2e-5)


def test_pallas_budget_escape_hatch(rng):
    """More oversized rois than the budget -> the whole batch recomputes on
    the exact quad path (lax.cond escape)."""
    import detectinblur_tpu.ops.roi_align_pallas as rap

    B, R = 1, 6
    feats = _feats(rng, B)
    # All rois are wide slivers that exceed the wide window.
    boxes = np.zeros((B, R, 4), np.float32)
    boxes[..., 0] = 0.0
    boxes[..., 1] = rng.uniform(0, 200, (B, R))
    boxes[..., 2] = 318.0
    boxes[..., 3] = boxes[..., 1] + rng.uniform(4, 10, (B, R))
    boxes = jnp.asarray(boxes)

    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(pallas_multiscale_roi_align(feats, boxes,
                                                      oversized_k=2))

    np.testing.assert_allclose(ours, _expected(feats, boxes), atol=2e-5)


def test_pallas_quad_tier_beyond_micro(rng):
    """More oversized rois than the unconditional micro budget (64) but
    within the quad budget -> the cond-gated quad tier must re-place
    EVERY oversized roi exactly (the micro pass only fixed the first 64)."""
    B, R = 1, 128
    feats = _feats(rng, B)
    boxes = np.zeros((B, R, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, 180, (B, R))
    boxes[..., 1] = rng.uniform(0, 140, (B, R))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(8, 60, (B, R))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(8, 60, (B, R))
    # 80 wide slivers overflow the window -> n_over=80 > k_micro=64.
    for i in range(80):
        boxes[0, i] = [0.0, 100.0 + i, 318.0, 104.0 + i]
    boxes = jnp.asarray(boxes)

    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(pallas_multiscale_roi_align(feats, boxes))

    np.testing.assert_allclose(ours, _expected(feats, boxes), atol=2e-5)


def test_fused_vjp_matches_quad_grads(rng, monkeypatch):
    """multiscale_roi_align_fused: the window-RMW backward kernel (plus the
    oversized take-VJP fallback) must match autodiff through the XLA quad
    formulation exactly (both are exact linear-operator transposes).

    kernel_backend() is forced True so the PALLAS kernels run (interpreted)
    — without it the sharded wrapper would silently test the CPU take-VJP
    fallback against itself."""
    import detectinblur_tpu.ops.roi_align_pallas as rap
    from detectinblur_tpu.ops.roi_align_pallas import multiscale_roi_align_fused

    monkeypatch.setattr(rap, "kernel_backend", lambda: True)
    monkeypatch.setattr(rap, "_CP_CACHE", {})

    B, R = 2, 6
    feats = _feats(rng, B)
    boxes = np.zeros((B, R, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, 180, (B, R))
    boxes[..., 1] = rng.uniform(0, 140, (B, R))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(8, 90, (B, R))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(8, 90, (B, R))
    # Overlapping rois in one image stress the sequential accumulation;
    # one oversized wide sliver exercises the take-VJP fallback; a tiny
    # roi lands in the small window class.
    boxes[0, 1] = boxes[0, 0] + np.array([4, 4, 4, 4], np.float32)
    boxes[0, 2] = [0.0, 60.0, 318.0, 70.0]
    boxes[1, 3] = [40.0, 40.0, 52.0, 52.0]
    boxes = jnp.asarray(boxes)
    w = np.asarray(rng.random((B, R, 7, 7, 8), dtype=np.float32))
    # Exactly-zero cotangents for two rois exercise the class-0 skip
    # (padded/unsampled slots in the train step look like this).
    w[0, 4] = 0.0
    w[1, 0] = 0.0
    w = jnp.asarray(w)

    def quad_loss(fs):
        out = jnp.stack([
            multiscale_roi_align(tuple(f[b] for f in fs), boxes[b])
            for b in range(B)])
        return jnp.sum(out * w)

    def fused_loss(fs):
        out = multiscale_roi_align_fused(tuple(fs), boxes, 7, 2, 2, 16, 24)
        return jnp.sum(out * w)

    expected = jax.grad(quad_loss)(feats)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(fused_loss)(feats)

    for g, e in zip(got, expected):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                   atol=3e-5, rtol=1e-4)


def test_fused_vjp_micro_tier(rng, monkeypatch):
    """Backward micro tier: with N > 64 rois the k_micro=64 branch exists
    (k_micro < k_small) and a few oversized stragglers route their
    gradients through the _flat_sample VJP — the hot path of real training
    steps (N = 4096, a handful of oversized). The small-N fused test above
    statically elides this branch (k_micro == k_small at N = 12)."""
    import detectinblur_tpu.ops.roi_align_pallas as rap
    from detectinblur_tpu.ops.roi_align_pallas import multiscale_roi_align_fused

    monkeypatch.setattr(rap, "kernel_backend", lambda: True)
    monkeypatch.setattr(rap, "_CP_CACHE", {})

    B, R = 1, 80
    feats = _feats(rng, B)
    boxes = np.zeros((B, R, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, 180, (B, R))
    boxes[..., 1] = rng.uniform(0, 140, (B, R))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(8, 40, (B, R))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(8, 40, (B, R))
    for i in range(5):   # oversized wide slivers -> micro VJP
        boxes[0, i] = [0.0, 60.0 + 8 * i, 318.0, 66.0 + 8 * i]
    boxes = jnp.asarray(boxes)
    w = jnp.asarray(rng.random((B, R, 7, 7, 8), dtype=np.float32))

    def quad_loss(fs):
        out = jnp.stack([
            multiscale_roi_align(tuple(f[b] for f in fs), boxes[b])
            for b in range(B)])
        return jnp.sum(out * w)

    def fused_loss(fs):
        out = multiscale_roi_align_fused(tuple(fs), boxes, 7, 2, 2, 16, 24)
        return jnp.sum(out * w)

    expected = jax.grad(quad_loss)(feats)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(fused_loss)(feats)

    for g, e in zip(got, expected):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                   atol=3e-5, rtol=1e-4)


def test_pallas_micro_tier_scattered_oversized(rng):
    """Several oversized rois at SCATTERED indices (not a contiguous
    prefix): the micro tier's sampling (idx_m) and placement (rank
    scattered from idx_m) must agree per-roi (ADVICE r4 item 4)."""
    B, R = 1, 48
    feats = _feats(rng, B)
    boxes = np.zeros((B, R, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, 180, (B, R))
    boxes[..., 1] = rng.uniform(0, 140, (B, R))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(8, 60, (B, R))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(8, 60, (B, R))
    # Oversized wide slivers at scattered, DISTINCT geometries so a
    # sampling/placement swap between any two of them changes values.
    for j, i in enumerate([3, 11, 17, 29, 41, 46]):
        boxes[0, i] = [0.0, 60.0 + 9 * j, 318.0, 63.0 + 9 * j]
    boxes = jnp.asarray(boxes)

    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(pallas_multiscale_roi_align(feats, boxes))

    np.testing.assert_allclose(ours, _expected(feats, boxes), atol=2e-5)
