import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectinblur_tpu.ops.trajectory import sample_trajectory, apply_scale_factor


def test_shapes_and_start():
    res = sample_trajectory(jax.random.key(0), canvas=64, iters=200, max_len=60.0, expl=0.005)
    assert res.positions.shape == (200, 2)
    # First sample is the origin, recentered to canvas/2.
    np.testing.assert_allclose(np.asarray(res.positions[0]), [32.0, 32.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.raw_positions[0]), [0.0, 0.0], atol=1e-6)


def test_constant_step_length():
    # Velocity is renormalized each step => equal exposure, equal length.
    iters, max_len = 300, 60.0
    res = sample_trajectory(jax.random.key(3), iters=iters, max_len=max_len, expl=0.005)
    steps = np.diff(np.asarray(res.positions), axis=0)
    lens = np.linalg.norm(steps, axis=1)
    np.testing.assert_allclose(lens, max_len / (iters - 1), rtol=1e-4)
    np.testing.assert_allclose(float(res.tot_length), max_len, rtol=1e-3)


def test_zero_anxiety_is_rectilinear():
    # expl=0: no shakes at all -> straight line (Boracchi & Foi 2011 mode).
    res = sample_trajectory(jax.random.key(7), iters=100, max_len=30.0, expl=0.0)
    pts = np.asarray(res.raw_positions)
    d = pts[-1] - pts[0]
    d = d / np.linalg.norm(d)
    proj = pts @ d
    residual = pts - np.outer(proj, d)
    assert np.abs(residual).max() < 1e-3
    assert int(res.big_shake_count) == 0


def test_vmap_batch_generation():
    keys = jax.random.split(jax.random.key(0), 8)
    batch = jax.vmap(lambda k: sample_trajectory(k, iters=100).positions)(keys)
    assert batch.shape == (8, 100, 2)
    # Distinct keys give distinct trajectories.
    assert np.std(np.asarray(batch[:, -1, 0])) > 1e-3


def test_big_shakes_occur_with_high_anxiety():
    # With a large expl, the big-shake probability is boosted; across many
    # keys at least some trajectories must record impulsive events.
    keys = jax.random.split(jax.random.key(42), 16)
    counts = jax.vmap(
        lambda k: sample_trajectory(k, iters=500, expl=0.9).big_shake_count
    )(keys)
    assert int(jnp.sum(counts)) > 0


def test_apply_scale_factor_fits_canvas():
    res = sample_trajectory(jax.random.key(5), canvas=64, iters=500, max_len=200.0, expl=0.5)
    scaled = apply_scale_factor(res.raw_positions, canvas=64)
    arr = np.asarray(scaled)
    assert arr.min() >= 0.0 and arr.max() <= 64.0


@pytest.mark.parametrize("expl", [0.005, 0.001, 0.00005])
def test_stays_reasonably_bounded(expl):
    # The centripetal term keeps trajectories near the origin for the
    # parameter grid used in training (transforms.py:248).
    res = sample_trajectory(jax.random.key(11), canvas=256, iters=2000, max_len=96.0, expl=expl)
    raw = np.asarray(res.raw_positions)
    assert np.abs(raw).max() <= 96.0 + 1e-3
