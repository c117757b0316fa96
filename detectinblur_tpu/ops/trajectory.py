"""Camera-shake trajectory sampler (Boracchi & Foi 2012), TPU-native.

Reproduces the stochastic process of the reference implementation
(``motion_blur/generate_trajectory.py:8-104``) as a single ``lax.scan`` over
fixed-shape float2 state, driven by ``jax.random`` keys, so thousands of
trajectories can be generated on-device via ``vmap`` instead of a Python loop
per sample.

Process (per step, matching the reference dynamics):
  * a particle with position x_t (2-vector, was complex in the reference) and
    velocity v is perturbed by Gaussian shake, pulled back toward the origin
    (centripetal), and with probability ``prob_big_shake * expl`` undergoes an
    impulsive near-inversion of velocity;
  * velocity is renormalized to ``max_len / (iters - 1)`` each step so equal
    exposure implies equal path length.

Per-fit hyperpriors match the reference draws: centripetal ~ 0.7*U(0,1),
prob_big_shake ~ 0.2*U(0,1), gaussian_shake ~ 10*U(0,1), init angle U(0,360).
Exact RNG-stream parity with numpy is neither possible nor required;
distributional parity is verified in tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class TrajectoryParams(NamedTuple):
    canvas: int = 64
    iters: int = 2000
    max_len: float = 60.0
    expl: float = 0.005


class TrajectoryResult(NamedTuple):
    # Positions centered on the canvas: x[t] = raw[t] + canvas/2.
    # Shape [iters, 2], (x, y) order — reference uses complex (real=x, imag=y).
    positions: jax.Array
    # Positions before recentering (reference ``unprocessedX``).
    raw_positions: jax.Array
    tot_length: jax.Array
    big_shake_count: jax.Array


def _rotate(v: jax.Array, angle: jax.Array) -> jax.Array:
    """Complex multiply v * exp(i*angle) expressed on float2."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack([v[0] * c - v[1] * s, v[0] * s + v[1] * c])


@functools.partial(jax.jit, static_argnames=("canvas", "iters"))
def sample_trajectory(
    key: jax.Array,
    canvas: int = 64,
    iters: int = 2000,
    max_len: float = 60.0,
    expl: float | jax.Array = 0.005,
) -> TrajectoryResult:
    """Sample one camera-shake trajectory. vmap-able over ``key``/``expl``."""
    k_cent, k_shake, k_gauss, k_angle, k_steps = jax.random.split(key, 5)

    centripetal = 0.7 * jax.random.uniform(k_cent)
    prob_big_shake = 0.2 * jax.random.uniform(k_shake)
    gaussian_shake = 10.0 * jax.random.uniform(k_gauss)
    init_angle = 2.0 * jnp.pi * jax.random.uniform(k_angle)

    expl = jnp.asarray(expl, jnp.float32)
    step_len = max_len / (iters - 1)

    v0 = jnp.stack([jnp.cos(init_angle), jnp.sin(init_angle)])
    # Reference: v = v0 * max_len/(iters-1), overridden to v0*expl when expl>0.
    v_init = jnp.where(expl > 0, v0 * expl, v0 * step_len)

    step_keys = jax.random.split(k_steps, iters - 1)

    def step(carry, k):
        x, v, tot_len, big_count = carry
        ku, kphase, kg = jax.random.split(k, 3)

        is_big = jax.random.uniform(ku) < prob_big_shake * expl
        # Impulsive inversion: 2 * v * exp(i*(pi + U(-0.5, 0.5))).
        phase = jnp.pi + (jax.random.uniform(kphase) - 0.5)
        big_dir = 2.0 * _rotate(v, phase)
        next_direction = jnp.where(is_big, big_dir, jnp.zeros(2))

        gauss = jax.random.normal(kg, (2,))
        dv = next_direction + expl * (gaussian_shake * gauss - centripetal * x) * step_len

        v = v + dv
        v = v / jnp.linalg.norm(v) * step_len
        x_new = x + v
        tot_len = tot_len + jnp.linalg.norm(v)
        big_count = big_count + is_big.astype(jnp.int32)
        return (x_new, v, tot_len, big_count), x_new

    init = (jnp.zeros(2), v_init, jnp.float32(0.0), jnp.int32(0))
    (_, _, tot_len, big_count), xs = jax.lax.scan(step, init, step_keys)

    raw = jnp.concatenate([jnp.zeros((1, 2)), xs], axis=0)
    centered = raw + canvas / 2.0
    return TrajectoryResult(centered, raw, tot_len, big_count)


def apply_scale_factor(raw_positions: jax.Array, canvas: int) -> jax.Array:
    """Rescale a raw trajectory so it fits within the canvas, recentered.

    Mirrors ``Trajectory.applyscale_factor`` (generate_trajectory.py:100-104).
    """
    half = canvas / 2.0 - 2.0
    scale = jnp.max(jnp.abs(raw_positions)) / half
    return raw_positions / scale + canvas / 2.0
