"""Fused Pallas stem kernel vs the XLA stem path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from detectinblur_tpu.ops.stem_pallas import stem_forward


def xla_stem(x, w7, scale, bias):
    y = jax.lax.conv_general_dilated(
        x, w7, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    y = y * scale + bias
    y = jnp.maximum(y, 0.0)
    y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-jnp.inf)
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def test_stem_kernel_matches_xla(rng):
    B, H, W = 2, 64, 96
    x = jnp.asarray(rng.random((B, H, W, 3), dtype=np.float32)) - 0.5
    w7 = jnp.asarray(rng.standard_normal((7, 7, 3, 64), dtype=np.float32)) * 0.1
    scale = jnp.asarray(rng.random(64, dtype=np.float32)) + 0.5
    bias = jnp.asarray(rng.random(64, dtype=np.float32)) - 0.5

    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(stem_forward(x, w7, scale, bias))
    ref = np.asarray(xla_stem(x, w7, scale, bias))
    assert ours.shape == ref.shape == (B, H // 4, W // 4, 64)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)
