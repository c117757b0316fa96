"""Blur-conditional input normalization (utils.py:219-273).

The remedy replaces the ImageNet std with a measured std for the image's
(blur type, exposure) bin — means stay canonical. Tables are the measured
per-channel stds of blurred COCO for P1/P2/P3 x 6 exposure columns, rescaled
by 0.229/0.2384 exactly as the reference does; column ``fraction_index + 1``
is used. fraction_index == -1 (negligible exposure) and non-blurred images
fall back to the canonical stats.

Expressed as one gather over a [3 (param), 6 (column), 3 (channel)] constant
so it lives inside the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

CANONICAL_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
CANONICAL_STD = np.array([0.229, 0.224, 0.225], np.float32)

# Measured stds, rows = 6 exposure columns, cols = RGB.
_STD_P1 = np.array([
    [0.2384, 0.2334, 0.2370], [0.2337, 0.2288, 0.2325], [0.2270, 0.2221, 0.2261],
    [0.2209, 0.2161, 0.2203], [0.2127, 0.2082, 0.2126], [0.2087, 0.2043, 0.2088],
], np.float32)
_STD_P2 = np.array([
    [0.2384, 0.2334, 0.2370], [0.2337, 0.2287, 0.2325], [0.2267, 0.2218, 0.2258],
    [0.2184, 0.2137, 0.2180], [0.2048, 0.2006, 0.2051], [0.1950, 0.1911, 0.1957],
], np.float32)
_STD_P3 = np.array([
    [0.2384, 0.2334, 0.2370], [0.2337, 0.2287, 0.2325], [0.2266, 0.2217, 0.2258],
    [0.2182, 0.2136, 0.2178], [0.2012, 0.1972, 0.2017], [0.1824, 0.1790, 0.1838],
], np.float32)

STD_TABLE = np.stack([_STD_P1, _STD_P2, _STD_P3]) * (0.229 / 0.2384)  # [3, 6, 3]


def get_norm_params(
    blurring: jax.Array,        # [B] bool
    param_index: jax.Array,     # [B] int32, -1 when not applicable
    fraction_index: jax.Array,  # [B] int32, -1 for negligible exposure
):
    """Per-image (means [B,3], stds [B,3])."""
    B = blurring.shape[0]
    means = jnp.tile(jnp.asarray(CANONICAL_MEAN)[None], (B, 1))
    table = jnp.asarray(STD_TABLE)

    p = jnp.clip(param_index, 0, 2)
    f = jnp.clip(fraction_index + 1, 0, 5)
    looked_up = table[p, f]                                  # [B, 3]
    use_custom = blurring & (param_index >= 0) & (fraction_index >= 0)
    stds = jnp.where(use_custom[:, None], looked_up,
                     jnp.asarray(CANONICAL_STD)[None])
    return means, stds
