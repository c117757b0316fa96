"""BatchNorm with the reference's test-time adaptation modes.

models/batchnorm.py:100-184 of the reference adds two eval-time BN modes
studied as blur remedies:

  * ``acclimation``: update running stats with the incoming batch (EMA),
    then normalize with the *updated* running stats;
  * ``mode_one``: normalize with a blend of source running stats and
    current-batch stats weighted N/(N+1) vs 1/(N+1), where N is
    ``num_batches_tracked`` (set to 16 by evaluate.py:234-237). No update.

Plus standard train (batch stats, EMA update with torch's unbiased-var
running update) and eval (running stats). Running stats live in the
``batch_stats`` collection; mutate by passing ``mutable=["batch_stats"]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class AdaptiveBatchNorm(nn.Module):
    features: int
    mode: str = "train"   # train | eval | acclimation | mode_one
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x):
        f = self.features
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(f, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(f, jnp.float32))
        n_tracked = self.variable("batch_stats", "num_batches_tracked",
                                  lambda: jnp.zeros((), jnp.float32))

        axes = tuple(range(x.ndim - 1))
        n = x.size // f

        def batch_stats():
            m = jnp.mean(x, axes)
            v = jnp.mean(jnp.square(x), axes) - jnp.square(m)  # biased
            return m, v

        if self.mode == "train":
            m, v = batch_stats()
            if not self.is_initializing():
                unbiased = v * n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * m
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                n_tracked.value = n_tracked.value + 1
            use_m, use_v = m, v
        elif self.mode == "eval":
            use_m, use_v = ra_mean.value, ra_var.value
        elif self.mode == "acclimation":
            m, v = batch_stats()
            if not self.is_initializing():
                unbiased = v * n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * m
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                n_tracked.value = n_tracked.value + 1
            use_m, use_v = ra_mean.value, ra_var.value
        elif self.mode == "mode_one":
            m, v = batch_stats()
            N = n_tracked.value
            sf = N / (N + 1.0)
            bf = 1.0 / (N + 1.0)
            use_m = sf * ra_mean.value + bf * m
            use_v = sf * ra_var.value + bf * v
        else:
            raise ValueError(self.mode)

        inv = jax.lax.rsqrt(use_v + self.eps)
        return (x - use_m) * inv * scale + bias


def set_num_batches_tracked(batch_stats, value: float):
    """utils.py setNumBatchesTracked equivalent: rewrite every
    num_batches_tracked leaf (evaluate.py sets 16 for mode_one)."""
    def fix(path, leaf):
        if path and str(path[-1].key) == "num_batches_tracked":
            return jnp.full_like(leaf, value)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, batch_stats)
