"""Backbone stage decomposition on the chip (stem vs stages vs FPN)."""
import os
import time

os.environ.setdefault("DETECTINBLUR_PRECISION", "default")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from detectinblur_tpu.models.resnet import ACT_DTYPE

B, H, W = 8, 832, 1088
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((B, H, W, 3), np.float32))

import flax.linen as nn
from detectinblur_tpu.models.resnet import CONV_PRECISION


class Stem(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=ACT_DTYPE,
                    precision=CONV_PRECISION)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        return x


stem = Stem()
sp = stem.init(jax.random.key(0), x)


def timed(f, *args, tag=""):
    g = jax.jit(f)
    out = jax.device_get(g(*args, jnp.float32(0.0)))
    best = float("inf")
    ji = 1
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = g(*args, jnp.float32(1e-6 * ji)); ji += 1
        _ = jax.device_get(out)
        best = min(best, (time.perf_counter() - t0) / 10 * 1000)
    print(f"{tag}: {best:7.2f} ms", flush=True)
    return best


timed(lambda p, xx, j: jnp.sum(stem.apply(p, xx + j).astype(jnp.float32)),
      sp, x, tag="stem conv7x7+pool (f32 in)")

xb = x.astype(jnp.bfloat16)
timed(lambda p, xx, j: jnp.sum(stem.apply(p, xx + j).astype(jnp.float32)),
      sp, xb, tag="stem conv7x7+pool (bf16 in)")

# space-to-depth 4x4: [B, H/4, W/4, 48] then 2x2s1 conv equiv? The torch
# stem is 7x7s2+maxpool3x3s2 = overall /4. s2d formulation: reshape to
# [B, H/2, 2, W/2, 2, 3] -> conv 4x4... just measure the conv part cost
# of an s2d'd input as an upper-bound probe.
xs2d = jnp.transpose(
    x.reshape(B, H // 4, 4, W // 4, 4, 3), (0, 1, 3, 2, 4, 5)
).reshape(B, H // 4, W // 4, 48).astype(jnp.bfloat16)


class S2DConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Conv(64, (2, 2), padding="SAME", use_bias=False,
                       dtype=ACT_DTYPE, precision=CONV_PRECISION)(x)


sc = S2DConv()
scp = sc.init(jax.random.key(0), xs2d)
timed(lambda p, xx, j: jnp.sum(sc.apply(p, xx + j).astype(jnp.float32)),
      scp, xs2d, tag="s2d: pre-s2d 2x2 conv on [H/4,W/4,48]")

timed(lambda xx, j: jnp.sum((jnp.transpose(
    (xx + j).astype(jnp.bfloat16).reshape(B, H // 4, 4, W // 4, 4, 3),
    (0, 1, 3, 2, 4, 5)).reshape(B, H // 4, W // 4, 48)).astype(jnp.float32)),
      x, tag="s2d reshape/transpose alone (f32->bf16)")

# Full backbone for reference
from detectinblur_tpu.models.resnet import ResNetFPN
bb = ResNetFPN()
bp = bb.init(jax.random.key(0), x)
timed(lambda p, xx, j: sum(
    jnp.sum(o.astype(jnp.float32)) for o in bb.apply(p, xx + j)),
      bp, x, tag="full backbone+FPN")
