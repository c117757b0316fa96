"""Microbench: what does an (untaken) lax.cond cost on this rig?"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

big = jnp.asarray(np.random.default_rng(0).random((8000, 7, 7, 256),
                                                  np.float32).astype(np.float32))
big = jax.block_until_ready(big.astype(jnp.bfloat16))
feats = jax.block_until_ready(
    jnp.asarray(np.random.default_rng(1).random((8, 208, 272, 256),
                                                np.float32)).astype(jnp.bfloat16))


def timed(fn, tag, *args):
    f = jax.jit(fn)
    out = jax.device_get(f(*args, jnp.float32(0.0)))
    best = float("inf")
    ji = 1
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(*args, jnp.float32(1e-6 * ji)); ji += 1
        _ = jax.device_get(out)
        best = min(best, (time.perf_counter() - t0) / 10 * 1000)
    print(f"{tag}: {best:7.2f} ms", flush=True)


def base(x, j):
    return jnp.sum((x + j).astype(jnp.float32))


def one_cond_untaken(x, j):
    y = x + j
    pred = jnp.sum(y[0, 0, 0, :8]) > 1e9      # false
    y = jax.lax.cond(pred, lambda a: a * 2, lambda a: a, y)
    return jnp.sum(y.astype(jnp.float32))


def one_cond_taken(x, j):
    y = x + j
    pred = jnp.sum(y[0, 0, 0, :8]) > -1e9     # true
    y = jax.lax.cond(pred, lambda a: a * 2, lambda a: a, y)
    return jnp.sum(y.astype(jnp.float32))


def two_conds_untaken(x, j):
    y = x + j
    pred = jnp.sum(y[0, 0, 0, :8]) > 1e9
    y = jax.lax.cond(pred, lambda a: a * 2, lambda a: a, y)
    y = jax.lax.cond(pred, lambda a: a * 3, lambda a: a, y)
    return jnp.sum(y.astype(jnp.float32))


def cond_capture_feats(x, f, j):
    y = x + j
    pred = jnp.sum(y[0, 0, 0, :8]) > 1e9
    # untaken branch captures a big unrelated buffer
    y = jax.lax.cond(pred, lambda a: a + jnp.sum(f).astype(a.dtype),
                     lambda a: a, y)
    return jnp.sum(y.astype(jnp.float32))


def switch_untaken(x, j):
    y = x + j
    ix = (jnp.sum(y[0, 0, 0, :8]) > 1e9).astype(jnp.int32)  # 0
    y = jax.lax.switch(ix, [lambda a: a, lambda a: a * 2], y)
    return jnp.sum(y.astype(jnp.float32))


timed(base, "no cond          ", big)
timed(one_cond_untaken, "1 cond, untaken  ", big)
timed(one_cond_taken, "1 cond, taken    ", big)
timed(two_conds_untaken, "2 conds, untaken ", big)
timed(cond_capture_feats, "cond + big capture", big, feats)
timed(switch_untaken, "switch, branch 0 ", big)
