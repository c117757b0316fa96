"""Per-roi localization of RoIAlign backward-kernel gradient error.

One image, hand-placed rois of each backward tier class (small class-1,
full-window class-2, oversized), f32 everything. For each roi alone
(cotangent nonzero only at that roi), compare the fused Pallas backward
against the exact XLA quad VJP and report the max abs/rel error — this
pins WHICH tier leaks error (tools/verify_bwd_windows.py saw ~3e-3 rel
on mixed batches at both window configs, too big for f32 ordering
noise).
"""
import os
import sys

# Parity mode: the quad reference's buffer quantizes to bf16 in
# throughput mode by design (ops/roi_align.py:91-102); error localization
# needs both sides f32.
os.environ.setdefault("DETECTINBLUR_PRECISION", "highest")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from detectinblur_tpu.ops.roi_align import multiscale_roi_align
from detectinblur_tpu.ops.roi_align_pallas import multiscale_roi_align_fused

B, C = 1, 256
H2, W2 = 208, 272
shapes = [(H2, W2), (H2 // 2, W2 // 2), (H2 // 4, W2 // 4), (H2 // 8, W2 // 8)]

rng = np.random.default_rng(0)
feats = tuple(jnp.asarray(rng.standard_normal((B, h, w, C)), jnp.float32)
              for h, w in shapes)

CASES = [
    ("tiny P2 (class1)", [40.0, 40.0, 80.0, 72.0]),
    ("small P3 (class1)", [100.0, 100.0, 220.0, 196.0]),
    ("mid P4 (class2ish)", [100.0, 60.0, 420.0, 380.0]),
    ("large P5 fits", [50.0, 50.0, 700.0, 600.0]),
    ("frame P5 oversized", [2.0, 2.0, 1080.0, 820.0]),
    ("sliver wide", [10.0, 400.0, 1000.0, 430.0]),
    ("sliver tall", [500.0, 10.0, 530.0, 800.0]),
    ("edge clamp", [1060.0, 800.0, 1087.0, 831.0]),
]
R = len(CASES)
boxes = jnp.asarray(np.array([c[1] for c in CASES], np.float32))[None]

douts = []
for r in range(R):
    d = np.zeros((B, R, 7, 7, C), np.float32)
    d[0, r] = rng.standard_normal((7, 7, C))
    douts.append(jnp.asarray(d))


def loss_fused(fs, dout, bwy, bwx):
    out = multiscale_roi_align_fused(fs, boxes, 7, 2, 4, 40, 48, bwy, bwx)
    return jnp.sum(out * dout)


def loss_exact(fs, dout):
    out = jax.vmap(
        lambda f0, f1, f2, f3, bx: multiscale_roi_align(
            (f0, f1, f2, f3), bx, 7, 2))(*fs, boxes)
    return jnp.sum(out * dout)


g_exact_fn = jax.jit(jax.grad(loss_exact))
g_fused_fn = jax.jit(jax.grad(loss_fused, argnums=0), static_argnums=(2, 3))

for (name, bx), dout in zip(CASES, douts):
    ge = g_exact_fn(feats, dout)
    for bwy, bwx in ((40, 48), (32, 40)):
        gf = g_fused_fn(feats, dout, bwy, bwx)
        worst = 0.0
        lvl_at = -1
        for li, (a, b) in enumerate(zip(gf, ge)):
            e = float(jnp.max(jnp.abs(a - b)))
            if e > worst:
                worst, lvl_at = e, li
        scale = max(float(jnp.max(jnp.abs(jnp.concatenate(
            [x.reshape(-1) for x in ge])))), 1e-12)
        print(f"{name:22s} bwd[{bwy},{bwx}]: max abs {worst:.3e} "
              f"(rel {worst / scale:.3e}) at P{lvl_at + 2}", flush=True)
print("done")
