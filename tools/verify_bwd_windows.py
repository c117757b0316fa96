"""Chip-side exactness + timing for the tiered RoIAlign backward windows.

Checks that multiscale_roi_align_fused's gradients with a TIGHTER backward
window (bwd_win [32, 40] under a [40, 48] forward) stay exact against the
XLA quad path's VJP — including rois that are oversized for the backward
window but NOT for the forward one (they must route through the take-VJP
tiers) — then times the backward alone at both window configs.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_bwd_windows.py
"""
import os
import sys
import time

# Parity mode by default: the exactness assertions compare against the
# XLA quad path, whose _build_quad buffer quantizes to bf16 in throughput
# mode BY DESIGN (ops/roi_align.py:91-102) — comparing f32 kernels against
# it under DETECTINBLUR_PRECISION=default measures that quantization
# (~4e-3 rel), not kernel error. Run with DETECTINBLUR_PRECISION=default
# for throughput-mode timing (loose tolerance).
os.environ.setdefault("DETECTINBLUR_PRECISION", "highest")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from detectinblur_tpu.ops.roi_align import multiscale_roi_align
from detectinblur_tpu.ops.roi_align_pallas import multiscale_roi_align_fused

B, R, C = 8, 512, 256
H2, W2 = 208, 272            # 832x1088 bucket levels
shapes = [(H2, W2), (H2 // 2, W2 // 2), (H2 // 4, W2 // 4), (H2 // 8, W2 // 8)]

rng = np.random.default_rng(0)
feats_f32 = tuple(jnp.asarray(rng.standard_normal((B, h, w, C)), jnp.float32)
                  for h, w in shapes)
feats_bf16 = tuple(f.astype(jnp.bfloat16) for f in feats_f32)

# Sampled-proposal-shaped rois (the training distribution) ...
boxes = np.zeros((B, R, 4), np.float32)
boxes[..., 0] = rng.uniform(0, 900, (B, R))
boxes[..., 1] = rng.uniform(0, 700, (B, R))
boxes[..., 2] = boxes[..., 0] + rng.uniform(8, 180, (B, R))
boxes[..., 3] = boxes[..., 1] + rng.uniform(8, 180, (B, R))
# ... plus per image a handful of BIG rois that fit a [40, 48] window but
# overflow [32, 40] (P2-mapped boxes of ~110-140 px => 28-35 cells at /4),
# and two that overflow both (full-frame boxes).
for b in range(B):
    for j in range(6):
        x0, y0 = rng.uniform(0, 800), rng.uniform(0, 600)
        boxes[b, 7 * j, :] = [x0, y0, x0 + rng.uniform(115, 135),
                              y0 + rng.uniform(115, 135)]
    boxes[b, 3, :] = [2, 2, 1080, 820]
    boxes[b, 11, :] = [5, 1, 1000, 790]
boxes = jnp.asarray(boxes)

dout_f32 = jnp.asarray(rng.standard_normal((B, R, 7, 7, C)), jnp.float32)
dout_bf16 = dout_f32.astype(jnp.bfloat16)


def loss_fused(fs, dout, bwy, bwx):
    out = multiscale_roi_align_fused(fs, boxes, 7, 2, 4, 40, 48, bwy, bwx)
    return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))


def loss_exact(fs, dout):
    out = jax.vmap(
        lambda f0, f1, f2, f3, bx: multiscale_roi_align(
            (f0, f1, f2, f3), bx, 7, 2))(*fs, boxes)
    return jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32))


# Exactness in the parity dtype (f32 windows force HIGHEST MXU passes in
# both kernels, so any residual is real routing error, not rounding).
g_exact = jax.jit(jax.grad(loss_exact))(feats_f32, dout_f32)
grad_fn = jax.jit(jax.grad(loss_fused, argnums=0), static_argnums=(2, 3))
for tag, (bwy, bwx) in (("bwd[40,48]", (40, 48)), ("bwd[32,40]", (32, 40))):
    g = grad_fn(feats_f32, dout_f32, bwy, bwx)
    # Grads accumulate 4096 rois x 196 bilinear samples per call; the two
    # implementations sum in different orders, so compare RELATIVE to the
    # gradient magnitude (f32 accumulation-order noise), not absolutely.
    rels = []
    for a, b in zip(g, g_exact):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        scale = float(jnp.max(jnp.abs(b))) or 1.0
        rels.append(float(jnp.max(jnp.abs(a - b))) / scale)
    print(f"{tag}: f32 max rel err per level = "
          f"{[f'{e:.2e}' for e in rels]} "
          f"(|g| max {float(jnp.max(jnp.abs(g_exact[0]))):.1f})", flush=True)
    # Parity mode: both sides are f32/HIGHEST -> accumulation-order noise
    # only. Throughput mode: the quad reference quantizes features to bf16
    # (see header), so only a bf16-scale agreement is meaningful.
    tol = 5e-4 if os.environ["DETECTINBLUR_PRECISION"] == "highest" else 2e-2
    assert max(rels) < tol, f"{tag} gradient mismatch: {rels}"

    # Timing in the throughput dtype (bf16 activations, f32 RMW accum).
    out = grad_fn(feats_bf16, dout_bf16, bwy, bwx)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for i in range(10):
            out = grad_fn(tuple(f + jnp.bfloat16(1e-3 * i)
                                for f in feats_bf16), dout_bf16, bwy, bwx)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"{tag}: bf16 fwd+bwd {best * 1000:.1f} ms", flush=True)
print("ok")
