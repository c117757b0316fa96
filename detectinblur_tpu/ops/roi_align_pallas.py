"""Pallas TPU kernel for multi-scale RoIAlign.

The XLA formulations in ops/roi_align.py are gather-bound: TPU gathers pay
a fixed per-row cost (~17-30 ns/row on v5e), so even the fastest exact XLA
variant (the corner-quad single-row take, 1.57M rows for the 8x1000-roi
detector batch) floors at ~60 ms. DMA engines, by contrast, stream
*strided windows* at near-HBM bandwidth. This kernel exploits that:

Per roi (replacing torchvision's CUDA roi_align, the backend of
MultiScaleRoIAlign at reference models/faster_rcnn.py:204-208):

  * One async DMA copies a [WIN_Y, WIN_X, C] feature window around the roi
    from its (padded) FPN level into VMEM; windows for the next grid step
    are prefetched while the current step computes (double buffering).
  * Bilinear sampling becomes two block-diagonal MXU matmuls with
    weight-carrying one-hot selection matrices. The 2x2-sample bin mean is
    separable, so it is pre-folded into the selection rows (7 pre-binned
    rows per axis instead of 14 sample rows) — the kernel emits final 7x7
    bins with no strided reductions or sample transposes.

The kernel reads from a FLAT row-stacked pyramid: the four FPN levels are
concatenated along rows into one padded [B, H_all, SEG_W, C] buffer
(_build_flat_pyramid), so window DMAs never branch on the level and the
same buffer serves the oversized correction below for free.

Tiering. The FPN level mapper bounds a roi's *geometric-mean* extent to
sqrt(area)*scale_l < 28 cells below the top level (<= max_side/32 + spill
when clamped), so a [48, 56] window covers ~99% of real RPN proposals
(extreme-aspect slivers land on low levels where their long axis spans
many cells). Oversized rois take an exact correction in tiers:

  * MICRO (<= 64 stragglers, the common case): UNCONDITIONAL — 4-corner
    row takes straight out of the flat pyramid, placed back with one
    concat + N-row take. ~2 ms, no lax.cond (the cond-gated quad
    correction measured +17 ms for six stragglers on v5e).
  * Beyond that, compacted exact-quad tiers behind conds: up to
    k_small/OVERSIZED_K rois gathered with top_k, resampled through the
    exact XLA quad path over the flattened 4B-level pyramid (~5 us/roi),
    placed with an [N, k] one-hot MXU matmul (TPU scatter serializes;
    one-hot rows are exact 0/1, so placement is bit-exact); more than
    OVERSIZED_K oversized rois (pathological untrained-RPN batches)
    escape to a whole-batch exact-quad recompute.

All paths are exact (torch aligned=False semantics, identical to
ops.roi_align.multiscale_roi_align).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SAMPLES = 14          # 7 bins x 2 sampling points per axis
# Oversized-roi budget per batch (fwd and bwd). Sized for the worst real
# case: an UNTRAINED RPN decodes random deltas into extreme-aspect slivers
# and ~25% of the 4096 sampled training rois can overflow the tier-1
# window, so the budget must cover that without tripping the whole-batch
# escape (trained proposals overflow at <1%).
OVERSIZED_K = 2048


def _kernel_factory(rps, win_y, win_x, wins, n_steps, out_size, win_dtype):
    """Forward kernel over the FLAT row-stacked pyramid: the four FPN
    levels are concatenated along rows into one [B, H_all, SEG_W, C]
    buffer (each level segment bottom-padded by win_y, right-padded to
    SEG_W — see _build_flat_pyramid) and each roi's window origin is
    pre-offset by its level's segment row host-side, so the kernel
    branches only on the window size class, never the level. The same
    buffer feeds the micro oversized-correction takes for free."""

    def kernel(img_ref, y0_ref, x0_ref, cls_ref,                # scalar [N]
               flat,                                            # ANY pyramid
               ty_ref, tx_ref,                                  # VMEM blocks
               out_ref,                                         # VMEM block
               win, sems):
        step = pl.program_id(0)
        C = out_ref.shape[-1]

        def dma(slot, si, k, cl):
            n = si * rps + k
            wy, wx = wins[cl]
            return pltpu.make_async_copy(
                flat.at[img_ref[n], pl.ds(y0_ref[n], wy),
                        pl.ds(pl.multiple_of(x0_ref[n], 8), wx), :],
                win.at[slot, k, :wy, :wx],
                sems.at[slot, k],
            )

        # Class 0 rois (grid-padding slots) start and wait NO dma: their
        # selection rows are zero, so they read only stale-but-finite
        # window bytes (the step-0 scrub below guarantees finiteness).
        def each_dma(slot, si, k, fn):
            n = si * rps + k
            for cl in (1, 2):
                @pl.when(cls_ref[n] == cl)
                def _():
                    fn(dma(slot, si, k, cl))

        def start_dmas(slot, si):
            for k in range(rps):
                each_dma(slot, si, k, lambda d: d.start())

        @pl.when(step == 0)
        def _():
            # Scrub the scratch once: small-class windows leave the outer
            # region stale, and uninitialized VMEM could hold non-finite
            # bit patterns that would poison 0-weight selection matmuls.
            win[...] = jnp.zeros(win.shape, win.dtype)
            start_dmas(0, 0)

        @pl.when(step + 1 < n_steps)
        def _():
            start_dmas((step + 1) % 2, step + 1)

        for k in range(rps):
            each_dma(step % 2, step, k, lambda d: d.wait())

        # Block-diagonal pre-binned selection matrices [rps*7, rps*WIN].
        ty = ty_ref[:].astype(win_dtype)      # [rps, 7, win_y]
        tx = tx_ref[:].astype(win_dtype)
        ty_blk = jnp.concatenate(
            [jnp.pad(ty[k], ((0, 0), (k * win_y, (rps - 1 - k) * win_y)))
             for k in range(rps)], axis=0)    # [rps*7, rps*win_y]
        tx_blk = jnp.concatenate(
            [jnp.pad(tx[k], ((0, 0), (k * win_x, (rps - 1 - k) * win_x)))
             for k in range(rps)], axis=0)

        # Parity (f32-window) configs must not let the MXU bf16-round the
        # bilinear weights/features (default one-pass f32 matmul does,
        # ~1e-2 absolute error on unit-scale features — measured on v5e);
        # bf16 windows lose nothing to the rounding, keep the fast pass.
        prec = (jax.lax.Precision.HIGHEST if win_dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        cur = win[step % 2]                   # [rps, win_y, win_x, C]
        w2 = cur.reshape(rps * win_y, win_x * C)
        # Contract y: -> [rps*7, win_x*C].
        t1 = jax.lax.dot_general(
            ty_blk, w2, (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        # Rearrange so x is contractable: [rps*win_x, 7*C].
        t1 = t1.reshape(rps, out_size, win_x, C).transpose(0, 2, 1, 3)
        t1 = t1.reshape(rps * win_x, out_size * C).astype(win_dtype)
        # Contract x: -> [rps*7x, 7y*C].
        t2 = jax.lax.dot_general(
            tx_blk, t1, (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        bins_xy = t2.reshape(rps, out_size, out_size, C)   # [r, x, y, C]
        out_ref[:] = bins_xy.transpose(0, 2, 1, 3).astype(out_ref.dtype)

    return kernel


def _selection(lo, w_lo, w_hi, ok, origin, width):
    """One-hot selection matrix [*, 14, width] carrying bilinear weights."""
    rel = lo - origin[..., None]
    w_lo = jnp.where(ok, w_lo, 0.0)
    w_hi = jnp.where(ok, w_hi, 0.0)
    oob = (rel < 0) | (rel > width - 2)
    rel_c = jnp.clip(rel, 0, width - 2)
    w_lo = jnp.where(oob, 0.0, w_lo)
    w_hi = jnp.where(oob, 0.0, w_hi)
    eye = jnp.arange(width)
    m_lo = (rel_c[..., None] == eye).astype(jnp.float32)
    m_hi = (rel_c[..., None] + 1 == eye).astype(jnp.float32)
    return m_lo * w_lo[..., None] + m_hi * w_hi[..., None]


def _geometry(flat_boxes, sizes, scales, s, g):
    """Level assignment + per-axis bilinear params for [N, 4] boxes —
    delegates to ops.roi_align so the Pallas path can never diverge from
    the XLA reference geometry."""
    from detectinblur_tpu.ops.roi_align import _assign_levels, _level_geometry

    N = flat_boxes.shape[0]
    lvl = _assign_levels(flat_boxes, 224, 4)
    ypar, xpar, Hl, Wl = _level_geometry(
        flat_boxes, lvl, jnp.asarray(sizes), jnp.asarray(scales), s, g)
    flat = lambda t: tuple(a.reshape(N, s * g) for a in t)
    return lvl, Hl, Wl, flat(ypar), flat(xpar)


def _window_geometry(flat_boxes, sizes, scales, win_y, win_x, s, g):
    """Tier-window geometry shared by the forward and backward kernels:
    per-roi (level, clamped window origin, folded selection matrices,
    oversized flag, (ey, ex) sample extents from the clamped origin).

    Origins are clamped assuming each level carries a full win_y/win_x of
    bottom/right padding — true for both consumers (the forward's flat
    pyramid segments and the backward's padded accumulators)."""
    lvl, Hl, Wl, ypar, xpar = _geometry(flat_boxes, sizes, scales, s, g)
    y_lo, _, wy_lo, wy_hi, y_ok = ypar
    x_lo, _, wx_lo, wx_hi, x_ok = xpar

    max_y0 = Hl
    max_x0 = (Wl // 8) * 8
    y0 = jnp.clip(jnp.min(y_lo, axis=1), 0, max_y0)
    x0 = jnp.clip(jnp.min(x_lo, axis=1), 0, max_x0)
    x0 = (x0 // 8) * 8                      # sublane-aligned DMA origin

    ey = jnp.max(y_lo, axis=1) - y0
    ex = jnp.max(x_lo, axis=1) - x0
    oversized = (ey > win_y - 2) | (ex > win_x - 2)

    ty = _selection(y_lo, wy_lo, wy_hi, y_ok, y0, win_y)     # [N, 14, win_y]
    tx = _selection(x_lo, wx_lo, wx_hi, x_ok, x0, win_x)
    # Fold the separable 2x2 bin mean into the selection rows.
    ty = 0.5 * (ty[:, 0::2] + ty[:, 1::2])                   # [N, 7, win_y]
    tx = 0.5 * (tx[:, 0::2] + tx[:, 1::2])
    return lvl, y0, x0, ty, tx, oversized, (ey, ex)


def _build_flat_pyramid(features, win_y, win_x, win_dtype):
    """Row-stack the FPN levels into one padded buffer (see
    _kernel_factory): each level segment is bottom-padded by win_y and
    right-padded to a common SEG_W >= max(W_l) + win_x, so any clamped
    window origin yields an in-bounds strided DMA without per-level
    branching. Returns (flat [B, H_all, SEG_W, C], row offsets [4])."""
    seg_w = max(f.shape[2] for f in features) + win_x
    seg_w = -(-seg_w // 8) * 8
    segs, offs, acc = [], [], 0
    for f in features:
        offs.append(acc)
        segs.append(jnp.pad(
            f.astype(win_dtype),
            ((0, 0), (0, win_y), (0, seg_w - f.shape[2]), (0, 0))))
        acc += f.shape[1] + win_y
    return jnp.concatenate(segs, axis=1), np.asarray(offs, np.int32)


def _kernel_pass(features, flat_boxes, img_idx, sizes, scales, out_dtype,
                 win_dtype, rps, win_y, win_x, s, g):
    """One pallas_call over N rois. Returns
    (out [N,s,s,C], oversized [N], flat pyramid, segment row offsets).

    Window origins are clamped so every DMA stays inside the padded flat
    pyramid — the selection matrices reference the clamped origin, so
    results stay exact, and the window still reaches the level edge."""
    N = flat_boxes.shape[0]
    C = features[0].shape[-1]

    lvl, y0, x0, ty, tx, oversized, (ey, ex) = _window_geometry(
        flat_boxes, sizes, scales, win_y, win_x, s, g)

    flat, seg_off = _build_flat_pyramid(features, win_y, win_x, win_dtype)
    y0f = y0 + jnp.asarray(seg_off)[lvl]

    # Size classes (see _kernel_factory): most trained-RPN rois fit a
    # [win-16, win-16] sub-window (the level mapper keeps sample extents
    # near 14 cells), nearly halving the window DMA traffic.
    wy2, wx2 = max(8, win_y - 16), max(8, win_x - 16)
    wins = ((8, 8), (wy2, wx2), (win_y, win_x))
    small = (ey <= wy2 - 2) & (ex <= wx2 - 2) & ~oversized
    cls = jnp.where(small, 1, 2).astype(jnp.int32)

    n_steps = pl.cdiv(N, rps)
    pad_n = n_steps * rps - N
    img_p, y0_p, x0_p, cls_p, ty_p, tx_p = (
        img_idx, y0f, x0, cls, ty, tx)
    if pad_n:
        def padn(a):
            # Padding slots get class 0: no window DMA at all (their
            # selection rows are zero and their outputs are sliced off).
            return jnp.concatenate([a, jnp.zeros((pad_n, *a.shape[1:]),
                                                 a.dtype)])
        img_p, y0_p, x0_p, cls_p, ty_p, tx_p = map(
            padn, (img_p, y0_p, x0_p, cls_p, ty_p, tx_p))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
            pl.BlockSpec((rps, s, win_y),
                         lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rps, s, win_x),
                         lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rps, s, s, C),
            lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rps, win_y, win_x, C), win_dtype),
            pltpu.SemaphoreType.DMA((2, rps)),
        ],
    )

    kernel = _kernel_factory(rps, win_y, win_x, wins, n_steps, s, win_dtype)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_steps * rps, s, s, C), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_steps * (rps * s) * (rps * win_y) * win_x * C,
            bytes_accessed=n_steps * rps * win_y * win_x * C * 2,
            transcendentals=0,
        ),
    )(img_p, y0_p, x0_p, cls_p, flat, ty_p, tx_p)
    return out[:N], oversized, flat, seg_off


def _quad_batch(features, boxes):
    """Exact full-batch quad path (escape hatch): [B,R,4] -> [B,R,7,7,C]."""
    from detectinblur_tpu.ops.roi_align import multiscale_roi_align

    def one(fs, b):
        return multiscale_roi_align(list(fs), b)

    return jax.vmap(one)(tuple(features), boxes)


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                              "rois_per_step", "win_y",
                                              "win_x", "oversized_k"))
def pallas_multiscale_roi_align(
    features: Sequence[jax.Array],   # 4 levels [B, H_l, W_l, C]
    boxes: jax.Array,                # [B, R, 4] xyxy in input coords
    output_size: int = 7,
    sampling_ratio: int = 2,
    rois_per_step: int = 4,
    win_y: int = 48,
    win_x: int = 56,
    oversized_k: int | None = None,
) -> jax.Array:
    """Batched FPN RoIAlign -> [B, R, 7, 7, C]; see module docstring."""
    from detectinblur_tpu.models.resnet import CONV_PRECISION

    B, R = boxes.shape[:2]
    N = B * R
    C = features[0].shape[-1]
    s, g = output_size, sampling_ratio
    assert s * g == SAMPLES

    win_dtype = (jnp.bfloat16 if CONV_PRECISION == jax.lax.Precision.DEFAULT
                 else features[0].dtype)
    out_dtype = features[0].dtype

    sizes = np.array([[f.shape[1], f.shape[2]] for f in features], np.int32)
    scales = np.array([0.25, 0.125, 0.0625, 0.03125], np.float32)

    flat_boxes = boxes.reshape(N, 4)
    img_idx = (jnp.arange(N, dtype=jnp.int32) // R)

    # ----------------------------------------------- tier 1: window kernel
    out, oversized, flat, seg_off = _kernel_pass(
        features, flat_boxes, img_idx, sizes, scales, out_dtype, win_dtype,
        rois_per_step, win_y, win_x, s, g)

    # ----------------------------------------------------- oversized rois
    # Exact correction for rois whose sample extent overflows the tier-1
    # window. Two regimes:
    #
    #   * MICRO (<= k_micro stragglers, the overwhelmingly common case for
    #     trained AND anchor-shaped proposals): runs UNCONDITIONALLY —
    #     4-corner row takes straight out of the kernel's flat pyramid
    #     (already built, no extra buffer), placed back with a
    #     concat + row-take (no [N, s*s*C] one-hot matmul intermediate).
    #     Keeping this outside lax.cond and quad-free matters: the
    #     cond-gated quad correction measured +17 ms for SIX stragglers
    #     (4C quad concat + f32 one-hot placement + conversion copies);
    #     this path is ~2 ms and pays it predictably.
    #   * BIG (> k_micro): the compacted exact-quad tiers behind conds —
    #     k_small/k_max gathers + one-hot placement (~5 us/roi), then the
    #     whole-batch exact-quad escape beyond OVERSIZED_K. Rare
    #     (untrained-RPN shapes), so the cond boundary cost is acceptable.
    k_max = min(OVERSIZED_K if oversized_k is None else oversized_k, N)
    k_small = min(256, k_max)
    k_micro = min(64, k_small)
    n_over = jnp.sum(oversized)

    from detectinblur_tpu.ops.roi_align import (
        _assign_levels, _build_quad, _corner_sample, _level_geometry,
        _quad_sample)

    lvl = _assign_levels(flat_boxes, 224, 4)
    over_f32 = oversized.astype(jnp.float32)

    def place(idx, sub_out, o):
        # One-hot rows are exact 0/1 in any dtype and each output row has
        # a single nonzero product, so placement is bit-exact in any
        # precision. Surplus top_k picks (n_over < k) land on
        # non-oversized rois and are masked off by the where.
        k = sub_out.shape[0]
        onehot = (idx[None, :] == jnp.arange(N)[:, None])
        placed = jnp.matmul(onehot.astype(sub_out.dtype),
                            sub_out.reshape(k, -1),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        placed = placed.reshape(o.shape).astype(out_dtype)
        return jnp.where(oversized[:, None, None, None], placed, o)

    # ---- micro correction, unconditional, sampled from the flat pyramid.
    _, idx_m = jax.lax.top_k(over_f32, k_micro)
    sub_boxes = flat_boxes[idx_m]
    sub_lvl = lvl[idx_m]
    ypar, xpar, _, _ = _level_geometry(sub_boxes, sub_lvl,
                                       jnp.asarray(sizes),
                                       jnp.asarray(scales), s, g)
    H_all, SEG_W = flat.shape[1], flat.shape[2]
    row0 = ((img_idx[idx_m] * H_all + jnp.asarray(seg_off)[sub_lvl])
            * SEG_W)                                             # [k]
    sub_m = _corner_sample(flat.reshape(-1, C), row0, SEG_W, ypar, xpar,
                           s, g, out_dtype)                      # [k,s,s,C]

    # Placement without the [N, s*s*C] matmul: rows come either from the
    # kernel output or (for the rois idx_m sampled) from sub_m — one concat
    # and one N-row take. Each roi's sub_m row number is SCATTERED from
    # idx_m itself, so sampling and placement share one source of truth
    # and cannot desynchronize (rois outside idx_m keep the fill value
    # k_micro and fall through to the BIG tiers below; surplus top_k picks
    # on non-oversized rois are masked by ``oversized``).
    rank = jnp.full((N,), k_micro, jnp.int32).at[idx_m].set(
        jnp.arange(k_micro, dtype=jnp.int32))                    # [N]
    row_src = jnp.where(oversized & (rank < k_micro),
                        N + jnp.clip(rank, 0, k_micro - 1),
                        jnp.arange(N))
    combined = jnp.concatenate(
        [out.reshape(N, s * s * C), sub_m.reshape(k_micro, s * s * C)])
    out = jnp.take(combined, row_src, axis=0).reshape(N, s, s, C)

    def make_fix(k):
        def fix(o):
            _, idx = jax.lax.top_k(over_f32, k)
            per_image = [features[li][b]
                         for b in range(B) for li in range(4)]
            quad, offs, szs = _build_quad(per_image)
            scales_flat = jnp.asarray(
                [0.25, 0.125, 0.0625, 0.03125] * B, jnp.float32)
            sub_out = _quad_sample(quad, img_idx[idx] * 4 + lvl[idx],
                                   offs, szs, scales_flat,
                                   flat_boxes[idx], s, g, out_dtype)
            return place(idx, sub_out, o)
        return fix

    def overflow(_o):
        # Budget overflow (pathological batches): whole-batch exact quad.
        return (_quad_batch(features, boxes).reshape(N, s, s, C)
                .astype(out_dtype))

    def dispatch(o):
        def big(o2):
            return jax.lax.cond(n_over > k_max, overflow, make_fix(k_max), o2)
        if k_small < k_max:
            return jax.lax.cond(n_over <= k_small, make_fix(k_small), big, o)
        return big(o)

    # n_over <= k_micro is fully handled by the unconditional micro pass;
    # anything beyond it (incl. the > k_max whole-batch escape) goes
    # through the cond chain.
    out = jax.lax.cond(n_over > k_micro, dispatch, lambda o: o, out)
    return out.reshape(B, R, s, s, C)


# ======================================================================
# Backward (training): window read-modify-write accumulation kernel.
#
# RoIAlign is linear in the features: out[r] = T_y[r] @ win[r] @ T_x[r]^T,
# so d(features) is "place T_y^T @ dout[r] @ T_x back at the roi's window
# origin, summed over rois". XLA's take-VJP does this as a scatter of 802k
# sample rows (37 ms/step at batch 8 x 512 rois); a window `scatter_add`
# is catastrophically worse (TPU scatter serializes per update — a 4096-
# window microbench did not finish one iteration in 14 min). This kernel
# streams whole [win_y, win_x, C] f32 windows HBM->VMEM->HBM instead:
#
#   * Rois are laid out in CHAINS, one image per chain (an image's rois
#     never split across chains), so windows of different chains can never
#     overlap and their read-modify-write DMAs run concurrently.
#   * Within a chain the grid's sequential steps serialize: step s waits
#     chain c's step-(s-1) write-back before reading — exact accumulation
#     for arbitrarily overlapping windows of one image.
#   * dwin is two small MXU contractions laid out so no transposes appear:
#     v = T_x^T(j-contract) dout -> [wx, 7, C]; dwin = T_y^T v -> [wy, wx, C].
#
# Oversized rois (window overflow, ~1%) are excluded (their selection
# rows are zeroed) and handled exactly by a k-bounded take-VJP over the
# image-flattened pyramid.
# ======================================================================


def _bwd_kernel_factory(chains, win_y, win_x, wins, n_steps,
                        precision=jax.lax.Precision.DEFAULT):

    def kernel(img_ref, lvl_ref, y0_ref, x0_ref, cls_ref,  # scalar [chains,S]
               z2, z3, z4, z5,                           # aliased zero inits
               dout_ref, ty_ref, tx_ref,                 # VMEM blocks
               o2, o3, o4, o5,                           # ANY level grads
               win, in_sems, out_sems):
        del z2, z3, z4, z5
        step = pl.program_id(0)
        outs = (o2, o3, o4, o5)

        # Scalars are [chains, steps]: the steps-minor layout keeps the
        # SMEM rows lane-aligned (a [steps, chains] layout lane-pads every
        # 4-wide row to 128 and blows the 1 MB SMEM budget).
        def copy(si, c, li, cl, inbound):
            wy, wx = wins[cl]
            region = outs[li].at[
                img_ref[c, si], pl.ds(y0_ref[c, si], wy),
                pl.ds(pl.multiple_of(x0_ref[c, si], 8), wx), :]
            buf = win.at[c, :wy, :wx]
            if inbound:
                return pltpu.make_async_copy(region, buf, in_sems.at[c])
            return pltpu.make_async_copy(buf, region, out_sems.at[c])

        def roi_dma(si, c, inbound, do_wait):
            # Class 0 (zero-contribution rois) is pinned to level 0 host-
            # side, so only 9 of the 12 (level, class) combos are live.
            for li in range(4):
                for cl in ((0, 1, 2) if li == 0 else (1, 2)):
                    @pl.when((lvl_ref[c, si] == li)
                             & (cls_ref[c, si] == cl))
                    def _():
                        dma = copy(si, c, li, cl, inbound)
                        (dma.wait if do_wait else dma.start)()

        # Wait the chain's previous write-back, then fetch this window.
        for c in range(chains):
            @pl.when(step > 0)
            def _():
                roi_dma(step - 1, c, inbound=False, do_wait=True)
            roi_dma(step, c, inbound=True, do_wait=False)

        for c in range(chains):
            roi_dma(step, c, inbound=True, do_wait=True)
            do = dout_ref[0, c].astype(jnp.float32)        # [7, 7, C]
            tyT = ty_ref[0, c].astype(jnp.float32)         # [win_y, 7]
            txT = tx_ref[0, c].astype(jnp.float32)         # [win_x, 7]
            v = jax.lax.dot_general(
                txT, do, (((1,), (1,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32)        # [wx, 7, C]
            dwin = jax.lax.dot_general(
                tyT, v, (((1,), (1,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32)        # [wy, wx, C]
            win[c] = win[c] + dwin
            roi_dma(step, c, inbound=False, do_wait=False)

        @pl.when(step == n_steps - 1)
        def _():
            for c in range(chains):
                roi_dma(step, c, inbound=False, do_wait=True)

    return kernel


def _chain_order(B, R, chains):
    """Static roi ordering [steps, chains]: chain c owns images
    {c, c+chains, ...} with their rois interleaved; -1 = dummy slot."""
    per_chain = -(-B // chains)
    steps = per_chain * R
    ord_ = np.full((steps, chains), -1, np.int64)
    for c in range(chains):
        imgs = list(range(c, B, chains))
        seq = [b * R + r for r in range(R) for b in imgs]
        ord_[: len(seq), c] = seq
    return ord_, steps


def _pallas_roi_align_bwd(feat_shapes, boxes, dout, win_y, win_x, chains=4):
    """Tier-1 window-RMW gradients. Returns (grads per level [B,H,W,C]
    in f32, oversized [N] mask).

    Windows are size-classed per roi to cut the RMW HBM traffic: class 2
    streams the full [win_y, win_x] window, class 1 a [win_y-16, win_x-16]
    sub-window (most trained-RPN rois: the level mapper keeps sample
    extents near 14 cells), and class 0 — rois with provably zero
    contribution (zero upstream cotangent, oversized-with-zeroed-rows,
    chain-padding dummies) — a token [8, 8] copy of level-0 pad rows that
    exists only to keep the chain's semaphore protocol uniform."""
    B, R = boxes.shape[:2]
    N = B * R
    C = dout.shape[-1]
    s, g = 7, 2
    sizes = np.array([[h, w] for (h, w) in feat_shapes], np.int32)
    scales = np.array([0.25, 0.125, 0.0625, 0.03125], np.float32)
    wy2, wx2 = max(8, win_y - 16), max(8, win_x - 16)
    wins = ((8, 8), (wy2, wx2), (win_y, win_x))

    flat_boxes = boxes.reshape(N, 4)
    img_idx = jnp.arange(N, dtype=jnp.int32) // R
    lvl, y0, x0, ty, tx, oversized, (ey, ex) = _window_geometry(
        flat_boxes, sizes, scales, win_y, win_x, s, g)
    keep = (~oversized).astype(ty.dtype)
    ty = ty * keep[:, None, None]

    # Zero-contribution rois: padded/unsampled slots get exactly-zero
    # upstream cotangents from the masked losses, and oversized rois have
    # their selection rows zeroed above (the k-bounded take-VJP handles
    # them exactly) — neither needs its window streamed.
    active = jnp.any(dout.reshape(N, -1) != 0, axis=1)
    redirect = (~active) | oversized
    small = (ey <= wy2 - 2) & (ex <= wx2 - 2)
    cls = jnp.where(redirect, 0, jnp.where(small, 1, 2)).astype(jnp.int32)
    # Class-0 windows live entirely in level-0's bottom pad rows
    # ([H0, H0+8)): they can only race with other class-0 / pad rows, all
    # sliced off the result.
    img_idx = jnp.where(redirect, 0, img_idx)
    lvl = jnp.where(redirect, 0, lvl)
    y0 = jnp.where(redirect, int(sizes[0, 0]), y0)
    x0 = jnp.where(redirect, 0, x0)

    chains = min(chains, B)
    ord_, steps = _chain_order(B, R, chains)
    mask = jnp.asarray(ord_ >= 0)
    idx = jnp.asarray(np.maximum(ord_, 0))

    def arrange(a, fill):
        out = a[idx]
        m = mask.reshape(mask.shape + (1,) * (out.ndim - 2))
        return jnp.where(m, out, fill)

    img_a = arrange(img_idx, 0).T        # [chains, steps] (SMEM layout)
    lvl_a = arrange(lvl, 0).T
    y0_a = arrange(y0, int(sizes[0, 0])).T
    x0_a = arrange(x0, 0).T
    cls_a = arrange(cls, 0).T            # dummies -> class 0
    ty_a = arrange(ty, 0.0)            # zero rows -> dwin == 0 for dummies
    tx_a = arrange(tx, 0.0)
    dout_a = dout.reshape(N, s, s, C)[idx]
    tyT = jnp.swapaxes(ty_a, -1, -2)   # [steps, chains, win_y, 7]
    txT = jnp.swapaxes(tx_a, -1, -2)

    zeros = [jnp.zeros((B, h + win_y, w + win_x, C), jnp.float32)
             for (h, w) in feat_shapes]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4 + [
            pl.BlockSpec((1, chains, s, s, C),
                         lambda i, *_: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chains, win_y, s),
                         lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chains, win_x, s),
                         lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        scratch_shapes=[
            pltpu.VMEM((chains, win_y, win_x, C), jnp.float32),
            pltpu.SemaphoreType.DMA((chains,)),
            pltpu.SemaphoreType.DMA((chains,)),
        ],
    )
    # Same MXU-rounding rule as the forward: f32 cotangents (parity
    # config) need HIGHEST or the weight/grad matmuls bf16-round; bf16
    # cotangents lose nothing to the fast pass.
    bwd_prec = (jax.lax.Precision.HIGHEST if dout.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
    kernel = _bwd_kernel_factory(chains, win_y, win_x, wins, steps,
                                 precision=bwd_prec)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(z.shape, z.dtype) for z in zeros],
        # Zero-initialized accumulators: inputs 5..8 (after the 5 scalar-
        # prefetch operands) are donated to outputs 0..3.
        input_output_aliases={5 + i: i for i in range(4)},
        cost_estimate=pl.CostEstimate(
            flops=2 * steps * chains * (win_x * s * s * C + win_y * win_x * s * C),
            bytes_accessed=2 * steps * chains * win_y * win_x * C * 4,
            transcendentals=0,
        ),
    )(img_a, lvl_a, y0_a, x0_a, cls_a, *zeros, dout_a, tyT, txT)
    grads = [o[:, :h, :w, :] for o, (h, w) in zip(outs, feat_shapes)]
    return grads, oversized


def _oversized_grads(feat_shapes, B, boxes, dout, oversized, k, micro=False):
    """Exact gradients for a k-bounded compaction of oversized rois via the
    take-based quad formulation over a 4B-level flat pyramid. The take's
    VJP is ONE scatter-add of k*196 rows; routing this through the
    dynamic-slice-pair formulation instead transposes into a serial
    batched dynamic-update-slice while loop (~270 ms for k=256 — measured).
    ``micro=True`` differentiates the quad-free ``_flat_sample`` instead
    (4 takes, no corner-concat build) — the cheap path for a handful of
    stragglers, mirroring the forward's micro tier. The whole computation
    sits behind a lax.cond: zero cost on the common all-tier-1 batch."""
    R = boxes.shape[1]
    N = B * R
    C = dout.shape[-1]
    k = min(k, N)
    flat_boxes = boxes.reshape(N, 4)
    img_idx = jnp.arange(N, dtype=jnp.int32) // R
    lvl = _assign_levels_cached(flat_boxes)

    scales32 = jnp.asarray([0.25, 0.125, 0.0625, 0.03125] * B, jnp.float32)

    sel, idx = jax.lax.top_k(oversized.astype(jnp.float32), k)
    sub_boxes = flat_boxes[idx]
    sub_levels = img_idx[idx] * 4 + lvl[idx]
    sub_dout = (dout.reshape(N, 7, 7, C)[idx].astype(jnp.float32)
                * sel[:, None, None, None])

    from detectinblur_tpu.ops.roi_align import (
        _build_quad, _flat_sample, _quad_sample)

    def skip(_):
        return tuple(jnp.zeros((B, h, w, C), jnp.float32)
                     for (h, w) in feat_shapes)

    if micro:
        def fm(feats0):
            return _flat_sample(
                feats0, lvl[idx], img_idx[idx], sub_boxes,
                np.array([0.25, 0.125, 0.0625, 0.03125], np.float32),
                7, 2, jnp.float32)

        zeros_b = tuple(jnp.zeros((B, h, w, C), jnp.float32)
                        for (h, w) in feat_shapes)

        # No cond: the micro VJP is a handful of masked take-transposes
        # (sub_dout rows beyond n_over are zeroed by ``sel``), and running
        # it unconditionally avoids the taken-cond serialization the
        # forward's correction measured (+17 ms for six stragglers). The
        # zero-oversized case contributes exactly zero.
        _, vjp = jax.vjp(fm, zeros_b)
        return tuple(vjp(sub_dout)[0])

    def f(levels32):
        quad, offs, szs = _build_quad(levels32)
        return _quad_sample(quad, sub_levels, offs, szs, scales32,
                            sub_boxes, 7, 2, jnp.float32)

    zeros32 = [jnp.zeros((h, w, C), jnp.float32)
               for _ in range(B) for (h, w) in feat_shapes]

    def compute(_):
        _, vjp = jax.vjp(f, zeros32)
        d32 = vjp(sub_dout)[0]
        return tuple(
            jnp.stack([d32[b * 4 + li] for b in range(B)])
            for li in range(4))

    return jax.lax.cond(jnp.any(oversized), compute, skip, 0)


def _assign_levels_cached(flat_boxes):
    from detectinblur_tpu.ops.roi_align import _assign_levels

    return _assign_levels(flat_boxes, 224, 4)


# ======================================================================
# SPMD: batch-dim partitioning (custom_partitioning).
#
# Pallas custom calls carry no GSPMD/Shardy rule, so under a multi-chip
# mesh the partitioner would all-gather the operands and replicate the
# kernel per device. But both RoIAlign directions are exactly
# batch-parallel: rois index only their own image (img_idx = i // R), the
# backward's accumulation chains never cross images, and the tier budgets
# are per-call, so sharding the leading dim and running the single-device
# kernel per shard is bit-identical to the unsharded computation. The
# rules below say exactly that: dim 0 of every operand/result shards
# together; every other dim must be replicated (the partitioner inserts
# the gathers if a user shards them). Per-shard body: the Pallas kernel
# on TPU backends, the exact XLA quad path elsewhere (CPU meshes used for
# sharding tests — ops/roi_align.py is exact-equal to the kernel).
# ======================================================================


def kernel_backend() -> bool:
    """Whether the current backend can run the Pallas TPU kernels."""
    return jax.default_backend() in ("tpu", "axon")


_CP_CACHE: dict = {}


def _cp_batch_call(key, body, op_factors, res_factors, args):
    """Call ``body(*args)`` through a custom_partitioning op whose rule
    shards the leading 'b' dim of every real operand/result and
    replicates everything else.

    custom_partitioning rejects jaxpr consts, and the kernel paths bake
    small np-derived helper arrays (level sizes, chain orders, scale
    tables) into the trace — so the body is closure-converted first and
    the hoisted consts ride along as extra replicated operands with
    generated factor names. (jax.closure_convert only hoists float
    consts; the integer chain/level tables must move too, so the
    conversion is done by hand from the jaxpr.)"""
    n_args = len(args)
    out_tree_box = []

    def flat_body(*a):
        out = body(*a)
        leaves, tree = jax.tree.flatten(out)
        out_tree_box.append(tree)
        return leaves

    closed_jaxpr = jax.make_jaxpr(flat_body)(*args)
    out_tree = out_tree_box[0]
    consts = closed_jaxpr.consts

    def closed(*all_args):
        real, consts_ = all_args[:n_args], all_args[n_args:]
        leaves = jax.core.eval_jaxpr(closed_jaxpr.jaxpr, consts_, *real)
        return jax.tree.unflatten(out_tree, leaves)

    const_avals = tuple((tuple(c.shape), jnp.dtype(c.dtype).name)
                        for c in consts)
    arg_avals = tuple((tuple(a.shape), jnp.dtype(a.dtype).name)
                      for a in args)
    cache_key = (key, arg_avals, const_avals)
    f = _CP_CACHE.get(cache_key)
    if f is None:
        from jax.experimental.custom_partitioning import custom_partitioning
        from jax.sharding import NamedSharding, PartitionSpec

        n_real = len(op_factors)
        const_factors = [
            " ".join(f"z{i}_{d}" for d in range(len(shape)))
            for i, (shape, _) in enumerate(const_avals)]
        rule = (", ".join(list(op_factors) + const_factors)
                + " -> " + ", ".join(res_factors))
        # need_replication = every factor but 'b', in first-appearance
        # order (shardy requires sorted special-factor indices).
        seen: set = set()
        order: list = []
        for tok in rule.replace("->", ",").split(","):
            for fac in tok.split():
                if fac != "b" and fac not in seen:
                    seen.add(fac)
                    order.append(fac)

        def _batch_axis(arg_shapes):
            for a in jax.tree.leaves(arg_shapes)[:n_real]:
                spec = getattr(a.sharding, "spec", None)
                if spec is not None and len(spec) and spec[0] is not None:
                    return spec[0]
            return None

        def _shardings(mesh, axis, tree, batch):
            def one(x):
                if batch and len(x.shape):
                    return NamedSharding(
                        mesh,
                        PartitionSpec(axis, *([None] * (len(x.shape) - 1))))
                return NamedSharding(mesh, PartitionSpec())
            return jax.tree.map(one, tree)

        # Legacy-GSPMD callbacks (used when shardy is off).
        def infer(mesh, arg_shapes, result_shape):
            return _shardings(mesh, _batch_axis(arg_shapes), result_shape,
                              batch=True)

        def partition(mesh, arg_shapes, result_shape):
            axis = _batch_axis(arg_shapes)
            flat = jax.tree.leaves(arg_shapes)
            arg_sh = tuple(
                _shardings(mesh, axis, a, batch=i < n_real)
                for i, a in enumerate(flat))
            res_sh = _shardings(mesh, axis, result_shape, batch=True)

            def lower_fn(*all_args):
                # Re-trace the body at the per-shard shapes: `closed`
                # replays a jaxpr specialized to the GLOBAL shapes, and
                # the hoisted helper tables (chain orders, level scales)
                # must be rebuilt for the local batch anyway. The global
                # const operands are ignored here.
                return body(*all_args[:n_real])

            return mesh, lower_fn, res_sh, arg_sh

        def propagate(mesh, user_shape):
            return jax.tree.map(lambda x: x.sharding, user_shape)

        f = custom_partitioning(closed)
        f.def_partition(
            partition=partition,
            infer_sharding_from_operands=infer,
            propagate_user_sharding=propagate,
            sharding_rule=rule,
            need_replication_factors=tuple(order),
        )
        _CP_CACHE[cache_key] = f
    return f(*args, *consts)


_FWD_FACTORS = ("b h2 w2 c", "b h3 w3 c", "b h4 w4 c", "b h5 w5 c", "b r q")
_OUT_FACTORS = ("b r o p c",)


def sharded_multiscale_roi_align(
    features,                 # tuple of 4 levels [B, H_l, W_l, C]
    boxes,                    # [B, R, 4]
    output_size: int = 7,
    sampling_ratio: int = 2,
    rois_per_step: int = 4,
    win_y: int = 48,
    win_x: int = 56,
    oversized_k: int | None = None,
):
    """Batch-dim-shardable RoIAlign forward (the inference path): the
    Pallas kernel per shard under any mesh, exact quad elsewhere."""
    feats = tuple(features)

    def body(f2, f3, f4, f5, b):
        if kernel_backend():
            return pallas_multiscale_roi_align(
                (f2, f3, f4, f5), b, output_size, sampling_ratio,
                rois_per_step, win_y, win_x, oversized_k=oversized_k)
        return _quad_batch((f2, f3, f4, f5), b)

    return _cp_batch_call(
        ("roi_align_fwd", output_size, sampling_ratio, rois_per_step,
         win_y, win_x, oversized_k, kernel_backend()),
        body, _FWD_FACTORS, _OUT_FACTORS, (*feats, boxes))


def _sharded_roi_align_bwd(feat_shapes, feat_dtype, win_y, win_x,
                           boxes, dout):
    """Batch-dim-shardable RoIAlign backward: window-RMW kernel per shard
    on TPU, exact take-VJP elsewhere."""
    feat_shapes = tuple(feat_shapes)

    def body(bxs, d):
        B = bxs.shape[0]
        N = B * bxs.shape[1]
        if not kernel_backend():
            all_rois = jnp.ones((N,), bool)
            full = _oversized_grads(feat_shapes, B, bxs, d, all_rois, N)
            return tuple(f.astype(feat_dtype) for f in full)
        grads, oversized = _pallas_roi_align_bwd(
            feat_shapes, bxs, d, win_y, win_x)
        # Oversized rois: exact flat-pyramid take-VJP on a k-bounded
        # subset. Budgets are TIERED like the forward's (the VJP cost
        # scales with the static k, and a few stragglers shouldn't pay
        # the full OVERSIZED_K program); on overflow the WHOLE backward
        # recomputes via the take-VJP over all rois (the forward's
        # escape), so gradients are never dropped.
        k_max = min(OVERSIZED_K, N)
        k_small = min(256, k_max)
        k_micro = min(64, k_small)
        n_over = jnp.sum(oversized)

        def over_with(k):
            def fn(_):
                over = _oversized_grads(feat_shapes, B, bxs, d, oversized, k)
                return tuple((g_ + o_).astype(feat_dtype)
                             for g_, o_ in zip(grads, over))
            return fn

        def full_recompute(_):
            all_rois = jnp.ones((N,), bool)
            full = _oversized_grads(feat_shapes, B, bxs, d, all_rois, N)
            return tuple(f.astype(feat_dtype) for f in full)

        def big(_):
            return jax.lax.cond(n_over > k_max, full_recompute,
                                over_with(k_max), 0)

        def tail(_):
            # > k_micro oversized (rare): recompute the ENTIRE oversized
            # contribution from `grads` through the quad tiers — the
            # unconditional micro result below is discarded, so nothing
            # double-counts.
            if k_small < k_max:
                return jax.lax.cond(n_over <= k_small, over_with(k_small),
                                    big, 0)
            return big(0)

        # Micro tier UNCONDITIONAL (mirrors the forward): the common
        # training batch has 0..64 stragglers, and a taken lax.cond around
        # the correction serializes badly (see the forward's note).
        over_m = _oversized_grads(feat_shapes, B, bxs, d, oversized,
                                  k_micro, micro=True)
        dfeat_m = tuple((g_ + o_).astype(feat_dtype)
                        for g_, o_ in zip(grads, over_m))
        if k_micro >= k_max:
            return jax.lax.cond(n_over > k_max, full_recompute,
                                lambda _: dfeat_m, 0)
        return jax.lax.cond(n_over <= k_micro, lambda _: dfeat_m, tail, 0)

    return _cp_batch_call(
        ("roi_align_bwd", feat_shapes, feat_dtype, win_y, win_x,
         kernel_backend()),
        body, ("b r q", "b r o p c"),
        ("b h2 w2 c", "b h3 w3 c", "b h4 w4 c", "b h5 w5 c"),
        (boxes, dout))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def multiscale_roi_align_fused(
    features,                 # tuple of 4 levels [B, H_l, W_l, C]
    boxes,                    # [B, R, 4]
    output_size: int = 7,
    sampling_ratio: int = 2,
    rois_per_step: int = 4,
    win_y: int = 48,
    win_x: int = 56,
    bwd_win_y: int | None = None,
    bwd_win_x: int | None = None,
):
    """Differentiable batched FPN RoIAlign: Pallas window kernel forward,
    Pallas window-RMW backward (boxes get zero cotangents — proposals are
    detached, matching torchvision's roi_align which has no box grad).
    Both directions shard along the batch dim under a mesh (see the SPMD
    section above).

    ``bwd_win_y/x`` (default: the forward windows) size the backward's RMW
    windows independently. The backward pays 2x the forward's HBM traffic
    (read+write) in f32 (vs bf16 forward windows) and its dwin matmuls
    scale with the window area, so a tighter backward window wins even
    though it classifies more rois oversized — those route through the
    exact k-bounded take-VJP tiers, so gradients stay exact for ANY window
    choice (this is a pure perf knob, not an approximation)."""
    return sharded_multiscale_roi_align(
        tuple(features), boxes, output_size, sampling_ratio, rois_per_step,
        win_y, win_x)


def _fused_fwd(features, boxes, output_size, sampling_ratio, rois_per_step,
               win_y, win_x, bwd_win_y, bwd_win_x):
    out = sharded_multiscale_roi_align(
        tuple(features), boxes, output_size, sampling_ratio, rois_per_step,
        win_y, win_x)
    # Zero-size placeholders carry each level's (H, W) + dtype to bwd.
    shapes = tuple(jnp.zeros((f.shape[1], f.shape[2], 0), f.dtype)
                   for f in features)
    return out, (boxes, shapes)


def _fused_bwd(output_size, sampling_ratio, rois_per_step, win_y, win_x,
               bwd_win_y, bwd_win_x, res, dout):
    assert output_size == 7 and sampling_ratio == 2, (
        "fused backward supports the torchvision 7x7/2 configuration")
    boxes, shapes = res
    feat_shapes = tuple((p.shape[0], p.shape[1]) for p in shapes)
    feat_dtype = jnp.dtype(shapes[0].dtype).name
    dfeat = _sharded_roi_align_bwd(feat_shapes, feat_dtype,
                                   bwd_win_y or win_y, bwd_win_x or win_x,
                                   boxes, dout)
    return dfeat, jnp.zeros_like(boxes)


multiscale_roi_align_fused.defvjp(_fused_fwd, _fused_bwd)
