"""Pallas TPU kernel for the ResNet stem: 7x7/s2 conv + BN + ReLU + 3x3/s2
maxpool, fused.

Why: a 3-channel-minor image tensor is poison for XLA:TPU — every layout
copy pads the 3-lane dimension to 128 (42x amplification), so the stem's
pad/reshape/convert chain around conv1 costs ~7 ms for an 8x832x1248 batch
(vs 1.7 ms for the conv math itself). This kernel reads the image as flat
[B, H, W*3] rows (sane (8,128) tiling, contiguous row DMA), splits the
factor-2 space-to-depth phases with in-VMEM strided lane slices, and runs
the whole stem as ONE [64, 147] x [147, 33*W/2] MXU matmul per row tile,
finishing with the frozen-BN affine, ReLU, and the 3x3/s2 -inf-padded
maxpool (reference torchvision stem, models/faster_rcnn.py:301 backbone).

Output is CHW planes [B, 64, H/4, W/4] (HWC would put 64 lanes back into
a relayout); the caller transposes once at 1/16 of the input bytes.

Exact semantics: out = maxpool3x3s2p1(relu(bn(conv7x7s2p3(x)))) with zero
conv padding and -inf pool padding, matching models/resnet.py's XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_TILE = 16          # pool-output rows per grid step


def _kernel_factory(n_tiles_h, tiles_per_img, cw, win_rows, lanes, dtype):
    """cw = conv output width (W/2); pool output width = cw // 2."""
    CONV_ROWS = 2 * ROWS_PER_TILE + 1        # 33 conv rows per tile
    pw = cw // 2
    plane_w = cw + 3                         # tap columns v = j + tb, tb < 4

    def kernel(flat_ref,                      # ANY [B, Hp, Lp]
               w_ref, scale_ref, bias_ref,    # VMEM [64,147], [64,1], [64,1]
               out_ref,                       # VMEM block [1, 64, 16, pw]
               blk, sems):
        step = pl.program_id(0)
        tile = step % tiles_per_img

        def dma(slot, si):
            bb = si // tiles_per_img
            tt = si % tiles_per_img
            return pltpu.make_async_copy(
                flat_ref.at[bb, pl.ds(tt * (4 * ROWS_PER_TILE), win_rows), :],
                blk.at[slot],
                sems.at[slot],
            )

        @pl.when(step == 0)
        def _():
            dma(0, 0).start()

        n_steps = pl.num_programs(0)

        @pl.when(step + 1 < n_steps)
        def _():
            dma((step + 1) % 2, step + 1).start()

        dma(step % 2, step).wait()
        block = blk[step % 2]                 # [win_rows, lanes]

        # 12 parity planes: plane(pa, q, c)[k, v] = x[4*m0 + 2k + pa - 5,
        # 2v + q - 3, c] (zero-padded coords). Rows pa::2, lanes 6v+3q+c.
        planes = {}
        for pa in (0, 1):
            rows = block[pa::2]               # [36, lanes]
            for q in (0, 1):
                for c in (0, 1, 2):
                    planes[(pa, q, c)] = jax.lax.slice(
                        rows, (0, 3 * q + c),
                        (36, 3 * q + c + 6 * plane_w), (1, 6))

        # rhs[(a,b,c), i, j] = x[2r+a-3, 2j+b-3, c] with r = 2*m0 - 1 + i:
        # a = 2*ta + pa -> plane rows ta + i; b = 2*tb + q -> plane cols
        # tb + j. Conv row r's input row 2r+a-3 = 4*m0 + 2(i+ta) + pa - 5.
        taps = []
        for a in range(7):
            ta, pa = divmod(a, 2)
            for bcol in range(7):
                tb, q = divmod(bcol, 2)
                for c in range(3):
                    p = planes[(pa, q, c)]
                    taps.append(jax.lax.slice(
                        p, (ta, tb), (ta + CONV_ROWS, tb + cw)))
        rhs = jnp.stack(taps, axis=0)         # [147, 33, cw]
        rhs = rhs.reshape(147, CONV_ROWS * cw)

        y = jax.lax.dot_general(
            w_ref[:], rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [64, 33*cw]
        y = y.reshape(64, CONV_ROWS, cw)
        y = y * scale_ref[:].reshape(64, 1, 1) + bias_ref[:].reshape(64, 1, 1)
        y = jnp.maximum(y, 0.0)

        # Pool-pad: conv row r = 2*m0 - 1 + i is -inf outside [0, 2*H4).
        r = 2 * (tile * ROWS_PER_TILE) - 1 + jax.lax.broadcasted_iota(
            jnp.int32, (1, CONV_ROWS, 1), 1)
        valid = (r >= 0) & (r < 2 * n_tiles_h * ROWS_PER_TILE)
        y = jnp.where(valid, y, -jnp.inf)

        # 3x3/s2 maxpool, pad 1 (-inf): rows first, then columns.
        z = jnp.maximum(jnp.maximum(y[:, 0:2 * ROWS_PER_TILE:2],
                                    y[:, 1:2 * ROWS_PER_TILE + 1:2]),
                        y[:, 2:2 * ROWS_PER_TILE + 1:2])   # [64, 16, cw]
        zp = jnp.concatenate(
            [jnp.full((64, ROWS_PER_TILE, 1), -jnp.inf, z.dtype), z], axis=2)
        out = jnp.maximum(jnp.maximum(zp[:, :, 0:2 * pw:2],
                                      zp[:, :, 1:2 * pw + 1:2]),
                          zp[:, :, 2:2 * pw + 1:2])        # [64, 16, pw]
        out_ref[0] = out.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=())
def stem_forward(images: jax.Array,      # [B, H, W, 3], H % 64 == W % 4 == 0
                 w7: jax.Array,          # [7, 7, 3, 64] HWIO conv1 kernel
                 scale: jax.Array,       # [64] frozen-BN scale
                 bias: jax.Array) -> jax.Array:
    """Fused stem -> [B, H/4, W/4, 64] (NHWC)."""
    B, H, W, C = images.shape
    # NOTE: parked kernel (Mosaic strided-slice limits; see module doc).
    # Before wiring into the model, generalize the row tiling: real model
    # buckets have H % 64 == 32 (800, 1056), which needs a partial last
    # tile or a per-bucket ROWS_PER_TILE.
    assert C == 3 and H % (4 * ROWS_PER_TILE) == 0 and W % 4 == 0
    cw = W // 2
    pw = W // 4
    tiles_per_img = H // (4 * ROWS_PER_TILE)
    dtype = images.dtype

    # Flat rows [B, H, W*3] tile sanely; pad so every (row, lane) the taps
    # touch is in bounds: rows 2r+a-3 in [-5, H+3] -> top/bottom pad 5;
    # lanes 6v+3q+c with x offset -3 -> left pad 9, right pad covers
    # x up to W+3 (24 lanes).
    flat = images.reshape(B, H, W * 3).astype(dtype)
    flat = jnp.pad(flat, ((0, 0), (5, 6), (9, 24)))
    win_rows = 4 * ROWS_PER_TILE + 8          # 72 rows per DMA block
    lanes = flat.shape[-1]

    lhs = jnp.transpose(w7, (3, 0, 1, 2)).reshape(64, 147).astype(dtype)
    scale2 = scale.reshape(64, 1).astype(jnp.float32)
    bias2 = bias.reshape(64, 1).astype(jnp.float32)

    n_steps = B * tiles_per_img
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((64, 147), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 64, ROWS_PER_TILE, pw),
            lambda i: (i // tiles_per_img, 0, i % tiles_per_img, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, win_rows, lanes), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = _kernel_factory(tiles_per_img, tiles_per_img, cw, win_rows,
                             lanes, dtype)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 64, H // 4, pw), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 64 * 147 * (H // 2) * cw * B,
            bytes_accessed=B * H * W * 3 * 2,
            transcendentals=0,
        ),
    )(flat, lhs, scale2, bias2)
    return jnp.transpose(out, (0, 2, 3, 1))
