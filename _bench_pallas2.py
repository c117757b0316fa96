import os, time, functools
os.environ.setdefault("DETECTINBLUR_PRECISION", "default")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SAMPLES = 14
B, R, C = 8, 1000, 256
H, W = 832, 1248
RPS, WN, WW = 4, 48, 56
rng = np.random.default_rng(0)
feats = [jnp.asarray(rng.random((B, H // s, W // s, C), np.float32)) for s in (4, 8, 16, 32)]
N = B * R
n_steps = N // RPS

def make(stage, single_wait=True):
    def kernel(img_ref, lvl_ref, orient_ref, n0_ref, w0_ref,
               p2n, p3n, p4n, p5n, p2t, p3t, p4t, p5t,
               tn_ref, tw_ref, out_ref, win, sems):
        step = pl.program_id(0)
        normal = (p2n, p3n, p4n, p5n)
        transp = (p2t, p3t, p4t, p5t)
        def start_dmas(slot, si):
            for k in range(RPS):
                n = si * RPS + k
                b = img_ref[n]; n0 = n0_ref[n]; w0 = w0_ref[n]
                for li in range(4):
                    for oi, refs in enumerate((normal, transp)):
                        @pl.when((lvl_ref[n] == li) & (orient_ref[n] == oi))
                        def _():
                            pltpu.make_async_copy(
                                refs[li].at[b, pl.ds(n0, WN), pl.ds(pl.multiple_of(w0, 8), WW), :],
                                win.at[slot, k], sems.at[slot, k]).start()
        def wait_dmas(slot, si):
            for k in range(RPS):
                if single_wait:
                    n = si * RPS + k
                    b = img_ref[n]; n0 = n0_ref[n]; w0 = w0_ref[n]
                    pltpu.make_async_copy(
                        p2n.at[b, pl.ds(n0, WN), pl.ds(pl.multiple_of(w0, 8), WW), :],
                        win.at[slot, k], sems.at[slot, k]).wait()
                else:
                    n = si * RPS + k
                    b = img_ref[n]; n0 = n0_ref[n]; w0 = w0_ref[n]
                    for li in range(4):
                        for oi, refs in enumerate((normal, transp)):
                            @pl.when((lvl_ref[n] == li) & (orient_ref[n] == oi))
                            def _():
                                pltpu.make_async_copy(
                                    refs[li].at[b, pl.ds(n0, WN), pl.ds(pl.multiple_of(w0, 8), WW), :],
                                    win.at[slot, k], sems.at[slot, k]).wait()
        if stage == 0:
            out_ref[:] = jnp.zeros_like(out_ref)
            return
        @pl.when(step == 0)
        def _(): start_dmas(0, 0)
        @pl.when(step + 1 < n_steps)
        def _(): start_dmas((step + 1) % 2, step + 1)
        wait_dmas(step % 2, step)
        if stage == 1:
            out_ref[:] = win[step % 2][:, :7, :7, :].astype(out_ref.dtype)
            return
        tn = tn_ref[:].astype(jnp.bfloat16)
        tw = tw_ref[:].astype(jnp.bfloat16)
        tn_blk = jnp.concatenate([jnp.pad(tn[k], ((0,0),(k*WN,(RPS-1-k)*WN))) for k in range(RPS)], 0)
        tw_blk = jnp.concatenate([jnp.pad(tw[k], ((0,0),(k*WW,(RPS-1-k)*WW))) for k in range(RPS)], 0)
        cur = win[step % 2]
        w2 = cur.reshape(RPS * WN, WW * C)
        t1 = jax.lax.dot_general(tn_blk, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if stage == 2:
            out_ref[:] = t1[:RPS * 7, :7 * C].reshape(RPS, 7, 7, C).astype(out_ref.dtype)
            return
        t1 = t1.reshape(RPS, SAMPLES, WW, C).transpose(0, 2, 1, 3)
        t1 = t1.reshape(RPS * WW, SAMPLES * C).astype(jnp.bfloat16)
        if stage == 3:
            out_ref[:] = t1[:RPS * 7, :7 * C].reshape(RPS, 7, 7, C).astype(out_ref.dtype)
            return
        t2 = jax.lax.dot_general(tw_blk, t1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if stage == 5:
            out_ref[:] = t2[:RPS * 7, :7 * C].reshape(RPS, 7, 7, C).astype(out_ref.dtype)
            return
        samples = t2.reshape(RPS, SAMPLES, SAMPLES, C).transpose(0, 2, 1, 3)
        bins = samples.reshape(RPS, 7, 2, 7, 2, C).mean((2, 4))
        if stage == 6:
            out_ref[:] = bins.astype(out_ref.dtype)
            return
        bins_t = bins.transpose(0, 2, 1, 3)
        for k in range(RPS):
            n = step * RPS + k
            @pl.when(orient_ref[n] == 0)
            def _(): out_ref[k] = bins[k].astype(out_ref.dtype)
            @pl.when(orient_ref[n] == 1)
            def _(): out_ref[k] = bins_t[k].astype(out_ref.dtype)
    return kernel

pads_n = [jnp.pad(f, ((0,0),(0,WN),(0,WW),(0,0))).astype(jnp.bfloat16) for f in feats]
pads_t = [jnp.pad(jnp.transpose(f, (0,2,1,3)), ((0,0),(0,WN),(0,WW),(0,0))).astype(jnp.bfloat16) for f in feats]
img_idx = jnp.asarray(np.arange(N, dtype=np.int32) // R)
lvl = jnp.asarray(rng.integers(0, 1, N).astype(np.int32))  # all P2 (dominant case)
orient = jnp.asarray((rng.random(N) < 0.5).astype(np.int32))
n0 = jnp.asarray(rng.integers(0, 150, N).astype(np.int32))
w0 = jnp.asarray((rng.integers(0, 250, N) // 8 * 8).astype(np.int32))
tn = jnp.asarray(rng.random((N, SAMPLES, WN), np.float32))
tw = jnp.asarray(rng.random((N, SAMPLES, WW), np.float32))

def run(stage, single_wait):
    kernel = make(stage, single_wait)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5, grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8 + [
            pl.BlockSpec((RPS, SAMPLES, WN), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RPS, SAMPLES, WW), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((RPS, 7, 7, C), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, RPS, WN, WW, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2, RPS))])
    @jax.jit
    def f(carry, *args):
        out = pl.pallas_call(kernel, grid_spec=grid_spec,
                             out_shape=jax.ShapeDtypeStruct((N, 7, 7, C), jnp.float32),
                             )(*args)
        return carry + out.mean()
    args = (img_idx, lvl, orient, n0, w0, *pads_n, *pads_t, tn, tw)
    c = f(jnp.zeros(()), *args); float(c)
    t0 = time.perf_counter(); n = 20
    for _ in range(n): c = f(c, *args)
    float(c)
    print(f"stage {stage} single_wait={single_wait}: {(time.perf_counter()-t0)/n*1e3:.2f} ms")

run(5, True)
run(6, True)
run(4, True)
