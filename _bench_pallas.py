import os, time
os.environ.setdefault("DETECTINBLUR_PRECISION", "default")
import jax, jax.numpy as jnp, numpy as np
from detectinblur_tpu.ops.roi_align_pallas import pallas_multiscale_roi_align
from detectinblur_tpu.ops.roi_align import multiscale_roi_align

B, R, C = 8, 1000, 256
H, W = 832, 1248
rng = np.random.default_rng(0)
feats = [jnp.asarray(rng.random((B, H // s, W // s, C), np.float32)) for s in (4, 8, 16, 32)]
# Realistic-ish proposals: mostly moderate ar, a few slivers
x1 = rng.uniform(0, W - 20, (B, R)); y1 = rng.uniform(0, H - 20, (B, R))
ar = np.exp(rng.normal(0, 0.35, (B, R)))
sq = rng.uniform(16, 250, (B, R))
bw = sq * np.sqrt(ar); bh = sq / np.sqrt(ar)
boxes = jnp.asarray(np.stack([x1, y1, np.minimum(x1+bw, W), np.minimum(y1+bh, H)], -1).astype(np.float32))

for rps in (4, 2):
    try:
        @jax.jit
        def step(fs, b, carry):
            out = pallas_multiscale_roi_align(list(fs), b, rois_per_step=rps)
            return carry + out.mean()
        c = step(tuple(feats), boxes, jnp.zeros(())); float(c)
        t0 = time.perf_counter(); n = 20
        for _ in range(n): c = step(tuple(feats), boxes, c)
        v = float(c)
        print(f"pallas rps={rps}: {(time.perf_counter()-t0)/n*1e3:.2f} ms (chk {v:.6f})")
    except Exception as e:
        print(f"rps={rps} FAILED: {type(e).__name__}: {str(e)[:300]}")

@jax.jit
def qstep(fs, b, carry):
    out = jax.vmap(lambda f, bb: multiscale_roi_align(list(f), bb))(fs, b)
    return carry + out.mean()
c = qstep(tuple(feats), boxes, jnp.zeros(())); float(c)
t0 = time.perf_counter(); n = 20
for _ in range(n): c = qstep(tuple(feats), boxes, c)
v = float(c)
print(f"xla quad: {(time.perf_counter()-t0)/n*1e3:.2f} ms (chk {v:.6f})")
