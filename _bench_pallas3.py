import os, time
os.environ.setdefault("DETECTINBLUR_PRECISION", "default")
import jax, jax.numpy as jnp, numpy as np
import detectinblur_tpu.ops.roi_align_pallas as rap

B, R, C = 8, 1000, 256
H, W = 832, 1248
rng = np.random.default_rng(0)
feats = [jnp.asarray(rng.random((B, H // s, W // s, C), np.float32)) for s in (4, 8, 16, 32)]
x1 = rng.uniform(0, W - 20, (B, R)); y1 = rng.uniform(0, H - 20, (B, R))
ar = np.exp(rng.normal(0, 0.35, (B, R)))
sq = rng.uniform(16, 250, (B, R))
bw = sq * np.sqrt(ar); bh = sq / np.sqrt(ar)
boxes_np = np.stack([x1, y1, np.minimum(x1+bw, W), np.minimum(y1+bh, H)], -1).astype(np.float32)
boxes = jnp.asarray(boxes_np)

# how many oversized?
wb = boxes_np[...,2]-boxes_np[...,0]; hb = boxes_np[...,3]-boxes_np[...,1]
area = np.clip(wb,0,None)*np.clip(hb,0,None)
lvl = np.clip(np.floor(4+np.log2(np.sqrt(area)/224+1e-6)),2,5).astype(int)
sc = 2.0**-lvl
print("oversized-ish (extent>46):", ((np.maximum(wb*sc, hb*sc)) > 46).sum())

import jax.experimental.pallas as _pl
orig_flat = rap._roi_align_flat = rap.__dict__.get('_roi_align_flat', None)
# time full wrapper
@jax.jit
def full(fs, b, c):
    return c + rap.pallas_multiscale_roi_align(list(fs), b).mean()
c = full(tuple(feats), boxes, jnp.zeros(())); float(c)
t0 = time.perf_counter(); n = 20
for _ in range(n): c = full(tuple(feats), boxes, c)
float(c)
print(f"full wrapper: {(time.perf_counter()-t0)/n*1e3:.2f} ms")
