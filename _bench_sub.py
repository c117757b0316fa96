import os, time
os.environ.setdefault("DETECTINBLUR_PRECISION", "default")
import jax, jax.numpy as jnp, numpy as np
from detectinblur_tpu.ops.roi_align import _roi_align_flat

B, C = 8, 256
H, W = 832, 1248
K = 384
rng = np.random.default_rng(0)
feats = [jnp.asarray(rng.random((B, H // s, W // s, C), np.float32), dtype=jnp.bfloat16) for s in (4, 8, 16, 32)]
counts = [(H//s)*(W//s) for s in (4,8,16,32)]
total = sum(counts)
offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
sizes = np.array([[H//s, W//s] for s in (4,8,16,32)], np.int32)
scales = np.array([0.25,0.125,0.0625,0.03125], np.float32)

per_img = [f.reshape(B, -1, C) for f in feats]
flat_all = jnp.concatenate(per_img, axis=1).reshape(-1, C)
off4b = (jnp.arange(B)[:, None]*total + jnp.asarray(offs, jnp.int32)[None, :]).reshape(-1)
sizes4b = jnp.tile(jnp.asarray(sizes), (B, 1))
scales4b = jnp.tile(jnp.asarray(scales), (B,))

x1 = rng.uniform(0, W-20, K); y1 = rng.uniform(0, H-20, K)
bw = rng.uniform(100, 900, K); bh = rng.uniform(5, 60, K)
boxes = jnp.asarray(np.stack([x1, y1, np.minimum(x1+bw, W), np.minimum(y1+bh, H)], -1).astype(np.float32))
area = (boxes[:,2]-boxes[:,0])*(boxes[:,3]-boxes[:,1])
lvl = jnp.clip(jnp.floor(4+jnp.log2(jnp.sqrt(area)/224+1e-6)),2,5).astype(jnp.int32)-2
img = jnp.asarray(rng.integers(0, B, K).astype(np.int32))
levels = img*4 + lvl

@jax.jit
def f(fa, lv, bx, c):
    out = _roi_align_flat(fa, lv, off4b, sizes4b, scales4b, bx, 7, 2)
    return c + out.astype(jnp.float32).mean()
c = f(flat_all, levels, boxes, jnp.zeros(())); float(c)
t0 = time.perf_counter(); n = 20
for _ in range(n): c = f(flat_all, levels, boxes, c)
float(c)
print(f"subset scattered K={K}: {(time.perf_counter()-t0)/n*1e3:.2f} ms")
