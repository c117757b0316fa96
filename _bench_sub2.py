import os, time
os.environ.setdefault("DETECTINBLUR_PRECISION", "default")
import jax, jax.numpy as jnp, numpy as np

B, C = 8, 256
H, W = 832, 1248
K = 384
rng = np.random.default_rng(0)
feats32 = [jnp.asarray(rng.random((B, H // s, W // s, C), np.float32)) for s in (4, 8, 16, 32)]
counts = [(H//s)*(W//s) for s in (4,8,16,32)]
total = sum(counts)
offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
sizes = np.array([[H//s, W//s] for s in (4,8,16,32)], np.int32)
scales = np.array([0.25,0.125,0.0625,0.03125], np.float32)

x1 = rng.uniform(0, W-20, K); y1 = rng.uniform(0, H-20, K)
bw = rng.uniform(100, 900, K); bh = rng.uniform(5, 60, K)
boxes = jnp.asarray(np.stack([x1, y1, np.minimum(x1+bw, W), np.minimum(y1+bh, H)], -1).astype(np.float32))
area = (boxes[:,2]-boxes[:,0])*(boxes[:,3]-boxes[:,1])
lvl = jnp.clip(jnp.floor(4+jnp.log2(jnp.sqrt(area)/224+1e-6)),2,5).astype(jnp.int32)-2
img = jnp.asarray(rng.integers(0, B, K).astype(np.int32))
levels4b = img*4 + lvl

def bench(name, fn, *a):
    f = jax.jit(fn)
    c = f(*a, jnp.zeros(())); float(c)
    t0 = time.perf_counter(); n = 20
    for _ in range(n): c = f(*a, c)
    float(c)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms")

# variant A: f32 flat + scattered
from detectinblur_tpu.ops.roi_align import _roi_align_flat, _roi_align_quad
def fa(fs, lv, bx, c):
    per_img = [f.reshape(B, -1, C) for f in fs]
    flat_all = jnp.concatenate(per_img, axis=1).reshape(-1, C)
    off4b = (jnp.arange(B)[:, None]*total + jnp.asarray(offs, jnp.int32)[None, :]).reshape(-1)
    out = _roi_align_flat(flat_all, lv, off4b, jnp.tile(jnp.asarray(sizes),(B,1)),
                          jnp.tile(jnp.asarray(scales),(B,)), bx, 7, 2)
    return c + out.astype(jnp.float32).mean()
bench("scattered f32-src", fa, tuple(feats32), levels4b, boxes)

# variant B: quad on 4B-levels subset
def fb(fs, lv, bx, c):
    fl = [fs[l][b] for b in range(B) for l in range(4)]
    sc = jnp.tile(jnp.asarray(scales), (B,))
    lv2 = img*4 + (lv - img*4)  # same
    out = _roi_align_quad(fl, lv, sc, bx, 7, 2)
    return c + out.astype(jnp.float32).mean()
bench("quad subset", fb, tuple(feats32), levels4b, boxes)
