"""Drive the real evaluate.py blur-sweep protocol on the chip (dev tool).

Builds a synthetic on-disk COCO val split at COCO-native image sizes and
runs cli/evaluate's sweep for one blur-type row (P1 x E1..E5) end to end:
PSF bank generation, per-cell blurred eval steps, per-image COCO updates,
19-stat summaries. Reports wall time per cell and eval images/sec.
"""
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("DETECTINBLUR_PRECISION", "default")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
from PIL import Image

N_IMAGES = int(os.environ.get("SWEEP_N", "24"))

root = tempfile.mkdtemp(prefix="cocodrive")
rng = np.random.default_rng(0)
os.makedirs(os.path.join(root, "val2017"), exist_ok=True)
os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
images, anns = [], []
aid = 1
for i in range(N_IMAGES):
    h, w = 480, 640
    arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    name = f"{i:012d}.jpg"
    Image.fromarray(arr).save(os.path.join(root, "val2017", name))
    images.append({"id": i + 1, "file_name": name, "height": h, "width": w})
    for _ in range(3):
        x, y = rng.uniform(2, 300, 2)
        bw, bh = rng.uniform(30, 120, 2)
        anns.append({"id": aid, "image_id": i + 1,
                     "category_id": int(rng.integers(1, 10)),
                     "bbox": [float(x), float(y), float(bw), float(bh)],
                     "area": float(bw * bh), "iscrowd": 0})
        aid += 1
cats = [{"id": c, "name": f"c{c}"} for c in range(1, 10)]
with open(os.path.join(root, "annotations", "instances_val2017.json"), "w") as f:
    json.dump({"images": images, "annotations": anns, "categories": cats}, f)
print(f"synthetic val2017: {N_IMAGES} images at 480x640", flush=True)

from detectinblur_tpu.cli.evaluate import main

t0 = time.perf_counter()
out = main(["--data-path", root, "--blur_eval", "--gpu_blur",
            "--param_index", "1"])
dt = time.perf_counter() - t0
n_cells = len(out) if isinstance(out, dict) else 1
total_imgs = N_IMAGES * n_cells
print(f"sweep wall: {dt:.1f}s for {n_cells} cells x {N_IMAGES} imgs "
      f"-> {total_imgs / dt:.2f} img/s protocol-inclusive", flush=True)
for k, v in (out.items() if isinstance(out, dict) else []):
    v = np.asarray(v)
    print(f"  cell {k}: AP={float(v[0]):.4f} AP50={float(v[1]):.4f}",
          flush=True)
