import os
os.environ.setdefault("DETECTINBLUR_PRECISION", "default")
import jax, jax.numpy as jnp, numpy as np
from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
from detectinblur_tpu.ops.blur import batched_blur
from detectinblur_tpu.ops.psf import sample_psf

B = 8
src_h, src_w = 480, 640
bucket = (832, 1248)
model = FasterRCNN(FasterRCNNConfig())
params = model.init(jax.random.key(0), bucket=bucket)
rng = np.random.default_rng(0)
images = jnp.asarray(rng.random((B, src_h, src_w, 3), np.float32))
hw = jnp.tile(jnp.asarray([[src_h, src_w]]), (B, 1))
keys = jax.random.split(jax.random.key(1), B)
psfs = jax.vmap(lambda k: sample_psf(k, expl=0.005, fraction=0.5))(keys)
blurring = jnp.ones((B,), bool)

@jax.jit
def blur_detect(params, images, hw, psfs, blurring):
    chw = jnp.transpose(images, (0, 3, 1, 2))
    blurred = batched_blur(chw, psfs, blurring)
    imgs = jnp.transpose(blurred, (0, 2, 3, 1))
    det = model.predict(params, imgs, hw, bucket=bucket)
    return det.boxes, det.scores, det.labels, det.valid

out = blur_detect(params, images, hw, psfs, blurring)
jax.block_until_ready(out)
import time
with jax.profiler.trace("/tmp/jaxtrace2"):
    for _ in range(5):
        out = blur_detect(params, images, hw, psfs, blurring)
    jax.block_until_ready(out)
txt = blur_detect.lower(params, images, hw, psfs, blurring).compile().as_text()
open("/tmp/e2e_hlo.txt", "w").write(txt)
print("done")
