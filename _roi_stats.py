import os
os.environ.setdefault("DETECTINBLUR_PRECISION", "default")
import jax, jax.numpy as jnp, numpy as np
from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
from detectinblur_tpu.models.detection_transform import preprocess_batch
from detectinblur_tpu.models.rpn import run_rpn

B = 8
bucket = (832, 1248)
cfg = FasterRCNNConfig()
model = FasterRCNN(cfg)
params = model.init(jax.random.key(0), bucket=bucket)
rng = np.random.default_rng(0)
images = jnp.asarray(rng.random((B, 480, 640, 3), np.float32))
hw = jnp.tile(jnp.asarray([[480, 640]]), (B, 1))

batched, new_hw = preprocess_batch(images, hw, bucket, None, None, cfg.min_size, cfg.max_size)
feats = model._features(params, batched, None, None, None, True)
rpn_out = run_rpn(params["rpn_head"], model.rpn_head, feats, new_hw, training=False, cfg=cfg.rpn)
boxes = np.asarray(rpn_out.proposals).reshape(-1, 4)
valid = np.asarray(rpn_out.proposal_valid).reshape(-1)
boxes = boxes[valid]
w = np.clip(boxes[:, 2] - boxes[:, 0], 0, None)
h = np.clip(boxes[:, 3] - boxes[:, 1], 0, None)
area = w * h
lvl = np.clip(np.floor(4 + np.log2(np.sqrt(area) / 224 + 1e-6)), 2, 5).astype(int)
scale = 2.0 ** -lvl
cw = w * scale; ch = h * scale
ext = np.maximum(cw, ch)
print("n =", len(boxes))
for t in (30, 38, 46, 54, 62):
    print(f"extent > {t}: {(ext > t).mean()*100:.2f}%  ({(ext > t).sum()})")
print("max extent", ext.max(), "p99", np.percentile(ext, 99))
print("per level counts", np.bincount(lvl-2, minlength=4))
