"""Fixed-shape batch assembly (host side).

Replaces the reference's GroupedBatchSampler + collate
(group_by_aspect_ratio.py, utils.py collate): images are grouped by
orientation into a small set of static buckets so XLA compiles only a few
shapes, padded top-left with zeros, and emitted as a BlurBatch struct of
arrays (the blur_dict contract, transforms.py:412-463, as fixed shapes).

Also hosts RandomHorizontalFlip (transforms.py:49-66) since flipping must
happen before box padding.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from detectinblur_tpu.data.blur_sampling import BlurDecision

# (h, w) source buckets; images are assigned by orientation and size.
DEFAULT_SOURCE_BUCKETS = ((512, 672), (672, 512), (672, 672))


def pick_bucket(h: int, w: int, buckets: Sequence[Tuple[int, int]]):
    """Smallest bucket that fits (h, w); falls back to the largest."""
    candidates = [b for b in buckets if b[0] >= h and b[1] >= w]
    if not candidates:
        return max(buckets, key=lambda b: b[0] * b[1])
    return min(candidates, key=lambda b: b[0] * b[1])


def model_bucket_for(source_bucket: Tuple[int, int], min_size=800, max_size=1333,
                     divisor=32) -> Tuple[int, int]:
    """Static model bucket big enough for any image in the source bucket
    after min/max-side resize.

    Sized for images AT the bucket's aspect ratio; an off-aspect image can
    resize beyond one axis, in which case the device transform shrinks its
    scale to fit with aspect intact (resize_into_bucket). Training uses this
    (one static shape per source bucket); evaluation uses the torch-exact
    per-batch ``model_bucket_for_batch`` instead."""
    h, w = source_bucket
    scale = min(min_size / min(h, w), max_size / max(h, w))
    Ho = int(np.ceil(h * scale / divisor) * divisor)
    Wo = int(np.ceil(w * scale / divisor) * divisor)
    return Ho, Wo


def resized_hw_np(h: int, w: int, min_size=800, max_size=1333) -> Tuple[int, int]:
    """torchvision resize semantics (net_transforms.py:151-175): scale the
    min side to ``min_size`` unless that pushes the max side past
    ``max_size``; output dims floor like interpolate(recompute_scale_factor)."""
    scale = min(min_size / min(h, w), max_size / max(h, w))
    return int(np.floor(h * scale)), int(np.floor(w * scale))


def model_bucket_for_batch(hw, min_size=800, max_size=1333,
                           divisor=64) -> Tuple[int, int]:
    """Exact static model bucket for one batch: the max resized extent over
    the batch's valid sizes, rounded up to ``divisor``.

    Every image fits at its torch-exact resized size — no scale shrink, no
    distortion — unlike the per-source-bucket bound, which assumes images
    share the bucket's aspect ratio (a 427x640 COCO image resizes to
    800x1199, overflowing the (512, 672) bucket's 800x1056 model shape).
    ``divisor=64`` quantizes the bucket so an eval pass compiles a handful
    of shapes, not one per image size."""
    hw = np.asarray(hw)
    rh, rw = zip(*(resized_hw_np(int(h), int(w), min_size, max_size)
                   for h, w in hw))
    Ho = int(np.ceil(max(rh) / divisor) * divisor)
    Wo = int(np.ceil(max(rw) / divisor) * divisor)
    return Ho, Wo


def hflip_item(item: Dict) -> Dict:
    img = item["image"][:, ::-1]
    w = item["image"].shape[1]
    boxes = item["boxes"].copy()
    boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
    out = dict(item, image=img, boxes=boxes)
    if "masks" in item:
        out["masks"] = item["masks"][:, :, ::-1]
    return out


GT_BUCKETS = (8, 16, 32, 64, 100)


def gt_bucket_for_batch(counts, max_gt: int = 100) -> int:
    """Static GT-slot count for a batch: the smallest GT_BUCKETS entry
    covering the batch's largest annotation count (capped at ``max_gt``).

    The train step's anchor assignment / target expansion cost scales with
    the static G dimension (an [anchors, G] IoU matrix per image), and a
    fixed G=100 pad made the REAL loader-fed step 2.7x slower than the
    same step at G=16 — while typical COCO batches carry <= 16 boxes.
    Bucketing keeps the pipeline fixed-shape (one retrace per bucket,
    5 programs max) at the cheap shape almost always."""
    need = min(max(counts, default=1), max_gt)
    for b in GT_BUCKETS:
        if need <= b:
            return min(b, max_gt)
    return max_gt


def build_blur_batch(
    items: List[Dict],
    decisions: List[BlurDecision],
    psf_bank: Optional[np.ndarray],     # [P, F, N, 128, 128] or None
    source_bucket: Tuple[int, int],
    max_gt: int = 100,
    bucket_gt: bool = True,
):
    """Assemble a BlurBatch (numpy) for a list of same-bucket items.

    With ``bucket_gt`` (the single-host default) GT arrays are padded to
    the batch's GT bucket (gt_bucket_for_batch) instead of to ``max_gt``.
    Multi-host loaders must pass ``bucket_gt=False``: in SPMD every host
    must feed the SAME program shape each step, and hosts' local batches
    carry different annotation counts — a host-local G bucket would
    deadlock the collectives."""
    from detectinblur_tpu.train.engine import BlurBatch

    B = len(items)
    Hb, Wb = source_bucket
    if bucket_gt:
        max_gt = gt_bucket_for_batch([len(it["boxes"]) for it in items],
                                     max_gt)
    # uint8 image transport: 4x less host->device traffic and host canvas
    # bandwidth than an f32 canvas, and bit-faithful to the reference's
    # pipeline, which stays PIL-uint8 until ToTensor (transforms.py:173-176)
    # — f32 items that came from uint8 decode round-trip exactly; float
    # augmentation outputs (AugMix, GOPROSynth frame averages) quantize to
    # 1/255 just like the reference's return to PIL. Device entry points
    # rescale to f32 0..1 (train.engine.images01).
    images = np.zeros((B, Hb, Wb, 3), np.uint8)
    hw = np.zeros((B, 2), np.int32)
    psfs = np.zeros((B, 128, 128), np.float32)
    blurring = np.zeros(B, bool)
    param_index = np.full(B, -1, np.int32)
    fraction_index = np.full(B, -1, np.int32)
    gt_boxes = np.zeros((B, max_gt, 4), np.float32)
    gt_labels = np.zeros((B, max_gt), np.int32)
    gt_valid = np.zeros((B, max_gt), bool)
    est_label = np.full(B, -1, np.int32)

    for i, (item, dec) in enumerate(zip(items, decisions)):
        est_label[i] = item.get("blur_est_label", -1)
        img = item["image"]
        h, w = img.shape[:2]
        assert h <= Hb and w <= Wb, (h, w, source_bucket)
        if img.dtype == np.uint8:
            images[i, :h, :w] = img
        else:
            images[i, :h, :w] = np.rint(
                np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)
        hw[i] = (h, w)
        n = min(len(item["boxes"]), max_gt)
        gt_boxes[i, :n] = item["boxes"][:n]
        gt_labels[i, :n] = item["labels"][:n]
        gt_valid[i, :n] = True
        if dec.blurring and dec.fraction_index >= 0 and psf_bank is not None:
            blurring[i] = True
            param_index[i] = dec.param_index
            fraction_index[i] = dec.fraction_index
            psfs[i] = psf_bank[dec.param_index, dec.fraction_index,
                               dec.psf_index % psf_bank.shape[2]]

    import jax.numpy as jnp

    return BlurBatch(
        images=jnp.asarray(images),
        hw=jnp.asarray(hw),
        psfs=jnp.asarray(psfs),
        blurring=jnp.asarray(blurring),
        thetas=jnp.zeros(B, jnp.float32),
        lam1s=jnp.ones(B, jnp.float32),
        lam2s=jnp.ones(B, jnp.float32),
        param_index=jnp.asarray(param_index),
        fraction_index=jnp.asarray(fraction_index),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_labels=jnp.asarray(gt_labels),
        gt_valid=jnp.asarray(gt_valid),
        est_label=jnp.asarray(est_label),
    )
