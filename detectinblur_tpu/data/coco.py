"""COCO detection dataset (host side).

Replaces coco_utils.py of the reference: poly->mask conversion, xywh->xyxy
clamping, empty/degenerate-annotation filtering for training
(coco_utils.py:51-144), and path wiring (get_coco, :243-275) — but returns
plain numpy dicts sized for the fixed-shape device pipeline instead of
variable-length torch tensors.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

from detectinblur_tpu.eval.coco_index import COCOIndex
from detectinblur_tpu.eval import rle as rle_mod


class CocoDetection:
    """Yields dicts: image [H, W, 3] uint8 (or float32 0..1 — both are
    valid item dtypes), boxes [N, 4] xyxy, labels [N], image_id, iscrowd,
    area, (optional masks)."""

    def __init__(
        self,
        img_dir: str,
        ann_file: str | dict,
        train_filter: bool = False,
        with_masks: bool = False,
        with_keypoints: bool = False,
    ):
        self.img_dir = img_dir
        self.index = COCOIndex(ann_file)
        self.with_masks = with_masks
        self.with_keypoints = with_keypoints
        self.ids = self.index.get_img_ids()
        if train_filter:
            self.ids = [i for i in self.ids if self._has_valid_anns(i)]

    def _anns(self, img_id) -> List[dict]:
        return [a for a in self.index.img_to_anns[img_id] if a.get("iscrowd", 0) == 0]

    def _has_valid_anns(self, img_id) -> bool:
        """coco_utils _has_valid_annotation: non-empty with positive-extent
        boxes (coco_utils.py:107-144)."""
        anns = self._anns(img_id)
        if not anns:
            return False
        for a in anns:
            if a["bbox"][2] > 1 and a["bbox"][3] > 1:
                return True
        return False

    def __len__(self):
        return len(self.ids)

    def load_image(self, img_id) -> np.ndarray:
        info = self.index.imgs[img_id]
        path = os.path.join(self.img_dir, info["file_name"])
        with Image.open(path) as im:
            # uint8, like the reference keeps PIL images until ToTensor
            # (transforms.py:173-176); batches ship uint8 to the device
            # and rescale there (train.engine.images01).
            return np.asarray(im.convert("RGB"))

    def __getitem__(self, i: int) -> Dict:
        img_id = self.ids[i]
        img = self.load_image(img_id)
        return self.make_target(img_id, img)

    def make_target(self, img_id, img: np.ndarray) -> Dict:
        h, w = img.shape[:2]
        anns = self._anns(img_id)
        boxes = np.array([a["bbox"] for a in anns], np.float32).reshape(-1, 4)
        # xywh -> xyxy, clamped (ConvertCocoPolysToMask semantics).
        boxes[:, 2:] += boxes[:, :2]
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)
        keep = (boxes[:, 3] > boxes[:, 1]) & (boxes[:, 2] > boxes[:, 0])
        anns = [a for a, k in zip(anns, keep) if k]
        boxes = boxes[keep]
        labels = np.array([a["category_id"] for a in anns], np.int32)
        out = {
            "image": img,
            "image_id": img_id,
            "boxes": boxes,
            "labels": labels,
            "area": np.array([a["area"] for a in anns], np.float32),
            "iscrowd": np.zeros(len(anns), np.int32),
        }
        if self.with_masks:
            out["masks"] = np.stack(
                [rle_mod.masks_from_segmentation(a["segmentation"], h, w) for a in anns]
            ) if anns else np.zeros((0, h, w), np.uint8)
        if self.with_keypoints:
            # [N, K, 3] (x, y, visibility) — ConvertCocoPolysToMask keypoint
            # path (coco_utils.py:75-95).
            kps = [np.asarray(a.get("keypoints", []), np.float32).reshape(-1, 3)
                   for a in anns]
            K = max((k.shape[0] for k in kps), default=0)
            kps = [np.pad(k, ((0, K - k.shape[0]), (0, 0))) for k in kps]
            out["keypoints"] = (np.stack(kps) if anns and K else
                                np.zeros((len(anns), K, 3), np.float32))
        return out


def get_coco(root: str, image_set: str = "train") -> CocoDetection:
    """Path wiring matching coco_utils.get_coco (coco_utils.py:243-271)."""
    paths = {
        "train": ("train2017", "annotations/instances_train2017.json"),
        "val": ("val2017", "annotations/instances_val2017.json"),
    }
    img_folder, ann_file = paths[image_set]
    return CocoDetection(
        os.path.join(root, img_folder),
        os.path.join(root, ann_file),
        train_filter=(image_set == "train"),
    )


def get_coco_kp(root: str, image_set: str = "train") -> CocoDetection:
    """Keypoint-annotation wiring (coco_utils.get_coco_kp, :274-275)."""
    paths = {
        "train": ("train2017", "annotations/person_keypoints_train2017.json"),
        "val": ("val2017", "annotations/person_keypoints_val2017.json"),
    }
    img_folder, ann_file = paths[image_set]
    return CocoDetection(
        os.path.join(root, img_folder),
        os.path.join(root, ann_file),
        train_filter=(image_set == "train"),
        with_keypoints=True,
    )
