"""Detection visualization (utils.py overlay_boxes / engine.py:382-383):
dump eval images with predicted boxes drawn, into --image_output_dir."""

from __future__ import annotations

import colorsys
import os
from typing import Optional

import numpy as np
from PIL import Image, ImageDraw


def unique_color(tag: int, hue_step: float = 0.05):
    """Stable per-class color (utils.py create_unique_color_float)."""
    h = (tag * hue_step) % 1.0
    v = 1.0 - (int(tag * hue_step) % 4) / 5.0
    r, g, b = colorsys.hsv_to_rgb(h, 1.0, v)
    return int(r * 255), int(g * 255), int(b * 255)


def overlay_boxes(
    image01: np.ndarray,
    boxes: np.ndarray,
    labels: np.ndarray,
    scores: Optional[np.ndarray] = None,
    valid: Optional[np.ndarray] = None,
    score_thresh: float = 0.5,
) -> Image.Image:
    img = Image.fromarray((np.clip(image01, 0, 1) * 255).astype(np.uint8))
    draw = ImageDraw.Draw(img)
    for i, b in enumerate(boxes):
        if valid is not None and not valid[i]:
            continue
        if scores is not None and scores[i] < score_thresh:
            continue
        color = unique_color(int(labels[i]))
        draw.rectangle([float(b[0]), float(b[1]), float(b[2]), float(b[3])],
                       outline=color, width=2)
        tag = f"{int(labels[i])}" + (f":{scores[i]:.2f}" if scores is not None else "")
        draw.text((float(b[0]) + 2, float(b[1]) + 2), tag, fill=color)
    return img


def dump_detections(output_dir: str, image_id: int, image01: np.ndarray,
                    dets, index: int = 0) -> str:
    os.makedirs(output_dir, exist_ok=True)
    img = overlay_boxes(
        image01,
        np.asarray(dets.boxes[index]),
        np.asarray(dets.labels[index]),
        np.asarray(dets.scores[index]),
        np.asarray(dets.valid[index]),
    )
    path = os.path.join(output_dir, f"det_{image_id}.png")
    img.save(path)
    return path
