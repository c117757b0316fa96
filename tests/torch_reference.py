"""Plain-torch + numpy reimplementation of torchvision's
fasterrcnn_resnet50_fpn INFERENCE decision sequence — no torchvision
import, so it executes in this environment (torch-cpu is installed,
torchvision is not).

This is the oracle for the always-running full-graph parity test: an
independent, loop-based rendering of the same public algorithm the JAX
model implements with fixed shapes and fused kernels (reference vendors
the torchvision configuration at models/faster_rcnn.py:150-298). Every
decision — resize scale, anchor layout, delta decode + clamps, per-level
top-k, level-offset NMS, FPN level mapping, RoIAlign sampling, score and
size filters, per-class NMS, top-100 — follows the torchvision source
semantics. Where torchvision IS available, test_full_model_parity.py
additionally checks against torchvision itself.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
BBOX_XFORM_CLIP = math.log(1000.0 / 16)
RESNET50_LAYERS = (3, 4, 6, 3)


# ------------------------------------------------------------ state dict
def make_random_fasterrcnn_sd(rng: np.random.Generator, num_classes=91):
    """Random weights in the torchvision fasterrcnn_resnet50_fpn state-dict
    layout (He-scaled so activations stay sane through 50 layers)."""
    sd = {}

    def conv(name, co, ci, k):
        fan_in = ci * k * k
        sd[f"{name}.weight"] = rng.normal(
            0, math.sqrt(2.0 / fan_in), (co, ci, k, k)).astype(np.float32)

    def conv_b(name, co, ci, k, bias_std=0.05):
        conv(name, co, ci, k)
        sd[f"{name}.bias"] = rng.normal(0, bias_std, co).astype(np.float32)

    def bn(name, c, gamma_scale=1.0):
        sd[f"{name}.weight"] = (gamma_scale * rng.uniform(0.8, 1.2, c)
                                ).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.05, c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(0, 0.05, c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.8, 1.2, c).astype(np.float32)

    conv("backbone.body.conv1", 64, 3, 7)
    bn("backbone.body.bn1", 64)
    cin = 64
    for li, n_blocks in enumerate(RESNET50_LAYERS, start=1):
        width = 64 * 2 ** (li - 1)
        for b in range(n_blocks):
            p = f"backbone.body.layer{li}.{b}"
            conv(f"{p}.conv1", width, cin, 1)
            bn(f"{p}.bn1", width)
            conv(f"{p}.conv2", width, width, 3)
            bn(f"{p}.bn2", width)
            conv(f"{p}.conv3", 4 * width, width, 1)
            # Small residual-branch gamma (zero-init-gamma style) so random
            # weights don't blow up through 16 accumulating blocks.
            bn(f"{p}.bn3", 4 * width, gamma_scale=0.2)
            if b == 0:
                conv(f"{p}.downsample.0", 4 * width, cin, 1)
                bn(f"{p}.downsample.1", 4 * width)
            cin = 4 * width
    for i, c in enumerate((256, 512, 1024, 2048)):
        conv_b(f"backbone.fpn.inner_blocks.{i}", 256, c, 1)
        conv_b(f"backbone.fpn.layer_blocks.{i}", 256, 256, 3)
    conv_b("rpn.head.conv", 256, 256, 3)
    conv_b("rpn.head.cls_logits", 3, 256, 1, bias_std=0.5)
    # Realistic trained-model delta magnitudes (torchvision inits this
    # head at std 0.01): decoded proposals must not all clip to slivers.
    sd["rpn.head.bbox_pred.weight"] = rng.normal(
        0, 0.01, (12, 256, 1, 1)).astype(np.float32)
    sd["rpn.head.bbox_pred.bias"] = rng.normal(0, 0.02, 12).astype(np.float32)

    def dense(name, co, ci, bias_std=0.05):
        sd[f"{name}.weight"] = rng.normal(
            0, math.sqrt(1.0 / ci), (co, ci)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, bias_std, co).astype(np.float32)

    dense("roi_heads.box_head.fc6", 1024, 256 * 49)
    dense("roi_heads.box_head.fc7", 1024, 1024)
    # Spread class scores so a range of detections clears the .05 thresh.
    dense("roi_heads.box_predictor.cls_score", num_classes, 1024, bias_std=1.5)
    # torchvision inits bbox_pred at std 0.001 — keep refined boxes near
    # their proposals instead of decoding off-image.
    sd["roi_heads.box_predictor.bbox_pred.weight"] = rng.normal(
        0, 0.001, (num_classes * 4, 1024)).astype(np.float32)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = rng.normal(
        0, 0.02, num_classes * 4).astype(np.float32)
    return sd


# ----------------------------------------------------------------- torch
def _conv(sd, name, x, stride=1, padding=0):
    b = sd.get(f"{name}.bias")
    return F.conv2d(x, torch.from_numpy(sd[f"{name}.weight"]),
                    torch.from_numpy(b) if b is not None else None,
                    stride, padding)


def _frozen_bn(sd, name, x, eps=0.0):
    scale = sd[f"{name}.weight"] / np.sqrt(sd[f"{name}.running_var"] + eps)
    bias = sd[f"{name}.bias"] - sd[f"{name}.running_mean"] * scale
    return (x * torch.from_numpy(scale)[None, :, None, None]
            + torch.from_numpy(bias)[None, :, None, None])


def _bottleneck(sd, p, x, stride, eps):
    out = F.relu(_frozen_bn(sd, f"{p}.bn1", _conv(sd, f"{p}.conv1", x), eps))
    out = F.relu(_frozen_bn(sd, f"{p}.bn2",
                            _conv(sd, f"{p}.conv2", out, stride, 1), eps))
    out = _frozen_bn(sd, f"{p}.bn3", _conv(sd, f"{p}.conv3", out), eps)
    if f"{p}.downsample.0.weight" in sd:
        x = _frozen_bn(sd, f"{p}.downsample.1",
                       _conv(sd, f"{p}.downsample.0", x, stride), eps)
    return F.relu(out + x)


def resnet50_fpn_forward(sd, x, eps=0.0):
    """x [1, 3, H, W] normalized -> 5 FPN maps [1, 256, h, w] (P2..P6)."""
    x = F.relu(_frozen_bn(sd, "backbone.body.bn1",
                          _conv(sd, "backbone.body.conv1", x, 2, 3), eps))
    x = F.max_pool2d(x, 3, 2, 1)
    cs = []
    for li, n_blocks in enumerate(RESNET50_LAYERS, start=1):
        for b in range(n_blocks):
            stride = 2 if (b == 0 and li > 1) else 1
            x = _bottleneck(sd, f"backbone.body.layer{li}.{b}", x, stride, eps)
        cs.append(x)
    # FPN: lateral 1x1, top-down nearest upsample + add, output 3x3.
    inner = [_conv(sd, f"backbone.fpn.inner_blocks.{i}", c)
             for i, c in enumerate(cs)]
    outs = [None] * 4
    last = inner[3]
    outs[3] = _conv(sd, "backbone.fpn.layer_blocks.3", last, 1, 1)
    for i in (2, 1, 0):
        last = inner[i] + F.interpolate(last, size=inner[i].shape[-2:],
                                        mode="nearest")
        outs[i] = _conv(sd, f"backbone.fpn.layer_blocks.{i}", last, 1, 1)
    outs.append(F.max_pool2d(outs[3], 1, 2, 0))   # LastLevelMaxPool -> P6
    return outs


# ----------------------------------------------------------------- numpy
def np_cell_anchors(size, ratios=(0.5, 1.0, 2.0)):
    ratios = np.asarray(ratios, np.float32)
    h_r = np.sqrt(ratios)
    w_r = 1.0 / h_r
    ws, hs = w_r * size, h_r * size
    return np.round(np.stack([-ws, -hs, ws, hs], 1) / 2.0).astype(np.float32)


def np_grid_anchors(feat_hw, image_hw, size):
    fh, fw = feat_hw
    base = np_cell_anchors(size)
    sy = np.arange(fh, dtype=np.float32) * (image_hw[0] // fh)
    sx = np.arange(fw, dtype=np.float32) * (image_hw[1] // fw)
    gy, gx = np.meshgrid(sy, sx, indexing="ij")
    shifts = np.stack([gx, gy, gx, gy], -1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def np_decode(deltas, boxes, weights):
    wx, wy, ww, wh = weights
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    dx, dy = deltas[:, 0] / wx, deltas[:, 1] / wy
    dw = np.minimum(deltas[:, 2] / ww, BBOX_XFORM_CLIP)
    dh = np.minimum(deltas[:, 3] / wh, BBOX_XFORM_CLIP)
    pcx, pcy = dx * w + cx, dy * h + cy
    pw, ph = np.exp(dw) * w, np.exp(dh) * h
    return np.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                     pcx + 0.5 * pw, pcy + 0.5 * ph], 1)


def np_clip(boxes, hw):
    out = boxes.copy()
    out[:, 0::2] = out[:, 0::2].clip(0, hw[1])
    out[:, 1::2] = out[:, 1::2].clip(0, hw[0])
    return out


def np_nms(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-12)
        suppressed |= iou > thresh
    return np.asarray(keep, np.int64)


def np_batched_nms(boxes, scores, idxs, thresh):
    if len(boxes) == 0:
        return np.zeros(0, np.int64)
    offset = idxs.astype(np.float32) * (boxes.max() + 1.0)
    return np_nms(boxes + offset[:, None], scores, thresh)


def np_roi_align(feat_chw, box, spatial_scale, out=7, ratio=2):
    """One roi, torchvision roi_align aligned=False semantics."""
    C, H, W = feat_chw.shape
    x1, y1, x2, y2 = box * spatial_scale
    bw = max(x2 - x1, 1.0)
    bh = max(y2 - y1, 1.0)
    binw, binh = bw / out, bh / out
    res = np.zeros((C, out, out), np.float32)
    for oy in range(out):
        for ox in range(out):
            acc = np.zeros(C, np.float32)
            for iy in range(ratio):
                y = y1 + oy * binh + (iy + 0.5) * binh / ratio
                for ix in range(ratio):
                    x = x1 + ox * binw + (ix + 0.5) * binw / ratio
                    if y < -1.0 or y > H or x < -1.0 or x > W:
                        continue
                    yy = min(max(y, 0.0), H - 1)
                    xx = min(max(x, 0.0), W - 1)
                    y0, x0 = int(yy), int(xx)
                    y1i = min(y0 + 1, H - 1)
                    x1i = min(x0 + 1, W - 1)
                    ly, lx = yy - y0, xx - x0
                    acc += ((1 - ly) * (1 - lx) * feat_chw[:, y0, x0]
                            + (1 - ly) * lx * feat_chw[:, y0, x1i]
                            + ly * (1 - lx) * feat_chw[:, y1i, x0]
                            + ly * lx * feat_chw[:, y1i, x1i])
            res[:, oy, ox] = acc / (ratio * ratio)
    return res


def torch_squint_warp(t, theta, lam1, lam2):
    """The reference Squint warp (warper.py:13-52 matrix composition) on a
    [1, C, H, W] tensor via torch affine_grid + grid_sample (bilinear,
    zeros, align_corners=False)."""
    H, W = t.shape[-2:]
    zero = torch.zeros(1)
    one = torch.ones(1)
    l1 = torch.full((1,), float(lam1))
    l2 = torch.full((1,), float(lam2))
    th = torch.full((1,), -float(theta))
    S = torch.stack([torch.stack([l1, zero, zero], 1),
                     torch.stack([zero, l2, zero], 1),
                     torch.stack([zero, zero, one], 1)], 2)
    R = torch.stack([torch.stack([torch.cos(th), torch.sin(th), zero], 1),
                     torch.stack([-torch.sin(th), torch.cos(th), zero], 1),
                     torch.stack([zero, zero, one], 1)], 2)
    T = torch.stack([torch.stack([one, zero, one * W], 1),
                     torch.stack([zero, one, one * H], 1),
                     torch.stack([zero, zero, one], 1)], 2)
    fwd = torch.bmm(R, T)
    fwd_s = torch.bmm(S, fwd)
    overall = torch.inverse(torch.bmm(torch.inverse(fwd), fwd_s))[:, :2, :]
    grid = F.affine_grid(overall, t.shape, align_corners=False)
    return F.grid_sample(t, grid, mode="bilinear", padding_mode="zeros",
                         align_corners=False)


# ------------------------------------------------------------- inference
def torchvision_reference_forward(sd, image_hwc, min_size=128, max_size=160,
                                  eps=0.0, score_thresh=0.05,
                                  pre_nms=1000, post_nms=1000, warp=None):
    """Full inference: raw image [H, W, 3] 0..1 -> dict with the resized
    hw, FPN maps, RPN proposals, and final (boxes, scores, labels) in
    ORIGINAL image coordinates.

    ``warp=(theta, lam1, lam2)`` enables the Squint path
    (generalized_rcnn.py:131-141): warp the normalized/resized/padded
    input, run the backbone, inverse-warp every FPN level before the RPN
    head."""
    h0, w0 = image_hwc.shape[:2]
    img = (image_hwc - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
        IMAGENET_STD, np.float32)
    t = torch.from_numpy(img.transpose(2, 0, 1))[None]
    scale = min(min_size / min(h0, w0), max_size / max(h0, w0))
    with torch.no_grad():
        t = F.interpolate(t, scale_factor=scale, mode="bilinear",
                          recompute_scale_factor=True, align_corners=False)
        nh, nw = t.shape[-2:]
        # Batch pad to /32 (torchvision batch_images).
        ph = (nh + 31) // 32 * 32
        pw = (nw + 31) // 32 * 32
        t = F.pad(t, (0, pw - nw, 0, ph - nh))
        if warp is not None:
            t = torch_squint_warp(t, warp[0], warp[1], warp[2])
        feats = resnet50_fpn_forward(sd, t, eps)
        if warp is not None:
            feats = [torch_squint_warp(f, warp[0], 1.0 / warp[1],
                                       1.0 / warp[2]) for f in feats]

        # RPN head.
        obj_l, dlt_l = [], []
        for f in feats:
            m = F.relu(_conv(sd, "rpn.head.conv", f, 1, 1))
            # [1, A*k, H, W] -> (y, x, anchor) ordering, k-minor.
            o = _conv(sd, "rpn.head.cls_logits", m)[0].numpy()
            d = _conv(sd, "rpn.head.bbox_pred", m)[0].numpy()
            hf, wf = o.shape[-2:]
            obj_l.append(o.transpose(1, 2, 0).reshape(-1))
            dlt_l.append(d.transpose(1, 2, 0).reshape(hf * wf * 3, 4))
        feats_np = [f[0].numpy() for f in feats]

    # Proposals: decode per level vs anchors, per-level top-k, clip,
    # small filter, level-offset NMS, post-NMS top-k.
    sizes = (32, 64, 128, 256, 512)
    all_boxes, all_scores, all_lvls = [], [], []
    for lvl, (o, d, f) in enumerate(zip(obj_l, dlt_l, feats_np)):
        anchors = np_grid_anchors(f.shape[-2:], (ph, pw), sizes[lvl])
        boxes = np_decode(d, anchors, (1.0, 1.0, 1.0, 1.0))
        k = min(pre_nms, len(o))
        top = np.argsort(-o, kind="stable")[:k]
        all_boxes.append(boxes[top])
        all_scores.append(o[top])
        all_lvls.append(np.full(k, lvl, np.int64))
    boxes = np_clip(np.concatenate(all_boxes), (nh, nw))
    scores = np.concatenate(all_scores)
    lvls = np.concatenate(all_lvls)
    ok = ((boxes[:, 2] - boxes[:, 0]) >= 1e-3) & (
        (boxes[:, 3] - boxes[:, 1]) >= 1e-3)
    boxes, scores, lvls = boxes[ok], scores[ok], lvls[ok]
    keep = np_batched_nms(boxes, scores, lvls, 0.7)[:post_nms]
    proposals = boxes[keep]

    # FPN level mapping + RoIAlign + box head.
    areas = ((proposals[:, 2] - proposals[:, 0])
             * (proposals[:, 3] - proposals[:, 1]))
    mapped = np.floor(4 + np.log2(np.sqrt(np.maximum(areas, 1e-12)) / 224
                                  + 1e-6))
    mapped = np.clip(mapped, 2, 5).astype(np.int64) - 2
    pooled = np.stack([
        np_roi_align(feats_np[lv], p, 1.0 / (4 * 2 ** lv))
        for p, lv in zip(proposals, mapped)])
    x = pooled.reshape(len(proposals), -1)
    x = np.maximum(x @ sd["roi_heads.box_head.fc6.weight"].T
                   + sd["roi_heads.box_head.fc6.bias"], 0)
    x = np.maximum(x @ sd["roi_heads.box_head.fc7.weight"].T
                   + sd["roi_heads.box_head.fc7.bias"], 0)
    logits = (x @ sd["roi_heads.box_predictor.cls_score.weight"].T
              + sd["roi_heads.box_predictor.cls_score.bias"])
    deltas = (x @ sd["roi_heads.box_predictor.bbox_pred.weight"].T
              + sd["roi_heads.box_predictor.bbox_pred.bias"])

    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    C = probs.shape[1]
    det_boxes, det_scores, det_labels = [], [], []
    for c in range(1, C):
        b = np_clip(np_decode(deltas[:, 4 * c: 4 * c + 4], proposals,
                              (10.0, 10.0, 5.0, 5.0)), (nh, nw))
        s = probs[:, c]
        ok = (s > score_thresh) & ((b[:, 2] - b[:, 0]) >= 1e-2) & (
            (b[:, 3] - b[:, 1]) >= 1e-2)
        det_boxes.append(b[ok])
        det_scores.append(s[ok])
        det_labels.append(np.full(ok.sum(), c, np.int64))
    det_boxes = np.concatenate(det_boxes) if det_boxes else np.zeros((0, 4))
    det_scores = np.concatenate(det_scores) if det_scores else np.zeros(0)
    det_labels = (np.concatenate(det_labels) if det_labels
                  else np.zeros(0, np.int64))
    keep = np_batched_nms(det_boxes, det_scores, det_labels, 0.5)[:100]
    det_boxes, det_scores, det_labels = (
        det_boxes[keep], det_scores[keep], det_labels[keep])
    # Back to original coords (torchvision resize_boxes in postprocess).
    rx, ry = w0 / nw, h0 / nh
    det_boxes = det_boxes * np.asarray([rx, ry, rx, ry], np.float32)

    return {
        "new_hw": (nh, nw), "pad_hw": (ph, pw), "feats": feats_np,
        "proposals": proposals,
        "boxes": det_boxes, "scores": det_scores, "labels": det_labels,
    }
