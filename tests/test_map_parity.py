"""End-to-end mAP-delta parity gate (VERDICT r2 item 1).

Runs a multi-image synthetic-COCO protocol through BOTH stacks and
compares the final *metric*, not per-stage tensors:

  torch oracle  : tests/torch_reference.py forward (torchvision decision
                  sequence, loop-based) -> detections
  JAX stack     : the production eval step (make_eval_step -> blur ->
                  FasterRCNN.predict) -> detections
  both          : eval/coco_eval.py 19-stat summarize over the same GT
                  (reference protocol: evaluate.py:299-370, batch 1)

and asserts the 19-stat vectors agree. This is the strongest in-environment
statement of BASELINE.md's 0.1-pt mAP budget: a perturbation of any decode /
NMS / resize / postprocess constant shifts detections on some of the images
and moves the stat vector (the gate's sensitivity is asserted explicitly in
``test_gate_is_sensitive_to_constant_perturbation``).

The blurred variant applies the SAME PSFs on both sides — JAX through the
production exact-circular blur path, the oracle through an independent
roll-accumulate loop with the reference's padding rules
(/root/reference/models/blur_functions.py:11-69).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytest.importorskip("torch")

from torch_reference import (  # noqa: E402
    make_random_fasterrcnn_sd,
    torchvision_reference_forward,
)

from detectinblur_tpu.eval.coco_eval import COCOEval, STAT_NAMES  # noqa: E402
from detectinblur_tpu.eval.coco_index import COCOIndex  # noqa: E402
from detectinblur_tpu.models.faster_rcnn import (  # noqa: E402
    FasterRCNN,
    FasterRCNNConfig,
)
from detectinblur_tpu.models.roi_heads import BoxHeadConfig  # noqa: E402
from detectinblur_tpu.models.rpn import RPNConfig  # noqa: E402
from detectinblur_tpu.train.engine import BlurBatch, make_eval_step  # noqa: E402
from detectinblur_tpu.utils.torch_convert import (  # noqa: E402
    convert_fasterrcnn_state_dict,
)

MIN_SIZE, MAX_SIZE = 128, 160
BUCKET = (128, 160)
PRE_NMS, POST_NMS = 400, 150
# Several shapes, all inside the (128, 160) source bucket; hw varies so the
# dynamic-resize path is exercised while ONE XLA program serves every image.
SHAPES = ((110, 150), (96, 128), (120, 160), (128, 140))


def _model_and_params(sd):
    cfg = FasterRCNNConfig(
        min_size=MIN_SIZE, max_size=MAX_SIZE,
        rpn=RPNConfig(pre_nms_top_n_test=PRE_NMS, post_nms_top_n_test=POST_NMS,
                      pre_nms_top_n_train=PRE_NMS, post_nms_top_n_train=POST_NMS),
        box=BoxHeadConfig(nms_pool=2048),
    )
    return FasterRCNN(cfg), convert_fasterrcnn_state_dict(sd)


def np_reference_roll_blur(image_hwc: np.ndarray, psf: np.ndarray):
    """Independent oracle for the reference GPU blur
    (blur_functions.py:43-69, k=128 branch): pad (63, 64) reflect (zero-fill
    below 64px), then out += roll(padded, (py-63, px-63)) * psf[py, px] over
    the PSF's nonzeros, crop back. PSF normalized to unit sum first
    (blur_image_list, :98)."""
    psf = psf / max(psf.sum(), 1e-20)
    h, w = image_hwc.shape[:2]
    mode = "reflect" if (h >= 64 and w >= 64) else "constant"
    padded = np.pad(image_hwc, [(63, 64), (63, 64), (0, 0)], mode=mode)
    out = np.zeros_like(padded)
    ys, xs = np.nonzero(psf)
    for py, px in zip(ys, xs):
        out += np.roll(padded, (py - 63, px - 63), axis=(0, 1)) * psf[py, px]
    return out[63:63 + h, 63:63 + w].astype(np.float32)


def _make_images(rng, n):
    imgs = []
    for i in range(n):
        h, w = SHAPES[i % len(SHAPES)]
        imgs.append(rng.random((h, w, 3)).astype(np.float32))
    return imgs


def _batch_for(img, psf=None, gt_boxes=None, n_gt_slots=8):
    """One-image BlurBatch on the (128, 160) source canvas; ``gt_boxes``
    [n, 4] xyxy fills the padded GT slots (for the expand variant)."""
    h, w = img.shape[:2]
    canvas = np.zeros((1, BUCKET[0], BUCKET[1], 3), np.float32)
    canvas[0, :h, :w] = img
    B = 1
    gtb = np.zeros((B, n_gt_slots, 4), np.float32)
    gtv = np.zeros((B, n_gt_slots), bool)
    if gt_boxes is not None:
        n = len(gt_boxes)
        assert n <= n_gt_slots
        gtb[0, :n] = gt_boxes
        gtv[0, :n] = True
    return BlurBatch(
        images=jnp.asarray(canvas),
        hw=jnp.asarray([[h, w]]),
        psfs=(jnp.asarray(psf)[None] if psf is not None
              else jnp.zeros((B, 128, 128))),
        blurring=jnp.asarray([psf is not None]),
        thetas=jnp.zeros((B,)), lam1s=jnp.ones((B,)), lam2s=jnp.ones((B,)),
        param_index=jnp.full((B,), -1, jnp.int32),
        fraction_index=jnp.full((B,), -1, jnp.int32),
        gt_boxes=jnp.asarray(gtb),
        gt_labels=jnp.zeros((B, n_gt_slots), jnp.int32),
        gt_valid=jnp.asarray(gtv),
        est_label=jnp.full((B,), -1, jnp.int32),
    )


MIN_SIDE = 4.0      # px, result filter (both stacks, symmetric rule)
GT_MIN_SIDE = 5.0   # px, GT-anchor filter — strictly inside MIN_SIDE


def _collect(results, image_id, boxes, scores, labels):
    """COCO result rows, dropping sub-MIN_SIDE slivers (symmetric rule on
    both stacks). A random-weight model emits some near-degenerate boxes
    whose sub-pixel cross-stack coordinate noise is a large RELATIVE error:
    they can neither anchor GT (their own-GT IoU straddles the 0.95
    threshold) nor ride along as false positives (their saturated scores
    tie, so the two stacks interleave the global PR curve differently).
    Both effects are float noise, not protocol divergence. GT anchors use
    the stricter GT_MIN_SIDE so every anchor sits 1px inside the result
    filter: no GT's detection can flip out of the result set on ~0.02px
    noise. Dets in the 4-5px band are false positives for BOTH stacks; a
    det straddling the 4px result boundary itself costs at most one FP of
    thousands (~1e-4 on a stat)."""
    for b, s, l in zip(boxes, scores, labels):
        if min(b[2] - b[0], b[3] - b[1]) < MIN_SIDE:
            continue
        results.append({
            "image_id": image_id, "category_id": int(l),
            "bbox": [float(b[0]), float(b[1]),
                     float(b[2] - b[0]), float(b[3] - b[1])],
            "score": float(s),
        })


def _gt_from_oracle(rng, images, oracle_dets, min_side=GT_MIN_SIDE,
                    n_noise=2):
    """Synthetic GT anchored on the oracle's detections (so both stacks
    score near the AP ceiling and every matching/ranking decision is
    load-bearing — a single flipped NMS survivor or shifted box breaks an
    IoU-0.95 match and moves AP) plus a couple of random never-detected
    boxes per image for false negatives.

    Detections smaller than ``min_side`` px are NOT anchored: on a sub-4px
    box the stacks' legitimate ~0.02px coordinate noise is a >5% relative
    error, so its IoU vs its own GT straddles the 0.95 threshold and the
    small-object AR slots absorb pure float noise (see _collect for the
    matching result-side filter and the GT_MIN_SIDE hysteresis)."""
    gt_images, anns = [], []
    aid = 1
    for i, (img, (boxes, scores, labels)) in enumerate(
            zip(images, oracle_dets)):
        h, w = img.shape[:2]
        gt_images.append({"id": i + 1, "height": h, "width": w})
        for j in range(len(boxes)):
            b = boxes[j]
            if min(b[2] - b[0], b[3] - b[1]) < min_side:
                continue
            anns.append({
                "id": aid, "image_id": i + 1, "category_id": int(labels[j]),
                "bbox": [float(b[0]), float(b[1]),
                         float(b[2] - b[0]), float(b[3] - b[1])],
                "area": float((b[2] - b[0]) * (b[3] - b[1])),
                "iscrowd": 0,
            })
            aid += 1
        for _ in range(n_noise):
            x, y = rng.uniform(2, w // 2), rng.uniform(2, h // 2)
            bw, bh = rng.uniform(8, 30), rng.uniform(8, 30)
            anns.append({
                "id": aid, "image_id": i + 1,
                "category_id": int(rng.integers(1, 91)),
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
            })
            aid += 1
    cats = sorted({a["category_id"] for a in anns})
    return COCOIndex({"images": gt_images, "annotations": anns,
                      "categories": [{"id": c} for c in cats]})


def _stats(gt: COCOIndex, results):
    dt = gt.load_res(results)
    ev = COCOEval(gt, dt, "bbox")
    ev.evaluate()
    ev.accumulate()
    return ev.summarize()


def _run_pair(sd, model, params, images, psfs=None):
    """Run every image through both stacks; returns (oracle_results,
    jax_results, oracle_dets) as COCO result lists."""
    step = make_eval_step(model, BUCKET, blur_eval=psfs is not None)
    t_results, j_results, oracle_dets = [], [], []
    for i, img in enumerate(images):
        timg = img
        psf = None
        if psfs is not None:
            psf = psfs[i % len(psfs)]
            timg = np_reference_roll_blur(img, psf)
        ref = torchvision_reference_forward(sd, timg, MIN_SIZE, MAX_SIZE,
                                            pre_nms=PRE_NMS,
                                            post_nms=POST_NMS)
        oracle_dets.append((ref["boxes"], ref["scores"], ref["labels"]))
        _collect(t_results, i + 1, ref["boxes"], ref["scores"], ref["labels"])

        dets, _ = step(params, _batch_for(img, psf))
        valid = np.asarray(dets.valid[0])
        _collect(j_results, i + 1,
                 np.asarray(dets.boxes[0])[valid],
                 np.asarray(dets.scores[0])[valid],
                 np.asarray(dets.labels[0])[valid])
    return t_results, j_results, oracle_dets


def _sharpen(sd, scale=4.0):
    """Widen the score margins of the random-weight model so every ranking /
    NMS / threshold decision has a gap far above fp32 noise. Random weights
    produce near-tied objectness and class scores, where ~1e-6 numeric
    differences legitimately flip top-k survivors (the per-stage parity test
    accepts >90% detection overlap for exactly this reason). The gate's job
    is to catch *protocol* divergence — a perturbed constant moves HUNDREDS
    of decisions — not to demand bit-identical tie-breaks, so we scale the
    two score-producing layers: decisions become margin-separated and both
    stacks must agree on the full decision sequence."""
    for k in ("rpn.head.cls_logits.weight", "rpn.head.cls_logits.bias",
              "roi_heads.box_predictor.cls_score.weight",
              "roi_heads.box_predictor.cls_score.bias"):
        sd[k] = sd[k] * scale
    return sd


@pytest.fixture(scope="module")
def sd_model():
    sd = _sharpen(make_random_fasterrcnn_sd(np.random.default_rng(0)))
    model, params = _model_and_params(sd)
    return sd, model, params


def test_map_delta_clean(sd_model):
    """32 images through the full protocol: the 19-stat vectors of the two
    stacks agree to 1e-3 (clean / no blur)."""
    sd, model, params = sd_model
    rng = np.random.default_rng(1)
    images = _make_images(rng, 32)
    t_res, j_res, oracle_dets = _run_pair(sd, model, params, images)
    gt = _gt_from_oracle(rng, images, oracle_dets)
    st = _stats(gt, t_res)
    sj = _stats(gt, j_res)
    assert st[0] > 0.2, "oracle mAP must be material on oracle-anchored GT"
    assert sj[0] > 0.2
    deltas = np.abs(st - sj)
    msg = "; ".join(f"{n}: {t:.4f} vs {j:.4f}"
                    for n, t, j, d in zip(STAT_NAMES, st, sj, deltas)
                    if d > 1e-3)
    assert deltas.max() <= 1e-3, f"stat deltas exceed 1e-3: {msg}"


def test_map_delta_blurred(sd_model):
    """Blurred variant: same PSFs both sides (production exact-circular FFT
    vs an independent roll-loop oracle), full protocol, stats agree.
    Blur moves pixels everywhere, so this also pins the blur padding rules
    and the blur->detect seam (engine.py:101-120 order)."""
    sd, model, params = sd_model
    rng = np.random.default_rng(2)
    images = _make_images(rng, 16)

    from detectinblur_tpu.ops.psf import sample_psf

    keys = jax.random.split(jax.random.key(3), 4)
    psfs = [np.asarray(jax.jit(sample_psf, static_argnames=("iters",))(
        k, expl=0.001, fraction=0.15, iters=500)) for k in keys]
    assert all(p.shape == (128, 128) and p.sum() > 0 for p in psfs)

    t_res, j_res, oracle_dets = _run_pair(sd, model, params, images,
                                          psfs=psfs)
    gt = _gt_from_oracle(rng, images, oracle_dets)
    st = _stats(gt, t_res)
    sj = _stats(gt, j_res)
    assert st[0] > 0.2 and sj[0] > 0.2
    deltas = np.abs(st - sj)
    msg = "; ".join(f"{n}: {t:.4f} vs {j:.4f}"
                    for n, t, j, d in zip(STAT_NAMES, st, sj, deltas)
                    if d > 1e-3)
    assert deltas.max() <= 1e-3, f"stat deltas exceed 1e-3: {msg}"


def test_gate_is_sensitive_to_constant_perturbation(sd_model):
    """Vacuity guard: nudging ONE postprocess constant (box NMS threshold
    .5 -> .4, faster_rcnn.py:158 in the reference) must move the stat
    vector by more than the gate tolerance — i.e. the gate would catch a
    perturbed constant."""
    sd, model, params = sd_model
    rng = np.random.default_rng(4)
    images = _make_images(rng, 8)
    t_res, j_res, oracle_dets = _run_pair(sd, model, params, images)
    gt = _gt_from_oracle(rng, images, oracle_dets)
    base = _stats(gt, j_res)

    cfg = model.cfg._replace(box=model.cfg.box._replace(nms_thresh=0.4))
    bent_model = FasterRCNN(cfg)
    step = make_eval_step(bent_model, BUCKET)
    bent_res = []
    for i, img in enumerate(images):
        dets, _ = step(params, _batch_for(img))
        valid = np.asarray(dets.valid[0])
        _collect(bent_res, i + 1,
                 np.asarray(dets.boxes[0])[valid],
                 np.asarray(dets.scores[0])[valid],
                 np.asarray(dets.labels[0])[valid])
    bent = _stats(gt, bent_res)
    assert np.abs(base - bent).max() > 1e-3, (
        "gate failed to detect a perturbed NMS constant")


# ------------------------------------------------- remedy-protocol cells
def _np_expand_targets(boxes_xyxy, psf, h, w):
    """Independent numpy oracle for expand_targets + fix_bounding_box_squeeze
    (/root/reference/utils.py:360-434): expansion = nonzero extents - 63
    applied to the box edges, then clamp -> degenerate repair -> clamp."""
    nz = np.nonzero(psf / max(psf.sum(), 1e-20))
    top, bottom = nz[0].min() - 63.0, nz[0].max() - 63.0
    left, right = nz[1].min() - 63.0, nz[1].max() - 63.0
    b = np.asarray(boxes_xyxy, np.float64).copy()
    b[:, 0] += left
    b[:, 2] += right
    b[:, 1] += top
    b[:, 3] += bottom

    def clamp(b):
        b[:, 0] = np.clip(b[:, 0], 0, w - 1)
        b[:, 2] = np.clip(b[:, 2], 0, w - 1)
        b[:, 1] = np.clip(b[:, 1], 0, h - 1)
        b[:, 3] = np.clip(b[:, 3], 0, h - 1)
        return b

    b = clamp(b)
    bad = b[:, 0] >= b[:, 2]
    b[bad, 2] += 1.0
    b[bad, 0] -= 1.0
    bad = b[:, 1] >= b[:, 3]
    b[bad, 3] += 1.0
    b[bad, 1] -= 1.0
    return clamp(b).astype(np.float32)


def _ann_boxes_xyxy(gt, img_id):
    """Per-image GT boxes in annotation order (the positional rewrite
    contract, engine.py:325-342)."""
    out = []
    for a in gt.img_to_anns[img_id]:
        x, y, bw, bh = a["bbox"]
        out.append([x, y, x + bw, y + bh])
    return np.asarray(out, np.float32).reshape(-1, 4)


def test_map_delta_expanded_gt(sd_model):
    """--expand_target_boxes end-to-end to the stat vector (VERDICT r4
    next-round item 4): the production step's PSF-driven GT expansion +
    positional cocoGt rewrite vs an independent numpy oracle of
    utils.py:369-386 on the SAME PSFs. Locks the extents-63 expansion and
    squeeze-fix constants through the full metric."""
    import copy

    from detectinblur_tpu.train.eval_loop import rewrite_expanded_gt
    from detectinblur_tpu.eval.coco_index import COCOIndex
    from detectinblur_tpu.ops.psf import sample_psf

    sd, model, params = sd_model
    rng = np.random.default_rng(6)
    images = _make_images(rng, 12)
    keys = jax.random.split(jax.random.key(7), 4)
    psfs = [np.asarray(jax.jit(sample_psf, static_argnames=("iters",))(
        k, expl=0.001, fraction=0.15, iters=500)) for k in keys]

    # Oracle pass (blurred) -> detections + GT anchoring.
    t_results, oracle_dets = [], []
    for i, img in enumerate(images):
        psf = psfs[i % len(psfs)]
        ref = torchvision_reference_forward(
            sd, np_reference_roll_blur(img, psf), MIN_SIZE, MAX_SIZE,
            pre_nms=PRE_NMS, post_nms=POST_NMS)
        oracle_dets.append((ref["boxes"], ref["scores"], ref["labels"]))
        _collect(t_results, i + 1, ref["boxes"], ref["scores"],
                 ref["labels"])
    gt = _gt_from_oracle(rng, images, oracle_dets)
    slots = max(len(gt.img_to_anns[i + 1]) for i in range(len(images)))

    # JAX pass with the production expansion; collect detections AND the
    # step's expanded GT, rewriting a deepcopy like evaluate_coco does.
    step = make_eval_step(model, BUCKET, blur_eval=True,
                          expand_target_boxes=True)
    gt_jax = COCOIndex(copy.deepcopy(gt.dataset))
    gt_torch = COCOIndex(copy.deepcopy(gt.dataset))
    j_results = []
    for i, img in enumerate(images):
        psf = psfs[i % len(psfs)]
        ann_boxes = _ann_boxes_xyxy(gt, i + 1)
        dets, expanded = step(params, _batch_for(img, psf, ann_boxes,
                                                 n_gt_slots=slots))
        valid = np.asarray(dets.valid[0])
        _collect(j_results, i + 1,
                 np.asarray(dets.boxes[0])[valid],
                 np.asarray(dets.scores[0])[valid],
                 np.asarray(dets.labels[0])[valid])
        rewrite_expanded_gt(gt_jax, i + 1,
                            np.asarray(expanded[0]), len(ann_boxes))
        h, w = img.shape[:2]
        rewrite_expanded_gt(gt_torch, i + 1,
                            _np_expand_targets(ann_boxes, psf, h, w),
                            len(ann_boxes))

    # The two stacks' EXPANSIONS must agree exactly (same integer extents).
    for i in range(len(images)):
        a = np.asarray([x["bbox"] for x in gt_jax.img_to_anns[i + 1]])
        b = np.asarray([x["bbox"] for x in gt_torch.img_to_anns[i + 1]])
        np.testing.assert_allclose(a, b, atol=1e-4)

    st = _stats(gt_torch, t_results)
    sj = _stats(gt_jax, j_results)
    assert st[0] > 0.05, "expanded-GT protocol must keep a material mAP"
    deltas = np.abs(st - sj)
    msg = "; ".join(f"{n}: {t:.4f} vs {j:.4f}"
                    for n, t, j, d in zip(STAT_NAMES, st, sj, deltas)
                    if d > 1e-3)
    assert deltas.max() <= 1e-3, f"stat deltas exceed 1e-3: {msg}"
    # Vacuity guard: expansion moved the GT, i.e. this cell is not the
    # plain blurred gate in disguise.
    s_plain = _stats(gt, j_results)
    assert np.abs(s_plain - sj).max() > 1e-3


def test_map_delta_warp(sd_model):
    """--warp_in_model end-to-end to the stat vector: the production Squint
    path (warp inputs, backbone, inverse-warp FPN levels, warper.py:13-52 /
    generalized_rcnn.py:131-141) vs the torch oracle running the same
    protocol with the reference's matrix composition, warp params derived
    from the SAME PSFs."""
    from detectinblur_tpu.ops.psf import psf_principal_components, sample_psf

    sd, model, params = sd_model
    wmodel = FasterRCNN(model.cfg._replace(warp_internally=True))
    rng = np.random.default_rng(8)
    images = _make_images(rng, 8)
    keys = jax.random.split(jax.random.key(9), 4)
    psfs = [np.asarray(jax.jit(sample_psf, static_argnames=("iters",))(
        k, expl=0.001, fraction=0.15, iters=500)) for k in keys]
    comps = [jax.jit(psf_principal_components)(jnp.asarray(p)) for p in psfs]

    step = make_eval_step(wmodel, BUCKET, blur_eval=True, use_warp=True)
    t_results, j_results, oracle_dets = [], [], []
    for i, img in enumerate(images):
        psf = psfs[i % len(psfs)]
        c = comps[i % len(psfs)]
        warp = (float(c.theta_rad), float(c.scale_factor_lambda1),
                float(c.scale_factor_lambda2))
        assert warp[1] != 1.0 or warp[2] != 1.0  # non-identity squint
        ref = torchvision_reference_forward(
            sd, np_reference_roll_blur(img, psf), MIN_SIZE, MAX_SIZE,
            pre_nms=PRE_NMS, post_nms=POST_NMS, warp=warp)
        oracle_dets.append((ref["boxes"], ref["scores"], ref["labels"]))
        _collect(t_results, i + 1, ref["boxes"], ref["scores"],
                 ref["labels"])

        dets, _ = step(params, _batch_for(img, psf))
        valid = np.asarray(dets.valid[0])
        _collect(j_results, i + 1,
                 np.asarray(dets.boxes[0])[valid],
                 np.asarray(dets.scores[0])[valid],
                 np.asarray(dets.labels[0])[valid])

    gt = _gt_from_oracle(rng, images, oracle_dets)
    st = _stats(gt, t_results)
    sj = _stats(gt, j_results)
    assert st[0] > 0.2 and sj[0] > 0.2
    deltas = np.abs(st - sj)
    msg = "; ".join(f"{n}: {t:.4f} vs {j:.4f}"
                    for n, t, j, d in zip(STAT_NAMES, st, sj, deltas)
                    if d > 1e-3)
    assert deltas.max() <= 1e-3, f"stat deltas exceed 1e-3: {msg}"
