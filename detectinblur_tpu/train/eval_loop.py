"""COCO evaluation loop (host orchestration around the jitted eval step).

Mirrors engine.evaluate (engine.py:220-416): batch-1 protocol, device-side
blur + box expansion, optional expanded-GT rewrite of the cocoGt
annotations (engine.py:325-342 — rewritten positionally against imgToAnns,
reproducing the reference's behavior including its tolerance of count
mismatches), detection collection as COCO results, cross-host merge, then
accumulate + 19-stat summarize.
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional

import jax
import numpy as np

from detectinblur_tpu.eval.coco_eval import COCOEval, STAT_NAMES
from detectinblur_tpu.eval.coco_index import COCOIndex
from detectinblur_tpu.utils.metric_logger import MetricLogger


def dataset_to_coco_index(dataset) -> COCOIndex:
    """convert_to_coco_api equivalent (coco_utils.py:147-211) for datasets
    without a native COCO index."""
    images, annotations, cats = [], [], set()
    aid = 1
    for i in range(len(dataset)):
        item = dataset[i]
        h, w = item["image"].shape[:2]
        images.append({"id": item["image_id"], "height": h, "width": w})
        for b, lab, area, crowd in zip(item["boxes"], item["labels"],
                                       item["area"], item["iscrowd"]):
            annotations.append({
                "id": aid,
                "image_id": item["image_id"],
                "category_id": int(lab),
                "bbox": [float(b[0]), float(b[1]),
                         float(b[2] - b[0]), float(b[3] - b[1])],
                "area": float(area),
                "iscrowd": int(crowd),
            })
            cats.add(int(lab))
            aid += 1
    return COCOIndex({
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c} for c in sorted(cats)],
    })


def rewrite_expanded_gt(coco_gt: COCOIndex, image_id: int,
                        expanded_xyxy: np.ndarray, n_valid: int) -> int:
    """Positional bbox rewrite (engine.py:325-342). Returns faulty count."""
    anns = coco_gt.img_to_anns[image_id]
    faulty = 0
    for k, ann in enumerate(anns):
        if k >= n_valid:
            faulty += 1
            continue
        b = expanded_xyxy[k]
        ann["bbox"] = [float(b[0]), float(b[1]),
                       float(b[2] - b[0]), float(b[3] - b[1])]
    return faulty


def collect_detections(dets, image_ids, results: List[dict]):
    """Append COCO result dicts from a Detections batch (xyxy -> xywh,
    CocoEvaluator.prepare_for_coco_detection semantics)."""
    boxes = np.asarray(dets.boxes)
    scores = np.asarray(dets.scores)
    labels = np.asarray(dets.labels)
    valid = np.asarray(dets.valid)
    for i, img_id in enumerate(image_ids):
        for b, s, l, v in zip(boxes[i], scores[i], labels[i], valid[i]):
            if not v:
                continue
            results.append({
                "image_id": int(img_id),
                "category_id": int(l),
                "bbox": [float(b[0]), float(b[1]),
                         float(b[2] - b[0]), float(b[3] - b[1])],
                "score": float(s),
            })


def merge_host_payloads(
    per_host_ids: List[List[int]],
    per_host_results: List[List[dict]],
    per_host_expanded: Optional[List[List[tuple]]] = None,
):
    """Pure (collective-free) cross-host merge: keep each image's payloads
    from the FIRST host that evaluated it (the reference merge dedups
    evaluated images by unique img id, keeping first occurrences,
    coco_eval.py:204-211). Needed because the padded per-host shards
    (DistributedSampler wrap-around) evaluate up to P-1 images twice.
    ``per_host_ids`` carries every image a host evaluated — including
    zero-detection images, which produce no result rows but still claim
    the id.

    ``per_host_expanded`` carries each host's expanded-GT records
    ``(image_id, boxes_xyxy[nv, 4])``; they follow the exact same
    first-host-claim rule so the GT box used for an image is the one
    produced by the host whose detections were kept (the PSF-dependent
    expansion cannot be recomputed on other hosts — each host sampled its
    own blur). Returns ``(results, expanded)``."""
    if per_host_expanded is None:
        per_host_expanded = [[] for _ in per_host_ids]
    seen: set = set()
    out: List[dict] = []
    out_exp: List[tuple] = []
    for ids, host_results, host_exp in zip(per_host_ids, per_host_results,
                                           per_host_expanded):
        fresh = {i for i in ids if i not in seen}
        for r in host_results:
            if r["image_id"] in fresh:
                out.append(r)
        claimed: set = set()
        for img_id, boxes in host_exp:
            # Within-host duplicates also keep the first occurrence.
            if img_id in fresh and img_id not in claimed:
                out_exp.append((img_id, boxes))
                claimed.add(img_id)
        seen.update(fresh)
    return out, out_exp


def dedup_across_hosts(per_host_ids: List[List[int]],
                       per_host_results: List[List[dict]]) -> List[dict]:
    """Detections-only view of :func:`merge_host_payloads`."""
    return merge_host_payloads(per_host_ids, per_host_results)[0]


def merge_results_across_hosts(
    results: List[dict],
    evaluated_ids: List[int],
    expanded_records: Optional[List[tuple]] = None,
):
    """Cross-host eval merge (utils.py:536-576 / coco_eval.py:182-201
    equivalent), via process_allgather of fixed-shape arrays, dedup'd by
    image id across hosts.

    ``expanded_records`` (``--expand_target_boxes``) are gathered ALONGSIDE
    the detections as fixed-width ``[img_id, k, x1, y1, x2, y2]`` rows and
    dedup'd by the same first-host-claim rule, so after the merge every
    host holds the expanded GT for every evaluated image — matching the
    reference, which evaluates each image on the rank that rewrote its GT
    before merging evalImgs (engine.py:325-342, coco_eval.py:182-211).
    Returns ``(results, expanded_records)``."""
    if jax.process_count() == 1:
        if expanded_records is None:
            return results, []
        merged, exp = merge_host_payloads([evaluated_ids], [results],
                                          [expanded_records])
        return merged, exp
    from jax.experimental import multihost_utils

    arr = np.zeros((len(results), 7), np.float64)
    for i, r in enumerate(results):
        arr[i] = [r["image_id"], r["category_id"], *r["bbox"], r["score"]]
    ids = np.asarray(evaluated_ids, np.int64)
    exp_rows: List[list] = []
    for img_id, boxes in (expanded_records or []):
        for k, b in enumerate(np.asarray(boxes, np.float64)):
            exp_rows.append([img_id, k, b[0], b[1], b[2], b[3]])
    exp_arr = np.asarray(exp_rows, np.float64).reshape(len(exp_rows), 6)
    # Pad to the max count across hosts.
    counts = multihost_utils.process_allgather(
        np.array([len(results), len(ids), len(exp_rows)]))
    m = int(counts[:, 0].max())
    mi = int(counts[:, 1].max())
    me = int(counts[:, 2].max())
    pad = np.full((m - len(results), 7), -1.0)
    gathered = multihost_utils.process_allgather(np.concatenate([arr, pad]))
    gathered_ids = multihost_utils.process_allgather(
        np.concatenate([ids, np.full(mi - len(ids), -1, np.int64)]))
    gathered_exp = multihost_utils.process_allgather(np.concatenate(
        [exp_arr, np.full((me - len(exp_rows), 6), -1.0)]))
    per_host_results = []
    per_host_ids = []
    per_host_expanded = []
    for host, host_ids, host_exp in zip(gathered, gathered_ids, gathered_exp):
        rows = []
        for row in host:
            if row[0] < 0:
                continue
            rows.append({
                "image_id": int(row[0]), "category_id": int(row[1]),
                "bbox": row[2:6].tolist(), "score": float(row[6]),
            })
        per_host_results.append(rows)
        per_host_ids.append([int(i) for i in host_ids if i >= 0])
        # Re-group the flat [img_id, k, box] rows into per-image arrays
        # (rows were emitted k-ascending per image, order preserved by the
        # fixed-shape gather).
        by_img: Dict[int, List[np.ndarray]] = {}
        order: List[int] = []
        for row in host_exp:
            if row[0] < 0:
                continue
            img = int(row[0])
            if img not in by_img:
                by_img[img] = []
                order.append(img)
            by_img[img].append(row[2:6])
        per_host_expanded.append(
            [(img, np.asarray(by_img[img])) for img in order])
    return merge_host_payloads(per_host_ids, per_host_results,
                               per_host_expanded)


def evaluate_coco(
    eval_step,
    params,
    loader,
    coco_gt: COCOIndex,
    expand_target_boxes: bool = False,
    print_freq: int = 100,
    early_stop: Optional[int] = None,
    header: str = "Test:",
    image_output_dir: Optional[str] = None,
    seed: int = 1337,
) -> np.ndarray:
    """Run the loop; returns the 19-stat vector (AP first — the reference's
    patched summarize, coco_eval.py:506-528).

    ``eval_step`` is called as ``eval_step(params, batch, key)`` with a
    fresh per-iteration key (fold_in over the iteration index, per-host
    offset like the reference's rank*1337 seeding, train.py:100-104), so
    eval-time corruptions (--add_noise/--add_block/--add_jpeg_artefacts/
    --dilate_psf) draw new randomness every step while the whole sweep
    stays deterministic given the seed."""
    results: List[dict] = []
    evaluated_ids: List[int] = []
    expanded_records: List[tuple] = []
    gt = coco_gt
    if expand_target_boxes:
        gt = COCOIndex(copy.deepcopy(coco_gt.dataset))

    base_key = jax.random.fold_in(jax.random.key(seed), jax.process_index())
    logger = MetricLogger()
    for it, (batch, bucket, image_ids) in enumerate(
        logger.log_every(loader, print_freq, header)
    ):
        if early_stop is not None and it >= early_stop:
            break
        dets, expanded_gt = eval_step(params, batch,
                                      jax.random.fold_in(base_key, it))
        evaluated_ids.extend(int(i) for i in image_ids)
        collect_detections(dets, image_ids, results)
        if image_output_dir is not None and it < 50:
            # Box-overlay dumps (engine.py:382-383).
            from detectinblur_tpu.utils.visualization import dump_detections

            dump_detections(image_output_dir, int(image_ids[0]),
                            np.asarray(batch.images[0]), dets)
        if expand_target_boxes:
            # Record, don't rewrite yet: the PSF-dependent expansion is only
            # computable on the host that blurred the image, so the rewrite
            # happens AFTER the cross-host merge, against the merged records
            # (reference engine.py:325-342 + coco_eval.py:182-211 fidelity).
            eg = np.asarray(expanded_gt)
            nv = np.asarray(batch.gt_valid).sum(axis=1)
            for i, img_id in enumerate(image_ids):
                expanded_records.append(
                    (int(img_id), eg[i, : int(nv[i])].copy()))

    results, expanded_records = merge_results_across_hosts(
        results, evaluated_ids,
        expanded_records if expand_target_boxes else None)
    faulty = 0
    for img_id, boxes in expanded_records:
        faulty += rewrite_expanded_gt(gt, img_id, boxes, len(boxes))
    if faulty:
        print(f"expanded-GT rewrite: {faulty} faulty boxes")
    if not results:
        print("no detections produced")
        return np.full(len(STAT_NAMES), -1.0)
    dt = gt.load_res(results)
    ev = COCOEval(gt, dt, "bbox")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    ev.print_summary()
    return stats
