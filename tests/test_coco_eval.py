"""COCOeval parity: our pure-numpy evaluator vs the vendored pycocotools
cocoeval.py (loaded from /root/reference as a read-only test oracle with a
stubbed mask module — its C extension is unavailable). Skipped when the
reference checkout is absent."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from detectinblur_tpu.eval.coco_index import COCOIndex
from detectinblur_tpu.eval.coco_eval import COCOEval, bbox_iou_crowd
from detectinblur_tpu.eval import rle

ORACLE_PATH = "/root/reference/cocoapi/PythonAPI/pycocotools/cocoeval.py"


def load_oracle_cocoeval():
    pkg = types.ModuleType("pycocotools_oracle")
    pkg.__path__ = []
    sys.modules["pycocotools_oracle"] = pkg
    mask_stub = types.ModuleType("pycocotools_oracle.mask")

    def iou(d, g, iscrowd):
        d = np.asarray(d, np.float64).reshape(len(d), 4)
        g = np.asarray(g, np.float64).reshape(len(g), 4)
        return bbox_iou_crowd(d, g, np.asarray(iscrowd))

    mask_stub.iou = iou
    sys.modules["pycocotools_oracle.mask"] = mask_stub
    # The vendored cocoeval targets numpy<1.20; shim the removed aliases.
    for alias, typ in (("float", float), ("int", int), ("bool", bool)):
        if not hasattr(np, alias):
            setattr(np, alias, typ)
    spec = importlib.util.spec_from_file_location(
        "pycocotools_oracle.cocoeval", ORACLE_PATH
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class FakeCOCO:
    """Just enough of pycocotools.coco.COCO for COCOeval."""

    def __init__(self, index: COCOIndex):
        self.idx = index

    def getImgIds(self):
        return self.idx.get_img_ids()

    def getCatIds(self):
        return self.idx.get_cat_ids()

    def getAnnIds(self, imgIds=(), catIds=()):
        return self.idx.get_ann_ids(imgIds, catIds)

    def loadAnns(self, ids):
        import copy

        return copy.deepcopy(self.idx.load_anns(ids))


def synthetic_dataset(rng, n_imgs=4, n_cats=3, seed_gt=30, seed_dt=60):
    images = [{"id": i + 1, "height": 200, "width": 200} for i in range(n_imgs)]
    cats = [{"id": c + 1, "name": f"c{c}"} for c in range(n_cats)]
    anns = []
    aid = 1
    for _ in range(seed_gt):
        x, y = rng.uniform(0, 150, 2)
        w, h = rng.uniform(4, 120, 2)
        anns.append({
            "id": aid,
            "image_id": int(rng.integers(1, n_imgs + 1)),
            "category_id": int(rng.integers(1, n_cats + 1)),
            "bbox": [float(x), float(y), float(w), float(h)],
            "area": float(w * h),
            "iscrowd": int(rng.random() < 0.15),
        })
        aid += 1
    gt = COCOIndex({"images": images, "annotations": anns, "categories": cats})

    results = []
    for a in anns:
        # jittered copies of GT + random noise detections
        if rng.random() < 0.8:
            bb = np.array(a["bbox"]) + rng.normal(0, 4, 4)
            results.append({
                "image_id": a["image_id"],
                "category_id": a["category_id"],
                "bbox": [float(v) for v in np.maximum(bb, 0)],
                "score": float(rng.random()),
            })
    for _ in range(seed_dt - len(results)):
        x, y = rng.uniform(0, 150, 2)
        w, h = rng.uniform(4, 120, 2)
        results.append({
            "image_id": int(rng.integers(1, n_imgs + 1)),
            "category_id": int(rng.integers(1, n_cats + 1)),
            "bbox": [float(x), float(y), float(w), float(h)],
            "score": float(rng.random()),
        })
    return gt, results


@pytest.mark.skipif(not os.path.exists(ORACLE_PATH), reason="reference oracle absent")
def test_cocoeval_matches_pycocotools(rng):
    gt, results = synthetic_dataset(rng)
    dt = gt.load_res(results)

    ours = COCOEval(gt, dt, "bbox")
    ours.evaluate()
    ours.accumulate()
    stats = ours.summarize()

    oracle_mod = load_oracle_cocoeval()
    oc = oracle_mod.COCOeval(FakeCOCO(gt), FakeCOCO(dt), "bbox")
    oc.evaluate()
    oc.accumulate()
    oc.summarize()

    np.testing.assert_allclose(
        ours.eval["precision"], oc.eval["precision"], atol=1e-10
    )
    np.testing.assert_allclose(ours.eval["recall"], oc.eval["recall"], atol=1e-10)
    # First 12 stats must agree exactly with the standard summary.
    np.testing.assert_allclose(stats[:12], oc.stats[:12], atol=1e-10)


def test_perfect_detections_give_ap1(rng):
    gt, _ = synthetic_dataset(rng, seed_gt=10)
    results = [
        {"image_id": a["image_id"], "category_id": a["category_id"],
         "bbox": a["bbox"], "score": 0.9}
        for a in gt.dataset["annotations"] if not a["iscrowd"]
    ]
    dt = gt.load_res(results)
    ev = COCOEval(gt, dt, "bbox")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    assert stats[0] > 0.99  # AP ~ 1.0
    assert stats[8] > 0.99  # AR100 ~ 1.0


def synthetic_kpt_dataset(rng, n_imgs=4, n_gt=20, n_dt=40):
    """Person-keypoint style dataset: 17 keypoints per annotation."""
    images = [{"id": i + 1, "height": 200, "width": 200} for i in range(n_imgs)]
    cats = [{"id": 1, "name": "person"}]
    anns = []
    for aid in range(1, n_gt + 1):
        x, y = rng.uniform(10, 120, 2)
        w, h = rng.uniform(20, 70, 2)
        kx = rng.uniform(x, x + w, 17)
        ky = rng.uniform(y, y + h, 17)
        kv = rng.integers(0, 3, 17)
        kps = np.stack([kx, ky, kv], 1).reshape(-1)
        anns.append({
            "id": aid,
            "image_id": int(rng.integers(1, n_imgs + 1)),
            "category_id": 1,
            "bbox": [float(x), float(y), float(w), float(h)],
            "area": float(w * h),
            "iscrowd": 0,
            "keypoints": [float(v) for v in kps],
            "num_keypoints": int((kv > 0).sum()),
        })
    gt = COCOIndex({"images": images, "categories": cats, "annotations": anns})
    results = []
    for _ in range(n_dt):
        base = anns[int(rng.integers(0, len(anns)))]
        kp = np.asarray(base["keypoints"], np.float64).copy()
        kp[0::3] += rng.normal(0, 6, 17)
        kp[1::3] += rng.normal(0, 6, 17)
        results.append({
            "image_id": base["image_id"] if rng.random() < 0.8
            else int(rng.integers(1, n_imgs + 1)),
            "category_id": 1,
            "keypoints": [float(v) for v in kp],
            "score": float(rng.random()),
        })
    return gt, results


@pytest.mark.skipif(not os.path.exists(ORACLE_PATH), reason="reference oracle absent")
def test_keypoints_oks_matches_pycocotools(rng):
    gt, results = synthetic_kpt_dataset(rng)
    dt = gt.load_res(results)

    ours = COCOEval(gt, dt, "keypoints")
    ours.evaluate()
    ours.accumulate()
    stats = ours.summarize()

    oracle_mod = load_oracle_cocoeval()
    oc = oracle_mod.COCOeval(FakeCOCO(gt), FakeCOCO(dt), "keypoints")
    oc.evaluate()
    oc.accumulate()
    oc.summarize()

    # OKS matrices agree per (img, cat).
    for img_id in gt.get_img_ids():
        np.testing.assert_allclose(
            ours._compute_iou(img_id, 1), oc.ious[(img_id, 1)], atol=1e-10)
    # Oracle area buckets: all/medium/large (no 'small'); ours carries the
    # 4-bucket layout, so compare the shared buckets by label.
    for our_a, oc_a in ((0, 0), (2, 1), (3, 2)):
        np.testing.assert_allclose(
            ours.eval["precision"][:, :, :, our_a, -1],
            oc.eval["precision"][:, :, :, oc_a, -1], atol=1e-10)
    np.testing.assert_allclose(stats, oc.stats, atol=1e-10)


def test_rle_roundtrip(rng):
    m = (rng.random((23, 31)) > 0.6).astype(np.uint8)
    r = rle.encode(m)
    np.testing.assert_array_equal(rle.decode(r), m)
    assert rle.area(r) == m.sum()
    s = rle.toString(r["counts"])
    np.testing.assert_array_equal(rle.frString(s), r["counts"])


def test_rle_bbox_and_merge(rng):
    m1 = np.zeros((20, 20), np.uint8); m1[3:8, 4:10] = 1
    m2 = np.zeros((20, 20), np.uint8); m2[6:12, 8:15] = 1
    r1, r2 = rle.encode(m1), rle.encode(m2)
    np.testing.assert_allclose(rle.toBbox(r1), [4, 3, 6, 5])
    union = rle.decode(rle.merge([r1, r2]))
    np.testing.assert_array_equal(union, (m1 | m2))
    inter = rle.decode(rle.merge([r1, r2], intersect=True))
    np.testing.assert_array_equal(inter, (m1 & m2))


def test_polygon_rasterization():
    # Axis-aligned square from (2,3) to (7,9): pixel centers inside.
    poly = [2, 3, 7, 3, 7, 9, 2, 9]
    m = rle.decode(rle.frPoly(poly, 12, 12))
    ys, xs = np.nonzero(m)
    assert xs.min() == 2 and xs.max() == 6
    assert ys.min() == 3 and ys.max() == 8
