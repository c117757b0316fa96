"""Native (C++) RLE ops vs the pure-numpy fallback."""

import numpy as np
import pytest

from detectinblur_tpu.eval import rle
from detectinblur_tpu.eval.native import get_lib


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_encode_decode(lib, rng):
    m = (rng.random((37, 23)) > 0.5).astype(np.uint8)
    r = rle.encode(m)  # uses native when built
    np.testing.assert_array_equal(rle.decode(r), m)
    assert rle.area(r) == m.sum()


def test_native_intersection(lib, rng):
    a = (rng.random((40, 40)) > 0.4).astype(np.uint8)
    b = (rng.random((40, 40)) > 0.6).astype(np.uint8)
    ra, rb = rle.encode(a), rle.encode(b)
    ca = np.asarray(ra["counts"], np.uint32)
    cb = np.asarray(rb["counts"], np.uint32)
    inter = lib.rle_intersection(ca, len(ca), cb, len(cb))
    assert inter == int((a & b).sum())


def test_native_iou_matrix(lib, rng):
    masks_d = [(rng.random((30, 30)) > t).astype(np.uint8) for t in (0.3, 0.5, 0.7)]
    masks_g = [(rng.random((30, 30)) > t).astype(np.uint8) for t in (0.4, 0.6)]
    dts = [rle.encode(m) for m in masks_d]
    gts = [rle.encode(m) for m in masks_g]
    iscrowd = [0, 1]
    got = rle.iou_matrix(dts, gts, iscrowd)
    for i, dm in enumerate(masks_d):
        for j, gm in enumerate(masks_g):
            inter = float((dm & gm).sum())
            denom = dm.sum() if iscrowd[j] else dm.sum() + gm.sum() - inter
            np.testing.assert_allclose(got[i, j], inter / denom, atol=1e-12)


def test_native_merge_and_bbox(lib, rng):
    a = np.zeros((20, 20), np.uint8); a[3:8, 4:10] = 1
    b = np.zeros((20, 20), np.uint8); b[6:12, 8:15] = 1
    ca = np.asarray(rle.encode(a)["counts"], np.uint32)
    cb = np.asarray(rle.encode(b)["counts"], np.uint32)
    out = np.empty(len(ca) + len(cb) + 1, np.uint32)
    m = lib.rle_merge(ca, len(ca), cb, len(cb), 0, out)
    union = rle.decode({"size": [20, 20], "counts": out[:m].tolist()})
    np.testing.assert_array_equal(union, a | b)
    bb = np.zeros(4, np.float64)
    lib.rle_to_bbox(ca, len(ca), 20, bb)
    np.testing.assert_allclose(bb, [4, 3, 6, 5])


def test_bb_and_rle_nms():
    """maskApi.h rleNms/bbNms greedy semantics (keep earlier, drop IoU>thr)."""
    import numpy as np
    from detectinblur_tpu.eval import rle

    boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [20, 20, 5, 5]], float)
    keep = rle.bbNms(boxes, 0.5)
    assert keep.tolist() == [True, False, True]

    m1 = np.zeros((12, 12), np.uint8); m1[0:10, 0:10] = 1
    m2 = np.zeros((12, 12), np.uint8); m2[1:11, 1:11] = 1
    m3 = np.zeros((12, 12), np.uint8); m3[11:, 11:] = 1
    rles = [rle.encode(m) for m in (m1, m2, m3)]
    keep = rle.rleNms(rles, 0.5)
    assert keep.tolist() == [True, False, True]
