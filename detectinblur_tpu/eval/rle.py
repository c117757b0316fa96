"""COCO run-length-encoded mask ops (maskApi equivalent).

Covers what the reference's vendored cocoapi C extension provides
(cocoapi/common/maskApi.h:16-60): RLE encode/decode, area, merge, IoU
(with crowd semantics), bbox extraction, polygon rasterization, and the
COCO compressed-string codec. Pure numpy; the polygon rasterizer uses
even-odd filling at pixel centers (cocoapi's 5x-upsampled scanline can
differ by <=1 boundary pixel — bbox evaluation, the benchmark path, is
unaffected).

RLE convention: column-major (Fortran) scan, counts alternate starting with
the number of zeros.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np

RLE = Dict[str, object]  # {"size": [h, w], "counts": list[int] | bytes}


# ----------------------------------------------------------- codec
def _counts_list(rle: RLE) -> np.ndarray:
    c = rle["counts"]
    if isinstance(c, (bytes, str)):
        return frString(c)
    return np.asarray(c, dtype=np.int64)


def toString(counts: Sequence[int]) -> bytes:
    """COCO compressed RLE string: delta-coded signed varints, 5 bits per
    char, offset by 48."""
    out = bytearray()
    counts = list(map(int, counts))
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


def frString(s: Union[bytes, str]) -> np.ndarray:
    if isinstance(s, str):
        s = s.encode()
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, dtype=np.int64)


def _native():
    from detectinblur_tpu.eval.native import get_lib

    return get_lib()


# ----------------------------------------------------------- encode/decode
def encode(mask: np.ndarray) -> RLE:
    """Encode a [H, W] binary mask (column-major runs)."""
    h, w = mask.shape
    lib = _native()
    if lib is not None and mask.size:
        flat = np.ascontiguousarray(
            np.asfortranarray(mask).reshape(-1, order="F").astype(np.uint8))
        buf = np.empty(mask.size + 1, np.uint32)
        m = lib.rle_encode(flat, flat.size, buf)
        return {"size": [h, w], "counts": buf[:m].tolist()}
    flat = np.asfortranarray(mask).reshape(-1, order="F").astype(bool)
    if flat.size == 0:
        return {"size": [h, w], "counts": [0]}
    changes = np.nonzero(np.diff(flat))[0] + 1
    bounds = np.concatenate([[0], changes, [flat.size]])
    runs = np.diff(bounds)
    if flat[0]:
        runs = np.concatenate([[0], runs])
    return {"size": [h, w], "counts": runs.tolist()}


def decode(rle: RLE) -> np.ndarray:
    h, w = rle["size"]
    counts = _counts_list(rle)
    vals = np.zeros(int(counts.sum()), dtype=np.uint8)
    pos = np.cumsum(counts)
    for i in range(1, len(counts), 2):
        vals[pos[i - 1] : pos[i]] = 1
    return vals.reshape((h, w), order="F")


def area(rle: RLE) -> int:
    counts = _counts_list(rle)
    return int(counts[1::2].sum())


def toBbox(rle: RLE) -> np.ndarray:
    m = decode(rle)
    ys, xs = np.nonzero(m)
    if len(xs) == 0:
        return np.zeros(4)
    return np.array([xs.min(), ys.min(), xs.max() - xs.min() + 1,
                     ys.max() - ys.min() + 1], np.float64)


def merge(rles: Sequence[RLE], intersect: bool = False) -> RLE:
    if not rles:
        return {"size": [0, 0], "counts": [0]}
    m = decode(rles[0]).astype(bool)
    for r in rles[1:]:
        other = decode(r).astype(bool)
        m = (m & other) if intersect else (m | other)
    return encode(m)


# ----------------------------------------------------------- iou
def _intersection_area(a: RLE, b: RLE) -> int:
    lib = _native()
    if lib is not None:
        ca = _counts_list(a).astype(np.uint32)
        cb = _counts_list(b).astype(np.uint32)
        return int(lib.rle_intersection(ca, len(ca), cb, len(cb)))
    return area(merge([a, b], intersect=True))


def iou_matrix(dts: Sequence[RLE], gts: Sequence[RLE], iscrowd) -> np.ndarray:
    lib = _native()
    if lib is not None and dts and gts:
        def pack(rles):
            counts = [_counts_list(r).astype(np.uint32) for r in rles]
            lens = np.asarray([len(c) for c in counts], np.int32)
            offs = np.zeros(len(counts), np.int64)
            offs[1:] = np.cumsum(lens[:-1])
            return np.concatenate(counts), offs, lens

        dc, do, dl = pack(dts)
        gc, go, gl = pack(gts)
        out = np.zeros(len(dts) * len(gts), np.float64)
        crowd = np.asarray(iscrowd, np.uint8)
        lib.rle_iou_matrix(dc, do, dl, len(dts), gc, go, gl, len(gts), crowd, out)
        return out.reshape(len(dts), len(gts))
    out = np.zeros((len(dts), len(gts)))
    for j, g in enumerate(gts):
        ga = area(g)
        for i, d in enumerate(dts):
            da = area(d)
            inter = _intersection_area(d, g)
            denom = da if iscrowd[j] else da + ga - inter
            out[i, j] = inter / denom if denom > 0 else 0.0
    return out


# ----------------------------------------------------------- polygons
def frPoly(poly: Sequence[float], h: int, w: int) -> RLE:
    """Rasterize one polygon [x0, y0, x1, y1, ...] into an RLE via even-odd
    filling at pixel centers (cocoapi rleFrPoly equivalent)."""
    xs = np.asarray(poly[0::2], np.float64)
    ys = np.asarray(poly[1::2], np.float64)
    n = len(xs)
    mask = np.zeros((h, w), np.uint8)
    if n < 3:
        return encode(mask)

    # Even-odd scanline at pixel centers (x+0.5 is handled by testing the
    # center y = row + 0.5 against each edge).
    px = np.arange(w) + 0.5
    x1, y1 = xs, ys
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    for row in range(h):
        cy = row + 0.5
        cond = (y1 <= cy) != (y2 <= cy)
        if not cond.any():
            continue
        xi = x1[cond] + (cy - y1[cond]) * (x2[cond] - x1[cond]) / (y2[cond] - y1[cond])
        inside = (xi[None, :] > px[:, None]).sum(axis=1) % 2 == 1
        mask[row] = inside
    return encode(mask)


def frPolys(polys: Sequence[Sequence[float]], h: int, w: int) -> RLE:
    """Union of several polygon parts (COCO multi-part segmentation)."""
    return merge([frPoly(p, h, w) for p in polys])


def masks_from_segmentation(segm, h: int, w: int) -> np.ndarray:
    """GT mask from a COCO segmentation field (polygons or RLE)."""
    if isinstance(segm, list):
        return decode(frPolys(segm, h, w))
    if isinstance(segm, dict):
        return decode(segm)
    raise TypeError(type(segm))


# ----------------------------------------------------------- nms
def bbNms(boxes: np.ndarray, thr: float) -> np.ndarray:
    """Greedy NMS over xywh boxes (maskApi.h bbNms). Returns keep mask."""
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    n = len(boxes)
    keep = np.ones(n, bool)
    x1, y1 = boxes[:, 0], boxes[:, 1]
    x2, y2 = boxes[:, 0] + boxes[:, 2], boxes[:, 1] + boxes[:, 3]
    areas = boxes[:, 2] * boxes[:, 3]
    for i in range(n):
        if not keep[i]:
            continue
        for j in range(i + 1, n):
            if not keep[j]:
                continue
            iw = min(x2[i], x2[j]) - max(x1[i], x1[j])
            ih = min(y2[i], y2[j]) - max(y1[i], y1[j])
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = areas[i] + areas[j] - inter
            if union > 0 and inter / union > thr:
                keep[j] = False
    return keep


def rleNms(rles: Sequence[RLE], thr: float) -> np.ndarray:
    """Greedy NMS over RLE masks (maskApi.h rleNms). Returns keep mask."""
    n = len(rles)
    keep = np.ones(n, bool)
    if n == 0:
        return keep
    # Pairwise IoUs don't depend on suppression state: one matrix call.
    ious = iou_matrix(rles, rles, np.zeros(n, bool))
    for i in range(n):
        if not keep[i]:
            continue
        for j in range(i + 1, n):
            if keep[j] and ious[j, i] > thr:
                keep[j] = False
    return keep
