// Native RLE mask ops — the C++ counterpart of cocoapi/common/maskApi.c
// (reimplemented from the documented run-length semantics, not copied).
//
// RLE convention: column-major scan, counts alternate starting with zeros.
// Exposed as a plain C ABI for ctypes (detectinblur_tpu/eval/rle.py).
//
// The hot op is rleIou for segm evaluation: intersection areas are computed
// directly on the run lists with a two-pointer sweep — O(runs), no decode.

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Encode a column-major [h*w] binary mask. counts_out must hold h*w+1
// entries. Returns the number of counts written.
int rle_encode(const uint8_t* mask, int64_t n, uint32_t* counts_out) {
    int64_t m = 0;
    uint8_t cur = 0;          // runs start with zeros
    int64_t run = 0;
    for (int64_t i = 0; i < n; ++i) {
        uint8_t v = mask[i] ? 1 : 0;
        if (v != cur) {
            counts_out[m++] = (uint32_t)run;
            run = 0;
            cur = v;
        }
        ++run;
    }
    counts_out[m++] = (uint32_t)run;
    return (int)m;
}

// Decode counts into a column-major [n] mask buffer.
void rle_decode(const uint32_t* counts, int m, uint8_t* mask_out) {
    int64_t pos = 0;
    uint8_t v = 0;
    for (int i = 0; i < m; ++i) {
        memset(mask_out + pos, v, counts[i]);
        pos += counts[i];
        v = 1 - v;
    }
}

uint64_t rle_area(const uint32_t* counts, int m) {
    uint64_t a = 0;
    for (int i = 1; i < m; i += 2) a += counts[i];
    return a;
}

// Intersection area of two RLEs over the same canvas: two-pointer sweep
// over run boundaries.
uint64_t rle_intersection(const uint32_t* a, int ma, const uint32_t* b, int mb) {
    uint64_t inter = 0;
    int ia = 0, ib = 0;
    uint64_t enda = a[0], endb = b[0];     // end offset of current run
    uint64_t pos = 0;
    uint8_t va = 0, vb = 0;
    while (ia < ma && ib < mb) {
        uint64_t next = std::min(enda, endb);
        if (va && vb) inter += next - pos;
        pos = next;
        if (enda == next) { ++ia; if (ia < ma) enda += a[ia]; va = 1 - va; }
        if (endb == next) { ++ib; if (ib < mb) endb += b[ib]; vb = 1 - vb; }
    }
    return inter;
}

// IoU matrix between ndt detection RLEs and ngt ground-truth RLEs.
// Inputs are flattened count arrays with per-RLE offsets/lengths.
// iscrowd[g] selects IoA (det area denominator) per COCO protocol.
void rle_iou_matrix(
    const uint32_t* dt_counts, const int64_t* dt_off, const int32_t* dt_len, int ndt,
    const uint32_t* gt_counts, const int64_t* gt_off, const int32_t* gt_len, int ngt,
    const uint8_t* iscrowd, double* out /* [ndt * ngt] */) {
    for (int g = 0; g < ngt; ++g) {
        const uint32_t* gc = gt_counts + gt_off[g];
        uint64_t ga = rle_area(gc, gt_len[g]);
        for (int d = 0; d < ndt; ++d) {
            const uint32_t* dc = dt_counts + dt_off[d];
            uint64_t da = rle_area(dc, dt_len[d]);
            uint64_t inter = rle_intersection(dc, dt_len[d], gc, gt_len[g]);
            double denom = iscrowd[g] ? (double)da : (double)(da + ga - inter);
            out[d * ngt + g] = denom > 0 ? (double)inter / denom : 0.0;
        }
    }
}

// Union/intersection merge of two RLEs -> counts_out (size <= ma+mb+1).
int rle_merge(const uint32_t* a, int ma, const uint32_t* b, int mb,
              int intersect, uint32_t* counts_out) {
    int ia = 0, ib = 0, m = 0;
    uint64_t enda = a[0], endb = b[0];
    uint64_t pos = 0;
    uint8_t va = 0, vb = 0;
    uint8_t cur = 0;
    uint64_t run = 0;
    while (ia < ma && ib < mb) {
        uint64_t next = std::min(enda, endb);
        uint8_t v = intersect ? (va & vb) : (va | vb);
        if (v != cur) { counts_out[m++] = (uint32_t)run; run = 0; cur = v; }
        run += next - pos;
        pos = next;
        if (enda == next) { ++ia; if (ia < ma) enda += a[ia]; va = 1 - va; }
        if (endb == next) { ++ib; if (ib < mb) endb += b[ib]; vb = 1 - vb; }
    }
    counts_out[m++] = (uint32_t)run;
    return m;
}

// Bounding box [x, y, w, h] of an RLE over an h-row canvas.
void rle_to_bbox(const uint32_t* counts, int m, int h, double* bb) {
    int64_t xmin = INT64_MAX, ymin = INT64_MAX, xmax = -1, ymax = -1;
    uint64_t pos = 0;
    uint8_t v = 0;
    for (int i = 0; i < m; ++i) {
        if (v) {
            uint64_t start = pos, end = pos + counts[i] - 1;
            int64_t x0 = (int64_t)(start / h), y0 = (int64_t)(start % h);
            int64_t x1 = (int64_t)(end / h), y1 = (int64_t)(end % h);
            xmin = std::min(xmin, x0); xmax = std::max(xmax, x1);
            if (x0 == x1) { ymin = std::min(ymin, y0); ymax = std::max(ymax, y1); }
            else { ymin = 0; ymax = h - 1; }
        }
        pos += counts[i];
        v = 1 - v;
    }
    if (xmax < 0) { bb[0] = bb[1] = bb[2] = bb[3] = 0; return; }
    bb[0] = (double)xmin; bb[1] = (double)ymin;
    bb[2] = (double)(xmax - xmin + 1); bb[3] = (double)(ymax - ymin + 1);
}

}  // extern "C"
