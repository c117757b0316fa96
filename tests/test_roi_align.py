import jax.numpy as jnp
import numpy as np

from detectinblur_tpu.ops.roi_align import roi_align_single_level, multiscale_roi_align


def numpy_roi_align_oracle(feature_hwc, boxes, spatial_scale, out_size=7, ratio=2):
    """torch roi_align (aligned=False) semantics in plain numpy."""
    H, W, C = feature_hwc.shape
    R = len(boxes)
    out = np.zeros((R, out_size, out_size, C), np.float32)

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C, np.float32)
        y = max(y, 0.0)
        x = max(x, 0.0)
        y_lo, x_lo = int(y), int(x)
        if y_lo >= H - 1:
            y_hi = y_lo = H - 1
            y = float(y_lo)
        else:
            y_hi = y_lo + 1
        if x_lo >= W - 1:
            x_hi = x_lo = W - 1
            x = float(x_lo)
        else:
            x_hi = x_lo + 1
        ly, lx = y - y_lo, x - x_lo
        hy, hx = 1 - ly, 1 - lx
        return (feature_hwc[y_lo, x_lo] * hy * hx + feature_hwc[y_lo, x_hi] * hy * lx
                + feature_hwc[y_hi, x_lo] * ly * hx + feature_hwc[y_hi, x_hi] * ly * lx)

    for r, (bx1, by1, bx2, by2) in enumerate(boxes):
        x1, y1 = bx1 * spatial_scale, by1 * spatial_scale
        x2, y2 = bx2 * spatial_scale, by2 * spatial_scale
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bw, bh = rw / out_size, rh / out_size
        for i in range(out_size):
            for j in range(out_size):
                acc = np.zeros(C, np.float32)
                for iy in range(ratio):
                    for ix in range(ratio):
                        y = y1 + i * bh + (iy + 0.5) * bh / ratio
                        x = x1 + j * bw + (ix + 0.5) * bw / ratio
                        acc += bilinear(y, x)
                out[r, i, j] = acc / (ratio * ratio)
    return out


def test_single_level_matches_oracle(rng):
    feat = rng.random((20, 24, 5), dtype=np.float32)
    boxes = np.array(
        [
            [4.0, 8.0, 60.0, 70.0],
            [0.0, 0.0, 16.0, 16.0],
            [30.0, 10.0, 31.0, 11.0],   # tiny roi -> clamped to 1
            [-4.0, -4.0, 100.0, 90.0],  # spills outside
        ],
        np.float32,
    )
    ours = np.asarray(roi_align_single_level(jnp.asarray(feat), jnp.asarray(boxes), 0.25))
    oracle = numpy_roi_align_oracle(feat, boxes, 0.25)
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_multiscale_levels_and_values(rng):
    C = 4
    feats = [
        rng.random((64, 80, C), dtype=np.float32),   # P2, stride 4
        rng.random((32, 40, C), dtype=np.float32),   # P3, stride 8
        rng.random((16, 20, C), dtype=np.float32),   # P4, stride 16
        rng.random((8, 10, C), dtype=np.float32),    # P5, stride 32
    ]
    # Areas chosen to land on each level: sqrt(area)/224 -> 2^(lvl-4).
    boxes = np.array(
        [
            [10, 10, 10 + 40, 10 + 40],      # sqrt=40   -> lvl 2 (P2)
            [10, 10, 10 + 100, 10 + 100],    # sqrt=100  -> lvl 2/3 boundary
            [0, 0, 224, 224],                # sqrt=224  -> lvl 4 (P4)
            [0, 0, 300, 310],                # big       -> lvl 5 (P5)
        ],
        np.float32,
    )
    ours = np.asarray(multiscale_roi_align([jnp.asarray(f) for f in feats], jnp.asarray(boxes)))
    assert ours.shape == (4, 7, 7, C)

    # Per-roi expected level per torchvision LevelMapper.
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    lvls = np.clip(np.floor(4 + np.log2(np.sqrt(areas) / 224 + 1e-6)), 2, 5).astype(int) - 2
    scales = [0.25, 0.125, 0.0625, 0.03125]
    for r in range(4):
        oracle = numpy_roi_align_oracle(feats[lvls[r]], boxes[r : r + 1], scales[lvls[r]])
        np.testing.assert_allclose(ours[r : r + 1], oracle, atol=1e-5)


def test_quad_matches_scattered_on_extreme_boxes(rng):
    """Quad-path stress: slivers, giants, tiny and degenerate boxes — all
    clipped to an 800x1216 image — must match the scattered reference
    gather exactly."""
    C = 8
    H, W = 800, 1216
    feats = [jnp.asarray(rng.random((H // s, W // s, C), dtype=np.float32))
             for s in (4, 8, 16, 32)]

    n = 64
    x1 = rng.uniform(0, W - 1, n)
    y1 = rng.uniform(0, H - 1, n)
    bw = rng.uniform(0.01, W, n)
    bh = rng.uniform(0.01, H, n)
    boxes = np.stack([x1, y1, np.minimum(x1 + bw, W), np.minimum(y1 + bh, H)], 1)
    extreme = np.array(
        [
            [0, 0, W, H],            # whole image
            [0, 390, W, 410],        # full-width sliver (ar ~60)
            [600, 0, 615, H],        # full-height sliver
            [0, 0, W, 8],            # top-edge sliver
            [100, 100, 100.5, 100.5],  # sub-pixel
            [5, 5, 5, 5],            # degenerate (w=h=0)
            [1200, 790, 1216, 800],  # bottom-right corner
        ],
        np.float32,
    )
    boxes = jnp.asarray(np.concatenate([boxes, extreme]).astype(np.float32))

    fast = np.asarray(multiscale_roi_align(feats, boxes, impl="quad"))
    ref = np.asarray(multiscale_roi_align(feats, boxes, impl="scattered"))
    np.testing.assert_allclose(fast, ref, atol=2e-5, rtol=1e-5)
