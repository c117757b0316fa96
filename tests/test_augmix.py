import numpy as np

from detectinblur_tpu.data.augmix import augment_and_mix, _transform_boxes


def test_output_range_and_shape(rng):
    img = rng.random((48, 64, 3)).astype(np.float32)
    out, boxes, masks = augment_and_mix(img, rng)
    assert out.shape == img.shape
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    assert boxes is None and masks is None


def test_mixture_changes_image(rng):
    img = rng.random((48, 64, 3)).astype(np.float32)
    out, _, _ = augment_and_mix(img, rng, severity=8)
    assert np.abs(out - img).max() > 1e-3


def test_boxes_passthrough_without_positional(rng):
    img = rng.random((48, 64, 3)).astype(np.float32)
    boxes = np.array([[5.0, 5, 30, 30]], np.float32)
    out, ob, _ = augment_and_mix(img, rng, boxes=boxes, positional=False,
                              modify_target_boxes=True)
    np.testing.assert_allclose(ob, boxes)


def test_positional_modifies_boxes_validly(rng):
    img = rng.random((64, 64, 3)).astype(np.float32)
    boxes = np.array([[10.0, 10, 40, 40], [20, 30, 50, 60]], np.float32)
    out, ob, _ = augment_and_mix(img, rng, boxes=boxes, positional=True,
                              modify_target_boxes=True, severity=4)
    assert ob.shape == boxes.shape
    # Boxes stay inside the image and non-degenerate after the union.
    assert (ob[:, 0] <= ob[:, 2]).all() and (ob[:, 1] <= ob[:, 3]).all()
    assert ob.min() >= 0 and ob.max() <= 64


def test_transform_boxes_translation():
    boxes = np.array([[10.0, 20, 30, 40]], np.float32)
    fwd = np.array([[1.0, 0, 5], [0, 1, -3]])
    out = _transform_boxes(boxes, fwd, (100, 100))
    np.testing.assert_allclose(out, [[15, 17, 35, 37]])


def test_transform_boxes_rotation_bounds():
    # 90-degree rotation around center of a 100x100 image.
    c = 50.0
    rad = np.pi / 2
    co, si = np.cos(rad), np.sin(rad)
    fwd = np.array([[co, -si, c - co * c + si * c],
                    [si, co, c - si * c - co * c]])
    boxes = np.array([[40.0, 30, 60, 50]], np.float32)
    out = _transform_boxes(boxes, fwd, (100, 100))
    # Under 90-deg rotation the AABB swaps extents around the center.
    np.testing.assert_allclose(out, [[50, 40, 70, 60]], atol=1e-4)


def test_positional_moves_masks_with_boxes(rng):
    """Masks are warped by the same affines as the boxes
    (transforms.py:135-171 warpMasksAndTarget capability); after a
    positional chain, the mask support must sit inside the transformed
    box (box = corner-walk AABB >= mask AABB)."""
    img = np.zeros((64, 64, 3), np.float32)
    masks = np.zeros((1, 64, 64), np.float32)
    masks[0, 20:40, 10:30] = 1.0
    boxes = np.array([[10.0, 20, 30, 40]], np.float32)
    moved = False
    for seed in range(8):
        r = np.random.default_rng(seed)
        _, ob, om = augment_and_mix(img, r, boxes=boxes, positional=True,
                                    modify_target_boxes=True, severity=4,
                                    masks=masks)
        assert om.shape == masks.shape
        ys, xs = np.nonzero(om[0] > 0.1)
        if len(xs) == 0:
            continue
        # Mask extents within the (union) box, with a 2px bilinear margin.
        assert xs.min() >= ob[0, 0] - 2 and xs.max() <= ob[0, 2] + 2
        assert ys.min() >= ob[0, 1] - 2 and ys.max() <= ob[0, 3] + 2
        if not np.allclose(om, masks):
            moved = True
    assert moved


def test_update_boxes_from_masks():
    """utils.py:436-458: box := mask>0.1 extents; empty masks keep the old
    box."""
    from detectinblur_tpu.ops.boxes import update_boxes_from_masks

    masks = np.zeros((2, 32, 32), np.float32)
    masks[0, 5:10, 8:20] = 1.0
    boxes = np.array([[0.0, 0, 4, 4], [1, 2, 3, 4]], np.float32)
    out = np.asarray(update_boxes_from_masks(boxes, masks))
    np.testing.assert_allclose(out[0], [8, 5, 19, 9])
    np.testing.assert_allclose(out[1], [1, 2, 3, 4])  # empty mask: keep
