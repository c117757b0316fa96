import numpy as np

from detectinblur_tpu.data.augmix import augment_and_mix, _transform_boxes


def test_output_range_and_shape(rng):
    img = rng.random((48, 64, 3)).astype(np.float32)
    out, boxes = augment_and_mix(img, rng)
    assert out.shape == img.shape
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    assert boxes is None


def test_mixture_changes_image(rng):
    img = rng.random((48, 64, 3)).astype(np.float32)
    out, _ = augment_and_mix(img, rng, severity=8)
    assert np.abs(out - img).max() > 1e-3


def test_boxes_passthrough_without_positional(rng):
    img = rng.random((48, 64, 3)).astype(np.float32)
    boxes = np.array([[5.0, 5, 30, 30]], np.float32)
    out, ob = augment_and_mix(img, rng, boxes=boxes, positional=False,
                              modify_target_boxes=True)
    np.testing.assert_allclose(ob, boxes)


def test_positional_modifies_boxes_validly(rng):
    img = rng.random((64, 64, 3)).astype(np.float32)
    boxes = np.array([[10.0, 10, 40, 40], [20, 30, 50, 60]], np.float32)
    out, ob = augment_and_mix(img, rng, boxes=boxes, positional=True,
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
