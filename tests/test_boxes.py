import jax.numpy as jnp
import numpy as np

from detectinblur_tpu.ops.boxes import (
    box_iou,
    box_area,
    xyxy_to_xywh,
    xywh_to_xyxy,
    clip_boxes_to_image,
    encode_boxes,
    decode_boxes,
    fix_box_squeeze,
    expand_boxes_by_psf,
)


def test_iou_basic():
    a = jnp.array([[0.0, 0, 10, 10], [5, 5, 15, 15]])
    b = jnp.array([[0.0, 0, 10, 10], [100, 100, 110, 110]])
    iou = np.asarray(box_iou(a, b))
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[1, 0], 25 / 175, rtol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 0.0)


def test_xywh_roundtrip():
    boxes = jnp.array([[3.0, 4, 10, 20], [0, 0, 5, 5]])
    np.testing.assert_allclose(np.asarray(xywh_to_xyxy(xyxy_to_xywh(boxes))), np.asarray(boxes))


def test_encode_decode_roundtrip(rng):
    props = rng.random((20, 4)).astype(np.float32) * 100
    props[:, 2:] += props[:, :2] + 5
    gts = rng.random((20, 4)).astype(np.float32) * 100
    gts[:, 2:] += gts[:, :2] + 5
    w = (10.0, 10.0, 5.0, 5.0)
    deltas = encode_boxes(jnp.asarray(gts), jnp.asarray(props), w)
    rec = decode_boxes(deltas, jnp.asarray(props), w)
    np.testing.assert_allclose(np.asarray(rec), gts, rtol=1e-4, atol=1e-2)


def test_decode_clamps_log_scale():
    boxes = jnp.array([[0.0, 0, 10, 10]])
    deltas = jnp.array([[0.0, 0, 100.0, 100.0]])  # insane dw/dh
    out = np.asarray(decode_boxes(deltas, boxes, (1.0, 1.0, 1.0, 1.0)))
    assert np.isfinite(out).all()
    assert (out[:, 2] - out[:, 0]) <= 10 * 1000 / 16 + 1


def test_clip():
    boxes = jnp.array([[-5.0, -5, 200, 300]])
    out = np.asarray(clip_boxes_to_image(boxes, 100, 150))
    np.testing.assert_allclose(out, [[0, 0, 150, 100]])


def test_fix_box_squeeze_repairs_degenerate():
    # A box squeezed to zero width gets its edges pushed 1px apart
    # (utils.py:414-421).
    boxes = jnp.array([[50.0, 10, 50, 20], [10, 30, 20, 30]])
    out = np.asarray(fix_box_squeeze(boxes, 100, 100))
    assert (out[:, 2] > out[:, 0]).all()
    assert (out[:, 3] > out[:, 1]).all()
    assert out.min() >= 0 and out[:, [0, 2]].max() <= 99 and out[:, [1, 3]].max() <= 99


def test_expand_boxes_by_psf():
    psf = jnp.zeros((128, 128))
    # Support: x in [60, 70], y in [50, 66] relative to center 63.
    psf = psf.at[50:67, 60:71].set(0.01)
    boxes = jnp.array([[30.0, 30, 60, 60]])
    out = np.asarray(
        expand_boxes_by_psf(boxes, psf, jnp.asarray(True), 200, 200)
    )
    # left edge moves by min_x-63 = -3, right by max_x-63 = +7,
    # top by min_y-63 = -13, bottom by max_y-63 = +3.
    np.testing.assert_allclose(out, [[27, 17, 67, 63]])


def test_expand_passthrough_when_not_blurring():
    psf = jnp.zeros((128, 128)).at[0, 0].set(1.0)
    boxes = jnp.array([[30.0, 30, 60, 60]])
    out = np.asarray(expand_boxes_by_psf(boxes, psf, jnp.asarray(False), 200, 200))
    np.testing.assert_allclose(out, [[30, 30, 60, 60]])
