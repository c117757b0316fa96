import jax
import jax.numpy as jnp
import numpy as np

from detectinblur_tpu.models.classifier import (
    estimator_label,
    estimator_label_lehe,
    estimator_to_model_index_16,
    model_index_oracle,
)
from detectinblur_tpu.models.ensemble import stack_params, select_params
from detectinblur_tpu.ops.normalization import get_norm_params, CANONICAL_STD


def test_estimator_label_16():
    blurring = jnp.array([True, True, False, True])
    param = jnp.array([0, 2, -1, 1])
    frac = jnp.array([0, 4, -1, -1])
    labels = np.asarray(estimator_label(blurring, param, frac))
    # param*5 + frac + 1; clean and negligible-exposure -> 0.
    np.testing.assert_array_equal(labels, [1, 15, 0, 0])


def test_estimator_label_lehe():
    blurring = jnp.array([True, True, True, False])
    param = jnp.array([0, 1, 2, -1])
    frac = jnp.array([2, 3, 4, -1])
    labels = np.asarray(estimator_label_lehe(blurring, param, frac))
    # Low exposure (frac<3) -> 0; else param+1.
    np.testing.assert_array_equal(labels, [0, 2, 3, 0])


def test_estimator_to_model_index():
    preds = jnp.arange(16)
    idx = np.asarray(estimator_to_model_index_16(preds))
    np.testing.assert_array_equal(idx[0], 0)
    np.testing.assert_array_equal(idx[1:6], 1)
    np.testing.assert_array_equal(idx[6:11], 2)
    np.testing.assert_array_equal(idx[11:16], 3)


def test_oracle_dispatch():
    blurring = jnp.array([False, True, True, True])
    param = jnp.array([-1, 0, 2, 1])
    frac = jnp.array([-1, 2, 4, -1])
    idx = np.asarray(model_index_oracle(blurring, param, frac))
    # engine.py:171-192: fraction -1 -> model 0; else param+1.
    np.testing.assert_array_equal(idx, [0, 1, 3, 0])


def test_stack_select_params():
    trees = [{"a": jnp.full((2, 2), float(i)), "b": {"c": jnp.full(3, float(i))}}
             for i in range(4)]
    stacked = stack_params(trees)
    assert stacked["a"].shape == (4, 2, 2)
    sel = select_params(stacked, jnp.asarray(2))
    np.testing.assert_allclose(np.asarray(sel["a"]), 2.0)
    np.testing.assert_allclose(np.asarray(sel["b"]["c"]), 2.0)


def test_ensemble_predict_expands_gt_and_dispatches():
    """Under --use_ensemble the reference still applies the expanded-GT
    rewrite and the blur chain (engine.py:319-342); the jitted ensemble
    step must return the PSF-expanded GT, not the raw one."""
    import jax

    import __graft_entry__ as ge
    from detectinblur_tpu.models.ensemble import (
        make_ensemble_predict,
        stack_params,
    )
    from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from detectinblur_tpu.models.roi_heads import BoxHeadConfig
    from detectinblur_tpu.models.rpn import RPNConfig
    from detectinblur_tpu.ops.boxes import expand_boxes_by_psf

    cfg = FasterRCNNConfig(
        min_size=64, max_size=64,
        rpn=RPNConfig(pre_nms_top_n_train=200, post_nms_top_n_train=100,
                      pre_nms_top_n_test=200, post_nms_top_n_test=100),
        box=BoxHeadConfig(batch_size_per_image=64, nms_pool=256,
                          detections_per_img=20),
    )
    model = FasterRCNN(cfg)
    params = model.init(jax.random.key(0), bucket=(64, 64))
    stacked = stack_params([params] * 4)
    batch = ge._tiny_batch(1, 64, 64, seed=5)
    batch = batch._replace(blurring=jnp.ones(1, bool),
                           param_index=jnp.array([2]),
                           fraction_index=jnp.array([4]))

    step = make_ensemble_predict(model, (64, 64), estimator=None, lehe=True,
                                 expand_target_boxes=True)
    dets, gt, idx = step(stacked, None, batch)
    expected = expand_boxes_by_psf(batch.gt_boxes[0], batch.psfs[0],
                                   True, batch.hw[0, 0], batch.hw[0, 1])
    np.testing.assert_allclose(np.asarray(gt[0]), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(gt), np.asarray(batch.gt_boxes))
    # Oracle dispatch (engine.py:171-192): param 2, high exposure -> model 3.
    assert int(idx) == 3
    assert np.asarray(dets.boxes).shape[0] == 1


def test_norm_params_lookup():
    blurring = jnp.array([True, True, False, True])
    param = jnp.array([0, 2, -1, 1])
    frac = jnp.array([0, 4, -1, -1])
    means, stds = get_norm_params(blurring, param, frac)
    m, s = np.asarray(means), np.asarray(stds)
    np.testing.assert_allclose(m, np.tile([0.485, 0.456, 0.406], (4, 1)), atol=1e-6)
    # Clean & negligible-exposure rows use canonical stds.
    np.testing.assert_allclose(s[2], CANONICAL_STD, atol=1e-6)
    np.testing.assert_allclose(s[3], CANONICAL_STD, atol=1e-6)
    # Blurred rows use table column fraction_index+1, rescaled by .229/.2384.
    np.testing.assert_allclose(s[0], np.array([0.2337, 0.2288, 0.2325]) * 0.229 / 0.2384,
                               atol=1e-6)
    np.testing.assert_allclose(s[1], np.array([0.1824, 0.1790, 0.1838]) * 0.229 / 0.2384,
                               atol=1e-6)


def test_blur_batch_images_resize_roundtrip():
    """--resize_images blurs at min-side-800 scale and returns the image at
    its original size (engine_blur_estimator.py:27-70). With a delta PSF the
    blur is the identity, so the resize round trip must approximately
    reproduce the input; non-blurring images must pass through bit-exact."""
    import jax

    from detectinblur_tpu.train.estimator_engine import blur_batch_images
    import __graft_entry__ as ge

    batch = ge._tiny_batch(2, 64, 96, seed=11)
    psf = jnp.zeros((2, 128, 128), jnp.float32).at[:, 63, 63].set(1.0)
    batch = batch._replace(psfs=psf,
                           blurring=jnp.array([True, False]))
    out = jax.jit(lambda b: blur_batch_images(b, resize_images=True))(batch)
    h, w = int(batch.hw[0, 0]), int(batch.hw[0, 1])
    np.testing.assert_allclose(
        np.asarray(out[0, :h, :w]), np.asarray(batch.images[0, :h, :w]),
        atol=0.06)
    np.testing.assert_array_equal(np.asarray(out[1]),
                                  np.asarray(batch.images[1]))


def test_estimator_resize_canvas_honors_min_side_800():
    """Regression: the blur canvas must never clamp the min-side-800 scale
    for images whose aspect differs from the bucket's (finding: (427, 640)
    in a (480, 640) bucket was blurred at min-side 726). For any hw with
    aspect <= 2 the scale min(800/min(h,w), RH/h, RW/w) must equal
    800/min(h,w) exactly."""
    from detectinblur_tpu.train.estimator_engine import estimator_resize_canvas

    for Hb, Wb in [(480, 640), (640, 480), (672, 672), (512, 672)]:
        RH, RW = estimator_resize_canvas(Hb, Wb)
        assert RH % 32 == 0 and RW % 32 == 0
        for h, w in [(427, 640), (Hb, Wb), (240, 480), (480, 240),
                     (333, 640), (505, 510)]:
            if h > Hb or w > Wb or max(h, w) / min(h, w) > 2.0:
                continue
            target = 800.0 / min(h, w)
            sc = min(target, RH / h, RW / w)
            assert sc == target, (Hb, Wb, h, w, sc, target)


def test_preprocess_batch_crop_and_normalize_toggles():
    """crop_images batches to the min /32 extent with zeros beyond
    (net_transforms.py:218-247); normalize=False skips mean/std
    (net_transforms.py:70-80)."""
    import jax

    from detectinblur_tpu.models.detection_transform import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        preprocess_batch,
    )

    key = jax.random.key(0)
    images = jax.random.uniform(key, (2, 96, 96, 3))
    hw = jnp.array([[96, 96], [48, 72]])
    out, new_hw = preprocess_batch(images, hw, (128, 128),
                                   min_size=100, max_size=133)
    out_c, new_hw_c = preprocess_batch(images, hw, (128, 128),
                                       min_size=100, max_size=133,
                                       crop_images=True)
    nh = np.asarray(new_hw)
    mh, mw = (nh[:, 0].min() // 32) * 32, (nh[:, 1].min() // 32) * 32
    np.testing.assert_array_equal(np.asarray(new_hw_c),
                                  np.tile([mh, mw], (2, 1)))
    np.testing.assert_allclose(np.asarray(out_c[:, :mh, :mw]),
                               np.asarray(out[:, :mh, :mw]), atol=1e-6)
    assert np.all(np.asarray(out_c)[:, mh:] == 0)
    assert np.all(np.asarray(out_c)[:, :, mw:] == 0)

    raw, _ = preprocess_batch(images, hw, (128, 128),
                              min_size=100, max_size=133, normalize=False)
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    np.testing.assert_allclose(np.asarray(out[:, :40, :40]),
                               (np.asarray(raw[:, :40, :40]) - mean) / std,
                               atol=1e-4)


def test_estimator_label_lehe_stored_override():
    """A stored blur_est_label wins over the derived LEHE label
    (engine_blur_estimator.py:111-112); -1 means "not stored"."""
    from detectinblur_tpu.models.classifier import estimator_label_lehe

    blurring = jnp.array([True, True, False, False])
    param = jnp.array([1, 1, -1, -1])
    frac = jnp.array([4, 4, -1, -1])
    est = jnp.array([3, -1, 2, -1])
    labels = np.asarray(estimator_label_lehe(blurring, param, frac, est))
    np.testing.assert_array_equal(labels, [3, 2, 2, 0])


def test_apply_corruptions_per_image_draws():
    """Corruption randomness is per IMAGE, like the reference's per-image
    manual_blur calls (blur_functions.py:72-88): two images in one batch
    get different noise fields / block scales, and the same key reproduces
    them exactly (VERDICT r2 item 3b)."""
    from detectinblur_tpu.train.estimator_engine import apply_corruptions

    rng = np.random.default_rng(0)
    base = jnp.asarray(np.tile(rng.random((1, 24, 24, 3)), (2, 1, 1, 1)),
                       jnp.float32)  # identical images
    key = jax.random.key(42)
    noised = apply_corruptions(key, base, add_noise=True, noise_level=0.01)
    a, b = np.asarray(noised[0]), np.asarray(noised[1])
    assert not np.allclose(a, b), "noise must differ per image"
    # Noise VARIANCE differs per image too (per-image var draw), not just
    # the field: compare per-image std of the delta.
    d0 = (a - np.asarray(base[0])).std()
    d1 = (b - np.asarray(base[1])).std()
    assert abs(d0 - d1) > 1e-5
    # Deterministic given the key.
    again = apply_corruptions(key, base, add_noise=True, noise_level=0.01)
    np.testing.assert_array_equal(np.asarray(noised), np.asarray(again))
    # Fresh key -> fresh draws.
    other = apply_corruptions(jax.random.key(7), base, add_noise=True,
                              noise_level=0.01)
    assert not np.allclose(np.asarray(noised), np.asarray(other))


def test_apply_corruptions_block_and_jpeg_per_image():
    """Block decision/scale and JPEG decision/quality draw per image: over
    a batch of identical images some get corrupted and some don't."""
    from detectinblur_tpu.train.estimator_engine import apply_corruptions

    rng = np.random.default_rng(1)
    one = rng.random((1, 32, 32, 3))
    base = jnp.asarray(np.tile(one, (16, 1, 1, 1)), jnp.float32)
    out = apply_corruptions(jax.random.key(3), base, add_block=True)
    changed = [not np.allclose(np.asarray(out[i]), one[0], atol=1e-6)
               for i in range(16)]
    assert any(changed) and not all(changed), (
        "with p=.5 per image, 16 identical images should split")
    outj = apply_corruptions(jax.random.key(5), base, add_jpeg=True)
    deltas = [float(jnp.abs(outj[i] - base[i]).max()) for i in range(16)]
    hit = [d > 1e-6 for d in deltas]
    assert any(hit) and not all(hit)
    # JPEG quality differs among corrupted images.
    hits = sorted(d for d in deltas if d > 1e-6)
    assert len(set(np.round(hits, 7))) > 1
