import numpy as np
import pytest

from detectinblur_tpu.data.batching import (
    build_blur_batch,
    hflip_item,
    model_bucket_for,
    pick_bucket,
)
from detectinblur_tpu.data.blur_sampling import (
    BlurPolicy,
    sample_blur_decision,
)
from detectinblur_tpu.data.loader import DetectionLoader


class FakeDataset:
    """In-memory dataset mimicking data.coco.CocoDetection's item dicts."""

    def __init__(self, rng, n=16, hw=(120, 160)):
        self.items = []
        for i in range(n):
            h = int(hw[0] + rng.integers(-20, 20))
            w = int(hw[1] + rng.integers(-20, 20))
            boxes = np.array([[5, 5, 50, 40], [20, 30, 90, 80]], np.float32)
            self.items.append({
                "image": rng.random((h, w, 3)).astype(np.float32),
                "image_id": i + 1,
                "boxes": boxes,
                "labels": np.array([1, 3], np.int32),
                "area": np.array([100.0, 200.0], np.float32),
                "iscrowd": np.zeros(2, np.int32),
            })

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_pick_bucket():
    buckets = ((512, 672), (672, 512), (672, 672))
    assert pick_bucket(480, 640, buckets) == (512, 672)
    assert pick_bucket(640, 480, buckets) == (672, 512)
    assert pick_bucket(600, 600, buckets) == (672, 672)
    assert pick_bucket(900, 900, buckets) == (672, 672)  # fallback: largest


def test_model_bucket_for():
    hb, wb = model_bucket_for((512, 672), min_size=800, max_size=1333)
    assert hb % 32 == 0 and wb % 32 == 0
    # Everything in the source bucket fits after min/max-side resize.
    assert hb >= 800 and wb >= 1024


def test_model_bucket_for_batch_fits_every_resized_image():
    from detectinblur_tpu.data.batching import (
        model_bucket_for_batch,
        resized_hw_np,
    )

    # 427x640 (a very common COCO shape) resizes to 800x1199 under the
    # torchvision rule — beyond the (512, 672) source bucket's 800x1056
    # model shape. The per-batch bucket must fit it exactly.
    assert resized_hw_np(427, 640) == (800, 1199)
    hb, wb = model_bucket_for_batch([[427, 640]])
    assert hb % 64 == 0 and wb % 64 == 0
    assert hb >= 800 and wb >= 1199
    # Batch bucket = max over the batch's resized extents.
    hb2, wb2 = model_bucket_for_batch([[427, 640], [480, 640], [512, 672]])
    assert (hb2, wb2) >= (hb, wb)
    for h, w in ((427, 640), (480, 640), (512, 672)):
        rh, rw = resized_hw_np(h, w)
        assert rh <= hb2 and rw <= wb2


def test_resize_clamp_preserves_aspect():
    """An off-aspect image overflowing its model bucket is scaled DOWN to
    fit, never squashed along one axis (the reference resize distorts
    nothing, net_transforms.py:151-175)."""
    import jax.numpy as jnp

    from detectinblur_tpu.models.detection_transform import preprocess_batch

    img = np.zeros((1, 512, 672, 3), np.float32)
    img[0, :427, :640] = 1.0
    # 427x640 -> torch-exact 800x1199, but the bucket is only (800, 1056).
    _, new_hw = preprocess_batch(
        jnp.asarray(img), jnp.asarray([[427, 640]]), (800, 1056))
    nh, nw = int(new_hw[0, 0]), int(new_hw[0, 1])
    assert nh <= 800 and nw <= 1056
    aspect_in, aspect_out = 640 / 427, nw / nh
    assert abs(aspect_out - aspect_in) / aspect_in < 0.01
    # In the exact per-batch bucket nothing is clamped: torch dims verbatim.
    _, new_hw = preprocess_batch(
        jnp.asarray(img), jnp.asarray([[427, 640]]), (832, 1216))
    assert (int(new_hw[0, 0]), int(new_hw[0, 1])) == (800, 1199)


def test_hflip_boxes(rng):
    item = FakeDataset(rng, n=1)[0]
    w = item["image"].shape[1]
    flipped = hflip_item(item)
    np.testing.assert_allclose(flipped["boxes"][:, 0], w - item["boxes"][:, 2])
    np.testing.assert_allclose(flipped["boxes"][:, 2], w - item["boxes"][:, 0])
    np.testing.assert_allclose(flipped["image"], item["image"][:, ::-1])


def test_blur_decision_distribution(rng):
    policy = BlurPolicy.training_default()  # prob 0.9
    decs = [sample_blur_decision(rng, policy) for _ in range(2000)]
    frac_blurred = np.mean([d.blurring for d in decs])
    assert 0.86 < frac_blurred < 0.94
    ps = [d.param_index for d in decs if d.blurring]
    assert set(ps) == {0, 1, 2}
    fs = [d.fraction_index for d in decs if d.blurring]
    assert set(fs) == {0, 1, 2, 3, 4}


def test_blur_decision_regimes(rng):
    high = BlurPolicy.training_default(high=True)
    decs = [sample_blur_decision(rng, high) for _ in range(500)]
    assert all(d.fraction_index >= 3 for d in decs if d.blurring)
    assert np.mean([d.blurring for d in decs]) > 0.97  # prob 1.0

    low = BlurPolicy.training_default(low=True)
    decs = [sample_blur_decision(rng, low) for _ in range(500)]
    assert all(d.fraction_index <= 2 for d in decs if d.blurring)


def test_blur_decision_fixed_sweep(rng):
    policy = BlurPolicy(prob=1.0, blur_type=0.001, blur_exposure=1 / 10)
    d = sample_blur_decision(rng, policy)
    assert d.blurring and d.param_index == 1 and d.fraction_index == 1
    # Negligible exposure tagged -1 (transforms.py:443-446).
    policy = BlurPolicy(prob=1.0, blur_type=0.001, blur_exposure=1 / 100)
    d = sample_blur_decision(rng, policy)
    assert d.fraction_index == -1


def test_loader_batches(rng):
    ds = FakeDataset(rng, n=12)
    bank = rng.random((3, 5, 4, 128, 128)).astype(np.float32)
    loader = DetectionLoader(ds, batch_size=2,
                             policy=BlurPolicy(prob=1.0), psf_bank=bank,
                             source_buckets=((160, 200),), hflip_prob=0.5)
    batches = list(loader)
    assert len(batches) == 6
    batch, bucket, ids = batches[0]
    assert bucket == (160, 200)
    assert batch.images.shape == (2, 160, 200, 3)
    assert batch.psfs.shape == (2, 128, 128)
    assert batch.gt_boxes.shape[0] == 2
    assert len(ids) == 2
    assert bool(np.asarray(batch.blurring).all())
    # Valid sizes recorded.
    assert (np.asarray(batch.hw) > 0).all()


def test_loader_epoch_reshuffle(rng):
    ds = FakeDataset(rng, n=8)
    loader = DetectionLoader(ds, batch_size=1, source_buckets=((160, 200),))
    loader.set_epoch(0)
    ids0 = [ids[0] for _, _, ids in loader]
    loader.set_epoch(1)
    ids1 = [ids[0] for _, _, ids in loader]
    assert sorted(ids0) == sorted(ids1)
    assert ids0 != ids1


def test_loader_workers_bit_identical(rng):
    """num_workers fans decode/augment over threads; per-item RNG keyed on
    (seed, epoch, host, position) keeps batches bit-identical to the
    sequential path — blur decisions, hflips, and PSF picks included."""
    ds = FakeDataset(rng, n=12)
    bank = rng.random((3, 5, 4, 128, 128)).astype(np.float32)

    def run(workers):
        loader = DetectionLoader(ds, batch_size=2,
                                 policy=BlurPolicy(prob=0.7), psf_bank=bank,
                                 source_buckets=((160, 200),),
                                 hflip_prob=0.5, num_workers=workers)
        loader.set_epoch(3)
        return list(loader)

    seq, par = run(0), run(4)
    assert len(seq) == len(par) == 6
    for (b0, bk0, ids0), (b1, bk1, ids1) in zip(seq, par):
        assert bk0 == bk1 and ids0 == ids1
        np.testing.assert_array_equal(np.asarray(b0.images),
                                      np.asarray(b1.images))
        np.testing.assert_array_equal(np.asarray(b0.psfs),
                                      np.asarray(b1.psfs))
        np.testing.assert_array_equal(np.asarray(b0.blurring),
                                      np.asarray(b1.blurring))
        np.testing.assert_array_equal(np.asarray(b0.gt_boxes),
                                      np.asarray(b1.gt_boxes))


def test_load_psf_bank_from_reference_layout(tmp_path):
    """Stored-PSF loading (--use_stored_psfs --stored_psf_directory).

    The reference writes folders P{1-3}E{0-4} (generate_PSFs.py:69:
    "P"+str(paramIndex+1)+"E"+str(fractionIndex)) of extensionless fp16
    I{idx:06d} files (np.save on an open handle, :88-90) and loads the same
    layout (transforms.py:301); 256-canvas PSFs crop to the central 128."""
    import os

    from detectinblur_tpu.data.blur_sampling import load_psf_bank

    rng = np.random.default_rng(3)
    for p in range(1, 4):
        for e in range(0, 5):
            d = tmp_path / f"P{p}E{e}"
            os.makedirs(d)
            for i in range(2):
                psf = np.zeros((256, 256), np.float16)
                psf[120:136, 120:136] = rng.random((16, 16)).astype(np.float16)
                with open(d / f"I{i:06d}", "wb") as f:
                    np.save(f, psf)
    bank = load_psf_bank(str(tmp_path), bank_size=2)
    assert bank.shape == (3, 5, 2, 128, 128)
    assert bank.dtype == np.float32
    # The 256->128 crop keeps the central mass.
    assert bank[0, 0, 0].sum() > 0
    with pytest.raises(FileNotFoundError):
        load_psf_bank(str(tmp_path), bank_size=3)


def test_generate_psfs_cli_roundtrip(tmp_path):
    """cli/generate_psfs.py writes the reference bank layout and
    load_psf_bank reads it back (round 1 shipped an E-index off-by-one
    that broke both directions)."""
    from detectinblur_tpu.cli.generate_psfs import main as gen_main
    from detectinblur_tpu.data.blur_sampling import load_psf_bank

    gen_main(["--output_path", str(tmp_path), "--num_psfs", "2",
              "--canvas", "128", "--max_len", "48", "--crop", "0",
              "--batch", "2"])
    # Reference folder names present, extensionless files inside.
    assert (tmp_path / "P1E0" / "I000000").exists()
    assert (tmp_path / "P3E4" / "I000001").exists()
    bank = load_psf_bank(str(tmp_path))
    assert bank.shape == (3, 5, 2, 128, 128)
    # Each PSF integrates to ~1 after the 64-canvas is placed in the
    # 128 frame (sample_psf normalizes by iters; full exposure bins sum to 1,
    # short exposures to ~fraction).
    assert np.isfinite(bank).all() and (bank >= 0).all()
    assert bank[2, 4].sum(axis=(-1, -2)).min() > 0.5


def test_eval_bank_rasterizes_exact_sweep_exposure():
    """The eval sweep must rasterize PSFs at the ACTUAL sweep fraction
    (reference evaluate.py:299-322 -> transforms.py:316-335): the E1 cell
    blurs at exposure 1/25, not the nearest training fraction 1/18. PSF
    mass (pre-normalization) equals the exposure fraction, so the bank's
    per-PSF sums pin the rasterized exposure."""
    import jax

    from detectinblur_tpu.data.blur_sampling import generate_psf_bank
    from detectinblur_tpu.ops.psf import EVAL_FRACTIONS

    bank = generate_psf_bank(jax.random.key(0), bank_size=4,
                             params=(0.001,),
                             fractions=(EVAL_FRACTIONS[1],), batch=4)
    mass = np.asarray(bank[0, 0].sum(axis=(-1, -2)))
    np.testing.assert_allclose(mass, 1 / 25, rtol=0.08)
    # Clearly distinguishable from a training-fraction (1/18) bank.
    assert np.all(np.abs(mass - 1 / 18) > np.abs(mass - 1 / 25))


def test_get_coco_kp_targets(tmp_path):
    """Keypoint dataset wiring (coco_utils.get_coco_kp)."""
    import json
    import os

    from PIL import Image

    from detectinblur_tpu.data.coco import get_coco_kp

    os.makedirs(tmp_path / "val2017")
    os.makedirs(tmp_path / "annotations")
    Image.fromarray(np.zeros((60, 80, 3), np.uint8)).save(
        tmp_path / "val2017" / "000000000001.jpg")
    kps = [float(v) for v in np.tile([30.0, 20.0, 2.0], 17)]
    ann = {"images": [{"id": 1, "file_name": "000000000001.jpg",
                       "height": 60, "width": 80}],
           "categories": [{"id": 1, "name": "person"}],
           "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                            "bbox": [10.0, 10.0, 40.0, 30.0], "area": 1200.0,
                            "iscrowd": 0, "keypoints": kps,
                            "num_keypoints": 17}]}
    with open(tmp_path / "annotations" / "person_keypoints_val2017.json", "w") as f:
        json.dump(ann, f)
    ds = get_coco_kp(str(tmp_path), "val")
    item = ds[0]
    assert item["keypoints"].shape == (1, 17, 3)
    assert item["keypoints"][0, 0, 2] == 2.0


def test_loader_crop_clips_boxes(rng):
    """Oversized images are top-left-cropped to the largest bucket; GT boxes
    must be clipped to the crop and fully-out-of-frame boxes dropped
    (loader.py oversize path)."""
    ds = FakeDataset(rng, n=2, hw=(120, 160))
    for it in ds.items:
        it["image"] = rng.random((150, 200, 3)).astype(np.float32)
        it["boxes"] = np.array([[5, 5, 50, 40],       # inside the crop
                                [70, 60, 190, 140],   # straddles the edge
                                [130, 110, 190, 140]],  # fully outside
                               np.float32)
        it["labels"] = np.array([1, 3, 4], np.int32)
        it["area"] = np.ones(3, np.float32)
        it["iscrowd"] = np.zeros(3, np.int32)
        it["keypoints"] = np.arange(3 * 17 * 3, dtype=np.float32).reshape(3, 17, 3)
    loader = DetectionLoader(ds, batch_size=2, policy=BlurPolicy(prob=0.0),
                             psf_bank=None, source_buckets=((96, 128),))
    (batch, bucket, _), = list(loader)
    assert bucket == (96, 128)
    valid = np.asarray(batch.gt_valid[0])
    boxes = np.asarray(batch.gt_boxes[0])[valid]
    assert valid.sum() == 2  # the fully-outside box is gone
    assert (boxes[:, [0, 2]] <= 128).all() and (boxes[:, [1, 3]] <= 96).all()
    np.testing.assert_allclose(boxes[1], [70, 60, 128, 96])
    # Every per-instance array must shrink with the boxes — a stale
    # 'keypoints' of length 3 would pair instance i with wrong keypoints.
    item, _, _ = loader._prepare(0, 0)
    assert len(item["keypoints"]) == len(item["boxes"]) == 2
    np.testing.assert_allclose(item["keypoints"][1, 0, 0], 17 * 3)


def test_load_psf_bank_epoch_restride(tmp_path):
    """When the stored bank is larger than max_bank, successive epochs
    stride through DISJOINT slices (epoch % stride offset), so training
    over many epochs sees the full 12000/bin reference bank instead of a
    fixed subset (VERDICT r2 item 7; reference draws uniformly from all
    12000, transforms.py:298-309)."""
    import os

    from detectinblur_tpu.data.blur_sampling import load_psf_bank

    for p in range(1, 4):
        for e in range(0, 5):
            d = tmp_path / f"P{p}E{e}"
            os.makedirs(d)
            for i in range(8):
                psf = np.full((128, 128), float(i), np.float16)
                with open(d / f"I{i:06d}", "wb") as f:
                    np.save(f, psf)
    b0 = load_psf_bank(str(tmp_path), max_bank=4, epoch=0)
    b1 = load_psf_bank(str(tmp_path), max_bank=4, epoch=1)
    assert b0.shape == b1.shape == (3, 5, 4, 128, 128)
    ids0 = sorted(set(b0[0, 0, :, 0, 0].astype(int)))
    ids1 = sorted(set(b1[0, 0, :, 0, 0].astype(int)))
    assert ids0 == [0, 2, 4, 6] and ids1 == [1, 3, 5, 7]
    # epoch cycles modulo the stride; HBM footprint unchanged.
    b2 = load_psf_bank(str(tmp_path), max_bank=4, epoch=2)
    np.testing.assert_array_equal(b2, b0)


def test_gt_bucket_for_batch():
    """GT arrays pad to the batch's bucket, not to max_gt=100: the train
    step's assignment cost scales with the static G dimension (the real
    loader-fed step measured 2.7x slower at G=100 than at G=16 for
    typical <=16-box batches)."""
    from detectinblur_tpu.data.batching import (build_blur_batch,
                                                gt_bucket_for_batch)
    from detectinblur_tpu.data.blur_sampling import BlurDecision

    assert gt_bucket_for_batch([1, 3]) == 8
    assert gt_bucket_for_batch([9]) == 16
    assert gt_bucket_for_batch([17, 2]) == 32
    assert gt_bucket_for_batch([64]) == 64
    assert gt_bucket_for_batch([99, 150]) == 100
    assert gt_bucket_for_batch([]) == 8
    assert gt_bucket_for_batch([30], max_gt=20) == 20  # cap wins

    rng = np.random.default_rng(0)
    items = [{
        "image": rng.random((40, 50, 3)).astype(np.float32),
        "image_id": i,
        "boxes": np.tile([[1.0, 1.0, 9.0, 9.0]], (n, 1)).astype(np.float32),
        "labels": np.ones(n, np.int32),
    } for i, n in enumerate((3, 11))]
    decs = [BlurDecision(False, -1, -1, 0)] * 2
    batch = build_blur_batch(items, decs, None, (40, 50))
    assert batch.gt_boxes.shape == (2, 16, 4)
    assert batch.gt_valid.sum() == 14

    # Multi-host SPMD requires every host to feed the same program shape
    # each step, so bucket_gt=False must keep the fixed max_gt pad.
    fixed = build_blur_batch(items, decs, None, (40, 50), bucket_gt=False)
    assert fixed.gt_boxes.shape == (2, 100, 4)


def test_uint8_image_transport(rng):
    """Batches ship images as uint8 (4x less h2d traffic; the reference
    pipeline stays PIL-uint8 until ToTensor, transforms.py:173-176) and
    the device entry rescale recovers the f32 0..1 convention exactly for
    uint8-decoded sources; direct-f32 batches pass through untouched."""
    import jax.numpy as jnp

    from detectinblur_tpu.data.batching import build_blur_batch
    from detectinblur_tpu.data.blur_sampling import BlurDecision
    from detectinblur_tpu.train.engine import images01

    u8 = rng.integers(0, 256, (40, 50, 3)).astype(np.uint8)
    items = [{"image": u8, "image_id": 0,
              "boxes": np.array([[1.0, 1.0, 9.0, 9.0]], np.float32),
              "labels": np.ones(1, np.int32)},
             {"image": u8.astype(np.float32) / 255.0, "image_id": 1,
              "boxes": np.array([[1.0, 1.0, 9.0, 9.0]], np.float32),
              "labels": np.ones(1, np.int32)}]
    decs = [BlurDecision(False, -1, -1, 0)] * 2
    batch = build_blur_batch(items, decs, None, (40, 50))
    assert batch.images.dtype == jnp.uint8
    # uint8 items copy bit-exact; f32 items that came from a uint8 decode
    # round-trip to the identical bytes.
    np.testing.assert_array_equal(np.asarray(batch.images[0]), u8)
    np.testing.assert_array_equal(np.asarray(batch.images[1]), u8)
    dec = images01(batch)
    assert dec.images.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(dec.images[0]),
                                  u8.astype(np.float32) / 255.0)
    # Direct-f32 batches (tests, synthetic paths) pass through unchanged.
    f32_batch = batch._replace(images=jnp.asarray(batch.images, jnp.float32))
    assert images01(f32_batch).images is f32_batch.images


def test_multihost_loader_keeps_fixed_gt_shape(rng):
    """A num_processes>1 DetectionLoader must emit max_gt-padded GT arrays
    (host-local G buckets would desynchronize the SPMD programs)."""
    ds = FakeDataset(rng, n=8)
    shapes = set()
    for p in range(2):
        loader = DetectionLoader(ds, batch_size=2, policy=BlurPolicy(prob=0.0),
                                 shuffle=False, num_processes=2,
                                 process_index=p, drop_last=False)
        for batch, _, _ in loader:
            shapes.add(batch.gt_boxes.shape[1])
    assert shapes == {100}
