"""End-to-end CLI smoke tests over a synthetic on-disk COCO dataset —
the framework's equivalent of the reference's --early_stop smoke runs
(SURVEY.md §4). The detector is shrunk via monkeypatching so the whole
train->checkpoint->eval cycle compiles in test time."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("coco")
    for split in ("train2017", "val2017"):
        os.makedirs(root / split, exist_ok=True)
    os.makedirs(root / "annotations", exist_ok=True)

    def make_split(split, n):
        images, anns = [], []
        aid = 1
        for i in range(n):
            h, w = 80, 96
            arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            name = f"{i:012d}.jpg"
            Image.fromarray(arr).save(root / split / name)
            images.append({"id": i + 1, "file_name": name,
                           "height": h, "width": w})
            for _ in range(2):
                x, y = rng.uniform(2, 40, 2)
                bw, bh = rng.uniform(10, 30, 2)
                anns.append({
                    "id": aid, "image_id": i + 1,
                    "category_id": int(rng.integers(1, 5)),
                    "bbox": [float(x), float(y), float(bw), float(bh)],
                    "area": float(bw * bh), "iscrowd": 0,
                })
                aid += 1
        cats = [{"id": c, "name": f"c{c}"} for c in range(1, 5)]
        with open(root / "annotations" / f"instances_{split}.json", "w") as f:
            json.dump({"images": images, "annotations": anns,
                       "categories": cats}, f)

    make_split("train2017", 6)
    make_split("val2017", 4)
    return str(root)


@pytest.fixture
def tiny_cli(monkeypatch):
    """Shrink the detector + buckets so CLI runs compile quickly."""
    from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
    import detectinblur_tpu.cli.train as cli_train
    import detectinblur_tpu.cli.evaluate as cli_eval
    import detectinblur_tpu.data.loader as loader_mod

    from detectinblur_tpu.models.roi_heads import BoxHeadConfig
    from detectinblur_tpu.models.rpn import RPNConfig

    def tiny_build(args, bn_mode=None):
        return FasterRCNN(FasterRCNNConfig(
            min_size=96, max_size=96, num_classes=5, bn_mode=bn_mode,
            rpn=RPNConfig(pre_nms_top_n_train=200, post_nms_top_n_train=100,
                          pre_nms_top_n_test=200, post_nms_top_n_test=100),
            box=BoxHeadConfig(batch_size_per_image=64, nms_pool=256,
                              detections_per_img=20),
        ))

    def tiny_model_bucket(b, **kw):
        return (96, 96)

    monkeypatch.setattr(cli_train, "build_model", tiny_build)
    monkeypatch.setattr(cli_eval, "build_model", tiny_build)
    monkeypatch.setattr(cli_train, "model_bucket_for_batch", tiny_model_bucket)
    monkeypatch.setattr(cli_eval, "model_bucket_for_batch", tiny_model_bucket)
    import detectinblur_tpu.data.batching as batching_mod

    monkeypatch.setattr(batching_mod, "DEFAULT_SOURCE_BUCKETS", ((96, 96),))
    # init() default bucket must also be tiny.
    orig_init = FasterRCNN.init
    monkeypatch.setattr(FasterRCNN, "init",
                        lambda self, key, bucket=(96, 96): orig_init(self, key, bucket))
    # Tiny PSF bank instead of a device sweep.
    import detectinblur_tpu.cli.train as ct

    rng = np.random.default_rng(1)
    bank = np.zeros((3, 5, 2, 128, 128), np.float32)
    bank[:, :, :, 60:68, 60:68] = rng.random((3, 5, 2, 8, 8))
    monkeypatch.setattr(ct, "generate_psf_bank", lambda *a, **k: bank)
    monkeypatch.setattr(cli_eval, "generate_psf_bank", lambda *a, **k: bank)
    return tiny_build


def test_train_cli_smoke(coco_root, tiny_cli, tmp_path):
    from detectinblur_tpu.cli.train import main

    out = tmp_path / "out"
    main([
        "--data-path", coco_root, "--blur_train", "--gpu_blur",
        "--expand_target_boxes", "-b", "2", "--epochs", "1",
        "--early_stop", "2", "--output_dir", str(out),
        "--lr", "0.001", "--print-freq", "1", "--eval_first",
    ])
    assert (out / "model_0").exists()


def test_evaluate_cli_vanilla(coco_root, tiny_cli):
    from detectinblur_tpu.cli.evaluate import main

    stats = main(["--data-path", coco_root, "--vanilla_eval",
                  "--early_stop", "4"])
    assert stats.shape == (19,)


def test_evaluate_cli_blur_cell(coco_root, tiny_cli):
    from detectinblur_tpu.cli.evaluate import main

    # One sweep cell only (param_index filter) with tiny early_stop.
    out = main(["--data-path", coco_root, "--blur_eval", "--gpu_blur",
                "--param_index", "1", "--early_stop", "2"])
    assert isinstance(out, dict) and len(out) == 5


@pytest.fixture(scope="module")
def goproblurest_root(tmp_path_factory):
    """Synthetic GOPROBlurEst layout (custom_datasets.py:1074-1231):
    split files of "imagePath,blurLabel" lines, .dat pickled targets."""
    import pickle

    rng = np.random.default_rng(3)
    root = tmp_path_factory.mktemp("goproest")
    lines = {"trainSplit.txt": [], "valSplit.txt": []}
    n = 0
    for split, per_class in (("trainSplit.txt", 2), ("valSplit.txt", 1)):
        for label in range(4):
            for _ in range(per_class):
                sub = "sharp" if label == 0 else "blur"
                os.makedirs(root / sub, exist_ok=True)
                name = str(root / sub / f"{n:05d}.png")
                n += 1
                arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
                Image.fromarray(arr).save(name)
                target = {
                    "boxes": np.array([[4.0, 4.0, 40.0, 40.0]], np.float32),
                    "labels": np.array([1], np.int64),
                }
                if label > 0:
                    target["windowSize"] = 2 * label + 1
                with open(name.replace(".png", ".dat"), "wb") as f:
                    pickle.dump(target, f)
                lines[split].append(f"{name},{label}")
    for fname, ls in lines.items():
        with open(root / fname, "w") as f:
            f.write("\n".join(ls) + "\n")
    return str(root)


def test_goproblurest_dataset(goproblurest_root):
    from detectinblur_tpu.data.natural_datasets import GOPROBlurEst

    # Val split: no rebalancing, stored labels round-trip.
    ds = GOPROBlurEst(goproblurest_root, "val")
    assert len(ds) == 4
    labels = sorted(ds[i]["blur_est_label"] for i in range(len(ds)))
    assert labels == [0, 1, 2, 3]
    item = ds[0]
    assert item["pre_blurred"] is True
    assert item["boxes"].shape == (1, 4)
    # Blurred-path items carry the stored windowSize, sharp ones 0
    # (custom_datasets.py:1168-1178).
    by_label = {ds[i]["blur_est_label"]: ds[i] for i in range(len(ds))}
    assert by_label[0]["window_size"] == 0
    assert by_label[3]["window_size"] == 7
    # Train split: labels 2/3 are never dropped; 0/1 may be (p=.65/.1).
    dtr = GOPROBlurEst(goproblurest_root, "train", seed=0)
    kept = [it[2] for it in dtr.items]
    assert kept.count(2) == 2 and kept.count(3) == 2
    assert dtr.class_counts[2] == 2


def test_estimator_cli_goproblurest(goproblurest_root, tmp_path, monkeypatch):
    """The estimator trains a step on natural-blur data with stored labels
    (VERDICT r1 item 7)."""
    import detectinblur_tpu.cli.train_blur_estimator as cli_est
    import detectinblur_tpu.data.batching as batching_mod

    monkeypatch.setattr(batching_mod, "DEFAULT_SOURCE_BUCKETS", ((64, 64),))
    monkeypatch.setattr(cli_est, "model_bucket_for", lambda b, **kw: (64, 64))
    top1 = cli_est.main([
        "--dataset", "GOPROBlurEst", "--data-path", goproblurest_root,
        "--LEHE_blur_seg", "--epochs", "1", "-b", "2", "--early_stop", "2",
        "--lr", "0.001", "--output_dir", str(tmp_path / "out"),
        "--print-freq", "1",
    ])
    assert 0.0 <= top1 <= 1.0


@pytest.fixture
def fake_natural_dataset(monkeypatch):
    """Tiny pre-blurred natural-eval dataset injected in place of the
    on-disk GOPRO layout (VERDICT r2 item 2 test harness)."""
    import detectinblur_tpu.data.natural_datasets as nat

    rng = np.random.default_rng(7)

    class _FakeNatural:
        def __len__(self):
            return 2

        def __getitem__(self, idx):
            return {
                "image": rng.random((100, 120, 3)).astype(np.float32),
                "image_id": idx + 1,
                "boxes": np.array([[10.0, 10.0, 60.0, 60.0]], np.float32),
                "labels": np.array([1], np.int64),
                "area": np.array([2500.0], np.float32),
                "iscrowd": np.zeros(1, np.int32),
                "pre_blurred": True,
            }

    monkeypatch.setattr(nat, "get_natural_dataset",
                        lambda name, root, **kw: _FakeNatural())
    return _FakeNatural


def test_evaluate_cli_natural_deblur_first(coco_root, tiny_cli,
                                           fake_natural_dataset, tmp_path,
                                           monkeypatch):
    """--blurred_dataset + --deblur_first must actually run the MSResNet on
    the natural images (the reference passes the deblurer into its single
    evaluate() call, evaluate.py:240-290; round 2 silently dropped every
    remedy on this branch)."""
    torch = pytest.importorskip("torch")
    import detectinblur_tpu.models.deblur as deblur_mod
    from detectinblur_tpu.cli.evaluate import main
    from tests.synthetic_torch import synthetic_deepdeblur_state_dict

    sd = synthetic_deepdeblur_state_dict(n_scales=3, feats=8, n_blocks=2)
    pth = tmp_path / "deblur.pth"
    torch.save({k: torch.tensor(np.asarray(v, np.float32))
                for k, v in sd.items()}, str(pth))

    calls = []
    orig = deblur_mod.deblur_image

    def spy(variables, img):
        calls.append(1)
        return orig(variables, img)

    monkeypatch.setattr(deblur_mod, "deblur_image", spy)
    stats = main(["--data-path", coco_root, "--blurred_dataset", "GOPRO",
                  "--deblur_first", "--deblurer_model_location", str(pth),
                  "--early_stop", "2"])
    assert stats.shape == (19,)
    assert calls, "deblur-first never ran on the natural-blur branch"


def test_evaluate_cli_natural_ensemble_dispatch(coco_root, tiny_cli,
                                                fake_natural_dataset,
                                                monkeypatch):
    """--blurred_dataset + --use_ensemble must fire the specialist-dispatch
    graph (engine.py:353-366 applies on natural datasets too)."""
    import detectinblur_tpu.cli.evaluate as cli_eval
    import detectinblur_tpu.models.ensemble as ens_mod
    from detectinblur_tpu.cli.evaluate import main

    def fake_load_params(model, path, **kw):
        import jax

        return model.init(jax.random.key(hash(path) % 1000)), None

    monkeypatch.setattr(cli_eval, "load_params", fake_load_params)
    made = []
    orig = ens_mod.make_ensemble_predict

    def spy(*a, **kw):
        made.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(ens_mod, "make_ensemble_predict", spy)
    stats = main(["--data-path", coco_root, "--blurred_dataset", "GOPRO",
                  "--use_ensemble", "--ensemble_model_paths",
                  "a", "b", "c", "d", "--early_stop", "2"])
    assert stats.shape == (19,)
    assert made, "ensemble dispatch never fired on the natural-blur branch"


def test_load_params_restores_bn_stats_from_own_checkpoint(tiny_cli, tmp_path):
    """--resume of an --unfrozen_batch_norm model from our own checkpoint
    must restore the RUNNING BN stats payload, not fall back to fresh
    stats (mode_one blends with them, batchnorm.py semantics; the silent
    fresh-stats path is exactly the Orbax partial-restore pitfall found
    in round 5)."""
    import jax
    import jax.numpy as jnp

    from detectinblur_tpu.cli.evaluate import load_params
    from detectinblur_tpu.train.checkpoint import save_checkpoint
    from detectinblur_tpu.train.state import create_train_state
    import optax

    model = tiny_cli(None, bn_mode="train")
    assert model.has_bn
    params = model.init(jax.random.key(0))
    state = create_train_state(params, optax.sgd(0.1))
    stats = jax.tree.map(lambda x: jnp.full_like(x, 0.25),
                         model.init_stats())
    path = save_checkpoint(str(tmp_path), state, epoch=0, bn_stats=stats)

    _, got = load_params(model, path)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        stats, got)
