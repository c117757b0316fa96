"""On-disk tests for the natural-blur dataset loaders.

Every loader is constructed against a real (tiny) directory tree in the
reference's layout (custom_datasets.py:16-487,901-1231) — NOT a
monkeypatched fake — so path-mapping and constructor-signature breakage
is caught here (round 5 found the cli passing ``expand_boxes=`` to
loaders that don't take it; the cli e2e tests monkeypatch
get_natural_dataset and never saw it).
"""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from detectinblur_tpu.data.natural_datasets import (
    GOPROBlurEst,
    GOPROSynth,
    expand_boxes_with_flow,
    get_natural_dataset,
)

H, W = 32, 48


def _dors(rng, n=2, score=0.9):
    """An 80-class DORS dump with ``n`` boxes in class 0 (person)."""
    dors = np.empty(80, object)
    for c in range(80):
        dors[c] = np.zeros((0, 5), np.float32)
    rows = np.zeros((n, 5), np.float32)
    rows[:, 0] = rng.uniform(0, W / 2, n)
    rows[:, 1] = rng.uniform(0, H / 2, n)
    rows[:, 2] = rows[:, 0] + rng.uniform(4, W / 3, n)
    rows[:, 3] = rows[:, 1] + rng.uniform(4, H / 3, n)
    rows[:, 4] = score
    dors[0] = rows
    return dors


def _png(path, rng, value=None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = (np.full((H, W, 3), value, np.uint8) if value is not None
           else (rng.random((H, W, 3)) * 255).astype(np.uint8))
    Image.fromarray(arr).save(path)
    return arr


def _save_dors(path, dors):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        np.save(f, dors, allow_pickle=True)


def _check_item(item, expect_boxes=None):
    assert item["image"].shape == (H, W, 3)
    assert item["image"].dtype == np.uint8
    assert item["boxes"].shape[1:] == (4,)
    assert len(item["labels"]) == len(item["boxes"])
    assert item["pre_blurred"] is True
    # coco80 class 0 (person) -> coco91 category 1 (utils.py:25-34)
    assert all(l == 1 for l in item["labels"])
    if expect_boxes is not None:
        np.testing.assert_allclose(item["boxes"], expect_boxes, atol=1e-5)


def test_gopro_tree(tmp_path):
    rng = np.random.default_rng(0)
    root = str(tmp_path)
    dors = _dors(rng)
    for i in range(3):
        _png(os.path.join(root, "test", "s0", "blur", f"{i:06d}.png"), rng)
        _save_dors(os.path.join(root, "test", "s0", "sharp",
                                f"{i:06d}_DORS.npy"), dors)
    # Exactly the kwargs the cli passes for a non-GOPROSynth dataset.
    ds = get_natural_dataset("GOPRO", root)
    assert len(ds) == 3
    _check_item(ds[0], expect_boxes=dors[0][:, :4])
    # Threshold: scores below 0.4 drop out.
    low = _dors(rng, n=1, score=0.1)
    _save_dors(os.path.join(root, "test", "s0", "sharp",
                            "000001_DORS.npy"), low)
    assert len(get_natural_dataset("GOPRO", root)[1]["boxes"]) == 0


def test_vidblur_tree(tmp_path):
    rng = np.random.default_rng(1)
    root = str(tmp_path)
    dors = _dors(rng)
    for i in range(2):
        os.makedirs(os.path.join(root, "seq", "input"), exist_ok=True)
        arr = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(
            os.path.join(root, "seq", "input", f"{i}.jpg"))
        _save_dors(os.path.join(root, "seq", "GT", f"{i}_DORS.npy"), dors)
    ds = get_natural_dataset("VidBlur", root)
    assert len(ds) == 2
    _check_item(ds[0], expect_boxes=dors[0][:, :4])


def test_realblur_tree(tmp_path):
    rng = np.random.default_rng(2)
    root = str(tmp_path)
    dors = _dors(rng, score=0.95)   # RealBlur threshold is 0.6
    _png(os.path.join(root, "scene1", "gt", "g0.png"), rng)
    _png(os.path.join(root, "scene1", "blur", "b0.png"), rng)
    _save_dors(os.path.join(root, "scene1", "gt", "g0_DORS.npy"), dors)
    with open(os.path.join(root, "RealBlur_J_test_list.txt"), "w") as f:
        f.write("scene1/gt/g0.png scene1/blur/b0.png\n")
    ds = get_natural_dataset("RealBlur", root)
    assert len(ds) == 1
    assert ds.image_paths[0].endswith("blur/b0.png")   # blurred by default
    _check_item(ds[0], expect_boxes=dors[0][:, :4])


def test_reds_tree(tmp_path):
    rng = np.random.default_rng(3)
    root = str(tmp_path)
    dors = _dors(rng)
    _png(os.path.join(root, "blur", "00.png"), rng)
    _save_dors(os.path.join(root, "sharp", "00_DORS.npy"), dors)
    with open(os.path.join(root, "blurry.txt"), "w") as f:
        f.write(os.path.join(root, "blur", "00.png") + "\n")
    ds = get_natural_dataset("REDS", root)
    assert len(ds) == 1
    _check_item(ds[0], expect_boxes=dors[0][:, :4])


def test_goprosynth_frame_average(tmp_path):
    """2w+1 consecutive sharp frames average into the blurred image
    (ImageInfo.blurImage, custom_datasets.py:737-763)."""
    rng = np.random.default_rng(4)
    root = str(tmp_path)
    vals = [10, 30, 50, 200, 90]
    dors = _dors(rng)
    for i, v in enumerate(vals):
        _png(os.path.join(root, "train", "s0", "sharp", f"{i:06d}.png"),
             rng, value=v)
        _save_dors(os.path.join(root, "train", "s0", "sharp",
                                f"{i:06d}_DORS.npy"), dors)
    ds = get_natural_dataset("GOPROSynth", root, window=2,
                             expand_boxes=False)
    assert len(ds) == 1                       # only frame 2 has a full window
    item = ds[0]
    expected = int(np.clip(np.mean(vals), 0, 255))
    assert np.all(item["image"] == expected)
    _check_item(item, expect_boxes=dors[0][:, :4])


def test_goprosynth_flow_expansion(tmp_path):
    """Constant (+dx, 0) forward flow must stretch every box right by
    n_steps * dx (corner walk, custom_datasets.py:636-735)."""
    boxes = np.array([[10.0, 8.0, 20.0, 16.0]], np.float32)
    flow = np.zeros((H, W, 2), np.float32)
    flow[..., 0] = 3.0
    out = expand_boxes_with_flow(boxes, [flow, flow], [], W, H)
    np.testing.assert_allclose(out, [[10.0, 8.0, 26.0, 16.0]], atol=1e-4)


def test_goprosynthload_tree(tmp_path):
    rng = np.random.default_rng(5)
    root = str(tmp_path)
    _png(os.path.join(root, "blur", "00000.png"), rng)
    boxes = np.array([[1.0, 2.0, 9.0, 12.0]], np.float32)
    with open(os.path.join(root, "blur", "00000.dat"), "wb") as f:
        pickle.dump({"boxes": boxes, "labels": np.array([7])}, f)
    ds = get_natural_dataset("GOPROSynthLoad", root)
    assert len(ds) == 1
    item = ds[0]
    np.testing.assert_allclose(item["boxes"], boxes)
    assert item["labels"].tolist() == [7]
    assert item["pre_blurred"] is True


def test_gopro_blur_est_split(tmp_path):
    """Split-file parsing, stored blur_est_label, and the val split taking
    every line (train rebalancing drops label-0/1 lines,
    custom_datasets.py:1121-1126)."""
    rng = np.random.default_rng(6)
    root = str(tmp_path)
    lines = []
    for i, label in enumerate([0, 1, 2, 3, 0, 3]):
        p = os.path.join(root, "blur", f"{i}.png")
        _png(p, rng)
        with open(p.replace(".png", ".dat"), "wb") as f:
            pickle.dump({"boxes": np.zeros((1, 4), np.float32),
                         "labels": np.array([3]), "windowSize": 7}, f)
        lines.append(f"{p},{label}")
    for name in ("trainSplit.txt", "valSplit.txt"):
        with open(os.path.join(root, name), "w") as f:
            f.write("\n".join(lines) + "\n")
    val = GOPROBlurEst(root, split="val")
    assert len(val) == 6
    item = val[2]
    assert item["blur_est_label"] == 2
    assert item["window_size"] == 7
    assert item["pre_blurred"] is True
    train = GOPROBlurEst(root, split="train", seed=0)
    assert len(train) <= 6                     # rebalancing can only drop
    assert val.class_counts == [2, 1, 1, 2]


def test_cli_kwargs_match_every_loader(tmp_path):
    """The exact kwarg set cli/evaluate.py builds for --blurred_dataset
    must be accepted by every loader in the dispatch table (round-5
    regression: expand_boxes was passed to ALL of them)."""
    import inspect

    from detectinblur_tpu.data import natural_datasets as nat

    for name in ("GOPRO", "VidBlur", "RealBlur", "REDS", "GOPROSynth",
                 "GOPROSynthLoad"):
        kw = {"expand_boxes": True} if name == "GOPROSynth" else {}
        cls = {"GOPRO": nat.GOPRO, "VidBlur": nat.VidBlur,
               "RealBlur": nat.RealBlur, "REDS": nat.REDS,
               "GOPROSynth": nat.GOPROSynth,
               "GOPROSynthLoad": nat.GOPROSynthLoad}[name]
        sig = inspect.signature(cls.__init__)
        has_varkw = any(p.kind == p.VAR_KEYWORD
                        for p in sig.parameters.values())
        for k in kw:
            assert has_varkw or k in sig.parameters, (
                f"cli would pass {k}= to {name}, which doesn't accept it")
