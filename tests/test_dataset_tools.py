"""cli/dataset_tools.py end-to-end: render -> segment -> load.

The chain must round-trip through its REAL consumers (GOPROSynthLoad /
GOPROBlurEst), the same way the reference's dataset_utils scripts feed
custom_datasets loaders (generate_GOPRO_blur_set.py -> GOPROSynthLoad,
segment_GOPRO.py -> GOPROBlurEst).
"""

import os

import numpy as np
import pytest
from PIL import Image

from detectinblur_tpu.cli.dataset_tools import main
from detectinblur_tpu.data.natural_datasets import (
    GOPROBlurEst,
    get_natural_dataset,
)

H, W = 24, 32


@pytest.fixture
def gopro_sharp_tree(tmp_path):
    rng = np.random.default_rng(0)
    root = str(tmp_path / "gopro")
    seq = os.path.join(root, "train", "s0", "sharp")
    os.makedirs(seq, exist_ok=True)
    for i in range(5):
        arr = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(seq, f"{i:06d}.png"))
        dors = np.empty(80, object)
        for c in range(80):
            dors[c] = np.zeros((0, 5), np.float32)
        dors[0] = np.array([[2.0, 3.0, 12.0, 14.0, 0.9]], np.float32)
        with open(os.path.join(seq, f"{i:06d}_DORS.npy"), "wb") as f:
            np.save(f, dors, allow_pickle=True)
    return root


def test_render_segment_load_roundtrip(gopro_sharp_tree, tmp_path):
    out = str(tmp_path / "rendered")
    main(["render-gopro-synth", "--root_dir", gopro_sharp_tree,
          "--output_dir", out, "--window", "2", "--limit", "10"])
    # window=2 over 5 frames -> exactly one center with a full window,
    # rendered to blur/ AND its sharp center frame alongside
    # (generate_GOPRO_blur_set.py:39-56).
    assert os.path.exists(os.path.join(out, "blur", "00000.png"))
    assert os.path.exists(os.path.join(out, "blur", "00000.dat"))
    assert os.path.exists(os.path.join(out, "sharp", "00000.png"))
    assert os.path.exists(os.path.join(out, "sharp", "00000.dat"))

    # The rendered set loads through GOPROSynthLoad.
    ds = get_natural_dataset("GOPROSynthLoad", out)
    assert len(ds) == 1
    item = ds[0]
    assert item["image"].shape == (H, W, 3)
    np.testing.assert_allclose(item["boxes"], [[2, 3, 12, 14]], atol=1e-5)

    # Splits parse through GOPROBlurEst (labels must be INTS; round 5
    # found the tool writing annotation paths in the label field).
    main(["segment-gopro", "--root_dir", out])
    # The written lines carry int labels: blurred (windowSize 5 <= 7) ->
    # class 1, sharp -> 0.
    lines = []
    for name in ("trainSplit.txt", "valSplit.txt"):
        with open(os.path.join(out, name)) as f:
            lines += [ln for ln in f.read().splitlines() if ln]
    written = {os.path.basename(os.path.dirname(ln.rsplit(",", 1)[0])):
               int(ln.rsplit(",", 1)[1]) for ln in lines}
    assert written == {"blur": 1, "sharp": 0}
    # And they parse through the real consumer (val split keeps every
    # line; train rebalancing may drop label-0/1 lines).
    val = GOPROBlurEst(out, split="val")
    train = GOPROBlurEst(out, split="train")
    for ds_ in (train, val):
        for i in range(len(ds_)):
            assert ds_[i]["blur_est_label"] in (0, 1, 2, 3)


def test_segment_reds(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(1)
    for i, score in enumerate([0.9, 0.1]):   # second image has no kept box
        bp = os.path.join(root, "seq", "blur")
        sp = os.path.join(root, "seq", "sharp")
        os.makedirs(bp, exist_ok=True)
        os.makedirs(sp, exist_ok=True)
        arr = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(bp, f"{i}.png"))
        dors = np.empty(80, object)
        for c in range(80):
            dors[c] = np.zeros((0, 5), np.float32)
        dors[0] = np.array([[1.0, 1.0, 9.0, 9.0, score]], np.float32)
        with open(os.path.join(sp, f"{i}_DORS.npy"), "wb") as f:
            np.save(f, dors, allow_pickle=True)
    main(["segment-reds", "--root_dir", root])
    with open(os.path.join(root, "blurry.txt")) as f:
        kept = [ln for ln in f.read().splitlines() if ln]
    # Both kept (empty-image allowance covers the 0.1-score one), and the
    # lists feed the REDS loader.
    assert len(kept) == 2
    ds = get_natural_dataset("REDS", root)
    assert len(ds) == 2
    assert len(ds[0]["boxes"]) == 1
    assert len(ds[1]["boxes"]) == 0
