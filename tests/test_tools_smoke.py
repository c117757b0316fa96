"""Rot guards for the untested surfaces (VERDICT r4 weak items 4/5).

The tools/ profiling scripts execute at module level (they drive the
chip), so a plain import would run them. Instead every script is
AST-parsed and each of its imports is resolved: modules must exist and
every ``from pkg import name`` must name a real attribute — which is
exactly how they rot (they reach for private symbols like
``_window_geometry`` that a refactor can rename).

``dump_detections`` is the one engine-path module that had no coverage:
exercise it into a tmpdir.
"""

import ast
import importlib
import importlib.util
import pathlib

import numpy as np
import pytest

TOOLS = sorted((pathlib.Path(__file__).parent.parent / "tools").glob("*.py"))
BENCH_SCRIPTS = [pathlib.Path(__file__).parent.parent / n
                 for n in ("bench.py", "bench_pipeline.py", "bench_train.py")]


def _imports_of(path: pathlib.Path):
    tree = ast.parse(path.read_text(), filename=str(path))
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                yield alias.name, None
        elif isinstance(node, ast.ImportFrom) and node.level == 0:
            for alias in node.names:
                yield node.module, alias.name


@pytest.mark.parametrize("script", TOOLS + BENCH_SCRIPTS,
                         ids=lambda p: p.name)
def test_script_imports_resolve(script):
    assert script.exists()
    for module, name in _imports_of(script):
        if not module.startswith("detectinblur_tpu"):
            # Third-party: existence check only, no import side effects.
            assert importlib.util.find_spec(module.split(".")[0]) is not None, (
                f"{script.name}: missing dependency {module}")
            continue
        mod = importlib.import_module(module)
        if name is not None and name != "*":
            assert hasattr(mod, name), (
                f"{script.name}: {module} no longer defines {name}")


def test_dump_detections_writes_overlay(tmp_path):
    from detectinblur_tpu.models.faster_rcnn import Detections
    from detectinblur_tpu.utils.visualization import dump_detections

    rng = np.random.default_rng(0)
    image = rng.random((60, 80, 3)).astype(np.float32)
    dets = Detections(
        boxes=np.asarray([[[5.0, 5.0, 30.0, 40.0],
                           [10.0, 12.0, 70.0, 50.0],
                           [0.0, 0.0, 0.0, 0.0]]]),
        scores=np.asarray([[0.9, 0.55, 0.0]]),
        labels=np.asarray([[3, 17, 0]]),
        valid=np.asarray([[True, True, False]]),
    )
    out = dump_detections(str(tmp_path / "dets"), 42, image, dets)
    p = pathlib.Path(out)
    assert p.exists() and p.name == "det_42.png"
    from PIL import Image

    img = Image.open(p)
    assert img.size == (80, 60)
    # Drawn boxes changed pixels vs the raw image.
    raw = (np.clip(image, 0, 1) * 255).astype(np.uint8)
    assert not np.array_equal(np.asarray(img)[..., :3], raw)


def test_dump_detections_empty_valid(tmp_path):
    """Zero valid detections must still write an image, not crash — a crash
    here takes down an eval 50 iterations in (engine.py:382-383 dumps run
    only behind --image_output_dir)."""
    from detectinblur_tpu.models.faster_rcnn import Detections
    from detectinblur_tpu.utils.visualization import dump_detections

    image = np.zeros((32, 32, 3), np.float32)
    dets = Detections(
        boxes=np.zeros((1, 2, 4)), scores=np.zeros((1, 2)),
        labels=np.zeros((1, 2), np.int64), valid=np.zeros((1, 2), bool),
    )
    out = dump_detections(str(tmp_path), 7, image, dets)
    assert pathlib.Path(out).exists()
