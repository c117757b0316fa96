"""Throughput-mode (DETECTINBLUR_PRECISION=default) smoke coverage.

The whole suite runs in parity mode (f32, the env default); the
production serving configuration — bfloat16 activations, DEFAULT conv
precision, bf16 RoIAlign windows — was only ever exercised on real
hardware. This spawns a subprocess with the throughput env (the flag is
read at import time) and checks the bf16 pipeline against the in-process
parity run: features must agree to bf16-accumulation tolerance and the
detector must produce structurally valid, finite outputs. Guards against
silent dtype-promotion regressions (an `x + jitter` style f32 promotion
was measured costing 2x on-chip before it was caught by hand).
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_CHILD = r"""
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
from detectinblur_tpu.models.resnet import ACT_DTYPE, CONV_PRECISION

assert CONV_PRECISION == jax.lax.Precision.DEFAULT
assert ACT_DTYPE == jnp.bfloat16

cfg = FasterRCNNConfig()
model = FasterRCNN(cfg)
params = model.init(jax.random.key(0), bucket=(128, 160))

rng = np.random.default_rng(0)
images = jnp.asarray(rng.random((2, 96, 128, 3), np.float32))
hw = jnp.asarray([[96, 128], [80, 100]])

batched_in = jnp.zeros((2, 128, 160, 3), jnp.float32).at[
    :, :96, :128, :].set(images)
feats, _ = model._features(params, batched_in)
det = model.predict(params, batched_in, hw, bucket=(128, 160))

out = {
    "p2_dtype": str(feats[0].dtype),
    "p2": np.asarray(feats[0], np.float32)[0, ::8, ::8, 0].tolist(),
    "boxes_finite": bool(np.isfinite(np.asarray(det.boxes)).all()),
    "scores_finite": bool(np.isfinite(np.asarray(det.scores)).all()),
    "shapes": [list(det.boxes.shape), list(det.scores.shape),
               list(det.labels.shape), list(det.valid.shape)],
    "n_valid": int(np.asarray(det.valid).sum()),
}
print("RESULT" + json.dumps(out))
"""


def test_throughput_mode_matches_parity_features():
    env = dict(os.environ)
    env["DETECTINBLUR_PRECISION"] = "default"
    env["JAX_PLATFORMS"] = "cpu"
    # conftest strips the axon relay path for CPU runs; do the same here.
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if "axon" not in p) or os.getcwd()
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, capture_output=True,
        text=True, timeout=1500)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT")]
    assert line, proc.stdout[-2000:]
    got = json.loads(line[0][len("RESULT"):])

    assert got["p2_dtype"] == "bfloat16"
    assert got["boxes_finite"] and got["scores_finite"]
    D = got["shapes"][0][1]
    assert got["shapes"] == [[2, D, 4], [2, D], [2, D], [2, D]]

    # Parity-mode reference for the same features, in this process (f32).
    from detectinblur_tpu.models.faster_rcnn import (
        FasterRCNN, FasterRCNNConfig)

    model = FasterRCNN(FasterRCNNConfig())
    params = model.init(jax.random.key(0), bucket=(128, 160))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((2, 96, 128, 3), np.float32))
    batched_in = jnp.zeros((2, 128, 160, 3), jnp.float32).at[
        :, :96, :128, :].set(images)
    feats, _ = model._features(params, batched_in)
    ref = np.asarray(feats[0], np.float32)[0, ::8, ::8, 0]

    got_p2 = np.asarray(got["p2"], np.float32)
    scale = max(np.abs(ref).max(), 1e-3)
    # ~50 bf16 layers accumulate a few percent of the feature scale.
    np.testing.assert_allclose(got_p2, ref, atol=0.08 * scale)
