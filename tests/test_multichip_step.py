"""Full-detector SPMD tests on the 8-device virtual CPU mesh.

Round-1 gap: the only multi-device test was a toy linear-regression step;
the driver's dryrun (which jits the full train step over a mesh) failed
unexercised. These tests jit the REAL Faster R-CNN train step and predict
over ``make_mesh(8)`` with a sharded ``BlurBatch`` — the capability the
reference gets from NCCL DDP (/root/reference/utils.py:763-785) — and
assert the sharded results match the single-device ones.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
from detectinblur_tpu.models.roi_heads import BoxHeadConfig
from detectinblur_tpu.models.rpn import RPNConfig
from detectinblur_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from detectinblur_tpu.train.engine import make_eval_step, make_train_step
from detectinblur_tpu.train.state import create_train_state, make_optimizer

BUCKET = (64, 64)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = FasterRCNNConfig(
        min_size=64, max_size=64,
        rpn=RPNConfig(pre_nms_top_n_train=200, post_nms_top_n_train=100,
                      pre_nms_top_n_test=200, post_nms_top_n_test=100),
        box=BoxHeadConfig(batch_size_per_image=64, nms_pool=256,
                          detections_per_img=20),
    )
    model = FasterRCNN(cfg)
    params = model.init(jax.random.key(0), bucket=BUCKET)
    return model, params


def test_sharded_train_step_matches_single_device(tiny_model):
    model, params = tiny_model
    tx, _ = make_optimizer(base_lr=0.04, steps_per_epoch=10, params=params)
    step = make_train_step(model, tx, BUCKET, blur_train=True,
                           expand_target_boxes=True, use_custom_norm=True)
    batch = ge._tiny_batch(8, 64, 64)
    key = jax.random.key(1)

    # Single-device reference (default placement). The step donates its
    # state, so give it a private copy of the shared fixture params.
    state0 = create_train_state(jax.tree.map(jnp.array, params), tx)
    _, ref_metrics = step(state0, batch, key)
    ref_metrics = {k: float(v) for k, v in ref_metrics.items()}

    mesh = make_mesh(8)
    with mesh:
        # device_put (inside replicate) aliases the source buffer, and the
        # step donates its state — copy so the fixture params survive.
        state = create_train_state(jax.tree.map(jnp.array, params), tx)
        state = state._replace(params=replicate(mesh, state.params),
                               opt_state=replicate(mesh, state.opt_state))
        sbatch = shard_batch(mesh, ge._tiny_batch(8, 64, 64))
        new_state, metrics = step(state, sbatch, key)
        jax.block_until_ready(metrics)

    metrics = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in metrics.values()), metrics
    for k, v in ref_metrics.items():
        np.testing.assert_allclose(metrics[k], v, rtol=2e-3, atol=2e-4,
                                   err_msg=k)
    # Updated params stay replicated and finite.
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated
    assert np.isfinite(np.asarray(leaf)).all()


def test_sharded_predict_matches_single_device(tiny_model):
    model, params = tiny_model
    step = make_eval_step(model, BUCKET, blur_eval=True,
                          expand_target_boxes=True)
    batch = ge._tiny_batch(8, 60, 64, seed=3)

    ref_dets, ref_gt = step(params, batch)

    mesh = make_mesh(8)
    with mesh:
        rparams = replicate(mesh, params)
        sbatch = shard_batch(mesh, ge._tiny_batch(8, 60, 64, seed=3))
        dets, gt = step(rparams, sbatch)
        jax.block_until_ready(dets)

    np.testing.assert_allclose(np.asarray(gt), np.asarray(ref_gt),
                               rtol=1e-5, atol=1e-5)
    ref_valid = np.asarray(ref_dets.valid)
    np.testing.assert_array_equal(np.asarray(dets.valid), ref_valid)
    np.testing.assert_allclose(np.asarray(dets.boxes)[ref_valid],
                               np.asarray(ref_dets.boxes)[ref_valid],
                               rtol=5e-3, atol=5e-2)
    np.testing.assert_allclose(np.asarray(dets.scores)[ref_valid],
                               np.asarray(ref_dets.scores)[ref_valid],
                               rtol=5e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(dets.labels)[ref_valid],
                                  np.asarray(ref_dets.labels)[ref_valid])
