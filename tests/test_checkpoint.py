"""Checkpoint/resume + LR-schedule + freeze-mask coverage (VERDICT r4 weak
items 1-2).

The reference resume restores model/optimizer/scheduler/epoch
(/root/reference/train.py:251-263,332-339); its warmup is 1/1000 over
min(1000, steps-1) iterations (utils.py:700-708) with MultiStepLR x0.1 at
epochs [16, 22] (train.py:244-248), and torchvision freezes
[layer4, layer3, layer2, layer1, conv1][trainable_backbone_layers:] plus
every FrozenBN affine (models/faster_rcnn.py:348 semantics).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from detectinblur_tpu.train.checkpoint import (
    latest_epoch,
    restore_checkpoint,
    restore_weights,
    save_checkpoint,
)
from detectinblur_tpu.train.state import (
    TrainState,
    _freeze_mask,
    create_train_state,
    make_lr_schedule,
    make_optimizer,
)


# ------------------------------------------------------------ LR schedule
def test_warmup_curve_matches_reference():
    """Linear warmup from 1/1000 over min(1000, steps_per_epoch - 1) iters
    (utils.py:700-708): pin the curve at steps {0, 500, 999, 1000}."""
    base = 0.04
    sched = make_lr_schedule(base, steps_per_epoch=2000)
    # alpha = step / 1000; factor = (1/1000) * (1 - alpha) + alpha.
    for step, alpha in ((0, 0.0), (500, 0.5), (999, 0.999)):
        want = base * ((1.0 / 1000) * (1 - alpha) + alpha)
        assert float(sched(step)) == pytest.approx(want, rel=1e-6), step
    assert float(sched(1000)) == pytest.approx(base, rel=1e-6)
    assert float(sched(1500)) == pytest.approx(base, rel=1e-6)


def test_warmup_iters_capped_by_steps_per_epoch():
    """Short epochs warm up over steps_per_epoch - 1 iterations
    (min(1000, len(data_loader) - 1), engine.py:64-69)."""
    sched = make_lr_schedule(0.04, steps_per_epoch=5)
    assert float(sched(0)) == pytest.approx(0.04 / 1000, rel=1e-6)
    assert float(sched(4)) == pytest.approx(0.04, rel=1e-6)


def test_multistep_decade_drops_at_epoch_boundaries():
    """MultiStepLR gamma 0.1 at epochs [16, 22] (train.py:244-248), in
    units of steps_per_epoch."""
    S = 100
    sched = make_lr_schedule(0.04, steps_per_epoch=S)
    assert float(sched(16 * S - 1)) == pytest.approx(0.04, rel=1e-6)
    assert float(sched(16 * S)) == pytest.approx(0.004, rel=1e-6)
    assert float(sched(22 * S - 1)) == pytest.approx(0.004, rel=1e-6)
    assert float(sched(22 * S)) == pytest.approx(0.0004, rel=1e-6)
    assert float(sched(30 * S)) == pytest.approx(0.0004, rel=1e-6)


# ------------------------------------------------------------- freeze mask
@pytest.fixture(scope="module")
def real_params():
    """The REAL converted torchvision tree, so the mask's path matching is
    tested against production module names, not a synthetic lookalike."""
    import sys

    sys.path.insert(0, "tests")
    from torch_reference import make_random_fasterrcnn_sd

    from detectinblur_tpu.utils.torch_convert import (
        convert_fasterrcnn_state_dict,
    )

    return convert_fasterrcnn_state_dict(
        make_random_fasterrcnn_sd(np.random.default_rng(0)))


def test_freeze_mask_partitions_real_tree(real_params):
    mask = _freeze_mask(real_params, trainable_backbone_layers=3)
    body, mbody = real_params["backbone"]["body"], mask["backbone"]["body"]

    def all_leaves(t, val):
        return all(v is val for v in jax.tree.leaves(t))

    # Stem + layer1 frozen with the default 3 trainable stages.
    assert all_leaves(mbody["conv1"], False)
    assert all_leaves(mbody["bn1"], False)
    for name in body:
        if name.startswith("layer1"):
            assert all_leaves(mbody[name], False), name
    # layer2..4 convs train; their FrozenBN affines never do.
    assert mbody["layer2_0"]["conv1"]["kernel"] is True
    assert mbody["layer4_2"]["conv3"]["kernel"] is True
    assert all_leaves(mbody["layer2_0"]["bn1"], False)
    assert all_leaves(mbody["layer3_1"]["bn2"], False)
    assert all_leaves(mbody["layer2_0"]["downsample_1"], False)
    # FPN + heads always train.
    assert all_leaves(mask["backbone"]["fpn"], True)
    assert all_leaves(mask["rpn_head"], True)
    assert all_leaves(mask["box_head"], True)
    assert all_leaves(mask["box_predictor"], True)


def test_freeze_mask_trainable_layers_5_unfreezes_stem(real_params):
    mask = _freeze_mask(real_params, trainable_backbone_layers=5)
    mbody = mask["backbone"]["body"]
    assert mbody["conv1"]["kernel"] is True
    assert mbody["layer1_0"]["conv1"]["kernel"] is True
    # BN affines stay frozen even at 5 (FrozenBatchNorm has no grads).
    assert mbody["bn1"]["scale"] is False
    assert mbody["layer1_0"]["bn1"]["scale"] is False


def test_frozen_leaves_receive_exactly_zero_updates(real_params):
    """Three optimizer steps with dense nonzero grads: frozen subtrees stay
    bit-identical, trainable ones move (VERDICT r4 weak item 2)."""
    tx, _ = make_optimizer(base_lr=0.1, steps_per_epoch=10,
                           params=real_params)
    state = create_train_state(real_params, tx)
    grads = jax.tree.map(lambda p: jnp.ones_like(p), real_params)
    for _ in range(3):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = TrainState(state.step + 1, params, opt_state)
    mask = _freeze_mask(real_params, trainable_backbone_layers=3)

    def check(p0, p1, m):
        if m:
            assert not np.array_equal(np.asarray(p0), np.asarray(p1))
        else:
            np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))

    jax.tree.map(check, real_params, state.params, mask)


# --------------------------------------------------------- checkpointing
def _toy_setup():
    params = {"w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4) / 10.0,
              "b": jnp.ones((4,), jnp.float32)}
    # Schedule with structure (short warmup + early milestones) so a resume
    # that restarted from step 0 would produce DIFFERENT continuation
    # trajectories.
    tx, sched = make_optimizer(base_lr=0.5, steps_per_epoch=4,
                               milestones=(1, 2))
    return params, tx, sched


def _sgd_steps(state, tx, n):
    losses = []
    for _ in range(n):
        grads = jax.tree.map(lambda p: p, state.params)  # d/dp 0.5||p||^2
        loss = sum(float(jnp.sum(p * p)) for p in jax.tree.leaves(state.params))
        losses.append(0.5 * loss)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = TrainState(state.step + 1, params, opt_state)
    return state, losses


def test_checkpoint_roundtrip_bitwise_and_resume_continuation(tmp_path):
    params, tx, sched = _toy_setup()
    state = create_train_state(params, tx)
    state, _ = _sgd_steps(state, tx, 3)
    assert int(state.step) == 3

    path = save_checkpoint(str(tmp_path), state, epoch=0,
                           args={"lr": 0.5, "note": "test"})
    assert (tmp_path / "args_0.json").exists()

    template = create_train_state(
        jax.tree.map(jnp.zeros_like, params), tx)
    restored = restore_checkpoint(path, template)

    # Bitwise state equality: params, opt_state (incl. momentum trace), step.
    assert int(restored.step) == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.params, restored.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.opt_state, restored.opt_state)

    # Continuation: M more steps from both produce identical losses — the
    # schedule position (warmup/milestone decades) survived the round trip.
    cont_a, losses_a = _sgd_steps(state, tx, 5)
    cont_b, losses_b = _sgd_steps(restored, tx, 5)
    assert losses_a == losses_b
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        cont_a.params, cont_b.params)

    # Vacuity guard: a resume that LOST the schedule position (step reset
    # to 0 -> re-enters warmup) diverges immediately.
    fresh = TrainState(jnp.zeros((), jnp.int32), restored.params,
                       tx.init(restored.params))
    _, losses_c = _sgd_steps(fresh, tx, 5)
    assert losses_c != losses_a
    # (losses equal at step 0 by construction; params diverge after it)
    assert float(sched(0)) != float(sched(3))


def test_checkpoint_bn_stats_payload_roundtrip(tmp_path):
    params, tx, _ = _toy_setup()
    state = create_train_state(params, tx)
    bn_stats = {"backbone": {"bn1": {"mean": jnp.full((4,), 2.5),
                                     "var": jnp.full((4,), 0.3)}}}
    path = save_checkpoint(str(tmp_path), state, epoch=2, bn_stats=bn_stats)
    template_stats = jax.tree.map(jnp.zeros_like, bn_stats)
    restored, restored_stats = restore_checkpoint(
        path, create_train_state(params, tx), template_stats)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        bn_stats, restored_stats)
    assert int(restored.step) == 0


def test_restore_weights_params_only(tmp_path):
    """--start_from_weights (train.py:260-263): params restored, optimizer
    state NOT touched."""
    params, tx, _ = _toy_setup()
    state = create_train_state(params, tx)
    state, _ = _sgd_steps(state, tx, 2)
    path = save_checkpoint(str(tmp_path), state, epoch=0)
    got = restore_weights(path, jax.tree.map(jnp.zeros_like, params))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.params, got)


def test_latest_epoch_autodiscovery(tmp_path):
    assert latest_epoch(str(tmp_path / "nope")) is None
    params, tx, _ = _toy_setup()
    state = create_train_state(params, tx)
    for e in (0, 3, 11):
        save_checkpoint(str(tmp_path), state, epoch=e)
    (tmp_path / "model_junk").mkdir()  # non-numeric suffix ignored
    assert latest_epoch(str(tmp_path)) == 11


def test_load_estimator_restores_bn_stats(tmp_path):
    """--blur_estimator_path must restore the estimator's RUNNING BN
    stats from a train_blur_estimator checkpoint (save_checkpoint's
    bn_stats payload) — eval-mode BN normalizes with them, so silently
    falling back to fresh stats would skew every dispatch (the reference
    loads the full state dict, evaluate.py:186-205)."""
    import numpy as np

    from detectinblur_tpu.cli.evaluate import load_estimator
    from detectinblur_tpu.models.classifier import ResNetClassifier
    from detectinblur_tpu.train.state import create_train_state

    est = ResNetClassifier("resnet18", 4, bn_mode="eval")
    variables = est.init(jax.random.key(3),
                         np.zeros((1, 32, 32, 3), np.float32))
    import optax

    tx = optax.sgd(0.1)
    state = create_train_state(variables["params"], tx)
    # Recognizable running stats, nothing like the fresh zeros/ones.
    stats = jax.tree.map(lambda x: jnp.full_like(x, 0.125),
                         variables["batch_stats"])
    path = save_checkpoint(str(tmp_path), state, epoch=0, bn_stats=stats)

    _, est_vars = load_estimator(path, 4)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        stats, est_vars["batch_stats"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.params, est_vars["params"])


def test_load_estimator_bare_weights_fresh_stats(tmp_path, capsys):
    """A bare params-tree checkpoint (no bn_stats payload) falls back to
    fresh stats WITH a warning, instead of crashing."""
    import numpy as np
    import orbax.checkpoint as ocp

    from detectinblur_tpu.cli.evaluate import load_estimator
    from detectinblur_tpu.models.classifier import ResNetClassifier

    est = ResNetClassifier("resnet18", 4, bn_mode="eval")
    variables = est.init(jax.random.key(3),
                         np.zeros((1, 32, 32, 3), np.float32))
    path = str(tmp_path / "weights_only")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, variables["params"])
    _, est_vars = load_estimator(path, 4)
    assert "no bn_stats" in capsys.readouterr().out
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables["params"], est_vars["params"])


def test_restore_weights_bare_tree_not_template(tmp_path):
    """A BARE params-tree checkpoint must restore the saved values — not
    silently return the caller's template (Orbax's partial restore does
    exactly that for absent subtrees; round 5 found the fallback branch
    dead because of it)."""
    import orbax.checkpoint as ocp

    saved = {"w": jnp.full((3, 4), 7.5), "b": jnp.full((4,), -2.0)}
    path = str(tmp_path / "bare")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, saved)
    template = jax.tree.map(jnp.zeros_like, saved)
    got = restore_weights(path, template)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        saved, got)
