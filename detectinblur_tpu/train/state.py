"""Train state: SGD + multi-step LR + warmup + parameter freezing.

Reproduces the reference recipe (train.py:244-248,417-424; warmup
utils.py:700-708): SGD momentum 0.9, weight decay 1e-4, MultiStepLR at
epochs [16, 22] with gamma 0.1, and a linear warmup from 1/1000 over the
first min(1000, steps_per_epoch) iterations of epoch 0.

Freezing matches ``trainable_backbone_layers`` (models/faster_rcnn.py:348):
FrozenBN affines never train; with the default of 3 trainable stages,
conv1/bn1/layer1 are frozen and layer2..4 + FPN + heads train.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def make_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    milestones: Sequence[int] = (16, 22),
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 1000,
    warmup_iters: int | None = None,
):
    if warmup_iters is None:
        warmup_iters = min(1000, steps_per_epoch - 1) if steps_per_epoch > 1 else 0

    boundaries = jnp.asarray([m * steps_per_epoch for m in milestones])

    def schedule(step):
        step = jnp.asarray(step)
        decays = jnp.sum(step >= boundaries)
        lr = base_lr * gamma**decays
        if warmup_iters > 0:
            alpha = jnp.clip(step / warmup_iters, 0.0, 1.0)
            wf = warmup_factor * (1 - alpha) + alpha
            lr = lr * jnp.where(step < warmup_iters, wf, 1.0)
        return lr

    return schedule


def _freeze_mask(params, trainable_backbone_layers: int = 3):
    """True = trainable. FrozenBN affines and the frozen backbone stages
    (by trainable_backbone_layers) are masked out."""
    # torchvision: layers_to_train = [layer4, layer3, layer2, layer1,
    # conv1][:trainable_backbone_layers]; 3 -> layer1 + stem frozen.
    frozen_prefixes = ["conv1", "bn1"] if trainable_backbone_layers < 5 else []
    frozen_prefixes += [f"layer{i}" for i in range(1, 5 - trainable_backbone_layers)]

    def decide(path) -> bool:
        keys = [str(k.key) for k in path]
        if "backbone" in keys and "body" in keys:
            mod = keys[2] if len(keys) > 2 else ""
            base = mod.split("_")[0]
            if base in frozen_prefixes or mod in frozen_prefixes:
                return False
            # FrozenBN affines inside trainable stages stay frozen too.
            if any(k.startswith("bn") or k.startswith("downsample_1") for k in keys[2:]):
                return False
        return True

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree.structure(params)
    return jax.tree.unflatten(treedef, [decide(p) for p, _ in flat])


def make_optimizer(
    base_lr: float = 0.04,
    steps_per_epoch: int = 1000,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    milestones: Sequence[int] = (16, 22),
    gamma: float = 0.1,
    trainable_backbone_layers: int = 3,
    params=None,
):
    schedule = make_lr_schedule(base_lr, steps_per_epoch, milestones, gamma)
    sgd = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=schedule, momentum=momentum),
    )
    if params is None:
        return sgd, schedule
    mask = _freeze_mask(params, trainable_backbone_layers)
    tx = optax.multi_transform(
        {"train": sgd, "freeze": optax.set_to_zero()},
        jax.tree.map(lambda t: "train" if t else "freeze", mask),
    )
    return tx, schedule


def create_train_state(params, tx) -> TrainState:
    return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
