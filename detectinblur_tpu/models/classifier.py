"""ResNet classifiers: the blur-type estimator and versatile backbones.

The blur estimator is torchvision resnet18 with fc -> 16 classes (none +
3 types x 5 exposures) or 4 classes for LEHE (none/P1HE/P2HE/P3HE)
(train_blur_estimator.py:212-217, evaluate.py:188-194). Labels derive from
the blur struct exactly as engine_blur_estimator.py:98-129.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectinblur_tpu.models.batchnorm import AdaptiveBatchNorm
from detectinblur_tpu.models.resnet import ResNet


class ResNetClassifier(nn.Module):
    arch: str = "resnet18"
    num_classes: int = 16
    bn_mode: str = "train"

    @nn.compact
    def __call__(self, x):
        norm = functools.partial(AdaptiveBatchNorm, mode=self.bn_mode)
        feats = ResNet(self.arch, norm=norm, name="body")(x)
        x = jnp.mean(feats[-1], axis=(1, 2))   # global average pool
        # torch nn.Linear default init (the reference swaps resnet18's fc
        # for a plain nn.Linear, train_blur_estimator.py:212-217).
        from detectinblur_tpu.models.resnet import (
            TORCH_LINEAR_KERNEL_INIT, torch_linear_bias_init)
        return nn.Dense(self.num_classes, name="fc",
                        precision=jax.lax.Precision.HIGHEST,
                        kernel_init=TORCH_LINEAR_KERNEL_INIT,
                        bias_init=torch_linear_bias_init(x.shape[-1]))(x)


def estimator_label(blurring, param_index, fraction_index) -> jax.Array:
    """16-class label: 0 = no blur, else param_index*5 + fraction_index + 1
    (engine_blur_estimator.py:98-105)."""
    lab = param_index * 5 + fraction_index + 1
    on = blurring & (param_index >= 0) & (fraction_index >= 0)
    return jnp.where(on, lab, 0).astype(jnp.int32)


def estimator_label_lehe(blurring, param_index, fraction_index,
                         est_label=None) -> jax.Array:
    """LEHE 4-class label: 0 = none/low-exposure, 1..3 = P{1..3} high
    exposure (engine_blur_estimator.py:107-129): high exposure means
    fraction_index in {3, 4}. A stored per-item label (natural-blur
    estimator data, blur_dict["blur_est_label"]) wins over the derived one
    (engine_blur_estimator.py:111-112); pass -1 / None for "not stored"."""
    high = fraction_index >= 3
    lab = param_index + 1
    on = blurring & (param_index >= 0) & high
    lab = jnp.where(on, lab, 0)
    if est_label is not None:
        lab = jnp.where(est_label >= 0, est_label, lab)
    return lab.astype(jnp.int32)


def estimator_to_model_index_16(pred_class: jax.Array) -> jax.Array:
    """Map a 16-class estimator prediction to the 4-model ensemble index
    (engine.py:194-205): class 0 -> model 0 (clean specialist); otherwise
    the blur-type specialist param_index + 1."""
    param = (pred_class - 1) // 5
    return jnp.where(pred_class == 0, 0, param + 1).astype(jnp.int32)


def model_index_oracle(blurring, param_index, fraction_index) -> jax.Array:
    """Oracle ensemble dispatch from the true blur struct
    (engine.py:171-192): clean or negligible exposure (fraction -1) ->
    model 0, else the blur-type specialist param_index + 1."""
    on = blurring & (param_index >= 0) & (fraction_index >= 0)
    return jnp.where(on, param_index + 1, 0).astype(jnp.int32)
