"""LEHE estimator-gated specialist ensemble, as one jitted graph.

The reference keeps 4 separate detectors and dispatches per image in Python
(engine.py:194-218,353-366). TPU-native: the 4 specialists' param trees are
stacked on a leading axis; the blur estimator (or oracle) picks an index
per image; the chosen specialist's params are gathered with one
dynamic-slice per leaf — no host round trip, no graph switch.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from detectinblur_tpu.models.classifier import (
    ResNetClassifier,
    estimator_to_model_index_16,
    model_index_oracle,
)


def stack_params(param_trees: Sequence) -> object:
    """[tree] * N -> tree with leading axis N on every leaf."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *param_trees)


def select_params(stacked, index: jax.Array):
    """Gather one specialist's params by (traced) index."""
    return jax.tree.map(
        lambda x: jax.lax.dynamic_index_in_dim(x, index, axis=0, keepdims=False),
        stacked,
    )


def make_ensemble_predict(
    model,
    bucket,
    estimator: Optional[ResNetClassifier] = None,
    lehe: bool = True,
):
    """Returns a jitted fn(stacked_params, estimator_vars, batch) that
    (1) classifies blur with the estimator (resnet18 on the blurred image,
    resized into the model bucket), or uses the oracle when estimator is
    None; (2) runs the selected specialist. Eval protocol is batch 1
    (evaluate.py uses batch_size=1), so one gather per step."""
    from detectinblur_tpu.models.detection_transform import preprocess_batch
    from detectinblur_tpu.train.engine import apply_blur_and_expand

    def predict(stacked_params, estimator_vars, batch):
        batch = apply_blur_and_expand(batch, expand_target_boxes=False)
        if estimator is None:
            idx = model_index_oracle(
                batch.blurring, batch.param_index, batch.fraction_index
            )[0]
        else:
            imgs, _ = preprocess_batch(batch.images, batch.hw, bucket)
            logits = estimator.apply(estimator_vars, imgs)
            pred = jnp.argmax(logits, axis=-1)
            if lehe:
                idx = jnp.clip(pred[0], 0, 3)
            else:
                idx = estimator_to_model_index_16(pred[0])
        params = select_params(stacked_params, idx)
        dets = model.predict(params, batch.images, batch.hw, bucket=bucket)
        return dets, idx

    return jax.jit(predict)
