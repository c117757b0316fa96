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
    blur_eval: bool = True,
    expand_target_boxes: bool = False,
    use_warp: bool = False,
    use_custom_norm: bool = False,
    deblur_vars=None,
    add_noise: bool = False,
    noise_level: float = 0.001,
    add_block: bool = False,
    add_jpeg: bool = False,
    dilate_psf: bool = False,
):
    """Returns a jitted fn(stacked_params, estimator_vars, batch[, key]) ->
    (Detections, expanded_gt, model_index).

    (1) blurs/expands/corrupts exactly like the single-model eval step —
    under --use_ensemble the reference still applies expanded-GT rewrite,
    deblur-first, corruptions and PSF dilation (engine.py:319-342,353-366);
    (2) classifies blur with the estimator (resnet18 on the blurred image,
    resized into the model bucket), or uses the oracle when estimator is
    None; (3) runs the selected specialist. Eval protocol is batch 1
    (evaluate.py uses batch_size=1), so one gather per step."""
    from detectinblur_tpu.models.detection_transform import preprocess_batch
    from detectinblur_tpu.train.engine import _blur_norms, prepare_eval_batch

    def predict(stacked_params, estimator_vars, batch, key=None):
        batch = prepare_eval_batch(
            batch, key, blur_eval=blur_eval,
            expand_target_boxes=expand_target_boxes, deblur_vars=deblur_vars,
            add_noise=add_noise, noise_level=noise_level, add_block=add_block,
            add_jpeg=add_jpeg, dilate_psf=dilate_psf, use_warp=use_warp)
        if estimator is None:
            idx = model_index_oracle(
                batch.blurring, batch.param_index, batch.fraction_index
            )[0]
        else:
            # The reference batches the estimator input with
            # crop_images=True (engine.py:264).
            imgs, _ = preprocess_batch(batch.images, batch.hw, bucket,
                                       crop_images=True)
            logits = estimator.apply(estimator_vars, imgs)
            pred = jnp.argmax(logits, axis=-1)
            if lehe:
                idx = jnp.clip(pred[0], 0, 3)
            else:
                idx = estimator_to_model_index_16(pred[0])
        params = select_params(stacked_params, idx)
        means, stds = _blur_norms(batch, use_custom_norm)
        dets = model.predict(
            params, batch.images, batch.hw, bucket=bucket,
            means=means, stds=stds,
            thetas=batch.thetas if use_warp else None,
            lam1s=batch.lam1s if use_warp else None,
            lam2s=batch.lam2s if use_warp else None,
        )
        return dets, batch.gt_boxes, idx

    return jax.jit(predict)
