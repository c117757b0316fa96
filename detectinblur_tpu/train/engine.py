"""Train/eval engines: the jitted step functions.

The per-iteration semantics mirror engine.py:30-167 of the reference —
device-side blur (``--gpu_blur``), PSF-driven target-box expansion
(``--expand_target_boxes``), blur-conditional normalization, squint warp
params — but the whole iteration (blur -> expand -> forward -> loss ->
grads -> SGD) is ONE compiled XLA program, SPMD over the data mesh. Loss
reduction across chips is implicit in the partitioner (the pmean the
reference does by DDP hooks + reduce_dict, utils.py:579-603).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from detectinblur_tpu.models.faster_rcnn import FasterRCNN
from detectinblur_tpu.ops.blur import batched_blur
from detectinblur_tpu.ops.boxes import expand_boxes_by_psf
from detectinblur_tpu.train.state import TrainState


class BlurBatch(NamedTuple):
    """Fixed-shape device batch: the blur_dict contract
    (transforms.py:412-463) as a struct of arrays."""

    images: jax.Array        # [B, Hb, Wb, 3] raw 0..1, valid at top-left
    hw: jax.Array            # [B, 2] valid sizes
    psfs: jax.Array          # [B, 128, 128]
    blurring: jax.Array      # [B] bool
    thetas: jax.Array        # [B]
    lam1s: jax.Array         # [B]
    lam2s: jax.Array         # [B]
    param_index: jax.Array   # [B] int32, -1 when N/A
    fraction_index: jax.Array  # [B] int32, -1 for negligible exposure
    gt_boxes: jax.Array      # [B, G, 4]
    gt_labels: jax.Array     # [B, G]
    gt_valid: jax.Array      # [B, G]
    # Stored estimator class label (blur_dict["blur_est_label"],
    # custom_datasets.py:1170); -1 / None = derive from the blur struct.
    est_label: jax.Array = None


def images01(batch: BlurBatch) -> BlurBatch:
    """Decode uint8 image transport to the f32 0..1 device convention.

    Loader-built batches ship images as uint8 (4x less host->device
    traffic and host canvas bandwidth; bit-faithful to the reference,
    whose pipeline stays PIL-uint8 until ToTensor, transforms.py:173-176).
    Synthetic/test batches built directly in f32 pass through unchanged.
    Every jitted entry point (train step, eval preamble, estimator blur)
    calls this first, so the cast+scale fuses into the program."""
    if batch.images.dtype == jnp.uint8:
        return batch._replace(
            images=batch.images.astype(jnp.float32) / 255.0)
    return batch


def apply_blur_and_expand(
    batch: BlurBatch,
    expand_target_boxes: bool,
    exact_blur: Optional[bool] = None,
    key: Optional[jax.Array] = None,
    add_noise: bool = False,
    noise_level: float = 0.001,
    add_block: bool = False,
    add_jpeg: bool = False,
    dilate_psf_sigma: Optional[jax.Array] = None,
) -> BlurBatch:
    """Device-side GPU-blur + expand_targets (engine.py:101-105), with the
    optional corruption chain of manual_blur (blur_functions.py:72-88) and
    PSF defocus dilation for eval (--dilate_psf).

    ``exact_blur=None`` follows the precision config: the parity
    configuration (DETECTINBLUR_PRECISION=highest, the default) uses the
    bit-matched circular convolution at the exact padded size; throughput
    mode (bench.py sets "default") keeps the smooth-size FFT / MXU-DFT
    path (ops/blur.py:51-90)."""
    if exact_blur is None:
        from detectinblur_tpu.models.resnet import CONV_PRECISION

        exact_blur = CONV_PRECISION == jax.lax.Precision.HIGHEST
    psfs = batch.psfs
    if dilate_psf_sigma is not None:
        from detectinblur_tpu.ops.psf import dilate_psf

        psfs = jax.vmap(dilate_psf)(psfs, dilate_psf_sigma)
    imgs_chw = jnp.transpose(batch.images, (0, 3, 1, 2))
    # hw: pad against each image's VALID extent (reference blurs per image
    # at its own size) instead of the batched canvas — see batched_blur.
    blurred = batched_blur(imgs_chw, psfs, batch.blurring, exact=exact_blur,
                           hw=batch.hw)
    images = jnp.transpose(blurred, (0, 2, 3, 1))
    if key is not None and (add_noise or add_block or add_jpeg):
        from detectinblur_tpu.train.estimator_engine import apply_corruptions

        images = apply_corruptions(key, images, add_noise, noise_level,
                                   add_block, add_jpeg)
    gt_boxes = batch.gt_boxes
    if expand_target_boxes:
        gt_boxes = jax.vmap(
            lambda b, p, on, s: expand_boxes_by_psf(b, p, on, s[0], s[1])
        )(batch.gt_boxes, psfs, batch.blurring, batch.hw)
    return batch._replace(images=images, gt_boxes=gt_boxes, psfs=psfs)


def derive_warp_params(batch: BlurBatch) -> BlurBatch:
    """Squint warp params from the PSFs on-device (the reference computes
    this PCA per image in dataloader workers, transforms.py:364-385);
    non-blurred images get the identity (theta 0, lambda 1)."""
    from detectinblur_tpu.ops.psf import psf_principal_components

    comps = jax.vmap(psf_principal_components)(batch.psfs)
    on = batch.blurring
    return batch._replace(
        thetas=jnp.where(on, comps.theta_rad, 0.0),
        lam1s=jnp.where(on, comps.scale_factor_lambda1, 1.0),
        lam2s=jnp.where(on, comps.scale_factor_lambda2, 1.0),
    )


def make_train_step(
    model: FasterRCNN,
    tx: optax.GradientTransformation,
    bucket: Tuple[int, int],
    blur_train: bool = True,
    expand_target_boxes: bool = False,
    use_warp: bool = False,
    use_custom_norm: bool = False,
    add_noise: bool = False,
    noise_level: float = 0.001,
    add_block: bool = False,
    add_jpeg: bool = False,
):
    """Build the jitted train step: (state, batch, key) -> (state, metrics).

    With an unfrozen-BN model (cfg.bn_mode == "train",
    --unfrozen_batch_norm) the signature becomes
    (state, bn_stats, batch, key) -> (state, bn_stats, metrics).
    """
    with_bn = getattr(model, "has_bn", model.cfg.bn_mode is not None)

    def step(state: TrainState, bn_stats, batch: BlurBatch, key: jax.Array):
        batch = images01(batch)
        key, bkey = jax.random.split(key)
        if blur_train:
            batch = apply_blur_and_expand(
                batch, expand_target_boxes, key=bkey, add_noise=add_noise,
                noise_level=noise_level, add_block=add_block, add_jpeg=add_jpeg)
        if use_warp:
            batch = derive_warp_params(batch)

        means, stds = _blur_norms(batch, use_custom_norm)

        def loss_fn(params):
            losses, new_stats = model.loss(
                params, key, batch.images, batch.hw,
                batch.gt_boxes, batch.gt_labels, batch.gt_valid,
                bucket=bucket, means=means, stds=stds,
                thetas=batch.thetas if use_warp else None,
                lam1s=batch.lam1s if use_warp else None,
                lam2s=batch.lam2s if use_warp else None,
                bn_stats=bn_stats,
            )
            return sum(losses.values()), (losses, new_stats)

        ((total, (losses, new_stats)), grads) = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        new_state = TrainState(state.step + 1, params, opt_state)
        return new_state, (new_stats if new_stats is not None else bn_stats), metrics

    jitted = jax.jit(step, donate_argnums=(0,))
    if with_bn:
        return jitted

    def no_stats(state, batch, key):
        new_state, _, metrics = jitted(state, None, batch, key)
        return new_state, metrics

    # The underlying jitted step, for AOT introspection (bench_pipeline.py
    # reads XLA's FLOP count off one lowering instead of compiling a
    # second wrapper program).
    no_stats.jitted = jitted
    return no_stats


def _blur_norms(batch: BlurBatch, use_custom_norm: bool):
    """Blur-conditional input normalization (utils.py:219-273): blurred
    images normalize with measured per-(type, exposure) stds."""
    if not use_custom_norm:
        return None, None
    from detectinblur_tpu.ops.normalization import get_norm_params

    return get_norm_params(batch.blurring, batch.param_index, batch.fraction_index)


def prepare_eval_batch(
    batch: BlurBatch,
    key: Optional[jax.Array],
    *,
    blur_eval: bool = False,
    expand_target_boxes: bool = False,
    deblur_vars=None,
    add_noise: bool = False,
    noise_level: float = 0.001,
    add_block: bool = False,
    add_jpeg: bool = False,
    dilate_psf: bool = False,
    use_warp: bool = False,
) -> BlurBatch:
    """The shared eval preamble: blur + corruptions + GT expansion,
    deblur-first, and warp-parameter derivation, in the reference's order
    (engine.py:301-342). Single-model (``make_eval_step``) and ensemble
    (``models/ensemble.py``) eval both run through here so the chains
    cannot diverge."""
    batch = images01(batch)
    if key is None:
        key = jax.random.key(0)
    key, bkey, dkey = jax.random.split(key, 3)
    if blur_eval:
        sigma = (jax.random.uniform(dkey, (batch.images.shape[0],),
                                    minval=0.0, maxval=3.0)
                 if dilate_psf else None)
        batch = apply_blur_and_expand(
            batch, expand_target_boxes, key=bkey, add_noise=add_noise,
            noise_level=noise_level, add_block=add_block, add_jpeg=add_jpeg,
            dilate_psf_sigma=sigma)
    if deblur_vars is not None:
        from detectinblur_tpu.models.deblur import deblur_image

        deblurred = jax.vmap(lambda im: deblur_image(deblur_vars, im))(
            batch.images)
        batch = batch._replace(images=deblurred)
    if use_warp:
        batch = derive_warp_params(batch)
    return batch


def make_eval_step(
    model: FasterRCNN,
    bucket: Tuple[int, int],
    blur_eval: bool = False,
    expand_target_boxes: bool = False,
    use_warp: bool = False,
    use_custom_norm: bool = False,
    deblur_vars=None,
    add_noise: bool = False,
    noise_level: float = 0.001,
    add_block: bool = False,
    add_jpeg: bool = False,
    dilate_psf: bool = False,
    bn_stats=None,
):
    """Build the jitted eval step: (params, batch[, key]) ->
    (Detections, expanded_gt).

    ``deblur_vars`` enables the deblur-first remedy (engine.py:319-322):
    the MSResNet runs on-device right after the blur, not via the
    reference's GPU->CPU->GPU round trip.
    """

    def step(params, batch: BlurBatch, key: Optional[jax.Array] = None):
        batch = prepare_eval_batch(
            batch, key, blur_eval=blur_eval,
            expand_target_boxes=expand_target_boxes, deblur_vars=deblur_vars,
            add_noise=add_noise, noise_level=noise_level, add_block=add_block,
            add_jpeg=add_jpeg, dilate_psf=dilate_psf, use_warp=use_warp)
        means, stds = _blur_norms(batch, use_custom_norm)
        dets = model.predict(
            params, batch.images, batch.hw, bucket=bucket, means=means, stds=stds,
            thetas=batch.thetas if use_warp else None,
            lam1s=batch.lam1s if use_warp else None,
            lam2s=batch.lam2s if use_warp else None,
            bn_stats=bn_stats,
        )
        return dets, batch.gt_boxes

    return jax.jit(step)
