"""Blur-estimator train/eval engine (engine_blur_estimator.py equivalent).

Per step: device blur (optionally resized to min-side 800 first, matching
the estimator's own manual_blur variant, engine_blur_estimator.py:27-70),
optional noise/block/JPEG/quantize corruptions (:201-219), labels from the
blur struct (:98-129), cross-entropy (with optional label smoothing,
train_blur_estimator.py:97-112), SGD — one jitted program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from detectinblur_tpu.models.classifier import (
    ResNetClassifier,
    estimator_label,
    estimator_label_lehe,
)
from detectinblur_tpu.models.detection_transform import (
    preprocess_batch,
    resize_into_bucket,
    resize_valid,
)
from detectinblur_tpu.ops.blur import batched_blur
from detectinblur_tpu.ops.jpeg import jpeg_compress_decompress
from detectinblur_tpu.train.engine import BlurBatch
from detectinblur_tpu.train.state import TrainState


def apply_corruptions(key, images, add_noise=False, noise_level=0.001,
                      add_block=False, add_jpeg=False, quantize=False):
    """Noise / block / JPEG / quantize corruption chain
    (blur_functions.py:72-88, engine_blur_estimator.py:201-219).
    images [B, H, W, 3] in 0..1.

    Every draw — noise variance, block decision + scale, JPEG decision +
    quality — is per IMAGE (vmapped key splits), matching the reference
    where manual_blur is invoked once per image so each image gets its own
    corruption parameters (engine.py:101-102 loops blur_image_list over
    images; blur_functions.py:72-88 draws inside)."""
    if not (add_noise or add_block or add_jpeg or quantize):
        return images
    H, W = images.shape[1:3]

    def one(k, img):
        kn, kv, kb, kbs, kj, kjq = jax.random.split(k, 6)
        if add_noise:
            var = jax.random.uniform(kv, (), minval=1e-8, maxval=noise_level)
            noise = jax.random.normal(kn, img.shape) * jnp.sqrt(var)
            img = jnp.clip(img + noise, 0.0, 1.0)
        if add_block:
            do = jax.random.uniform(kb) > 0.5
            sf = jax.random.uniform(kbs, (), minval=0.6, maxval=1.0)
            # Nearest down/up via index gather (dynamic scale, static shapes).
            ys = jnp.clip(jnp.floor(jnp.arange(H) / sf) * sf,
                          0, H - 1).astype(jnp.int32)
            xs = jnp.clip(jnp.floor(jnp.arange(W) / sf) * sf,
                          0, W - 1).astype(jnp.int32)
            blocked = img[ys][:, xs]
            img = jnp.where(do, blocked, img)
        if add_jpeg:
            do = jax.random.uniform(kj) > 0.35
            q = jax.random.uniform(kjq, (), minval=20.0, maxval=90.0)
            img = jnp.where(do, jpeg_compress_decompress(img, q), img)
        if quantize:
            img = jnp.round(img * 255.0) / 255.0
        return img

    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(one)(keys, images)


def estimator_resize_canvas(Hb: int, Wb: int, aspect_cap: float = 2.0):
    """Static canvas fitting the min-side-800 resize of ANY image in the
    (Hb, Wb) bucket with aspect ratio up to ``aspect_cap``. pick_bucket
    assigns by size, not strictly orientation, so either side may be the
    short one — the canvas is square. Images beyond the cap (rare) are
    clamped to fit; everything else blurs at exactly min-side 800 like the
    reference (engine_blur_estimator.py:27-70)."""
    side = -(-int(round(800 * aspect_cap)) // 32) * 32
    bucket_fit = -(-int(round(800 * max(Hb, Wb) / min(Hb, Wb))) // 32) * 32
    side = max(side, bucket_fit)
    return side, side


def blur_batch_images(batch: BlurBatch, resize_images: bool = False) -> jax.Array:
    """Device blur of the batch, optionally at min-side-800 resolution.

    ``resize_images=True`` is the estimator's own manual_blur variant
    (engine_blur_estimator.py:27-70): resize so the short side is 800, blur
    there (the 128^2 PSF then covers a consistent fraction of the scene),
    and return the image at its original size. The reference's tail at
    :62-69 crops the top-left original-size window of the *upscaled* image
    and then runs a same-size interpolate — a no-op crop bug we do not
    reproduce; the intended round trip is resize -> blur -> resize back.
    Non-blurring images skip the round trip entirely (blur_image_list
    :72-80 never touches them).
    """
    from detectinblur_tpu.train.engine import images01

    batch = images01(batch)
    if not resize_images:
        chw = jnp.transpose(batch.images, (0, 3, 1, 2))
        blurred = batched_blur(chw, batch.psfs, batch.blurring, hw=batch.hw)
        return jnp.transpose(blurred, (0, 2, 3, 1))

    Hb, Wb = batch.images.shape[1:3]
    RH, RW = estimator_resize_canvas(Hb, Wb)

    def up(img, s):
        h = s[0].astype(jnp.float32)
        w = s[1].astype(jnp.float32)
        sc = jnp.minimum(800.0 / jnp.minimum(h, w),
                         jnp.minimum(RH / h, RW / w))
        return resize_into_bucket(img, s, sc, (RH, RW))

    big, big_hw = jax.vmap(up)(batch.images, batch.hw)
    chw = jnp.transpose(big, (0, 3, 1, 2))
    blurred = batched_blur(chw, batch.psfs, batch.blurring, hw=big_hw)
    big = jnp.transpose(blurred, (0, 2, 3, 1))
    down = jax.vmap(lambda img, bs, s: resize_valid(img, bs, s, (Hb, Wb)))
    out = down(big, big_hw, batch.hw)
    keep = batch.blurring[:, None, None, None]
    return jnp.where(keep, out, batch.images)


def make_estimator_train_step(
    classifier: ResNetClassifier,
    tx: optax.GradientTransformation,
    bucket: Tuple[int, int],
    lehe: bool = False,
    label_smoothing: float = 0.0,
    add_noise: bool = False,
    noise_level: float = 0.001,
    add_block: bool = False,
    add_jpeg: bool = False,
    quantize: bool = False,
    resize_images: bool = False,
    crop_images: bool = False,
):
    label_fn = estimator_label_lehe if lehe else estimator_label

    def step(state: TrainState, stats, batch: BlurBatch, key: jax.Array):
        kc, _ = jax.random.split(key)
        images = blur_batch_images(batch, resize_images)
        images = apply_corruptions(kc, images, add_noise, noise_level,
                                   add_block, add_jpeg, quantize)
        imgs, _ = preprocess_batch(images, batch.hw, bucket,
                                   crop_images=crop_images)
        labels = (label_fn(batch.blurring, batch.param_index,
                   batch.fraction_index, batch.est_label)
                  if lehe else
                  label_fn(batch.blurring, batch.param_index,
                           batch.fraction_index))

        def loss_fn(params):
            logits, new_stats = classifier.apply(
                {"params": params, "batch_stats": stats}, imgs,
                mutable=["batch_stats"],
            )
            nc = logits.shape[-1]
            onehot = jax.nn.one_hot(labels, nc)
            if label_smoothing > 0:
                onehot = onehot * (1 - label_smoothing) + label_smoothing / nc
            loss = optax.softmax_cross_entropy(logits, onehot).mean()
            acc = (jnp.argmax(logits, -1) == labels).mean()
            return loss, (new_stats["batch_stats"], acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(state.step + 1, params, opt_state), new_stats,
                {"loss": loss, "top1": acc})

    return jax.jit(step, donate_argnums=(0, 1))


def make_estimator_eval_step(classifier: ResNetClassifier,
                             bucket: Tuple[int, int], lehe: bool = False,
                             resize_images: bool = False,
                             crop_images: bool = False):
    label_fn = estimator_label_lehe if lehe else estimator_label
    # Eval uses running BN stats (torch model.eval(),
    # train_blur_estimator.py:254-270), not batch stats.
    eval_classifier = classifier.clone(bn_mode="eval")

    def step(variables, batch: BlurBatch, key: jax.Array):
        images = blur_batch_images(batch, resize_images)
        imgs, _ = preprocess_batch(images, batch.hw, bucket,
                                   crop_images=crop_images)
        logits = eval_classifier.apply(variables, imgs)
        labels = (label_fn(batch.blurring, batch.param_index,
                   batch.fraction_index, batch.est_label)
                  if lehe else
                  label_fn(batch.blurring, batch.param_index,
                           batch.fraction_index))
        top2 = jax.lax.top_k(logits, 2)[1]
        return {
            "pred": jnp.argmax(logits, -1),
            "label": labels,
            "top2_hit": jnp.any(top2 == labels[:, None], axis=1),
        }

    return jax.jit(step)
