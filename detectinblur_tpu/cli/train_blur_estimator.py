"""Blur-estimator training CLI (train_blur_estimator.py equivalent).

resnet18 -> 16 classes (none + 3 types x 5 exposures) or 4 (LEHE), trained
on device-blurred COCO with the LEHE class-weighted sampling
(transforms.py:238-263), CE loss (optional label smoothing), SGD; eval
reports top-1/top-2 and per-class mean accuracy plus confusion matrices in
--test_only mode (train_blur_estimator.py:254-412).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from detectinblur_tpu.cli.args import add_common_args
from detectinblur_tpu.data.blur_sampling import BlurPolicy, generate_psf_bank
from detectinblur_tpu.data.coco import get_coco
from detectinblur_tpu.data.loader import DetectionLoader
from detectinblur_tpu.models.classifier import ResNetClassifier
from detectinblur_tpu.parallel.mesh import make_mesh
from detectinblur_tpu.train.estimator_engine import (
    make_estimator_eval_step,
    make_estimator_train_step,
)
from detectinblur_tpu.train.state import TrainState, make_lr_schedule
from detectinblur_tpu.data.batching import model_bucket_for
from detectinblur_tpu.utils.logging import ScalarWriter
from detectinblur_tpu.utils.metric_logger import MetricLogger
import optax


def estimator_parser():
    import argparse

    p = argparse.ArgumentParser(description="blur estimator training")
    add_common_args(p)
    p.add_argument("--epochs", default=10, type=int)
    p.add_argument("--lr", default=0.01, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--wd", "--weight-decay", dest="weight_decay",
                   default=1e-4, type=float)
    p.add_argument("--LEHE_blur_seg", action="store_true")
    p.add_argument("--crop_images", action="store_true")
    p.add_argument("--resize_images", action="store_true")
    p.add_argument("--quantize_image", action="store_true")
    p.add_argument("--test_only", action="store_true")
    p.add_argument("--label_smoothing", default=0.0, type=float)
    return p


def confusion_matrix(preds, labels, n):
    cm = np.zeros((n, n), np.int64)
    for p_, l_ in zip(preds, labels):
        cm[l_, p_] += 1
    return cm


def main(argv=None):
    args = estimator_parser().parse_args(argv)
    np.random.seed(1337)
    mesh = make_mesh()
    writer = ScalarWriter(args.tensorboard_path)

    lehe = args.LEHE or args.LEHE_blur_seg
    n_classes = 4 if lehe else 16
    classifier = ResNetClassifier("resnet18", n_classes)

    policy = BlurPolicy(prob=0.9, lehe_blur_seg=args.LEHE_blur_seg)
    bank = generate_psf_bank(jax.random.key(7), bank_size=512)

    if args.dataset == "GOPROBlurEst":
        # Natural-blur estimator data: pre-blurred images with stored class
        # labels (custom_datasets.py:1074-1231); the blur stage passes them
        # through and labels come from blur_est_label. The stored labels are
        # LEHE-class labels and only the LEHE label path consults them
        # (engine_blur_estimator.py:111-112); the 16-class path would
        # silently train on all-zero labels.
        if not args.LEHE_blur_seg:
            raise SystemExit(
                "--dataset GOPROBlurEst requires --LEHE_blur_seg: its stored "
                "blur_est_label values are LEHE classes and the 16-class "
                "label derivation ignores them (all items are pre-blurred, "
                "so every 16-class label would be 0).")
        from detectinblur_tpu.data.natural_datasets import GOPROBlurEst

        dataset = GOPROBlurEst(args.data_path, "train")
        dataset_val = GOPROBlurEst(args.data_path, "val")
    else:
        dataset = get_coco(args.data_path, "train")
        dataset_val = get_coco(args.data_path, "val")
    loader = DetectionLoader(dataset, args.batch_size, policy, bank,
                             shuffle=True, hflip_prob=0.5,
                             num_processes=jax.process_count(),
                             process_index=jax.process_index(),
                             num_workers=args.workers)

    variables = classifier.init(jax.random.key(0),
                                np.zeros((1, 224, 224, 3), np.float32))
    params, stats = variables["params"], variables["batch_stats"]
    if args.pretrained or args.start_from_weights.endswith(".pth"):
        # ImageNet-pretrained resnet18 torso, fresh fc
        # (train_blur_estimator.py:212-217).
        from detectinblur_tpu.utils.torch_convert import (
            convert_resnet_classifier_state_dict,
            load_torch_state_dict,
        )

        path = args.start_from_weights or f"{args.output_dir}/resnet18_imagenet.pth"
        try:
            sd = load_torch_state_dict(path)
            conv_p, conv_s = convert_resnet_classifier_state_dict(sd)
            params = {**params, **conv_p}
            stats = conv_s
            print(f"loaded ImageNet resnet18 torso from {path}")
        except FileNotFoundError:
            print(f"pretrained weights not found at {path}; "
                  "training from scratch")
    schedule = make_lr_schedule(args.lr, max(len(loader), 1), milestones=(6, 8))
    tx = optax.chain(optax.add_decayed_weights(args.weight_decay),
                     optax.sgd(schedule, momentum=args.momentum))
    state = TrainState(np.int32(0), params, tx.init(params))
    if args.resume:
        from detectinblur_tpu.train.checkpoint import restore_checkpoint

        state, stats = restore_checkpoint(args.resume, state, stats)
        print(f"resumed from {args.resume}")

    steps = {}
    with mesh:
        if not args.test_only:
            for epoch in range(args.epochs):
                loader.set_epoch(epoch)
                logger = MetricLogger()
                for it, (batch, bucket, _) in enumerate(
                    logger.log_every(loader, args.print_freq, f"Epoch [{epoch}]")
                ):
                    if bucket not in steps:
                        steps[bucket] = make_estimator_train_step(
                            classifier, tx, model_bucket_for(bucket),
                            lehe=lehe, label_smoothing=args.label_smoothing,
                            add_noise=args.add_noise, noise_level=args.noise_level,
                            add_block=args.add_block, add_jpeg=args.add_jpeg_artefacts,
                            quantize=args.quantize_image,
                            resize_images=args.resize_images,
                            crop_images=args.crop_images,
                        )
                    key = jax.random.fold_in(jax.random.key(3), int(state.step))
                    state, stats, metrics = steps[bucket](state, stats, batch, key)
                    if it % args.print_freq == 0:
                        logger.update(**{k: float(v) for k, v in metrics.items()})
                        writer.add_scalar("losses/ce", float(metrics["loss"]),
                                          int(state.step))
                    if args.early_stop and it >= args.early_stop:
                        break

        # Evaluation: top-1/top-2 + per-class mean acc (+ confusion matrix).
        val_loader = DetectionLoader(dataset_val, args.batch_size, policy, bank,
                                     shuffle=False, drop_last=False,
                                     num_processes=jax.process_count(),
                                     process_index=jax.process_index(),
                                     num_workers=args.workers)
        eval_steps = {}
        preds, labels, top2 = [], [], []
        for it, (batch, bucket, _) in enumerate(val_loader):
            if bucket not in eval_steps:
                eval_steps[bucket] = make_estimator_eval_step(
                    classifier, model_bucket_for(bucket), lehe=lehe,
                    resize_images=args.resize_images,
                    crop_images=args.crop_images)
            out = eval_steps[bucket](
                {"params": state.params, "batch_stats": stats}, batch,
                jax.random.key(0))
            preds += np.asarray(out["pred"]).tolist()
            labels += np.asarray(out["label"]).tolist()
            top2 += np.asarray(out["top2_hit"]).tolist()
            if args.early_stop and it >= args.early_stop:
                break

        preds, labels, top2 = map(np.asarray, (preds, labels, top2))
        top1 = float((preds == labels).mean())
        top2_acc = float(np.mean(top2))
        per_class = [float((preds[labels == c] == c).mean())
                     for c in range(n_classes) if (labels == c).any()]
        mean_class = float(np.mean(per_class)) if per_class else 0.0
        print(f"Top1 {top1:.4f}  Top2 {top2_acc:.4f}  MeanClassAcc {mean_class:.4f}")
        writer.add_scalar("Blurred/Top1Accuracy", top1, 0)
        writer.add_scalar("Blurred/Top2Accuracy", top2_acc, 0)
        if args.test_only:
            cm = confusion_matrix(preds, labels, n_classes)
            print("confusion matrix (rows=gt):")
            print(cm)
            if args.output_dir:
                np.save(os.path.join(args.output_dir, "confusion_matrix.npy"), cm)
        if args.output_dir and not args.test_only:
            from detectinblur_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(args.output_dir, state, args.epochs - 1,
                            vars(args), bn_stats=stats)
    writer.close()
    return top1


if __name__ == "__main__":
    main()
