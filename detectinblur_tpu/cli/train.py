"""Training entry point (reference train.py equivalent).

Pipeline: dataset -> per-host loader -> device PSF bank -> jitted SPMD
train step (blur + expand + forward + losses + SGD in one XLA program) ->
per-epoch Orbax checkpoint + clean/blurred eval + TensorBoard scalars
(train.py:89-391 semantics).
"""

from __future__ import annotations

import time

import jax
import numpy as np

from detectinblur_tpu.cli.args import train_parser
from detectinblur_tpu.data.blur_sampling import BlurPolicy, generate_psf_bank
from detectinblur_tpu.data.coco import get_coco
from detectinblur_tpu.data.loader import DetectionLoader
from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
from detectinblur_tpu.parallel.mesh import is_main_process, make_mesh
from detectinblur_tpu.train.checkpoint import restore_checkpoint, restore_weights, save_checkpoint
from detectinblur_tpu.train.engine import make_train_step, make_eval_step
from detectinblur_tpu.train.eval_loop import evaluate_coco
from detectinblur_tpu.train.state import create_train_state, make_optimizer
from detectinblur_tpu.data.batching import model_bucket_for_batch
from detectinblur_tpu.utils.logging import ScalarWriter
from detectinblur_tpu.utils.metric_logger import MetricLogger
from detectinblur_tpu.utils.torch_convert import (
    convert_fasterrcnn_state_dict,
    load_torch_state_dict,
)

BLUR_STAT_TAGS = ["AveragePrecision", "AP50", "AP75", "APSmall", "APMedium",
                  "APLarge", "AR1", "AR10", "AR100", "ARSmall", "ARMedium",
                  "ARLarge"]


def build_model(args, bn_mode=None):
    """Reference model dispatch by substring, train.py:218-230: FPN
    detector, or a versatile single-map mobile_net / resnet_50. The
    dataset sets num_classes (get_dataset: coco -> 91, coco_kp -> 2)."""
    num_classes = 2 if getattr(args, "dataset", "coco") == "coco_kp" else 91
    if "fasterrcnn_resnet50_fpn" in args.model:
        cfg = FasterRCNNConfig(num_classes=num_classes,
                               warp_internally=args.warp_in_model,
                               bn_mode=bn_mode)
        return FasterRCNN(cfg)
    from detectinblur_tpu.models.backbones import (
        SingleMapConfig,
        SingleMapFasterRCNN,
    )

    if "mobile_net" in args.model:
        return SingleMapFasterRCNN(SingleMapConfig(
            "mobile_net", num_classes=num_classes, bn_mode=bn_mode))
    if "resnet_50" in args.model:
        return SingleMapFasterRCNN(SingleMapConfig(
            "resnet50", num_classes=num_classes, bn_mode=bn_mode))
    raise ValueError(f"Unrecognized model type {args.model!r} "
                     "(train.py:228-230 semantics)")


def load_initial_params(args, model, bn_stats=None):
    """(params, bn_stats). ``--pretrained`` / a ``.pth``
    --start_from_weights loads torch weights: COCO detector weights for
    the FPN model (faster_rcnn.py:360-372), ImageNet torso weights for
    versatile models (versatile_backbone_models.py:31-96, heads stay
    random)."""
    key = jax.random.key(1337)
    params = model.init(key)
    if args.pretrained or args.start_from_weights.endswith(".pth"):
        is_fpn = isinstance(model, FasterRCNN)
        default_pth = ("fasterrcnn_resnet50_fpn_coco.pth" if is_fpn
                       else f"{model.cfg.backbone}_imagenet.pth")
        path = args.start_from_weights or f"{args.output_dir}/{default_pth}"
        try:
            sd = load_torch_state_dict(path)
            if is_fpn:
                params = convert_fasterrcnn_state_dict(sd)
            elif model.cfg.backbone == "mobile_net":
                from detectinblur_tpu.utils.torch_convert import (
                    convert_mobilenet_v2_features,
                )

                torso, torso_stats = convert_mobilenet_v2_features(sd)
                params["backbone"] = torso
                bn_stats = {"backbone": torso_stats}
            else:
                from detectinblur_tpu.utils.torch_convert import (
                    convert_resnet_trunk_state_dict,
                )

                torso, torso_stats = convert_resnet_trunk_state_dict(
                    sd, arch=model.cfg.backbone,
                    frozen_bn=not model.has_bn)
                params["backbone"] = torso
                if torso_stats is not None:
                    bn_stats = {"backbone": torso_stats}
            print(f"loaded torch weights from {path}")
        except FileNotFoundError:
            print(f"pretrained weights not found at {path}; training from scratch")
    return params, bn_stats


def main(argv=None):
    args = train_parser().parse_args(argv)
    np.random.seed(1337 + jax.process_index() * 1337)  # train.py:100-104

    mesh = make_mesh()
    writer = ScalarWriter(args.tensorboard_path)

    if args.dataset == "coco_kp":
        from detectinblur_tpu.data.coco import get_coco_kp

        dataset = get_coco_kp(args.data_path, "train")
        dataset_val = get_coco_kp(args.data_path, "val")
    else:
        dataset = get_coco(args.data_path, "train")
        dataset_val = get_coco(args.data_path, "val")

    policy = BlurPolicy.training_default(
        low=args.low_exposure, high=args.high_exposure
    ) if args.blur_train else BlurPolicy(prob=0.0)
    if args.param_index is not None:
        from detectinblur_tpu.ops.psf import BLUR_PARAMS, EVAL_PARAMS

        # With stored PSFs the index is a folder index 1-3; otherwise an
        # index into [0.01, 0.005, 0.001, 0.00005] (train.py:127-137).
        params_list = BLUR_PARAMS if args.use_stored_psfs else EVAL_PARAMS
        offset = -1 if args.use_stored_psfs else 0
        policy.blur_type = params_list[args.param_index + offset]

    psf_bank = None
    if args.blur_train:
        if args.use_stored_psfs:
            if not args.stored_psf_directory:
                raise ValueError("--use_stored_psfs requires "
                                 "--stored_psf_directory (transforms.py "
                                 "loads from that folder in the reference)")
            from detectinblur_tpu.data.blur_sampling import load_psf_bank

            print(f"loading stored PSF bank from {args.stored_psf_directory}...")
            psf_bank = load_psf_bank(args.stored_psf_directory)
        else:
            print("generating device PSF bank (512/bin)...")
            psf_bank = generate_psf_bank(jax.random.key(7), bank_size=512,
                                         center=not args.dont_center_psf)

    augmix_cfg = None
    if args.non_pos_aug_mix or args.include_pos_aug_mix:
        augmix_cfg = dict(positional=args.include_pos_aug_mix,
                          modify_target_boxes=args.aug_mix_target_expand)

    loader = DetectionLoader(
        dataset, args.batch_size, policy, psf_bank, shuffle=True,
        hflip_prob=0.5, num_processes=jax.process_count(),
        process_index=jax.process_index(), augmix=augmix_cfg,
        num_workers=args.workers,
    )

    bn_mode = "train" if args.unfrozen_batch_norm else None
    model = build_model(args, bn_mode=bn_mode)
    bn_stats = model.init_stats() if model.has_bn else None
    params, bn_stats = load_initial_params(args, model, bn_stats)
    tx, schedule = make_optimizer(
        base_lr=args.lr, steps_per_epoch=max(len(loader), 1),
        momentum=args.momentum, weight_decay=args.weight_decay,
        milestones=args.lr_steps, gamma=args.lr_gamma,
        trainable_backbone_layers=args.trainable_backbone_blocks,
        params=params,
    )
    state = create_train_state(params, tx)
    start_epoch = args.start_epoch
    if args.resume:
        if model.has_bn:
            state, bn_stats = restore_checkpoint(args.resume, state, bn_stats)
        else:
            state = restore_checkpoint(args.resume, state)
        print(f"resumed from {args.resume}")
    elif args.start_from_weights and not args.start_from_weights.endswith(".pth"):
        state = state._replace(params=restore_weights(args.start_from_weights,
                                                      state.params))

    steps = {}  # (source bucket, model bucket) -> jitted step

    def step_for(bucket, batch):
        # Exact per-batch model bucket (quantized /64): batches resize
        # torch-exactly with no off-aspect scale shrink, and pay conv time
        # for their own extent, not the source bucket's worst case. The /64
        # quantization bounds this to a few compiles per source bucket.
        key = (bucket, model_bucket_for_batch(batch.hw))
        if key not in steps:
            steps[key] = make_train_step(
                model, tx, key[1],
                blur_train=args.blur_train,
                expand_target_boxes=args.expand_target_boxes,
                use_warp=args.warp_in_model,
                use_custom_norm=args.use_custom_image_norm,
                add_noise=args.add_noise, noise_level=args.noise_level,
                add_block=args.add_block, add_jpeg=args.add_jpeg_artefacts,
            )
        return steps[key]

    eval_steps = {}  # (blur, source bucket, model bucket) -> jitted step,
    #                  shared across epochs so post-epoch eval compiles once

    def run_eval(epoch):
        """Clean + blurred post-epoch eval (train.py:346-387). The blurred
        val set blurs EVERY image (blur_ratio=1, train.py:172-181), not at
        the training regime probability."""
        from dataclasses import replace

        coco_gt = dataset_val.index
        for tag, blur in (("Normal", False), ("Blurred", True)):
            if blur and not args.blur_train:
                continue
            val_loader = DetectionLoader(
                dataset_val, 1,
                replace(policy, prob=1.0) if blur else BlurPolicy(prob=0.0),
                psf_bank if blur else None,
                shuffle=False, num_processes=jax.process_count(),
                process_index=jax.process_index(), drop_last=False,
                num_workers=args.workers,
            )

            def eval_step(params, batch, key=None, _blur=blur):
                b = (_blur, batch.images.shape[1:3],
                     model_bucket_for_batch(batch.hw))
                if b not in eval_steps:
                    eval_steps[b] = make_eval_step(
                        model, b[2], blur_eval=_blur,
                        expand_target_boxes=args.expand_target_boxes and _blur,
                        use_warp=args.warp_in_model,
                        use_custom_norm=args.use_custom_image_norm,
                        bn_stats=bn_stats,
                    )
                return eval_steps[b](params, batch, key)

            stats = evaluate_coco(
                eval_step, state.params, val_loader, coco_gt,
                expand_target_boxes=args.expand_target_boxes and blur,
                early_stop=args.early_stop,
            )
            for name, value in zip(BLUR_STAT_TAGS, stats[:12]):
                writer.add_scalar(f"{tag}/{name}", float(value), epoch)

    global_iter = 0
    with mesh:
        if args.eval_first:
            run_eval(start_epoch - 1)
        for epoch in range(start_epoch, args.epochs):
            loader.set_epoch(epoch)
            if (args.blur_train and args.use_stored_psfs and epoch > 0
                    and psf_bank.shape[2] == 2048):
                # A take of exactly max_bank means the stored bank was
                # stride-subsampled; re-stride with an epoch offset so
                # successive epochs walk disjoint slices of the full
                # 12000/bin reference bank (blur_sampling.load_psf_bank).
                from detectinblur_tpu.data.blur_sampling import load_psf_bank

                psf_bank = load_psf_bank(args.stored_psf_directory,
                                         epoch=epoch)
                loader.psf_bank = psf_bank
            logger = MetricLogger()
            t_epoch = time.time()
            for batch, bucket, _ids in logger.log_every(
                loader, args.print_freq, f"Epoch: [{epoch}]"
            ):
                key = jax.random.fold_in(jax.random.key(1337), global_iter)
                if model.has_bn:
                    state, bn_stats, metrics = step_for(bucket, batch)(
                        state, bn_stats, batch, key)
                else:
                    state, metrics = step_for(bucket, batch)(state, batch, key)
                if global_iter % args.print_freq == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    if not np.isfinite(m["loss"]):
                        raise RuntimeError(f"Loss is {m['loss']}, aborting "
                                           f"(non-finite loss guard): {m}")
                    logger.update(**m)
                    writer.add_scalar("losses/totalLoss", m["loss"], global_iter)
                    for k, v in m.items():
                        if k != "loss":
                            writer.add_scalar(f"losses/{k}", v, global_iter)
                    writer.add_scalar("learningRate",
                                      float(schedule(global_iter)), global_iter)
                global_iter += 1
                if args.early_stop is not None and global_iter >= args.early_stop:
                    break

            print(f"epoch {epoch} done in {time.time() - t_epoch:.1f}s")
            if args.output_dir:
                save_checkpoint(args.output_dir, state, epoch, vars(args),
                                bn_stats=bn_stats)
            run_eval(epoch)
            if args.early_stop is not None:
                break
    writer.close()


if __name__ == "__main__":
    main()
