"""Evaluation entry point (reference evaluate.py equivalent).

Vanilla / natural-blur single eval, or the blur sweep: params[1:] x
fractions[1:] with blur probability 1 per cell (evaluate.py:299-370),
optional expand_target_boxes GT rewrite, custom norms, mode_one BN,
LEHE/16-class estimator-gated ensembles.
"""

from __future__ import annotations

import jax
import numpy as np

from detectinblur_tpu.cli.args import eval_parser
from detectinblur_tpu.cli.train import build_model, BLUR_STAT_TAGS
from detectinblur_tpu.data.blur_sampling import BlurPolicy, generate_psf_bank
from detectinblur_tpu.data.coco import get_coco
from detectinblur_tpu.data.loader import DetectionLoader
from detectinblur_tpu.data.batching import model_bucket_for_batch
from detectinblur_tpu.ops.psf import EVAL_PARAMS, EVAL_FRACTIONS
from detectinblur_tpu.parallel.mesh import make_mesh
from detectinblur_tpu.train.checkpoint import restore_weights
from detectinblur_tpu.train.engine import make_eval_step
from detectinblur_tpu.train.eval_loop import evaluate_coco
from detectinblur_tpu.utils.logging import ScalarWriter
from detectinblur_tpu.utils.torch_convert import (
    convert_fasterrcnn_state_dict,
    load_torch_state_dict,
)


def load_params(model, path: str, frozen_bn=True, mode_one_n=0.0):
    """Returns (params, bn_stats_or_None). For --mode_one_norm /
    --unfrozen_batch_norm (.pth only), BN stays a real layer and running
    stats come along with num_batches_tracked preset (evaluate.py:234-237
    sets 16)."""
    from detectinblur_tpu.models.faster_rcnn import FasterRCNN

    is_fpn = isinstance(model, FasterRCNN)
    if path.endswith(".pth"):
        sd = load_torch_state_dict(path)
        if is_fpn:
            params = convert_fasterrcnn_state_dict(sd, frozen_bn=frozen_bn)
            stats = None
            if not frozen_bn:
                from detectinblur_tpu.utils.torch_convert import (
                    convert_fasterrcnn_bn_stats,
                )

                stats = convert_fasterrcnn_bn_stats(sd, num_batches=mode_one_n)
            return params, stats
        # Versatile single-map model: .pth holds an ImageNet classifier
        # torso (versatile_backbone_models.py); heads stay random.
        params = model.init(jax.random.key(0))
        stats = model.init_stats() if model.has_bn else None
        if model.cfg.backbone == "mobile_net":
            from detectinblur_tpu.utils.torch_convert import (
                convert_mobilenet_v2_features,
            )
            from detectinblur_tpu.models.batchnorm import (
                set_num_batches_tracked,
            )

            torso, torso_stats = convert_mobilenet_v2_features(sd)
            params["backbone"] = torso
            if mode_one_n:
                torso_stats = set_num_batches_tracked(torso_stats, mode_one_n)
            stats = {"backbone": torso_stats}
        else:
            from detectinblur_tpu.utils.torch_convert import (
                convert_resnet_trunk_state_dict,
            )

            torso, torso_stats = convert_resnet_trunk_state_dict(
                sd, arch=model.cfg.backbone, frozen_bn=not model.has_bn,
                num_batches=mode_one_n)
            params["backbone"] = torso
            if torso_stats is not None:
                stats = {"backbone": torso_stats}
        print("loaded ImageNet torso weights; detection heads are random")
        return params, stats
    template = model.init(jax.random.key(0))
    params = restore_weights(path, template)
    stats = None
    if model.has_bn:
        # Our own checkpoints carry bn_stats (train/checkpoint.py); fall
        # back to fresh stats for weight-only artifacts. restore_subtree
        # decides presence from the checkpoint metadata — a try/except
        # around Orbax's partial restore can't be trusted (it silently
        # returns the template for absent subtrees).
        from detectinblur_tpu.train.checkpoint import restore_subtree

        stats = restore_subtree(path, "bn_stats", model.init_stats())
    return params, stats


def load_estimator(path: str, n_classes: int):
    """Build the resnet18 blur estimator and restore its weights AND
    running BN stats from either a train_blur_estimator checkpoint
    (save_checkpoint layout: {params, opt_state, step, bn_stats}) or a
    bare weights tree (then stats stay fresh, with a warning — eval-mode
    BN normalizes with running stats, so fresh stats would misclassify;
    the reference restores the full state dict, evaluate.py:186-205)."""
    from detectinblur_tpu.models.classifier import ResNetClassifier
    from detectinblur_tpu.train.checkpoint import restore_weights

    estimator = ResNetClassifier("resnet18", n_classes, bn_mode="eval")
    init_vars = estimator.init(
        jax.random.key(0), np.zeros((1, 224, 224, 3), np.float32))
    from detectinblur_tpu.train.checkpoint import restore_subtree

    est_params = restore_weights(path, init_vars["params"])
    est_stats = restore_subtree(path, "bn_stats", init_vars["batch_stats"])
    return estimator, {"params": est_params, "batch_stats": est_stats}


def run_cell(args, model, params, dataset_val, policy, psf_bank,
             ensemble=None, bn_stats=None, step_cache=None, loader=None,
             coco_index=None):
    """One evaluate() call (engine.py:220-416): build the loader (or use the
    given one — the natural-blur path brings its own dataset + COCO index),
    assemble the eval step with EVERY remedy the flags ask for, run the
    COCO loop. Both the sweep cells and the --blurred_dataset branch come
    through here so no flag combination can silently fall back to the plain
    model (the reference passes the same remedy set into its single
    evaluate() for natural datasets, evaluate.py:240-290)."""
    if loader is None:
        loader = DetectionLoader(
            dataset_val, 1, policy, psf_bank, shuffle=False,
            num_processes=jax.process_count(),
            process_index=jax.process_index(),
            drop_last=False, num_workers=args.workers,
        )
    blur = policy.prob > 0
    # Jitted steps are keyed by (source bucket, exact model bucket); the
    # sweep passes one shared cache so the 15 P x E cells reuse compiles
    # (nothing the step closes over varies across cells).
    eval_steps = step_cache if step_cache is not None else {}

    deblur_vars = None
    if args.deblur_first and args.deblurer_model_location:
        from detectinblur_tpu.models.deblur import convert_deepdeblur_state_dict
        from detectinblur_tpu.utils.torch_convert import load_torch_state_dict

        deblur_vars = convert_deepdeblur_state_dict(
            load_torch_state_dict(args.deblurer_model_location))

    if ensemble is not None:
        # LEHE / 16-class estimator-gated specialist dispatch
        # (engine.py:353-366) as one jitted graph per bucket, with the same
        # blur/expand/deblur/corruption chain as the single-model path
        # (engine.py:319-342 still applies under --use_ensemble).
        from detectinblur_tpu.models.ensemble import make_ensemble_predict

        stacked, estimator, est_vars, lehe = ensemble

        def eval_step(_p, batch, key=None):
            b = (batch.images.shape[1:3], model_bucket_for_batch(batch.hw))
            if b not in eval_steps:
                eval_steps[b] = make_ensemble_predict(
                    model, b[1], estimator, lehe=lehe,
                    blur_eval=blur,
                    expand_target_boxes=args.expand_target_boxes and blur,
                    use_warp=args.warp_in_model,
                    use_custom_norm=args.use_custom_image_norm,
                    deblur_vars=deblur_vars,
                    add_noise=args.add_noise, noise_level=args.noise_level,
                    add_block=args.add_block,
                    add_jpeg=args.add_jpeg_artefacts,
                    dilate_psf=args.dilate_psf)
            dets, gt, _idx = eval_steps[b](stacked, est_vars, batch, key)
            return dets, gt
    else:
        def eval_step(p, batch, key=None):
            b = (batch.images.shape[1:3], model_bucket_for_batch(batch.hw))
            if b not in eval_steps:
                eval_steps[b] = make_eval_step(
                    model, b[1], blur_eval=blur,
                    expand_target_boxes=args.expand_target_boxes and blur,
                    use_warp=args.warp_in_model,
                    use_custom_norm=args.use_custom_image_norm,
                    deblur_vars=deblur_vars,
                    add_noise=args.add_noise, noise_level=args.noise_level,
                    add_block=args.add_block,
                    add_jpeg=args.add_jpeg_artefacts,
                    dilate_psf=args.dilate_psf,
                    bn_stats=bn_stats,
                )
            return eval_steps[b](p, batch, key)

    return evaluate_coco(
        eval_step, params, loader,
        coco_index if coco_index is not None else dataset_val.index,
        expand_target_boxes=args.expand_target_boxes and blur,
        early_stop=args.early_stop,
        image_output_dir=args.image_output_dir,
    )


def main(argv=None):
    args = eval_parser().parse_args(argv)
    np.random.seed(1337)
    mesh = make_mesh()
    writer = ScalarWriter(args.tensorboard_path)

    bn_mode = "mode_one" if args.mode_one_norm else (
        "train" if args.unfrozen_batch_norm else None)
    model = build_model(args, bn_mode=bn_mode)
    bn_stats = None
    ensemble = None
    if args.use_ensemble:
        # Build the 4-specialist stack + optional estimator
        # (evaluate.py:159-205). Without an estimator path the oracle
        # dispatch by true blur params is used.
        from detectinblur_tpu.models.ensemble import stack_params

        assert args.ensemble_model_paths and len(args.ensemble_model_paths) == 4
        trees = [load_params(model, p)[0] for p in args.ensemble_model_paths]
        stacked = stack_params(trees)
        params = trees[0]
        estimator = est_vars = None
        if args.blur_estimator_path:
            estimator, est_vars = load_estimator(
                args.blur_estimator_path, 4 if args.LEHE else 16)
        ensemble = (stacked, estimator, est_vars, args.LEHE)
    elif args.resume:
        params, bn_stats = load_params(model, args.resume,
                                       frozen_bn=(bn_mode is None),
                                       mode_one_n=16.0)
    elif args.start_from_weights:
        params, bn_stats = load_params(model, args.start_from_weights,
                                       frozen_bn=(bn_mode is None),
                                       mode_one_n=16.0)
    else:
        print("no checkpoint given; evaluating random weights")
        params = model.init(jax.random.key(0))
        bn_stats = model.init_stats() if model.has_bn else None

    if args.blurred_dataset:
        # Natural-blur eval: the dataset is pre-blurred (blur prob 0 here;
        # pre_blurred items pass the blur stage untouched) but EVERY remedy
        # still applies — deblur-first, estimator-gated ensemble, warp,
        # custom norms all flow into the one evaluate() call exactly like
        # the reference's (evaluate.py:240-290 + engine.py:319-366), so the
        # headline "GOPRO + deblur" / "GOPRO + LEHE ensemble" experiments
        # run through the same remedy chain as the synthetic sweep.
        from detectinblur_tpu.data.natural_datasets import get_natural_dataset
        from detectinblur_tpu.train.eval_loop import dataset_to_coco_index

        # Only GOPROSynth takes the flow-walk box expansion knob
        # (--expand_synth_boxes, custom_datasets.py:636-699); the other
        # loaders' pseudo-GT comes pre-sized from the DORS dumps.
        nat_kw = ({"expand_boxes": args.expand_synth_boxes}
                  if args.blurred_dataset == "GOPROSynth" else {})
        ds = get_natural_dataset(args.blurred_dataset, args.data_path,
                                 **nat_kw)
        coco_gt = dataset_to_coco_index(ds)
        loader = DetectionLoader(ds, 1, BlurPolicy(prob=0.0), None,
                                 shuffle=False, drop_last=False,
                                 source_buckets=((736, 1312),),
                                 num_processes=jax.process_count(),
                                 process_index=jax.process_index(),
                                 num_workers=args.workers)
        with mesh:
            stats = run_cell(args, model, params, None, BlurPolicy(prob=0.0),
                             None, ensemble, bn_stats, loader=loader,
                             coco_index=coco_gt)
        for name, value in zip(BLUR_STAT_TAGS, stats[:12]):
            writer.add_scalar(f"{args.blurred_dataset}/{name}", float(value), 0)
        writer.close()
        return stats

    if args.dataset == "coco_kp":
        from detectinblur_tpu.data.coco import get_coco_kp

        dataset_val = get_coco_kp(args.data_path, "val")
    else:
        dataset_val = get_coco(args.data_path, "val")

    with mesh:
        if args.vanilla_eval or not args.blur_eval:
            stats = run_cell(args, model, params, dataset_val,
                             BlurPolicy(prob=0.0), None, ensemble, bn_stats)
            for name, value in zip(BLUR_STAT_TAGS, stats[:12]):
                writer.add_scalar(f"Normal/{name}", float(value), 0)
            writer.close()
            return stats

        # Blur sweep: skip param 0 and fraction 0 as legacy
        # (evaluate.py:302-310).
        if args.use_stored_psfs:
            if not args.stored_psf_directory:
                raise ValueError("--use_stored_psfs requires "
                                 "--stored_psf_directory")
            from detectinblur_tpu.data.blur_sampling import load_psf_bank

            bank = load_psf_bank(args.stored_psf_directory, max_bank=256)
        else:
            # Rasterize at the ACTUAL sweep exposures (1/25, 1/10, ...):
            # the reference generates eval PSFs at the exact fraction
            # (evaluate.py:299-322 -> transforms.py:316-335), not at the
            # nearest training fraction. BLUR_FRACTIONS and
            # EVAL_FRACTIONS[1:] agree except E1 (1/18 vs 1/25) and are
            # index-aligned, so BlurDecision's quantized indices (used for
            # the measured-norm tables, matching transforms.py:423-435)
            # address this bank correctly.
            bank = generate_psf_bank(jax.random.key(7), bank_size=256,
                                     fractions=tuple(EVAL_FRACTIONS[1:]),
                                     center=not args.dont_center_psf)
        all_stats = {}
        step_cache = {}   # compiled steps shared across the P x E cells
        for pi, param in enumerate(EVAL_PARAMS[1:], start=1):
            if args.param_index is not None and pi != args.param_index:
                continue
            for fi, fraction in enumerate(EVAL_FRACTIONS[1:], start=1):
                policy = BlurPolicy(prob=1.0, blur_type=param,
                                    blur_exposure=fraction)
                stats = run_cell(args, model, params, dataset_val, policy, bank,
                                 ensemble, bn_stats, step_cache=step_cache)
                all_stats[(pi, fi)] = stats
                for name, value in zip(BLUR_STAT_TAGS, stats[:12]):
                    writer.add_scalar(f"P{pi}/{name}", float(value), fi)
                print(f"P{pi} E{fi} (param={param}, fraction={fraction:.3f}): "
                      f"mAP={stats[0]:.4f}")
    writer.close()
    return all_stats


if __name__ == "__main__":
    main()
