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
from detectinblur_tpu.data.batching import model_bucket_for
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


def load_params(model, path: str):
    if path.endswith(".pth"):
        return convert_fasterrcnn_state_dict(load_torch_state_dict(path))
    template = model.init(jax.random.key(0))
    return restore_weights(path, template)


def run_cell(args, model, params, dataset_val, policy, psf_bank):
    loader = DetectionLoader(
        dataset_val, 1, policy, psf_bank, shuffle=False,
        num_processes=jax.process_count(), process_index=jax.process_index(),
        drop_last=False,
    )
    blur = policy.prob > 0
    eval_steps = {}

    def eval_step(p, batch):
        b = batch.images.shape[1:3]
        if b not in eval_steps:
            eval_steps[b] = make_eval_step(
                model, model_bucket_for(b), blur_eval=blur,
                expand_target_boxes=args.expand_target_boxes and blur,
                use_warp=args.warp_in_model,
                use_custom_norm=args.use_custom_image_norm,
            )
        return eval_steps[b](p, batch)

    return evaluate_coco(
        eval_step, params, loader, dataset_val.index,
        expand_target_boxes=args.expand_target_boxes and blur,
        early_stop=args.early_stop,
    )


def main(argv=None):
    args = eval_parser().parse_args(argv)
    np.random.seed(1337)
    mesh = make_mesh()
    writer = ScalarWriter(args.tensorboard_path)

    model = build_model(args)
    if args.resume:
        params = load_params(model, args.resume)
    elif args.start_from_weights:
        params = load_params(model, args.start_from_weights)
    else:
        print("no checkpoint given; evaluating random weights")
        params = model.init(jax.random.key(0))

    dataset_val = get_coco(args.data_path, "val")

    with mesh:
        if args.vanilla_eval or not args.blur_eval:
            stats = run_cell(args, model, params, dataset_val,
                             BlurPolicy(prob=0.0), None)
            for name, value in zip(BLUR_STAT_TAGS, stats[:12]):
                writer.add_scalar(f"Normal/{name}", float(value), 0)
            writer.close()
            return stats

        # Blur sweep: skip param 0 and fraction 0 as legacy
        # (evaluate.py:302-310).
        bank = generate_psf_bank(jax.random.key(7), bank_size=256)
        all_stats = {}
        for pi, param in enumerate(EVAL_PARAMS[1:], start=1):
            if args.param_index is not None and pi != args.param_index:
                continue
            for fi, fraction in enumerate(EVAL_FRACTIONS[1:], start=1):
                policy = BlurPolicy(prob=1.0, blur_type=param,
                                    blur_exposure=fraction)
                stats = run_cell(args, model, params, dataset_val, policy, bank)
                all_stats[(pi, fi)] = stats
                for name, value in zip(BLUR_STAT_TAGS, stats[:12]):
                    writer.add_scalar(f"P{pi}/{name}", float(value), fi)
                print(f"P{pi} E{fi} (param={param}, fraction={fraction:.3f}): "
                      f"mAP={stats[0]:.4f}")
    writer.close()
    return all_stats


if __name__ == "__main__":
    main()
