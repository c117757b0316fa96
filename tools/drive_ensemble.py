"""Drive BASELINE config 5 — the LEHE estimator-gated 4-specialist
ensemble with deblur-first — on the real chip (dev tool).

Two measurements, both on hardware:

1. Device-side per-image ms of the full stacked-params chain
   (blur -> MSResNet deblur -> resnet18 estimator -> specialist gather ->
   Faster R-CNN predict) as ONE jitted program at the protocol's batch 1
   (reference evaluate.py runs eval at batch_size 1; engine.py:353-366 is
   the Python dispatch this graph replaces). A no-deblur variant
   decomposes the MSResNet's share.

2. End-to-end protocol proof: a synthetic COCO val split run through
   cli/evaluate.main with --use_ensemble --LEHE --blur_estimator_path
   --deblur_first, i.e. the exact flag path of the paper's headline
   remedy (evaluate.py:159-205 + engine.py:319-366). Wall time on this
   rig is relay-RTT-bound (see PERF.md); the device-side number is (1).

Set DRIVE_PROTOCOL=0 to skip (2).
"""
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("DETECTINBLUR_PRECISION", "default")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_deblur_vars(feats=64, n_blocks=19):
    """Real-size DeepDeblur MSResNet (the released deblurer's config:
    3 scales x 19 resblocks x 64 feats, deblurInterface.py defaults)."""
    from detectinblur_tpu.models.deblur import convert_deepdeblur_state_dict
    from tests.synthetic_torch import synthetic_deepdeblur_state_dict

    sd = synthetic_deepdeblur_state_dict(n_scales=3, feats=feats,
                                         n_blocks=n_blocks)
    return convert_deepdeblur_state_dict(sd), sd


def time_device_chain():
    from detectinblur_tpu.data.batching import model_bucket_for_batch
    from detectinblur_tpu.models.classifier import ResNetClassifier
    from detectinblur_tpu.models.ensemble import make_ensemble_predict, stack_params
    from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from detectinblur_tpu.ops.psf import sample_psf
    from detectinblur_tpu.train.engine import BlurBatch

    B, src_h, src_w, G = 1, 480, 640, 8
    bucket = model_bucket_for_batch([[src_h, src_w]] * B)

    model = FasterRCNN(FasterRCNNConfig())
    params = model.init(jax.random.key(0), bucket=bucket)
    # Serving proposal-shape distribution (see bench.py): zero the RPN
    # delta head so the random backbone doesn't emit sliver proposals.
    params = dict(params)
    rh = dict(params["rpn_head"])
    rh["bbox_pred"] = {k: jnp.zeros_like(v) for k, v in rh["bbox_pred"].items()}
    params["rpn_head"] = rh
    # 4 specialists: value-identical trees measure the same gather cost.
    stacked = stack_params([params] * 4)

    estimator = ResNetClassifier("resnet18", 4, bn_mode="eval")
    est_vars = estimator.init(jax.random.key(1),
                              np.zeros((1, 224, 224, 3), np.float32))

    deblur_vars, _ = build_deblur_vars()

    rng = np.random.default_rng(0)
    batch = BlurBatch(
        images=jnp.asarray(rng.random((B, src_h, src_w, 3), np.float32)),
        hw=jnp.tile(jnp.asarray([[src_h, src_w]]), (B, 1)),
        psfs=jax.vmap(lambda k: sample_psf(k, expl=0.005, fraction=0.5))(
            jax.random.split(jax.random.key(2), B)),
        blurring=jnp.ones((B,), bool),
        thetas=jnp.zeros((B,)), lam1s=jnp.ones((B,)), lam2s=jnp.ones((B,)),
        param_index=jnp.ones((B,), jnp.int32),
        fraction_index=jnp.full((B,), 3, jnp.int32),
        gt_boxes=jnp.asarray(rng.uniform(0, 300, (B, G, 4)), jnp.float32),
        gt_labels=jnp.ones((B, G), jnp.int32),
        gt_valid=jnp.ones((B, G), bool),
    )

    results = {}
    for tag, dvars in (("lehe_deblur_first", deblur_vars), ("lehe", None)):
        step = make_ensemble_predict(model, bucket, estimator, lehe=True,
                                     blur_eval=True,
                                     expand_target_boxes=True,
                                     deblur_vars=dvars)
        key = jax.random.key(3)
        t0 = time.perf_counter()
        out = step(stacked, est_vars, batch, key)
        jax.block_until_ready(out)
        print(f"{tag}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        jitters = [batch._replace(images=batch.images + 1e-6 * (i + 1))
                   for i in range(4)]
        iters, repeats = 10, 8
        rates = []
        for r in range(repeats):
            t0 = time.perf_counter()
            for i in range(iters):
                out = step(stacked, est_vars, jitters[(r * iters + i) % 4]
                           ._replace(thetas=batch.thetas
                                     + 1e-7 * (r * iters + i)), key)
            jax.block_until_ready(out)
            rates.append(B * iters / (time.perf_counter() - t0))
        best, med = max(rates), sorted(rates)[(len(rates) - 1) // 2]
        results[tag] = {"ms_per_image_best": round(1000.0 / best, 2),
                        "ms_per_image_median": round(1000.0 / med, 2),
                        "window_rates": [round(x, 2) for x in rates]}
        print(f"{tag}: {1000.0 / best:.1f} ms/img best "
              f"({1000.0 / med:.1f} median)", flush=True)
    return results


def build_checkpoints(root):
    """Specialist / estimator / deblurer artifacts for the cli flag path."""
    import orbax.checkpoint as ocp
    import torch

    from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from detectinblur_tpu.models.classifier import ResNetClassifier

    model = FasterRCNN(FasterRCNNConfig())
    spec = os.path.join(root, "specialist")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(spec, model.init(jax.random.key(0)))
    est = ResNetClassifier("resnet18", 4, bn_mode="eval")
    est_params = est.init(jax.random.key(1),
                          np.zeros((1, 224, 224, 3), np.float32))["params"]
    est_path = os.path.join(root, "estimator")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(est_path, est_params)
    _, sd = build_deblur_vars()
    pth = os.path.join(root, "deblur.pth")
    torch.save({k: torch.tensor(np.asarray(v, np.float32))
                for k, v in sd.items()}, pth)
    return spec, est_path, pth


def run_gopro(n_images=6):
    """GOPRO natural-blur eval + LEHE ensemble + deblur-first on hardware
    (the BASELINE config-5 'GOPRO + remedies' cell): a synthetic GOPRO
    tree (test/<seq>/blur/*.png + sharp/*_DORS.npy pseudo-GT dumps at the
    dataset's native 720x1280) through cli/evaluate's --blurred_dataset
    branch with the full remedy flag set."""
    from PIL import Image

    root = tempfile.mkdtemp(prefix="gopro_drive")
    rng = np.random.default_rng(0)
    seq = os.path.join(root, "test", "seq0")
    os.makedirs(os.path.join(seq, "blur"), exist_ok=True)
    os.makedirs(os.path.join(seq, "sharp"), exist_ok=True)
    for i in range(n_images):
        arr = (rng.random((720, 1280, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(seq, "blur", f"{i:06d}.png"))
        dors = np.empty(80, object)
        for c in range(80):
            n = int(rng.integers(0, 3))
            rows = np.zeros((n, 5), np.float32)
            if n:
                rows[:, 0] = rng.uniform(0, 900, n)
                rows[:, 1] = rng.uniform(0, 500, n)
                rows[:, 2] = rows[:, 0] + rng.uniform(40, 200, n)
                rows[:, 3] = rows[:, 1] + rng.uniform(40, 150, n)
                rows[:, 4] = rng.uniform(0.2, 1.0, n)
            dors[c] = rows
        with open(os.path.join(seq, "sharp", f"{i:06d}_DORS.npy"), "wb") as f:
            np.save(f, dors, allow_pickle=True)

    spec, est_path, pth = build_checkpoints(root)
    from detectinblur_tpu.cli.evaluate import main

    t0 = time.perf_counter()
    stats = main(["--data-path", root, "--blurred_dataset", "GOPRO",
                  "--use_ensemble", "--ensemble_model_paths",
                  spec, spec, spec, spec,
                  "--blur_estimator_path", est_path, "--LEHE",
                  "--deblur_first", "--deblurer_model_location", pth])
    dt = time.perf_counter() - t0
    stats = np.asarray(stats)
    print(f"GOPRO+LEHE+deblur: {n_images} imgs in {dt:.1f}s "
          f"(relay-RTT-bound wall) AP={float(stats[0]):.4f}", flush=True)
    return {"images": n_images, "wall_s": round(dt, 1),
            "ap": float(stats[0])}


def run_protocol(n_images=8):
    """End-to-end cli/evaluate run with the full config-5 flag set."""
    from PIL import Image

    root = tempfile.mkdtemp(prefix="lehe_drive")
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "val2017"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    images, anns = [], []
    for i in range(n_images):
        h, w = 480, 640
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        name = f"{i:012d}.jpg"
        Image.fromarray(arr).save(os.path.join(root, "val2017", name))
        images.append({"id": i + 1, "file_name": name, "height": h, "width": w})
        for j in range(3):
            x, y = rng.uniform(2, 300, 2)
            bw, bh = rng.uniform(30, 120, 2)
            anns.append({"id": 3 * i + j + 1, "image_id": i + 1,
                         "category_id": int(rng.integers(1, 10)),
                         "bbox": [float(x), float(y), float(bw), float(bh)],
                         "area": float(bw * bh), "iscrowd": 0})
    cats = [{"id": c, "name": f"c{c}"} for c in range(1, 10)]
    with open(os.path.join(root, "annotations", "instances_val2017.json"),
              "w") as f:
        json.dump({"images": images, "annotations": anns, "categories": cats}, f)

    # Checkpoints: one specialist tree reused 4x (the cli loads each path
    # independently; value-identical trees exercise the same code path),
    # estimator weights, real-size deblurer .pth.
    spec, est_path, pth = build_checkpoints(root)

    from detectinblur_tpu.cli.evaluate import main

    t0 = time.perf_counter()
    out = main(["--data-path", root, "--blur_eval", "--gpu_blur",
                "--param_index", "1", "--use_ensemble",
                "--ensemble_model_paths", spec, spec, spec, spec,
                "--blur_estimator_path", est_path, "--LEHE",
                "--deblur_first", "--deblurer_model_location", pth,
                "--expand_target_boxes"])
    dt = time.perf_counter() - t0
    n_cells = len(out) if isinstance(out, dict) else 1
    print(f"protocol: {n_cells} cells x {n_images} imgs in {dt:.1f}s "
          f"(relay-RTT-bound wall; device ms above)", flush=True)
    for k, v in (out.items() if isinstance(out, dict) else []):
        v = np.asarray(v)
        print(f"  cell {k}: AP={float(v[0]):.4f} AP50={float(v[1]):.4f}",
              flush=True)
    return {"cells": n_cells, "images_per_cell": n_images,
            "wall_s": round(dt, 1)}


if __name__ == "__main__":
    mode = os.environ.get("DRIVE_MODE", "coco")
    if mode == "gopro":
        out = {"gopro": run_gopro(int(os.environ.get("SWEEP_N", "6")))}
    else:
        out = {"device": time_device_chain()}
        if os.environ.get("DRIVE_PROTOCOL", "1") != "0":
            out["protocol"] = run_protocol(int(os.environ.get("SWEEP_N", "8")))
    print(json.dumps(out))
