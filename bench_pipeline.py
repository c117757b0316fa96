"""Real-input-pipeline training benchmark (companion to bench_train.py).

bench_train.py measures the fused train step on a pre-staged batch; this
script measures what the reference's README actually claims (README.md:8 —
the data loader must never choke the accelerator): a full epoch-style loop
where the REAL ``DetectionLoader`` path — JPEG decode (PIL), hflip, blur
decision + stored-PSF pick, fixed-shape batch assembly over
``num_workers`` threads — feeds the fused train step, overlapped with
device execution via the loader's prefetch queue and JAX async dispatch.

Reports one JSON line with:
  - ``images_per_sec``      end-to-end epoch throughput (wall clock)
  - ``step_ms``             device-only step time (isolated re-measure)
  - ``h2d_ms``              host->device transfer per batch (isolated) —
                            on this rig the chip sits behind a network
                            tunnel, so this is NOT the PCIe cost a real
                            TPU host pays
  - ``loader_wait_ms``      mean host time blocked on the loader per batch
  - ``loader_only_img_s``   warmed-up loader throughput, no device work
  - ``host_cores``          os.cpu_count() — the loader scales with cores
  - ``mfu``                 model FLOPs utilization: XLA cost-analysis
                            FLOPs of the fused step / step time / chip peak

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python bench_pipeline.py
"""
import json
import os
import subprocess
import sys
import tempfile
import time

os.environ.setdefault("DETECTINBLUR_PRECISION", "default")
# Persistent compile cache (see bench.py).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

# bf16 matmul peak per chip, by device kind (the MXU number that "MFU"
# is conventionally quoted against).
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
    "cpu": 1e12,
}

N_IMAGES = int(os.environ.get("BENCH_N_IMAGES", "256"))
BATCH = 8
SRC_H, SRC_W = 480, 640


def synth_coco_dir(root: str, rng: np.random.Generator):
    """Write N_IMAGES real JPEGs + a COCO index: the decode path must be the
    production one (PIL decode in CocoDetection.load_image), so the bench
    pays genuine per-image decode cost (~3 ms for a 480x640 JPEG)."""
    from PIL import Image

    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    images, anns = [], []
    aid = 1
    for i in range(N_IMAGES):
        # Smooth low-frequency content so JPEG size/decode cost is realistic
        # (pure noise JPEGs are pathologically large).
        low = rng.random((30, 40, 3)).astype(np.float32)
        im = np.asarray(Image.fromarray(
            (low * 255).astype(np.uint8)).resize((SRC_W, SRC_H)))
        Image.fromarray(im).save(os.path.join(img_dir, f"{i:06d}.jpg"),
                                 quality=90)
        images.append({"id": i + 1, "height": SRC_H, "width": SRC_W,
                       "file_name": f"{i:06d}.jpg"})
        for _ in range(rng.integers(2, 9)):
            x, y = rng.uniform(0, SRC_W * 0.6), rng.uniform(0, SRC_H * 0.6)
            w, h = rng.uniform(16, SRC_W * 0.3), rng.uniform(16, SRC_H * 0.3)
            anns.append({"id": aid, "image_id": i + 1,
                         "category_id": int(rng.integers(1, 91)),
                         "bbox": [float(x), float(y), float(w), float(h)],
                         "area": float(w * h), "iscrowd": 0})
            aid += 1
    return img_dir, {"images": images, "annotations": anns,
                     "categories": [{"id": c} for c in range(1, 91)]}


def _build_batch(gt_count):
    """A synthetic staged BlurBatch at the bench shapes. Shared by the
    benchmark proper and the --flops-only child."""
    from detectinblur_tpu.data.batching import build_blur_batch
    from detectinblur_tpu.data.blur_sampling import BlurDecision

    items = [{
        "image": np.zeros((SRC_H, SRC_W, 3), np.float32),
        "image_id": i,
        "boxes": np.tile([[4.0, 4.0, 60.0, 60.0]], (gt_count, 1)).astype(
            np.float32),
        "labels": np.ones(gt_count, np.int32),
    } for i in range(BATCH)]
    decs = [BlurDecision(True, 1, 2, 0)] * BATCH
    bank = np.zeros((3, 5, 1, 128, 128), np.float32)
    bank[..., 64, 64] = 1.0
    return build_blur_batch(items, decs, bank, (SRC_H, SRC_W))


def _flops_only(bucket, gt_count):
    """Child mode: lower (never compile/run) the train step on the CPU
    backend and print XLA's HLO-level FLOP count. Runs in a cleaned
    JAX_PLATFORMS=cpu env — the axon plugin implements no cost_analysis,
    and FLOP counts are backend-independent at the HLO level."""
    from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from detectinblur_tpu.train.engine import make_train_step
    from detectinblur_tpu.train.state import create_train_state, make_optimizer

    model = FasterRCNN(FasterRCNNConfig())
    batch = _build_batch(gt_count)
    aparams = jax.eval_shape(
        lambda: model.init(jax.random.key(0), bucket=bucket))
    tx, _ = make_optimizer(base_lr=0.04, steps_per_epoch=1000, params=aparams)
    step = make_train_step(model, tx, bucket, blur_train=True,
                           expand_target_boxes=True)
    state = jax.eval_shape(lambda p: create_train_state(p, tx), aparams)
    lowered = step.jitted.lower(
        state, None, batch,
        jax.ShapeDtypeStruct(jax.random.key(0).shape, jax.random.key(0).dtype))
    cost = lowered.cost_analysis() or {}
    print(json.dumps({"flops": float(cost.get("flops", 0.0))}))


def _flops_subprocess(bucket, gt_count) -> float:
    """Get the step's FLOP count from a clean-CPU child (see _flops_only)."""
    from __graft_entry__ import _clean_cpu_env

    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--flops-only",
             str(bucket[0]), str(bucket[1]), str(gt_count)],
            env=_clean_cpu_env(1), capture_output=True, text=True,
            timeout=1200, check=True)
        return float(json.loads(out.stdout.strip().splitlines()[-1])["flops"])
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"flops child failed: {e!r}", file=sys.stderr)
        return 0.0


def main():
    from detectinblur_tpu.data.batching import (gt_bucket_for_batch,
                                                model_bucket_for_batch)
    from detectinblur_tpu.data.blur_sampling import BlurPolicy
    from detectinblur_tpu.data.coco import CocoDetection
    from detectinblur_tpu.data.loader import DetectionLoader
    from detectinblur_tpu.ops.psf import sample_psf
    from detectinblur_tpu.train.state import create_train_state, make_optimizer
    import detectinblur_tpu.train.engine  # noqa: F401  (pre-import: the
    # loader's producer thread lazily imports it for BlurBatch otherwise,
    # polluting the first loader timing window)

    rng = np.random.default_rng(0)
    workers = int(os.environ.get("BENCH_WORKERS", "8"))

    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        img_dir, ann = synth_coco_dir(root, rng)
        print(f"dataset synth: {time.perf_counter() - t0:.1f}s "
              f"({N_IMAGES} JPEGs)", file=sys.stderr)

        dataset = CocoDetection(img_dir, ann, train_filter=True)
        # Stored-PSF bank: 24 distinct PSFs tiled to (3, 5, 24). Bank
        # CONTENT is irrelevant to a throughput bench (the loader only
        # indexes into it; rasterization is off the per-image path when
        # --use_stored_psfs, transforms.py:298-309), and rasterizing a
        # large bank on-device costs minutes over the axon tunnel.
        t0 = time.perf_counter()
        keys = jax.random.split(jax.random.key(1), 24)
        psf24 = np.asarray(
            jax.vmap(lambda k: sample_psf(k, expl=0.005, fraction=0.5))(keys))
        bank = np.broadcast_to(
            psf24.reshape(1, 1, 24, 128, 128), (3, 5, 24, 128, 128)).copy()
        print(f"psf bank: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

        policy = BlurPolicy(prob=1.0)
        loader = DetectionLoader(dataset, BATCH, policy, bank, shuffle=True,
                                 hflip_prob=0.5, num_workers=workers,
                                 seed=7)

        from detectinblur_tpu.models.faster_rcnn import (FasterRCNN,
                                                          FasterRCNNConfig)
        from detectinblur_tpu.train.engine import make_train_step

        bucket = model_bucket_for_batch([[SRC_H, SRC_W]] * BATCH)
        gt_count = gt_bucket_for_batch([8])  # synth images carry 2-8 anns
        model = FasterRCNN(FasterRCNNConfig())
        staged = _build_batch(gt_count)
        params = model.init(jax.random.key(0), bucket=bucket)
        tx, _ = make_optimizer(base_lr=0.04, steps_per_epoch=1000,
                               params=params)
        state = create_train_state(params, tx)
        step = make_train_step(model, tx, bucket, blur_train=True,
                               expand_target_boxes=True)

        # Loader-only pass: host-side ceiling, zero device work. Warm 2
        # batches first (thread-pool spin-up, lazy imports) — the epoch
        # loop below runs warm, so the ceiling should too.
        it = iter(loader)
        for _ in range(2):
            next(it)
        t0 = time.perf_counter()
        n_items = 0
        for i, (b, _, _) in enumerate(it):
            n_items += b.images.shape[0]
            if i == 13:
                break
        loader_only = n_items / (time.perf_counter() - t0)
        del it
        print(f"loader-only: {loader_only:.1f} img/s", file=sys.stderr)

        # Warmup / compile on the staged synthetic batch.
        t0 = time.perf_counter()
        state, metrics = step(state, staged, jax.random.key(0))
        jax.block_until_ready(metrics)
        print(f"step compile: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        # MFU numerator: XLA's own FLOP count for the fused step program.
        # Try the live lowering first; the axon plugin returns nothing, so
        # fall back to lowering the same step on a clean-CPU child.
        try:
            cost = step.jitted.lower(
                state, None, staged, jax.random.key(0)).cost_analysis()
            flops = float((cost or {}).get("flops", 0.0))
        except Exception as e:  # pragma: no cover - backend quirks
            print(f"cost_analysis unavailable: {e!r}", file=sys.stderr)
            flops = 0.0
        if not flops:
            flops = _flops_subprocess(bucket, gt_count)

        # Host->device transfer cost per batch, isolated. On this rig the
        # "device" is reached over a network tunnel; a real TPU host moves
        # the same 29 MB over PCIe in ~2-3 ms.
        fresh = [next(iter(loader))[0] for _ in range(3)]
        jax.block_until_ready(jax.device_put(fresh[0]))
        t0 = time.perf_counter()
        for fb in fresh:
            jax.block_until_ready(jax.device_put(fb))
        h2d_ms = (time.perf_counter() - t0) / len(fresh) * 1000

        # Device-only step time (staged batch, distinct keys).
        iters = 30
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = step(state, staged, jax.random.key(i + 1))
        jax.block_until_ready(metrics)
        step_ms = (time.perf_counter() - t0) / iters * 1000

        # Full-epoch overlapped loop: decode/augment threads + prefetch
        # queue + async dispatch. `wait` isolates host time blocked on the
        # loader (queue get); everything else is device/transfer-bound.
        loader.set_epoch(1)
        wait = 0.0
        steps = 0
        t0 = time.perf_counter()
        it = iter(loader)
        while True:
            tw = time.perf_counter()
            got = next(it, None)
            wait += time.perf_counter() - tw
            if got is None:
                break
            batch, _, _ = got
            state, metrics = step(state, batch, jax.random.key(100 + steps))
            steps += 1
        jax.block_until_ready(metrics)
        wall = time.perf_counter() - t0

        kind = jax.devices()[0].device_kind
        peak = next((v for k, v in PEAK_FLOPS.items()
                     if k.lower() in kind.lower()), PEAK_FLOPS["cpu"])
        mfu = flops / (step_ms / 1000) / peak if flops else -1.0
        print(json.dumps({
            "metric": "pipeline_train_images_per_sec_per_chip",
            "value": round(steps * BATCH / wall, 2),
            "unit": "img/s",
            "step_ms": round(step_ms, 1),
            "h2d_ms": round(h2d_ms, 1),
            "loader_wait_ms": round(wait / max(steps, 1) * 1000, 2),
            "loader_only_img_s": round(loader_only, 1),
            "workers": workers,
            "host_cores": os.cpu_count(),
            "flops_per_step": flops,
            "device_kind": kind,
            "mfu": round(mfu, 4) if mfu >= 0 else None,
        }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--flops-only":
        _flops_only((int(sys.argv[2]), int(sys.argv[3])), int(sys.argv[4]))
    else:
        main()
