"""End-to-end blur+detect throughput benchmark (driver entry point).

Measures the fused pipeline on real hardware: PSF-bank blur (128x128
camera-shake kernels) -> normalize/resize -> Faster R-CNN ResNet50-FPN
inference at COCO eval resolution (min side 800), everything inside one
jitted XLA program per step.

Baseline: the reference runs torchvision fasterrcnn_resnet50_fpn plus a
per-image O(nnz) roll-loop blur; on A100 the detector alone sustains
~25 img/s (torchvision reference scripts), and BASELINE.md's target is
>= 2x A100 img/s/chip, i.e. 50 img/s. vs_baseline = value / 50.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

# Throughput mode: bf16-accumulation convs (XLA default precision). The
# parity-eval path keeps DETECTINBLUR_PRECISION=highest (f32) — this bench
# measures the production serving configuration.
os.environ.setdefault("DETECTINBLUR_PRECISION", "default")
# Persistent compile cache: detector compiles over the axon tunnel take
# minutes; repeated bench runs reuse the serialized executable (harmless
# no-op if the backend can't serialize — jax logs and recompiles).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

A100_X2_TARGET = 50.0  # img/s; see module docstring

# The TPU relay occasionally drops for a few minutes; a failed backend init
# is cached for the process lifetime, so retry by re-exec'ing ourselves.
_RETRIES, _RETRY_SLEEP_S = 8, 180


def _retry(e) -> None:
    """Re-exec with a bumped attempt counter (a failed backend init is
    cached for the process lifetime), or re-raise when out of budget."""
    attempt = int(os.environ.get("DETECTINBLUR_BENCH_ATTEMPT", "0"))
    if attempt + 1 >= _RETRIES:
        raise e
    print(f"bench attempt {attempt + 1}/{_RETRIES} failed, "
          f"retrying in {_RETRY_SLEEP_S}s: {e!r}", file=sys.stderr)
    time.sleep(_RETRY_SLEEP_S)
    os.environ["DETECTINBLUR_BENCH_ATTEMPT"] = str(attempt + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)


def _require_backend():
    from detectinblur_tpu.utils.backend import bounded_devices

    try:
        bounded_devices()
    except (RuntimeError, TimeoutError) as e:
        _retry(e)


def main():
    _require_backend()
    try:
        _run()
    except jax.errors.JaxRuntimeError as e:
        # Relay drops mid-compile/run surface here; re-exec retries them.
        _retry(e)


def _run():
    from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from detectinblur_tpu.ops.blur import batched_blur
    from detectinblur_tpu.ops.psf import sample_psf
    from detectinblur_tpu.models.detection_transform import preprocess_batch

    from detectinblur_tpu.data.batching import model_bucket_for_batch

    B = 8
    src_h, src_w = 480, 640            # COCO-native size
    # The exact static bucket the eval pipeline derives for this batch
    # (torch resize 480x640 -> 800x1066, quantized /64) = (832, 1088).
    bucket = model_bucket_for_batch([[src_h, src_w]] * B)

    cfg = FasterRCNNConfig()
    model = FasterRCNN(cfg)
    params = model.init(jax.random.key(0), bucket=bucket)
    # Zero the RPN delta head so proposals sit exactly at the anchors.
    # torchvision's N(0, 0.01) init intends near-zero deltas on O(1)
    # activations, but this bench's backbone is random (no released .pth
    # ships in this environment) and its unnormalized activations push the
    # random delta head into extreme-aspect proposals a trained RPN never
    # emits — RoIAlign then measures a pathological-sliver workload
    # (54 ms vs 19 ms, r4 profiling) instead of the serving one. Anchors
    # reproduce the trained model's proposal SHAPE distribution; objectness
    # stays random so top-k/NMS still see diverse scores.
    rh = dict(params["rpn_head"])
    rh["bbox_pred"] = {k: jnp.zeros_like(v)
                       for k, v in rh["bbox_pred"].items()}
    params = dict(params)
    params["rpn_head"] = rh

    # 12 windows of 10 iterations: each window is ~0.6-0.9 s of device
    # work, and relay stalls last seconds at a time — r3's recorded number
    # (89.7 vs 134.6 measured locally) shows 4 windows can ALL land on a
    # bad stretch. Twelve windows cost ~8 s of extra bench time and make a
    # clean window overwhelmingly likely.
    iters, repeats = 10, 12
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((B, src_h, src_w, 3), np.float32))
    hw = jnp.tile(jnp.asarray([[src_h, src_w]]), (B, 1))
    keys = jax.random.split(jax.random.key(1), B)
    psfs = jax.vmap(lambda k: sample_psf(k, expl=0.005, fraction=0.5))(keys)
    blurring = jnp.ones((B,), bool)
    # Distinct inputs per iteration: the TPU relay can elide repeat
    # executions of an identical pure (program, args) pair, which would make
    # a fixed-input loop read near-0 ms. A per-iteration scalar jitter makes
    # every (program, args) pair unique at zero extra HBM residency (staging
    # 11 full batches instead measured the same 120 img/s, so the jitter add
    # is not distorting the number).
    jitters = [jnp.float32(1e-6 * (i + 1)) for i in range(iters * repeats + 1)]

    @jax.jit
    def blur_detect(params, images, jitter, hw, psfs, blurring):
        chw = jnp.transpose(images + jitter, (0, 3, 1, 2))
        blurred = batched_blur(chw, psfs, blurring)
        imgs = jnp.transpose(blurred, (0, 2, 3, 1))
        det = model.predict(params, imgs, hw, bucket=bucket)
        return det.boxes, det.scores, det.labels, det.valid

    # Warmup / compile.
    out = blur_detect(params, images, jitters[-1], hw, psfs, blurring)
    jax.block_until_ready(out)

    # Best of several timed windows: the chip sits behind a network relay
    # whose latency spikes for seconds at a time, and a single window folds
    # those stalls into the chip's throughput number (ADVICE r2 flagged the
    # same jitter risk for bench_train). The best window is the one where
    # dispatch pipelining actually covered the relay round-trips — i.e. the
    # device's own steady-state rate.
    window_rates = []
    for r in range(repeats):
        t0 = time.perf_counter()
        for i in range(iters):
            out = blur_detect(params, images, jitters[r * iters + i], hw,
                              psfs, blurring)
        jax.block_until_ready(out)
        window_rates.append(B * iters / (time.perf_counter() - t0))

    best = max(window_rates)
    # LOWER median: with an even window count, [len//2] is the upper-middle
    # element and would bias the "conservative" headline high.
    median = sorted(window_rates)[(len(window_rates) - 1) // 2]
    # Headline = MEDIAN window (VERDICT r4 #8): the r4 data showed the
    # median survives relay stalls (125.44 vs best 125.56 across 12
    # windows), so the more conservative statistic is now the recorded
    # number. All per-window rates go in the JSON so the spread stays
    # visible, not silent; best_window is kept for continuity with the
    # r2-r4 records.
    print(json.dumps({
        "metric": "blur_detect_images_per_sec_per_chip",
        "value": round(median, 2),
        "unit": "img/s",
        "vs_baseline": round(median / A100_X2_TARGET, 3),
        "window_rates": [round(x, 2) for x in window_rates],
        "best_window": round(best, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
