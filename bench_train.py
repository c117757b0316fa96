"""Train-step throughput benchmark (companion to bench.py).

Measures the full jitted training iteration — device blur, PSF-driven
target expansion, Faster R-CNN forward, losses, backward, SGD — as ONE
XLA program (train/engine.py make_train_step) at the per-batch exact
model bucket, batch 8, throughput mode. The numbers in PERF.md's
"Training step" section come from this script:

    PYTHONPATH=/root/repo:/root/.axon_site python bench_train.py
"""
import json
import os
import time

os.environ.setdefault("DETECTINBLUR_PRECISION", "default")
# Persistent compile cache (see bench.py).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from detectinblur_tpu.data.batching import model_bucket_for_batch
    from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from detectinblur_tpu.ops.psf import sample_psf
    from detectinblur_tpu.train.engine import BlurBatch, make_train_step
    from detectinblur_tpu.train.state import create_train_state, make_optimizer

    B, G = 8, 16
    src_h, src_w = 480, 640
    bucket = model_bucket_for_batch([[src_h, src_w]] * B)
    print("model bucket:", bucket)

    cfg = FasterRCNNConfig()
    # DIB_ZERO_RPN_DELTA=1: zero the RPN bbox_pred head so proposals sit at
    # the anchors — the steady-state TRAINING proposal-shape distribution
    # (same argument as bench.py's serving shapes: a real run leaves the
    # garbage-proposal phase within the first few hundred steps, and from a
    # zeroed head SGD keeps deltas near zero across the timed window).
    # Default off: the recorded protocol measures training from scratch.
    zero_rpn = os.environ.get("DIB_ZERO_RPN_DELTA", "0") == "1"
    # Perf probe (VERDICT r4 #5): the train path runs NMS to 2000 outputs
    # where the loss samples only 512 proposals/img. A tighter budget is a
    # SEMANTIC change (the sampling pool shrinks), so it is a measurement
    # knob only — never a default.
    post_n = int(os.environ.get("DIB_POST_NMS_TRAIN", "0"))
    if post_n:
        cfg = cfg._replace(rpn=cfg.rpn._replace(post_nms_top_n_train=post_n))
        print(f"probe: post_nms_top_n_train={post_n}")
    model = FasterRCNN(cfg)
    params = model.init(jax.random.key(0), bucket=bucket)
    if zero_rpn:
        params = dict(params)
        rh = dict(params["rpn_head"])
        rh["bbox_pred"] = {k: jnp.zeros_like(v)
                           for k, v in rh["bbox_pred"].items()}
        params["rpn_head"] = rh
        print("probe: RPN delta head zeroed (steady-state proposal shapes)")
    tx, _ = make_optimizer(base_lr=0.04, steps_per_epoch=1000, params=params)
    state = create_train_state(params, tx)

    rng = np.random.default_rng(0)
    keys = jax.random.split(jax.random.key(1), B)
    psfs = jax.vmap(lambda k: sample_psf(k, expl=0.005, fraction=0.5))(keys)
    boxes = np.zeros((B, G, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, src_w // 2, (B, G))
    boxes[..., 1] = rng.uniform(0, src_h // 2, (B, G))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(8, src_w // 3, (B, G))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(8, src_h // 3, (B, G))
    batch = BlurBatch(
        images=jnp.asarray(rng.random((B, src_h, src_w, 3), np.float32)),
        hw=jnp.tile(jnp.asarray([[src_h, src_w]]), (B, 1)),
        psfs=psfs,
        blurring=jnp.ones((B,), bool),
        thetas=jnp.zeros(B),
        lam1s=jnp.full((B,), 0.9),
        lam2s=jnp.full((B,), 0.95),
        param_index=jnp.zeros(B, jnp.int32),
        fraction_index=jnp.ones(B, jnp.int32),
        gt_boxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(rng.integers(1, 91, (B, G)).astype(np.int32)),
        gt_valid=jnp.asarray(np.ones((B, G), bool)),
    )

    step = make_train_step(model, tx, bucket, blur_train=True,
                           expand_target_boxes=True)

    # DIB_HOLD_STATE=1: time the step WITHOUT carrying the updated state
    # between iterations (keys still vary). With DIB_ZERO_RPN_DELTA this
    # pins the proposal-shape distribution at steady state for the whole
    # window — carrying the state lets SGD on the random-feature backbone
    # drift the delta head back into sliver proposals within a few
    # iterations, which re-arms the RoIAlign oversized quad tier (~28 ms,
    # tools/trace_sample_roi.py) and masks the distribution's real cost.
    # Default off: the recorded protocol measures real training dynamics.
    hold = os.environ.get("DIB_HOLD_STATE", "0") == "1"
    if hold:
        # The step donates its state argument, so reusing one state needs
        # a fresh copy per call (~334 MB params+momentum ~ +0.5 ms/iter,
        # charged AGAINST the probe, so the reading is conservative).
        dup = jax.jit(lambda s: jax.tree.map(jnp.copy, s))
        print("probe: state held fixed across timed iterations")

    t0 = time.perf_counter()
    if hold:
        _, metrics = step(dup(state), batch, jax.random.key(100))
    else:
        state, metrics = step(state, batch, jax.random.key(100))
    jax.block_until_ready(metrics)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s",
          {k: float(v) for k, v in metrics.items()})

    # 3 timed repeats of 50 iters; report the best repeat (ADVICE r2:
    # 10 iters was jitter-prone for a headline number).
    iters = 50
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            if hold:
                _, metrics = step(dup(state), batch, jax.random.key(i))
            else:
                state, metrics = step(state, batch, jax.random.key(i))
        jax.block_until_ready(metrics)
        best = min(best, time.perf_counter() - t0)
    dt = best
    ms = dt / iters * 1000
    print(json.dumps({
        "metric": "train_step_images_per_sec_per_chip",
        "value": round(B * iters / dt, 2),
        "unit": "img/s",
        "step_ms": round(ms, 1),
    }))


if __name__ == "__main__":
    main()
