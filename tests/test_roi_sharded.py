"""Batch-dim partitioning of the RoIAlign entry points (VERDICT r1 item
10): the custom_partitioning rules in ops/roi_align_pallas.py must shard
the 8-device mesh along the batch dim and reproduce the single-device
quad results exactly. On this CPU mesh the per-shard body is the exact
XLA quad path; on TPU backends the same rule wraps the Pallas kernel
(chip-validated separately — the bodies are exact-equal by
test_roi_align's kernel-vs-quad parity).
"""


import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from detectinblur_tpu.ops.roi_align_pallas import (
    _quad_batch,
    multiscale_roi_align_fused,
    sharded_multiscale_roi_align,
)
from detectinblur_tpu.parallel.mesh import make_mesh, shard_batch


def _fixture(key, B=8, C=16, R=32, hw=(64, 64)):
    feats = tuple(
        jax.random.normal(jax.random.fold_in(key, i),
                          (B, hw[0] // (2 ** i), hw[1] // (2 ** i), C),
                          jnp.float32)
        for i in range(4))
    raw = jax.random.uniform(jax.random.fold_in(key, 9), (B, R, 4),
                             minval=0.0, maxval=200.0)
    boxes = jnp.concatenate(
        [jnp.minimum(raw[..., :2], raw[..., 2:]),
         jnp.maximum(raw[..., :2], raw[..., 2:]) + 1.0], -1)
    return feats, boxes


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(8)


def test_sharded_forward_matches_quad(mesh):
    feats, boxes = _fixture(jax.random.key(0))
    ref = _quad_batch(feats, boxes)
    shard = NamedSharding(mesh, P("data"))
    sfeats = tuple(jax.device_put(f, shard) for f in feats)
    sboxes = jax.device_put(boxes, shard)
    out = jax.jit(lambda fs, b: sharded_multiscale_roi_align(fs, b))(
        sfeats, sboxes)
    # The rule keeps the batch dim sharded end to end.
    assert out.sharding.spec[0] == "data"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_fused_grads_match_quad_vjp(mesh):
    feats, boxes = _fixture(jax.random.key(1))
    shard = NamedSharding(mesh, P("data"))
    sfeats = tuple(jax.device_put(f, shard) for f in feats)
    sboxes = jax.device_put(boxes, shard)

    def loss(fs, b):
        return jnp.sum(multiscale_roi_align_fused(fs, b) ** 2)

    g_sharded = jax.jit(jax.grad(loss))(sfeats, sboxes)
    g_ref = jax.grad(lambda fs: jnp.sum(_quad_batch(fs, boxes) ** 2))(feats)
    assert g_sharded[0].sharding.spec[0] == "data"
    for gs, gr in zip(g_sharded, g_ref):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


def test_no_feature_allgather_in_sharded_forward(mesh):
    """The point of the rule: features stay resident per shard. The
    compiled forward must contain no all-gather of a feature-map-sized
    operand (collectives on the tiny box/const operands would be fine,
    but with everything batch-sharded there should be none at all)."""
    feats, boxes = _fixture(jax.random.key(2))
    shard = NamedSharding(mesh, P("data"))
    lowered = jax.jit(
        lambda fs, b: sharded_multiscale_roi_align(fs, b)
    ).lower(
        tuple(jax.device_put(f, shard) for f in feats),
        jax.device_put(boxes, shard))
    hlo = lowered.compile().as_text()
    assert "all-gather" not in hlo, "partitioner gathered the batch"


def test_detector_cp_path_matches_quad_path(mesh):
    """Full-detector integration: with cp_roi_align=True (the config knob
    behind DETECTINBLUR_CP_ROIALIGN=1) the model routes RoIAlign through
    the partitioned entry points on this CPU mesh (per-shard body = quad);
    detections must equal the plain quad path (small float tolerance: the
    cp route batches the box head over pre-pooled features, a different
    but equivalent contraction order)."""
    import __graft_entry__ as ge
    from detectinblur_tpu.models.faster_rcnn import (
        FasterRCNN,
        FasterRCNNConfig,
    )
    from detectinblur_tpu.models.roi_heads import BoxHeadConfig
    from detectinblur_tpu.models.rpn import RPNConfig

    cfg = FasterRCNNConfig(
        min_size=64, max_size=64,
        rpn=RPNConfig(pre_nms_top_n_train=200, post_nms_top_n_train=100,
                      pre_nms_top_n_test=200, post_nms_top_n_test=100),
        box=BoxHeadConfig(batch_size_per_image=64, nms_pool=256,
                          detections_per_img=20),
    )
    model = FasterRCNN(cfg._replace(cp_roi_align=False))
    params = model.init(jax.random.key(0), bucket=(64, 64))
    batch = ge._tiny_batch(8, 64, 64, seed=7)

    def predict(p, b):
        return model.predict(p, b.images, b.hw, bucket=(64, 64))

    ref = jax.jit(predict)(params, batch)

    cp_model = FasterRCNN(cfg._replace(cp_roi_align=True))
    assert cp_model._pallas_pool_plan((64, 64))[0]

    def cp_predict(p, b):
        return cp_model.predict(p, b.images, b.hw, bucket=(64, 64))

    with mesh:
        sbatch = shard_batch(mesh, ge._tiny_batch(8, 64, 64, seed=7))
        out = jax.jit(cp_predict)(params, sbatch)
    for name in ("boxes", "scores", "labels", "valid"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
            rtol=2e-4, atol=2e-4, err_msg=name)
