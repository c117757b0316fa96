import jax
import jax.numpy as jnp
import numpy as np

from detectinblur_tpu.models.batchnorm import AdaptiveBatchNorm, set_num_batches_tracked


def _init(mode, x):
    bn = AdaptiveBatchNorm(features=x.shape[-1], mode=mode)
    vs = bn.init(jax.random.key(0), x)
    return bn, vs


def test_train_mode_normalizes_and_updates(rng):
    x = jnp.asarray(rng.normal(3.0, 2.0, (4, 5, 5, 3)).astype(np.float32))
    bn, vs = _init("train", x)
    y, mut = bn.apply(vs, x, mutable=["batch_stats"])
    out = np.asarray(y)
    # Batch-normalized output: ~zero mean, ~unit var per channel.
    np.testing.assert_allclose(out.mean((0, 1, 2)), 0, atol=1e-4)
    np.testing.assert_allclose(out.std((0, 1, 2)), 1, atol=1e-2)
    # Running stats EMA with momentum 0.1 and torch's unbiased-var update.
    m = np.asarray(x).mean((0, 1, 2))
    n = x.size // 3
    v = np.asarray(x).var((0, 1, 2)) * n / (n - 1)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]), 0.1 * m, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               0.9 * 1.0 + 0.1 * v, rtol=1e-4)
    assert float(mut["batch_stats"]["num_batches_tracked"]) == 1


def test_eval_uses_running_stats(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 3)).astype(np.float32))
    bn, vs = _init("eval", x)
    stats = {"mean": jnp.full(3, 2.0), "var": jnp.full(3, 4.0),
             "num_batches_tracked": jnp.asarray(5.0)}
    y = bn.apply({"params": vs["params"], "batch_stats": stats}, x)
    np.testing.assert_allclose(np.asarray(y), (np.asarray(x) - 2) / np.sqrt(4 + 1e-5),
                               atol=1e-5)


def test_mode_one_blends(rng):
    x = jnp.asarray(rng.normal(1.0, 1.5, (2, 4, 4, 3)).astype(np.float32))
    bn, vs = _init("mode_one", x)
    N = 16.0
    stats = {"mean": jnp.zeros(3), "var": jnp.ones(3),
             "num_batches_tracked": jnp.asarray(N)}
    y = bn.apply({"params": vs["params"], "batch_stats": stats}, x)
    bm = np.asarray(x).mean((0, 1, 2))
    bv = np.asarray(x).var((0, 1, 2))
    um = (N / (N + 1)) * 0 + (1 / (N + 1)) * bm
    uv = (N / (N + 1)) * 1 + (1 / (N + 1)) * bv
    exp = (np.asarray(x) - um) / np.sqrt(uv + 1e-5)
    np.testing.assert_allclose(np.asarray(y), exp, atol=1e-5)


def test_acclimation_normalizes_with_updated_running(rng):
    x = jnp.asarray(rng.normal(5.0, 1.0, (2, 4, 4, 3)).astype(np.float32))
    bn, vs = _init("acclimation", x)
    y, mut = bn.apply(vs, x, mutable=["batch_stats"])
    # Output must be normalized with the UPDATED running stats.
    um = np.asarray(mut["batch_stats"]["mean"])
    uv = np.asarray(mut["batch_stats"]["var"])
    exp = (np.asarray(x) - um) / np.sqrt(uv + 1e-5)
    np.testing.assert_allclose(np.asarray(y), exp, atol=1e-5)


def test_set_num_batches_tracked():
    stats = {"layer": {"mean": jnp.zeros(3), "var": jnp.ones(3),
                       "num_batches_tracked": jnp.asarray(3.0)}}
    out = set_num_batches_tracked(stats, 16.0)
    assert float(out["layer"]["num_batches_tracked"]) == 16.0
    np.testing.assert_allclose(np.asarray(out["layer"]["mean"]), 0)


def test_fpn_detector_init_with_bn_mode():
    """FasterRCNN.init must thread the batch_stats collection through its
    shape-probing backbone apply (regression: bn_mode models crashed with
    ScopeCollectionNotFound on init)."""
    from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from detectinblur_tpu.models.roi_heads import BoxHeadConfig
    from detectinblur_tpu.models.rpn import RPNConfig

    for mode in ("mode_one", "train"):
        model = FasterRCNN(FasterRCNNConfig(
            min_size=64, max_size=64, bn_mode=mode,
            rpn=RPNConfig(pre_nms_top_n_train=64, post_nms_top_n_train=32,
                          pre_nms_top_n_test=64, post_nms_top_n_test=32),
            box=BoxHeadConfig(batch_size_per_image=16, nms_pool=64,
                              detections_per_img=8)))
        params = model.init(jax.random.key(0), bucket=(64, 64))
        stats = model.init_stats((64, 64))
        assert model.has_bn and stats is not None
        assert "backbone" in params and "backbone" in stats
