"""Versatile single-map detectors (versatile_backbone_models.py parity):
predict/loss on tiny shapes, BN-stats threading, ImageNet torso weight
converters, CLI model dispatch (train.py:218-230)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from detectinblur_tpu.models.backbones import (
    SingleMapConfig,
    SingleMapFasterRCNN,
)
from detectinblur_tpu.models.roi_heads import BoxHeadConfig
from detectinblur_tpu.models.rpn import RPNConfig

TINY_RPN = RPNConfig(pre_nms_top_n_train=200, post_nms_top_n_train=100,
                     pre_nms_top_n_test=200, post_nms_top_n_test=100)
TINY_BOX = BoxHeadConfig(batch_size_per_image=64, nms_pool=256,
                         detections_per_img=20)


def tiny_cfg(backbone, **kw):
    return SingleMapConfig(backbone=backbone, min_size=96, max_size=128,
                           rpn=TINY_RPN, box=TINY_BOX, **kw)


@pytest.fixture(scope="module", params=["mobile_net", "resnet18"])
def single_map(request):
    model = SingleMapFasterRCNN(tiny_cfg(request.param))
    params = model.init(jax.random.key(0), bucket=(96, 128))
    stats = model.init_stats((96, 128))
    return model, params, stats


def test_predict_shapes(single_map, rng):
    model, params, stats = single_map
    imgs = jnp.asarray(rng.random((2, 96, 128, 3), dtype=np.float32))
    hw = jnp.array([[96, 128], [80, 100]])
    det = model.predict(params, imgs, hw, bucket=(96, 128), bn_stats=stats)
    D = TINY_BOX.detections_per_img
    assert det.boxes.shape == (2, D, 4)
    assert det.scores.shape == det.labels.shape == det.valid.shape == (2, D)
    assert model.has_bn == (model.cfg.backbone == "mobile_net")
    assert (stats is not None) == model.has_bn


def test_loss_and_grads(single_map, rng):
    model, params, stats = single_map
    imgs = jnp.asarray(rng.random((1, 96, 128, 3), dtype=np.float32))
    hw = jnp.array([[96, 128]])
    gtb = jnp.array([[[10.0, 10.0, 60.0, 60.0], [20.0, 30.0, 90.0, 80.0]]])
    gtl = jnp.array([[1, 5]])
    gtv = jnp.array([[True, True]])

    def total(p):
        losses, new_stats = model.loss(p, jax.random.key(1), imgs, hw, gtb,
                                       gtl, gtv, bucket=(96, 128),
                                       bn_stats=stats)
        return sum(losses.values()), new_stats

    (val, new_stats), grads = jax.value_and_grad(
        total, has_aux=True)(params)
    assert np.isfinite(float(val))
    leaf_norms = [float(jnp.abs(g).max())
                  for g in jax.tree.leaves(grads["rpn_head"])]
    assert max(leaf_norms) > 0
    if model.has_bn:
        # Train-mode BN must have produced updated running stats.
        assert new_stats is not None
        old = stats["backbone"]["stem_bn"]["num_batches_tracked"]
        new = new_stats["backbone"]["stem_bn"]["num_batches_tracked"]
        assert float(new) == float(old) + 1


def test_predict_requires_stats_when_bn():
    model = SingleMapFasterRCNN(tiny_cfg("mobile_net"))
    params = model.init(jax.random.key(0), bucket=(96, 128))
    imgs = jnp.zeros((1, 96, 128, 3), jnp.float32)
    hw = jnp.array([[96, 128]])
    with pytest.raises(AssertionError, match="bn_stats"):
        model.predict(params, imgs, hw, bucket=(96, 128))


def test_mobilenet_converter_matches_init():
    torchvision = pytest.importorskip("torchvision")
    from detectinblur_tpu.utils.torch_convert import (
        assert_tree_shapes_match,
        convert_mobilenet_v2_features,
    )

    sd = {k: v.detach().numpy()
          for k, v in torchvision.models.mobilenet_v2().state_dict().items()}
    torso, stats = convert_mobilenet_v2_features(sd)
    model = SingleMapFasterRCNN(tiny_cfg("mobile_net"))
    init_p = model.init(jax.random.key(0), bucket=(96, 128))
    init_s = model.init_stats((96, 128))
    assert_tree_shapes_match(torso, init_p["backbone"])
    assert_tree_shapes_match(stats, init_s["backbone"])


@pytest.mark.parametrize("frozen", [True, False])
def test_resnet_trunk_converter_matches_init(frozen):
    torchvision = pytest.importorskip("torchvision")
    from detectinblur_tpu.utils.torch_convert import (
        assert_tree_shapes_match,
        convert_resnet_trunk_state_dict,
    )

    sd = {k: v.detach().numpy()
          for k, v in torchvision.models.resnet18().state_dict().items()}
    torso, stats = convert_resnet_trunk_state_dict(sd, arch="resnet18",
                                                   frozen_bn=frozen)
    cfg = tiny_cfg("resnet18", bn_mode=None if frozen else "train")
    model = SingleMapFasterRCNN(cfg)
    init_p = model.init(jax.random.key(0), bucket=(96, 128))
    assert_tree_shapes_match(torso, init_p["backbone"])
    if frozen:
        assert stats is None
    else:
        init_s = model.init_stats((96, 128))
        assert_tree_shapes_match(stats, init_s["backbone"])


def test_resnet_classifier_converter_matches_init():
    torchvision = pytest.importorskip("torchvision")
    from detectinblur_tpu.models.classifier import ResNetClassifier
    from detectinblur_tpu.utils.torch_convert import (
        assert_tree_shapes_match,
        convert_resnet_classifier_state_dict,
    )

    sd = {k: v.detach().numpy()
          for k, v in torchvision.models.resnet18().state_dict().items()}
    params, stats = convert_resnet_classifier_state_dict(sd, include_fc=True)
    clf = ResNetClassifier("resnet18", num_classes=1000)
    variables = clf.init(jax.random.key(0),
                         np.zeros((1, 64, 64, 3), np.float32))
    assert_tree_shapes_match(params, variables["params"])
    assert_tree_shapes_match(stats, variables["batch_stats"])


def test_build_model_dispatch():
    from detectinblur_tpu.cli.args import train_parser
    from detectinblur_tpu.cli.train import build_model
    from detectinblur_tpu.models.faster_rcnn import FasterRCNN

    args = train_parser().parse_args(["--model", "fasterrcnn_resnet50_fpn"])
    assert isinstance(build_model(args), FasterRCNN)
    args = train_parser().parse_args(["--model", "mobile_net"])
    m = build_model(args)
    assert isinstance(m, SingleMapFasterRCNN)
    assert m.cfg.backbone == "mobile_net" and m.has_bn
    args = train_parser().parse_args(["--model", "resnet_50"])
    m = build_model(args)
    assert isinstance(m, SingleMapFasterRCNN)
    assert m.cfg.backbone == "resnet50" and not m.has_bn
    # create_model defaults: min 300 / max 500 (versatile_backbone_models.py)
    assert m.cfg.min_size == 300 and m.cfg.max_size == 500
    import types

    with pytest.raises(ValueError):
        build_model(types.SimpleNamespace(model="yolo9000",
                                          warp_in_model=False))


# ---- synthetic-layout converter tests (always run; torchvision-free) ----
# State dicts fabricated from the public torchvision architecture tables
# (tests/synthetic_torch.py), so the converters are exercised in
# environments without torchvision. The live-torchvision variants above
# remain the stronger check where available.

def test_mobilenet_converter_synthetic_layout():
    from synthetic_torch import synthetic_mobilenet_v2_state_dict
    from detectinblur_tpu.utils.torch_convert import (
        assert_tree_shapes_match,
        convert_mobilenet_v2_features,
    )

    sd = synthetic_mobilenet_v2_state_dict()
    torso, stats = convert_mobilenet_v2_features(sd)
    model = SingleMapFasterRCNN(tiny_cfg("mobile_net"))
    init_p = model.init(jax.random.key(0), bucket=(96, 128))
    init_s = model.init_stats((96, 128))
    assert_tree_shapes_match(torso, init_p["backbone"])
    assert_tree_shapes_match(stats, init_s["backbone"])
    # Conv kernels transpose OIHW -> HWIO with values preserved.
    np.testing.assert_allclose(
        np.asarray(torso["stem_conv"]["kernel"]),
        np.transpose(sd["features.0.0.weight"], (2, 3, 1, 0)))


@pytest.mark.parametrize("frozen", [True, False])
def test_resnet_trunk_converter_synthetic_layout(frozen):
    from synthetic_torch import synthetic_resnet_state_dict
    from detectinblur_tpu.utils.torch_convert import (
        assert_tree_shapes_match,
        convert_resnet_trunk_state_dict,
    )

    sd = synthetic_resnet_state_dict("resnet18")
    torso, stats = convert_resnet_trunk_state_dict(sd, arch="resnet18",
                                                   frozen_bn=frozen)
    cfg = tiny_cfg("resnet18", bn_mode=None if frozen else "train")
    model = SingleMapFasterRCNN(cfg)
    init_p = model.init(jax.random.key(0), bucket=(96, 128))
    assert_tree_shapes_match(torso, init_p["backbone"])
    if frozen:
        assert stats is None
        # Folded FrozenBN: scale = w/sqrt(var+eps), bias = b - mean*scale.
        scale = np.asarray(torso["bn1"]["scale"])
        expect = sd["bn1.weight"] / np.sqrt(sd["bn1.running_var"])
        np.testing.assert_allclose(scale, expect, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(torso["bn1"]["bias"]),
            sd["bn1.bias"] - sd["bn1.running_mean"] * expect, rtol=1e-5)
    else:
        init_s = model.init_stats((96, 128))
        assert_tree_shapes_match(stats, init_s["backbone"])


def test_resnet_classifier_converter_synthetic_layout():
    from synthetic_torch import synthetic_resnet_state_dict
    from detectinblur_tpu.models.classifier import ResNetClassifier
    from detectinblur_tpu.utils.torch_convert import (
        assert_tree_shapes_match,
        convert_resnet_classifier_state_dict,
    )

    sd = synthetic_resnet_state_dict("resnet18")
    params, stats = convert_resnet_classifier_state_dict(sd, include_fc=True)
    clf = ResNetClassifier("resnet18", num_classes=1000)
    variables = clf.init(jax.random.key(0),
                         np.zeros((1, 64, 64, 3), np.float32))
    assert_tree_shapes_match(params, variables["params"])
    assert_tree_shapes_match(stats, variables["batch_stats"])


def test_fasterrcnn_converter_synthetic_layout():
    from synthetic_torch import synthetic_fasterrcnn_state_dict
    from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from detectinblur_tpu.utils.torch_convert import (
        assert_tree_shapes_match,
        convert_fasterrcnn_state_dict,
        convert_fasterrcnn_bn_stats,
    )

    sd = synthetic_fasterrcnn_state_dict()
    tree = convert_fasterrcnn_state_dict(sd)
    model = FasterRCNN(FasterRCNNConfig(min_size=96, max_size=128,
                                        rpn=TINY_RPN, box=TINY_BOX))
    init_p = model.init(jax.random.key(0), bucket=(96, 128))
    assert_tree_shapes_match(tree, init_p)
    # fc weights transpose [out, in] -> [in, out].
    np.testing.assert_allclose(
        np.asarray(tree["box_head"]["fc6"]["kernel"]),
        np.transpose(sd["roi_heads.box_head.fc6.weight"]))
    # Unfrozen path returns real BN params + a parallel stats tree.
    tree_bn = convert_fasterrcnn_state_dict(sd, frozen_bn=False)
    stats = convert_fasterrcnn_bn_stats(sd)
    model_bn = FasterRCNN(FasterRCNNConfig(min_size=96, max_size=128,
                                           rpn=TINY_RPN, box=TINY_BOX,
                                           bn_mode="acclimation"))
    init_bn = model_bn.init(jax.random.key(0), bucket=(96, 128))
    assert_tree_shapes_match(tree_bn, init_bn)
    assert_tree_shapes_match(stats, model_bn.init_stats())
