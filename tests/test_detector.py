"""Detector integration: tiny-shape forward/loss/grad, and the multichip
SPMD dry-run (the driver's dryrun_multichip path) on the 8-device virtual
CPU mesh."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig


from detectinblur_tpu.models.roi_heads import BoxHeadConfig
from detectinblur_tpu.models.rpn import RPNConfig

TINY_CFG = FasterRCNNConfig(
    min_size=64, max_size=64,
    rpn=RPNConfig(pre_nms_top_n_train=200, post_nms_top_n_train=100,
                  pre_nms_top_n_test=200, post_nms_top_n_test=100),
    box=BoxHeadConfig(batch_size_per_image=64, nms_pool=256,
                      detections_per_img=20),
)


@pytest.fixture(scope="module")
def tiny_model():
    model = FasterRCNN(TINY_CFG)
    params = model.init(jax.random.key(0), bucket=(64, 64))
    return model, params


def test_predict_shapes_and_validity(tiny_model, rng):
    model, params = tiny_model
    imgs = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    hw = jnp.array([[60, 50], [64, 64]])
    det = model.predict(params, imgs, hw, bucket=(64, 64))
    D = TINY_CFG.box.detections_per_img
    assert det.boxes.shape == (2, D, 4)
    assert det.scores.shape == (2, D)
    v = np.asarray(det.valid)
    s = np.asarray(det.scores)
    # Invalid slots carry zero score; valid ones exceed the 0.05 threshold.
    assert (s[~v] == 0).all()
    if v.any():
        assert (s[v] > 0.05).all()
    b = np.asarray(det.boxes)
    # Boxes live in original-image coordinates.
    assert (b[0][v[0]] <= 60.0 + 1e-3).all() if v[0].any() else True


def test_loss_finite_and_grads_flow(tiny_model, rng):
    model, params = tiny_model
    imgs = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    hw = jnp.array([[64, 64], [64, 64]])
    gt_boxes = jnp.array([[[5.0, 5, 30, 30], [10, 10, 40, 45]]] * 2)
    gt_labels = jnp.array([[1, 17]] * 2)
    gt_valid = jnp.array([[True, True]] * 2)

    def total(p):
        losses, _ = model.loss(p, jax.random.key(2), imgs, hw, gt_boxes,
                               gt_labels, gt_valid, bucket=(64, 64))
        return sum(losses.values()), losses

    (tot, losses), grads = jax.value_and_grad(total, has_aux=True)(params)
    assert np.isfinite(float(tot))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    gnorm = jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_empty_gt_image(tiny_model, rng):
    model, params = tiny_model
    imgs = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    hw = jnp.array([[64, 64]])
    gt_boxes = jnp.zeros((1, 2, 4))
    gt_labels = jnp.zeros((1, 2), jnp.int32)
    gt_valid = jnp.zeros((1, 2), bool)
    losses, _ = model.loss(params, jax.random.key(0), imgs, hw, gt_boxes,
                           gt_labels, gt_valid, bucket=(64, 64))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_balanced_sample_counts(rng):
    """torchvision BalancedPositiveNegativeSampler semantics: exactly
    min(#pos, 128) positives and min(#neg, 256 - #sampled_pos) negatives,
    uniformly at random, masks disjoint and within their pools."""
    from detectinblur_tpu.models.rpn import balanced_sample

    labels = jnp.asarray(rng.choice([-1, 0, 1], size=5000,
                                    p=[0.2, 0.75, 0.05]).astype(np.int32))
    sel_pos, sel_neg = jax.jit(
        lambda k, l: balanced_sample(k, l, 256, 0.5)
    )(jax.random.key(0), labels)
    sp, sn, lab = map(np.asarray, (sel_pos, sel_neg, labels))
    n_pos = min((lab == 1).sum(), 128)
    assert sp.sum() == n_pos
    assert sn.sum() == min((lab == 0).sum(), 256 - n_pos)
    assert not (sp & sn).any()
    assert (lab[sp] == 1).all() and (lab[sn] == 0).all()

    # Few positives: all of them taken, negatives fill the budget.
    labels2 = jnp.asarray(np.r_[np.ones(3), np.zeros(4000),
                                -np.ones(997)].astype(np.int32))
    sel_pos, sel_neg = jax.jit(
        lambda k, l: balanced_sample(k, l, 256, 0.5)
    )(jax.random.key(1), labels2)
    assert int(sel_pos.sum()) == 3 and int(sel_neg.sum()) == 253

    # No positives at all.
    labels3 = jnp.zeros(1000, jnp.int32)
    sel_pos, sel_neg = balanced_sample(jax.random.key(2), labels3, 256, 0.5)
    assert int(sel_pos.sum()) == 0 and int(sel_neg.sum()) == 256


def test_dryrun_multichip_8():
    import __graft_entry__

    assert jax.device_count() >= 8
    __graft_entry__.dryrun_multichip(8)


def test_resnext_torso_forward():
    """resnext101_32x8d grouped-conv trunk (reference
    versatile_backbone_models.py torso option) produces the usual C2..C5."""
    import jax
    import jax.numpy as jnp
    from detectinblur_tpu.models.resnet import ResNet

    m = ResNet("resnext101_32x8d")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = m.init(jax.random.key(0), x)["params"]
    # conv2 of layer1 block 0 must be grouped: kernel [3,3,in/groups=8,256].
    assert params["layer1_0"]["conv2"]["kernel"].shape == (3, 3, 8, 256)
    outs = m.apply({"params": params}, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]


def test_torchvision_init_semantics():
    """From-scratch init matches torchvision (matters for --pretrained off):
    RPN head convs N(0, 0.01); torch nn.Linear default U(+-1/sqrt(fan_in))
    for kernel AND bias; resnet convs kaiming_normal(fan_out)."""
    import numpy as np
    from detectinblur_tpu.models.faster_rcnn import FasterRCNN

    model = FasterRCNN()
    params = model.init(jax.random.key(3), bucket=(96, 96))

    for name in ("conv", "cls_logits", "bbox_pred"):
        w = np.asarray(params["rpn_head"][name]["kernel"])
        assert abs(w.std() - 0.01) < 0.002, (name, w.std())
        assert np.all(params["rpn_head"][name]["bias"] == 0)

    fc6 = params["box_head"]["fc6"]
    bound = 1.0 / np.sqrt(fc6["kernel"].shape[0])
    for leaf in (fc6["kernel"], fc6["bias"]):
        a = np.asarray(leaf)
        assert a.max() <= bound and a.min() >= -bound
        assert a.std() > 0.4 * bound          # uniform, not zeros

    pred = params["box_predictor"]["cls_score"]
    bound = 1.0 / np.sqrt(pred["kernel"].shape[0])
    assert np.abs(np.asarray(pred["bias"])).max() <= bound
    assert np.asarray(pred["bias"]).std() > 0

    # resnet stem: kaiming_normal(fan_out) => std = sqrt(2 / (49 * 64)).
    stem = np.asarray(params["backbone"]["body"]["conv1"]["kernel"])
    expect = np.sqrt(2.0 / (7 * 7 * 64))
    assert abs(stem.std() - expect) / expect < 0.15
