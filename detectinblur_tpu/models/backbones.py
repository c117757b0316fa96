"""Versatile single-feature-map detectors (versatile_backbone_models.py).

``create_model`` in the reference (:13-119) builds a FasterRCNN over the
torso of a torchvision classifier — mobilenet_v2.features (1280 ch), vgg
features, or a resnet conv1..layer4 — with ONE feature map: anchors
(32..512) x (0.5, 1, 2) all on that map, MultiScaleRoIAlign over ['0'].
Normalization uses the ImageNet stats (:98-99).

Here: linen torsos (MobileNetV2 / VGG / ResNet trunk) + a
SingleMapFasterRCNN assembly reusing the same RPN/RoI-head machinery as the
FPN detector but with a one-level anchor grid and single-level RoIAlign.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectinblur_tpu.models.batchnorm import AdaptiveBatchNorm
from detectinblur_tpu.models.detection_transform import preprocess_batch, resize_boxes
from detectinblur_tpu.models.resnet import (
    ResNet,
    CONV_PRECISION,
    KAIMING_OUT_INIT,
)
from detectinblur_tpu.models.roi_heads import (
    BoxHeadConfig,
    FastRCNNPredictor,
    TwoMLPHead,
    fastrcnn_loss,
    postprocess_detections,
    select_training_samples,
)
from detectinblur_tpu.models.rpn import RPNConfig, RPNHead, rpn_loss, run_rpn
from detectinblur_tpu.ops.roi_align import roi_align_single_level

SINGLE_MAP_ANCHOR_SIZES = ((32.0, 64.0, 128.0, 256.0, 512.0),)
SINGLE_MAP_ASPECT_RATIOS = ((0.5, 1.0, 2.0),)


def _conv_bn6(ch, k, stride, name, groups=1, bn_mode="eval"):
    def apply(x):
        # torchvision mobilenet_v2 init: kaiming_normal_(fan_out) convs.
        x = nn.Conv(ch, (k, k), strides=(stride, stride),
                    padding=[(k // 2, k // 2)] * 2, use_bias=False,
                    feature_group_count=groups, name=f"{name}_conv",
                    precision=CONV_PRECISION, kernel_init=KAIMING_OUT_INIT)(x)
        x = AdaptiveBatchNorm(ch, mode=bn_mode, name=f"{name}_bn")(x)
        return jnp.minimum(nn.relu(x), 6.0)

    return apply


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int
    expand: int
    bn_mode: str = "eval"

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = _conv_bn6(hidden, 1, 1, "expand", bn_mode=self.bn_mode)(y)
        y = _conv_bn6(hidden, 3, self.stride, "depthwise", groups=hidden,
                      bn_mode=self.bn_mode)(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="project_conv",
                    precision=CONV_PRECISION, kernel_init=KAIMING_OUT_INIT)(y)
        y = AdaptiveBatchNorm(self.out_ch, mode=self.bn_mode, name="project_bn")(y)
        if self.stride == 1 and in_ch == self.out_ch:
            y = x + y
        return y


class MobileNetV2Features(nn.Module):
    """torchvision mobilenet_v2.features torso -> [H/32, W/32, 1280]."""

    bn_mode: str = "eval"

    @nn.compact
    def __call__(self, x):
        cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
               (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        x = _conv_bn6(32, 3, 2, "stem", bn_mode=self.bn_mode)(x)
        i = 1
        for t, c, n, s in cfg:
            for b in range(n):
                x = InvertedResidual(c, s if b == 0 else 1, t,
                                     bn_mode=self.bn_mode, name=f"block{i}")(x)
                i += 1
        x = _conv_bn6(1280, 1, 1, "head", bn_mode=self.bn_mode)(x)
        return x


VGG_CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512,
              512, 512, "M", 512, 512, 512, 512, "M"),
}


class VGGFeatures(nn.Module):
    arch: str = "vgg16"

    @nn.compact
    def __call__(self, x):
        i = 0
        for v in VGG_CFGS[self.arch]:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                # torchvision vgg init: kaiming_normal_(fan_out, relu),
                # bias 0 (flax default).
                x = nn.Conv(v, (3, 3), padding=[(1, 1)] * 2, name=f"conv{i}",
                            precision=CONV_PRECISION,
                            kernel_init=KAIMING_OUT_INIT)(x)
                x = nn.relu(x)
                i += 1
        return x


class SingleMapConfig(NamedTuple):
    backbone: str = "mobile_net"        # mobile_net | vggNN | resnetNN
    num_classes: int = 91
    # create_model defaults (versatile_backbone_models.py:13): min 300 /
    # max 500, unlike the FPN detector's 800/1333.
    min_size: int = 300
    max_size: int = 500
    rpn: RPNConfig = RPNConfig()
    box: BoxHeadConfig = BoxHeadConfig()
    stride: int = 32
    # Eval-time BN behavior for torsos with real BatchNorm: None = plain
    # eval stats (mobile_net) / frozen affine (resnet, vgg has no BN);
    # "mode_one" / "acclimation" enable the models/batchnorm.py remedies;
    # "train" ≙ --unfrozen_batch_norm (resnet torsos get live BN too).
    bn_mode: Optional[str] = None


class SingleMapFasterRCNN:
    """FasterRCNN over one backbone feature map (create_model semantics).

    Same duck-typed surface as models.faster_rcnn.FasterRCNN (init /
    init_stats / predict / loss / has_bn), so train.engine's
    make_train_step / make_eval_step drive either detector unchanged.
    The Squint warp args are accepted but ignored: the reference comments
    out warp_internally for versatile backbones (train.py:222-227).
    """

    def __init__(self, config: SingleMapConfig = SingleMapConfig()):
        self.cfg = config
        if config.backbone == "mobile_net":
            # torchvision mobilenet_v2 has real BN everywhere: eval-time
            # behavior from cfg.bn_mode, train-time always batch stats.
            self.torso = MobileNetV2Features(bn_mode=config.bn_mode or "eval")
            self._train_torso = MobileNetV2Features(bn_mode="train")
            self.has_bn = True
        elif config.backbone.startswith("vgg"):
            self.torso = self._train_torso = VGGFeatures(config.backbone)
            self.has_bn = False
        elif config.bn_mode is None:
            # FrozenBN affine, like the FPN detector's default backbone.
            self.torso = self._train_torso = ResNet(config.backbone)
            self.has_bn = False
        else:
            self.torso = ResNet(config.backbone, norm=functools.partial(
                AdaptiveBatchNorm, mode=config.bn_mode))
            self._train_torso = ResNet(config.backbone, norm=functools.partial(
                AdaptiveBatchNorm, mode="train"))
            self.has_bn = True
        num_anchors = len(SINGLE_MAP_ANCHOR_SIZES[0]) * len(SINGLE_MAP_ASPECT_RATIOS[0])
        self.rpn_head = RPNHead(num_anchors=num_anchors)
        self.box_head = TwoMLPHead()
        self.box_predictor = FastRCNNPredictor(config.num_classes)

    def _torso_out(self, params, x, train: bool = False, bn_stats=None):
        """Returns (feat, new_bn_stats); new_bn_stats is None unless the
        bn mode makes running stats mutable (train / acclimation)."""
        torso = self._train_torso if train else self.torso
        variables = {"params": params["backbone"]}
        mutable = False
        if self.has_bn:
            assert bn_stats is not None, (
                f"{self.cfg.backbone} torso has BatchNorm; pass bn_stats "
                "(init_stats() builds a fresh tree)")
            variables["batch_stats"] = bn_stats["backbone"]
            mode = "train" if train else (self.cfg.bn_mode or "eval")
            mutable = ["batch_stats"] if mode in ("train", "acclimation") else False
        kw = {"train": train} if isinstance(torso, ResNet) else {}
        out = torso.apply(variables, x, mutable=mutable, **kw)
        new_stats = None
        if mutable:
            out, mut = out
            new_stats = {"backbone": mut["batch_stats"]}
        if isinstance(out, tuple):
            out = out[-1]  # resnet trunk: C5
        return out, new_stats

    def init(self, key, bucket: Tuple[int, int] = (224, 224)):
        kb, kr, kh, kp = jax.random.split(key, 4)
        dummy = jnp.zeros((1, bucket[0], bucket[1], 3), jnp.float32)
        variables = self.torso.init(kb, dummy)
        backbone = variables["params"]
        bn_stats = ({"backbone": variables["batch_stats"]}
                    if "batch_stats" in variables else None)
        feat, _ = self._torso_out({"backbone": backbone}, dummy,
                                  bn_stats=bn_stats)
        rpn_head = self.rpn_head.init(kr, [feat])["params"]
        c = feat.shape[-1]
        pooled = jnp.zeros((1, c, 7, 7), jnp.float32)
        box_head = self.box_head.init(kh, pooled)["params"]
        box_predictor = self.box_predictor.init(
            kp, jnp.zeros((1, 1024), jnp.float32))["params"]
        return {"backbone": backbone, "rpn_head": rpn_head,
                "box_head": box_head, "box_predictor": box_predictor}

    def init_stats(self, bucket: Tuple[int, int] = (224, 224)):
        """Fresh batch_stats tree for torsos with BN (None otherwise)."""
        if not self.has_bn:
            return None
        dummy = jnp.zeros((1, bucket[0], bucket[1], 3), jnp.float32)
        variables = self.torso.init(jax.random.key(0), dummy)
        return {"backbone": variables["batch_stats"]}

    def predict(self, params, images, hw, bucket: Tuple[int, int],
                means=None, stds=None, thetas=None, lam1s=None, lam2s=None,
                kill_warp: bool = False, bn_stats=None):
        del thetas, lam1s, lam2s, kill_warp  # no Squint path (see class doc)
        cfg = self.cfg
        batched, new_hw = preprocess_batch(images, hw, bucket, means, stds,
                                           min_size=cfg.min_size,
                                           max_size=cfg.max_size)
        feat, _ = self._torso_out(params, batched, bn_stats=bn_stats)
        rpn_out = run_rpn(
            params["rpn_head"], self.rpn_head, [feat], new_hw, training=False,
            cfg=cfg.rpn, first_level_stride=cfg.stride,
            anchor_sizes=SINGLE_MAP_ANCHOR_SIZES,
            anchor_ratios=SINGLE_MAP_ASPECT_RATIOS,
        )
        scale = 1.0 / cfg.stride

        def per_image(feat_i, rois, roi_valid, hw_i, orig_hw_i):
            pooled = roi_align_single_level(feat_i, rois, scale)
            pooled = jnp.transpose(pooled, (0, 3, 1, 2))
            x = self.box_head.apply({"params": params["box_head"]}, pooled)
            logits, deltas = self.box_predictor.apply(
                {"params": params["box_predictor"]}, x)
            boxes, scores, labels, valid = postprocess_detections(
                logits, deltas, rois, roi_valid, hw_i, cfg.box)
            return resize_boxes(boxes, hw_i, orig_hw_i), scores, labels, valid

        from detectinblur_tpu.models.faster_rcnn import Detections

        return Detections(*jax.vmap(per_image)(
            feat, rpn_out.proposals, rpn_out.proposal_valid, new_hw, hw))

    def loss(self, params, key, images, hw, gt_boxes, gt_labels, gt_valid,
             bucket: Tuple[int, int], means=None, stds=None, thetas=None,
             lam1s=None, lam2s=None, kill_warp: bool = False, bn_stats=None):
        """Training losses, single-level twin of FasterRCNN.loss (the
        reference trains versatile models through the same engine,
        train.py:222-227 + engine.py:30-167)."""
        del thetas, lam1s, lam2s, kill_warp  # no Squint path (see class doc)
        cfg = self.cfg
        B = images.shape[0]
        batched, new_hw = preprocess_batch(images, hw, bucket, means, stds,
                                           min_size=cfg.min_size,
                                           max_size=cfg.max_size)
        gt_resized = jax.vmap(resize_boxes)(gt_boxes, hw, new_hw)

        feat, new_bn_stats = self._torso_out(params, batched, train=True,
                                             bn_stats=bn_stats)
        rpn_out = run_rpn(
            params["rpn_head"], self.rpn_head, [feat], new_hw, training=True,
            cfg=cfg.rpn, first_level_stride=cfg.stride,
            anchor_sizes=SINGLE_MAP_ANCHOR_SIZES,
            anchor_ratios=SINGLE_MAP_ASPECT_RATIOS,
        )
        keys = jax.random.split(key, (B, 2))

        rpn_box_l, rpn_obj_l, rpn_n = jax.vmap(
            lambda k, obj, dlt, gb, gv: rpn_loss(
                k, obj, dlt, rpn_out.anchors, gb, gv, cfg.rpn
            )
        )(keys[:, 0], rpn_out.objectness, rpn_out.pred_deltas, gt_resized,
          gt_valid)

        rois, roi_labels, reg_targets, roi_valid = jax.vmap(
            lambda k, r, rv, gb, gl, gv: select_training_samples(
                k, r, rv, gb, gl, gv, cfg.box)
        )(keys[:, 1], rpn_out.proposals, rpn_out.proposal_valid,
          gt_resized, gt_labels, gt_valid)

        scale = 1.0 / cfg.stride

        def box_outputs(feat_i, rois_i):
            pooled = roi_align_single_level(feat_i, rois_i, scale)
            pooled = jnp.transpose(pooled, (0, 3, 1, 2))
            x = self.box_head.apply({"params": params["box_head"]}, pooled)
            return self.box_predictor.apply(
                {"params": params["box_predictor"]}, x)

        logits, deltas = jax.vmap(box_outputs)(feat, rois)
        ce_sum, box_sum, n = jax.vmap(fastrcnn_loss)(
            logits, deltas, roi_labels, reg_targets)
        n_tot = jnp.maximum(jnp.sum(n), 1)
        return {
            "loss_objectness": jnp.sum(rpn_obj_l) / jnp.maximum(jnp.sum(rpn_n), 1),
            "loss_rpn_box_reg": jnp.sum(rpn_box_l) / jnp.maximum(jnp.sum(rpn_n), 1),
            "loss_classifier": jnp.sum(ce_sum) / n_tot,
            "loss_box_reg": jnp.sum(box_sum) / n_tot,
        }, new_bn_stats
