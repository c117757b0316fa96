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
from detectinblur_tpu.models.resnet import ResNet, CONV_PRECISION
from detectinblur_tpu.models.roi_heads import (
    BoxHeadConfig,
    FastRCNNPredictor,
    TwoMLPHead,
    postprocess_detections,
)
from detectinblur_tpu.models.rpn import RPNConfig, RPNHead, run_rpn
from detectinblur_tpu.ops.roi_align import roi_align_single_level

SINGLE_MAP_ANCHOR_SIZES = ((32.0, 64.0, 128.0, 256.0, 512.0),)
SINGLE_MAP_ASPECT_RATIOS = ((0.5, 1.0, 2.0),)


def _conv_bn6(ch, k, stride, name, groups=1, bn_mode="eval"):
    def apply(x):
        x = nn.Conv(ch, (k, k), strides=(stride, stride),
                    padding=[(k // 2, k // 2)] * 2, use_bias=False,
                    feature_group_count=groups, name=f"{name}_conv",
                    precision=CONV_PRECISION)(x)
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
                    precision=CONV_PRECISION)(y)
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
                x = nn.Conv(v, (3, 3), padding=[(1, 1)] * 2, name=f"conv{i}",
                            precision=CONV_PRECISION)(x)
                x = nn.relu(x)
                i += 1
        return x


class SingleMapConfig(NamedTuple):
    backbone: str = "mobile_net"        # mobile_net | vggNN | resnetNN
    num_classes: int = 91
    min_size: int = 800
    max_size: int = 1333
    rpn: RPNConfig = RPNConfig()
    box: BoxHeadConfig = BoxHeadConfig()
    stride: int = 32


class SingleMapFasterRCNN:
    """FasterRCNN over one backbone feature map (create_model semantics)."""

    def __init__(self, config: SingleMapConfig = SingleMapConfig()):
        self.cfg = config
        if config.backbone == "mobile_net":
            self.torso = MobileNetV2Features()
        elif config.backbone.startswith("vgg"):
            self.torso = VGGFeatures(config.backbone)
        else:
            self.torso = ResNet(config.backbone)
        num_anchors = len(SINGLE_MAP_ANCHOR_SIZES[0]) * len(SINGLE_MAP_ASPECT_RATIOS[0])
        self.rpn_head = RPNHead(num_anchors=num_anchors)
        self.box_head = TwoMLPHead()
        self.box_predictor = FastRCNNPredictor(config.num_classes)

    def _torso_out(self, params, x):
        out = self.torso.apply({"params": params["backbone"]}, x)
        if isinstance(out, tuple):
            out = out[-1]  # resnet trunk: C5
        return out

    def init(self, key, bucket: Tuple[int, int] = (224, 224)):
        kb, kr, kh, kp = jax.random.split(key, 4)
        dummy = jnp.zeros((1, bucket[0], bucket[1], 3), jnp.float32)
        backbone = self.torso.init(kb, dummy)["params"]
        feat = self._torso_out({"backbone": backbone}, dummy)
        rpn_head = self.rpn_head.init(kr, [feat])["params"]
        c = feat.shape[-1]
        pooled = jnp.zeros((1, c, 7, 7), jnp.float32)
        box_head = self.box_head.init(kh, pooled)["params"]
        box_predictor = self.box_predictor.init(
            kp, jnp.zeros((1, 1024), jnp.float32))["params"]
        return {"backbone": backbone, "rpn_head": rpn_head,
                "box_head": box_head, "box_predictor": box_predictor}

    def predict(self, params, images, hw, bucket: Tuple[int, int]):
        cfg = self.cfg
        batched, new_hw = preprocess_batch(images, hw, bucket,
                                           min_size=cfg.min_size,
                                           max_size=cfg.max_size)
        feat = self._torso_out(params, batched)
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

        return jax.vmap(per_image)(feat, rpn_out.proposals,
                                   rpn_out.proposal_valid, new_hw, hw)
