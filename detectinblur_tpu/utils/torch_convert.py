"""Convert torchvision Faster R-CNN checkpoints to detectinblur_tpu params.

The reference loads torchvision's released ``fasterrcnn_resnet50_fpn_coco``
weights (models/faster_rcnn.py:295-298,360-372) and saves its own
checkpoints as ``{model, optimizer, lr_scheduler, args, epoch}`` dicts
(train.py:332-339). This module maps a torch ``state_dict`` (as numpy
arrays) onto the param pytree produced by
``detectinblur_tpu.models.faster_rcnn.FasterRCNN.init``:

  * conv weights OIHW -> HWIO,
  * linear weights [out, in] -> [in, out],
  * FrozenBatchNorm (weight, bias, running_mean, running_var) folded into
    the affine (scale, bias) pair used by models.resnet.FrozenBatchNorm,
  * torchvision naming differences across versions (``inner_blocks.0`` vs
    ``inner_blocks.0.0``, ``rpn.head.conv`` vs ``rpn.head.conv.0.0``)
    handled transparently.

No torch import is required here — pass any mapping of name -> np.ndarray
(use ``load_torch_state_dict`` for .pth files when torch is available).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]  # reference checkpoint layout (train.py:332-339)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _fold_frozen_bn(sd: Mapping[str, np.ndarray], prefix: str, eps: float):
    gamma = sd[f"{prefix}.weight"]
    beta = sd[f"{prefix}.bias"]
    mean = sd[f"{prefix}.running_mean"]
    var = sd[f"{prefix}.running_var"]
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    return {"scale": scale.astype(np.float32), "bias": bias.astype(np.float32)}


def _get(sd: Mapping[str, np.ndarray], *candidates: str) -> np.ndarray:
    for c in candidates:
        if c in sd:
            return sd[c]
    raise KeyError(f"none of {candidates} found in state dict")


def _bn_params(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"].astype(np.float32),
            "bias": sd[f"{prefix}.bias"].astype(np.float32)}


def _bn_stats(sd, prefix, num_batches: float = 0.0):
    return {"mean": sd[f"{prefix}.running_mean"].astype(np.float32),
            "var": sd[f"{prefix}.running_var"].astype(np.float32),
            "num_batches_tracked": np.float32(num_batches)}


def convert_fasterrcnn_state_dict(
    sd: Mapping[str, np.ndarray],
    arch: str = "resnet50",
    bn_eps: float = 0.0,
    frozen_bn: bool = True,
) -> Dict:
    """Build the detectinblur_tpu param tree from a torchvision
    fasterrcnn_{arch}_fpn state dict.

    With ``frozen_bn`` (default) BN folds into affine pairs; with
    ``frozen_bn=False`` (the --unfrozen_batch_norm / --mode_one_norm paths,
    utils.py:37-78) real (scale, bias) params are kept and running stats
    are returned under a parallel ``batch_stats`` tree — call
    ``convert_fasterrcnn_bn_stats`` for that tree.
    """
    from detectinblur_tpu.models.resnet import RESNET_SPECS

    bn = (lambda p: _fold_frozen_bn(sd, p, bn_eps)) if frozen_bn else (
        lambda p: _bn_params(sd, p))

    _, layers, _ = RESNET_SPECS[arch]
    body: Dict = {}
    body["conv1"] = {"kernel": _conv_kernel(sd["backbone.body.conv1.weight"])}
    body["bn1"] = bn("backbone.body.bn1")

    for li, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            p = f"backbone.body.layer{li}.{b}"
            blk: Dict = {}
            convs = 3 if f"{p}.conv3.weight" in sd else 2
            for c in range(1, convs + 1):
                blk[f"conv{c}"] = {"kernel": _conv_kernel(sd[f"{p}.conv{c}.weight"])}
                blk[f"bn{c}"] = bn(f"{p}.bn{c}")
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample_0"] = {
                    "kernel": _conv_kernel(sd[f"{p}.downsample.0.weight"])
                }
                blk["downsample_1"] = bn(f"{p}.downsample.1")
            body[f"layer{li}_{b}"] = blk

    fpn: Dict = {}
    for i in range(4):
        iw = _get(sd, f"backbone.fpn.inner_blocks.{i}.weight",
                  f"backbone.fpn.inner_blocks.{i}.0.weight")
        ib = _get(sd, f"backbone.fpn.inner_blocks.{i}.bias",
                  f"backbone.fpn.inner_blocks.{i}.0.bias")
        lw = _get(sd, f"backbone.fpn.layer_blocks.{i}.weight",
                  f"backbone.fpn.layer_blocks.{i}.0.weight")
        lb = _get(sd, f"backbone.fpn.layer_blocks.{i}.bias",
                  f"backbone.fpn.layer_blocks.{i}.0.bias")
        fpn[f"inner_{i}"] = {"kernel": _conv_kernel(iw), "bias": ib}
        fpn[f"layer_{i}"] = {"kernel": _conv_kernel(lw), "bias": lb}

    rpn_head = {
        "conv": {
            "kernel": _conv_kernel(_get(sd, "rpn.head.conv.weight",
                                        "rpn.head.conv.0.0.weight")),
            "bias": _get(sd, "rpn.head.conv.bias", "rpn.head.conv.0.0.bias"),
        },
        "cls_logits": {
            "kernel": _conv_kernel(sd["rpn.head.cls_logits.weight"]),
            "bias": sd["rpn.head.cls_logits.bias"],
        },
        "bbox_pred": {
            "kernel": _conv_kernel(sd["rpn.head.bbox_pred.weight"]),
            "bias": sd["rpn.head.bbox_pred.bias"],
        },
    }

    def dense(prefix):
        return {
            "kernel": np.transpose(sd[f"{prefix}.weight"]),
            "bias": sd[f"{prefix}.bias"],
        }

    box_head = {"fc6": dense("roi_heads.box_head.fc6"),
                "fc7": dense("roi_heads.box_head.fc7")}
    box_predictor = {"cls_score": dense("roi_heads.box_predictor.cls_score"),
                     "bbox_pred": dense("roi_heads.box_predictor.bbox_pred")}

    import jax.numpy as jnp
    import jax

    tree = {
        "backbone": {"body": body, "fpn": fpn},
        "rpn_head": rpn_head,
        "box_head": box_head,
        "box_predictor": box_predictor,
    }
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), tree)


def convert_fasterrcnn_bn_stats(
    sd: Mapping[str, np.ndarray],
    arch: str = "resnet50",
    num_batches: float = 0.0,
) -> Dict:
    """batch_stats tree (running mean/var) matching the unfrozen-BN layout.

    ``num_batches`` seeds num_batches_tracked (evaluate.py:234-237 sets 16
    for --mode_one_norm via models.batchnorm.set_num_batches_tracked)."""
    from detectinblur_tpu.models.resnet import RESNET_SPECS

    _, layers, _ = RESNET_SPECS[arch]
    body: Dict = {"bn1": _bn_stats(sd, "backbone.body.bn1", num_batches)}
    for li, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            p = f"backbone.body.layer{li}.{b}"
            blk: Dict = {}
            convs = 3 if f"{p}.conv3.weight" in sd else 2
            for c in range(1, convs + 1):
                blk[f"bn{c}"] = _bn_stats(sd, f"{p}.bn{c}", num_batches)
            if f"{p}.downsample.1.weight" in sd:
                blk["downsample_1"] = _bn_stats(sd, f"{p}.downsample.1", num_batches)
            body[f"layer{li}_{b}"] = blk

    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda x: jnp.asarray(x),
                        {"backbone": {"body": body}})


def convert_mobilenet_v2_features(sd: Mapping[str, np.ndarray]):
    """torchvision mobilenet_v2 ImageNet state dict -> (params, batch_stats)
    for models.backbones.MobileNetV2Features (the versatile mobile_net torso,
    versatile_backbone_models.py:31-36 uses ``mobilenet_v2(pretrained).features``).

    Keys are the classifier's: features.0 stem ConvBNReLU, features.1..17
    InvertedResiduals (block 1 has no expand conv), features.18 head
    ConvBNReLU. BN stays real (AdaptiveBatchNorm), so running stats come
    along in a parallel tree.
    """
    params: Dict = {}
    stats: Dict = {}

    def conv_bn(dst, conv_key, bn_key):
        params[f"{dst}_conv"] = {"kernel": _conv_kernel(sd[conv_key])}
        params[f"{dst}_bn"] = _bn_params(sd, bn_key)
        stats[f"{dst}_bn"] = _bn_stats(sd, bn_key)

    conv_bn("stem", "features.0.0.weight", "features.0.1")
    for i in range(1, 18):
        blk_p: Dict = {}
        blk_s: Dict = {}

        def blk_conv_bn(dst, conv_key, bn_key):
            blk_p[f"{dst}_conv"] = {"kernel": _conv_kernel(sd[conv_key])}
            blk_p[f"{dst}_bn"] = _bn_params(sd, bn_key)
            blk_s[f"{dst}_bn"] = _bn_stats(sd, bn_key)

        p = f"features.{i}.conv"
        if f"{p}.1.0.weight" in sd:       # expand -> depthwise -> project
            blk_conv_bn("expand", f"{p}.0.0.weight", f"{p}.0.1")
            blk_conv_bn("depthwise", f"{p}.1.0.weight", f"{p}.1.1")
            blk_conv_bn("project", f"{p}.2.weight", f"{p}.3")
        else:                             # block 1: depthwise -> project
            blk_conv_bn("depthwise", f"{p}.0.0.weight", f"{p}.0.1")
            blk_conv_bn("project", f"{p}.1.weight", f"{p}.2")
        params[f"block{i}"] = blk_p
        stats[f"block{i}"] = blk_s
    conv_bn("head", "features.18.0.weight", "features.18.1")

    import jax
    import jax.numpy as jnp

    return (jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params),
            jax.tree.map(jnp.asarray, stats))


def convert_resnet_trunk_state_dict(
    sd: Mapping[str, np.ndarray],
    arch: str = "resnet50",
    bn_eps: float = 0.0,
    frozen_bn: bool = True,
    num_batches: float = 0.0,
):
    """torchvision resnet classifier ImageNet state dict (keys conv1 / bn1 /
    layer{1-4}...) -> (params, batch_stats_or_None) for models.resnet.ResNet
    used as a single-map torso (versatile_backbone_models.py resnet_50).

    ``frozen_bn`` folds BN into affine pairs (stats None); otherwise real
    (scale, bias) params + running stats for AdaptiveBatchNorm torsos."""
    from detectinblur_tpu.models.resnet import RESNET_SPECS

    bn = (lambda p: _fold_frozen_bn(sd, p, bn_eps)) if frozen_bn else (
        lambda p: _bn_params(sd, p))

    _, layers, _ = RESNET_SPECS[arch]
    body: Dict = {"conv1": {"kernel": _conv_kernel(sd["conv1.weight"])},
                  "bn1": bn("bn1")}
    stats: Dict = {} if not frozen_bn else None
    if not frozen_bn:
        stats["bn1"] = _bn_stats(sd, "bn1", num_batches)
    for li, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            p = f"layer{li}.{b}"
            blk: Dict = {}
            blk_s: Dict = {}
            convs = 3 if f"{p}.conv3.weight" in sd else 2
            for c in range(1, convs + 1):
                blk[f"conv{c}"] = {"kernel": _conv_kernel(sd[f"{p}.conv{c}.weight"])}
                blk[f"bn{c}"] = bn(f"{p}.bn{c}")
                if not frozen_bn:
                    blk_s[f"bn{c}"] = _bn_stats(sd, f"{p}.bn{c}", num_batches)
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample_0"] = {
                    "kernel": _conv_kernel(sd[f"{p}.downsample.0.weight"])}
                blk["downsample_1"] = bn(f"{p}.downsample.1")
                if not frozen_bn:
                    blk_s["downsample_1"] = _bn_stats(
                        sd, f"{p}.downsample.1", num_batches)
            body[f"layer{li}_{b}"] = blk
            if not frozen_bn:
                stats[f"layer{li}_{b}"] = blk_s

    import jax
    import jax.numpy as jnp

    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), body)
    if not frozen_bn:
        stats = jax.tree.map(jnp.asarray, stats)
    return params, stats


def convert_resnet_classifier_state_dict(
    sd: Mapping[str, np.ndarray],
    arch: str = "resnet18",
    num_batches: float = 0.0,
    include_fc: bool = False,
):
    """torchvision resnet classifier -> (params, batch_stats) for
    models.classifier.ResNetClassifier (the blur estimator starts from
    ImageNet-pretrained resnet18, train_blur_estimator.py:212-217; its fc
    is replaced by a fresh 16/4-way head, so ``include_fc`` defaults off)."""
    trunk, stats = convert_resnet_trunk_state_dict(
        sd, arch=arch, frozen_bn=False, num_batches=num_batches)
    params: Dict = {"body": trunk}
    if include_fc and "fc.weight" in sd:
        import jax.numpy as jnp

        params["fc"] = {"kernel": jnp.asarray(np.transpose(sd["fc.weight"]),
                                              jnp.float32),
                        "bias": jnp.asarray(sd["fc.bias"], jnp.float32)}
    return params, {"body": stats}


def assert_tree_shapes_match(converted, initialized) -> None:
    """Raise if the converted tree doesn't structurally match init()'s."""
    import jax

    c_paths = {tuple(str(k.key) for k in p): v.shape
               for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    i_paths = {tuple(str(k.key) for k in p): v.shape
               for p, v in jax.tree_util.tree_flatten_with_path(initialized)[0]}
    missing = set(i_paths) - set(c_paths)
    extra = set(c_paths) - set(i_paths)
    if missing or extra:
        raise ValueError(f"param tree mismatch: missing={sorted(missing)[:5]} "
                         f"extra={sorted(extra)[:5]}")
    bad = [(p, c_paths[p], i_paths[p]) for p in c_paths if c_paths[p] != i_paths[p]]
    if bad:
        raise ValueError(f"shape mismatches: {bad[:5]}")
