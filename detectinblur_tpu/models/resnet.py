"""ResNet backbones (flax.linen, NHWC) structurally matched to torchvision.

The reference detector is torchvision's ``fasterrcnn_resnet50_fpn``
(models/faster_rcnn.py:301-373) whose backbone is a ResNet with
FrozenBatchNorm. Module names here mirror torchvision's parameter names
(``conv1``, ``layer1.0.conv2``, ``downsample.0`` ...) so the released .pth
checkpoints map 1:1 through utils/torch_convert.py.

Frozen BN is represented as an affine (scale, bias) pair kept in the normal
param tree; the training layer freezes them (and optionally whole stages,
matching ``trainable_backbone_layers``) with an optimizer mask rather than a
separate collection.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """Affine-only BatchNorm: y = x * scale + bias.

    The torch converter folds (gamma, beta, running_mean, running_var, eps)
    into (scale, bias); fresh initialization is identity.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


# Checkpoint-parity requires f32 accumulation; on TPU the default conv
# precision is bf16-ish, which costs real mAP. HIGHEST keeps convs f32.
# DETECTINBLUR_PRECISION=default|high|highest selects the speed/parity
# trade-off process-wide (bench measures both).
import os as _os

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}
CONV_PRECISION = _PRECISIONS[_os.environ.get("DETECTINBLUR_PRECISION", "highest")]
# In throughput mode the backbone is HBM-bandwidth bound (f32 residual
# chains at 208x312x256 dominate the profile), so activations are kept in
# bfloat16 end-to-end; parity mode stays f32.
ACT_DTYPE = (jnp.bfloat16 if CONV_PRECISION == jax.lax.Precision.DEFAULT
             else jnp.float32)


# torchvision from-scratch initializers (matter when --pretrained is off,
# train.py:219-221 with pretrained=False):
#   * resnet convs: kaiming_normal_(fan_out, relu) = N(0, sqrt(2/fan_out))
#   * FPN convs: kaiming_uniform_(a=1) = U(+-sqrt(3/fan_in)), bias 0
#   * torch nn.Linear default: kaiming_uniform_(a=sqrt(5)) =
#     U(+-1/sqrt(fan_in)) for the kernel AND the bias
# flax's lecun_normal default is close in scale for the trunk but wrong for
# heads like the RPN (torchvision uses N(0, 0.01) there — see models/rpn.py);
# an untrained lecun RPN decodes wild deltas where torch's stays near the
# anchors.
KAIMING_OUT_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
FPN_CONV_INIT = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
TORCH_LINEAR_KERNEL_INIT = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias_init(fan_in: int):
    """torch nn.Linear bias default: U(+-1/sqrt(fan_in))."""
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _conv(features, kernel, stride=1, name=None, padding=None, groups=1):
    if padding is None:
        padding = [(kernel // 2, kernel // 2)] * 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        use_bias=False,
        feature_group_count=groups,
        name=name,
        dtype=ACT_DTYPE,
        precision=CONV_PRECISION,
        kernel_init=KAIMING_OUT_INIT,
    )


class _StemConv(nn.Module):
    """The 7x7/stride-2 stem conv.

    Perf note (v5e, measured): the classic space-to-depth rewrite (4x4
    VALID conv over factor-2 s2d phases) makes the conv itself 3x faster,
    but XLA tiles any C<=3-minor tensor with 42x lane-padding amplification
    so the surrounding pad/reshape copies cost more than they save (11.3 ms
    vs 8.0 ms for the plain conv in bf16). A fused Pallas stem
    (s2d+conv+bn+relu+maxpool) was exact in interpreter mode but Mosaic
    refuses its strided slices (re-probed against the current toolchain,
    still blocked: "Shape mismatch in input, indices and output"), so the
    kernel was removed (git history: ops/stem_pallas.py) and the plain conv
    remains the fastest correct choice. The parameter keeps the torchvision
    [7,7,3,64] shape at tree path conv1/kernel.
    """

    features: int = 64

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w7 = self.param("kernel", KAIMING_OUT_INIT,
                        (7, 7, cin, self.features))
        return jax.lax.conv_general_dilated(
            x, w7.astype(x.dtype), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=CONV_PRECISION)


class Bottleneck(nn.Module):
    width: int           # torchvision "planes" (conv3 out = width * 4)
    stride: int = 1
    expansion: int = 4
    norm: Callable[..., nn.Module] = FrozenBatchNorm
    groups: int = 1          # ResNeXt cardinality
    base_width: int = 64     # ResNeXt width per group

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out_ch = self.width * self.expansion
        # torchvision: width = int(planes * base_width/64) * groups.
        mid = int(self.width * self.base_width / 64) * self.groups
        identity = x
        y = _conv(mid, 1, name="conv1")(x)
        y = self.norm(mid, name="bn1")(y)
        y = nn.relu(y)
        y = _conv(mid, 3, stride=self.stride, name="conv2",
                  groups=self.groups)(y)
        y = self.norm(mid, name="bn2")(y)
        y = nn.relu(y)
        y = _conv(out_ch, 1, name="conv3")(y)
        y = self.norm(out_ch, name="bn3")(y)
        if x.shape[-1] != out_ch or self.stride != 1:
            identity = _conv(out_ch, 1, stride=self.stride, name="downsample_0")(x)
            identity = self.norm(out_ch, name="downsample_1")(identity)
        return nn.relu(y + identity)


class BasicBlock(nn.Module):
    width: int
    stride: int = 1
    expansion: int = 1
    norm: Callable[..., nn.Module] = FrozenBatchNorm

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        identity = x
        y = _conv(self.width, 3, stride=self.stride, name="conv1")(x)
        y = self.norm(self.width, name="bn1")(y)
        y = nn.relu(y)
        y = _conv(self.width, 3, name="conv2")(y)
        y = self.norm(self.width, name="bn2")(y)
        if x.shape[-1] != self.width or self.stride != 1:
            identity = _conv(self.width, 1, stride=self.stride, name="downsample_0")(x)
            identity = self.norm(self.width, name="downsample_1")(identity)
        return nn.relu(y + identity)


RESNET_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), {}),
    "resnet34": (BasicBlock, (3, 4, 6, 3), {}),
    "resnet50": (Bottleneck, (3, 4, 6, 3), {}),
    "resnet101": (Bottleneck, (3, 4, 23, 3), {}),
    "resnet152": (Bottleneck, (3, 8, 36, 3), {}),
    # reference versatile_backbone_models.py:31-96 also offers resnext101.
    "resnext101_32x8d": (Bottleneck, (3, 4, 23, 3),
                         {"groups": 32, "base_width": 8}),
}


class ResNet(nn.Module):
    """torchvision-layout ResNet trunk returning the four stage outputs
    (C2, C3, C4, C5), NHWC."""

    arch: str = "resnet50"
    norm: Callable[..., nn.Module] = FrozenBatchNorm

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        block, layers, block_kw = RESNET_SPECS[self.arch]
        x = x.astype(ACT_DTYPE)
        x = _StemConv(64, name="conv1")(x)
        x = self.norm(64, name="bn1")(x)
        x = nn.relu(x)
        # torch maxpool 3x3 stride 2 pad 1: explicit -inf padding.
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        outs = []
        widths = (64, 128, 256, 512)
        for i, (n_blocks, width) in enumerate(zip(layers, widths)):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and i > 0) else 1
                x = block(width, stride=stride, norm=self.norm,
                          name=f"layer{i + 1}_{b}", **block_kw)(x, train=train)
            outs.append(x)
        return tuple(outs)


class FPN(nn.Module):
    """Feature Pyramid Network with LastLevelMaxPool, matching torchvision's
    ``BackboneWithFPN`` (P2..P5 + pool P6 used only by the RPN)."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"inner_{i}",
                    dtype=ACT_DTYPE, precision=CONV_PRECISION,
                    kernel_init=FPN_CONV_INIT)(f)
            for i, f in enumerate(feats)
        ]
        ps = [laterals[-1]]
        for i in range(len(laterals) - 2, -1, -1):
            up = jax.image.resize(
                ps[0],
                (laterals[i].shape[0], laterals[i].shape[1], laterals[i].shape[2],
                 ps[0].shape[-1]) if laterals[i].ndim == 4 else laterals[i].shape,
                method="nearest",
            )
            ps.insert(0, laterals[i] + up)
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    name=f"layer_{i}", dtype=ACT_DTYPE,
                    precision=CONV_PRECISION, kernel_init=FPN_CONV_INIT)(p)
            for i, p in enumerate(ps)
        ]
        # LastLevelMaxPool: 1x1 window, stride 2 == subsample by 2.
        pool = outs[-1][..., ::2, ::2, :] if outs[-1].ndim == 4 else outs[-1][::2, ::2, :]
        return tuple(outs) + (pool,)


class ResNetFPN(nn.Module):
    """resnet_fpn_backbone equivalent: images -> (P2, P3, P4, P5, P6)."""

    arch: str = "resnet50"
    out_channels: int = 256
    norm: Callable[..., nn.Module] = FrozenBatchNorm

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = ResNet(self.arch, norm=self.norm, name="body")(x, train=train)
        return FPN(self.out_channels, name="fpn")(feats)
