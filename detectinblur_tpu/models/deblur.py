"""DeepDeblur MSResNet inference (models/deblur/ equivalent).

Architecture per the reference (MSResNet.py:24-66, ResNet.py:8-40,
common.py:58-77): 3 scales coarse->fine; each scale a plain conv ResNet
(head conv5x5 -> 19 ResBlocks[conv5-relu-conv5 + skip] -> tail conv5),
finer scales take cat(input_level, PixelShuffle(conv(coarse_out)) ) = 6ch.
Values are mean-shifted by rgb_range/2 (=127.5 at rgb_range 255).

Used by --deblur_first (engine.py:319-322): pad to /2^(scales-1) edge-mode,
build a Gaussian pyramid, run, unpad. Runs fully on device here instead of
the reference's GPU->CPU->GPU round trip.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

PREC = jax.lax.Precision.HIGHEST


def _conv(ch, k=5, name=None):
    return nn.Conv(ch, (k, k), padding=[(k // 2, k // 2)] * 2, name=name,
                   precision=PREC)


class ResBlock(nn.Module):
    feats: int = 64
    kernel: int = 5

    @nn.compact
    def __call__(self, x):
        y = _conv(self.feats, self.kernel, name="conv0")(x)
        y = nn.relu(y)
        y = _conv(self.feats, self.kernel, name="conv1")(y)
        return x + y


class ScaleResNet(nn.Module):
    in_ch: int = 3
    out_ch: int = 3
    feats: int = 64
    kernel: int = 5
    n_blocks: int = 19

    @nn.compact
    def __call__(self, x):
        x = _conv(self.feats, self.kernel, name="head")(x)
        for i in range(self.n_blocks):
            x = ResBlock(self.feats, self.kernel, name=f"block{i}")(x)
        return _conv(self.out_ch, self.kernel, name="tail")(x)


def pixel_shuffle(x: jax.Array, r: int = 2) -> jax.Array:
    """torch PixelShuffle on NHWC: [H, W, C*r*r] -> [H*r, W*r, C]."""
    H, W, C = x.shape
    c = C // (r * r)
    x = x.reshape(H, W, c, r, r)
    x = jnp.transpose(x, (0, 3, 1, 4, 2))  # H, r, W, r, c
    return x.reshape(H * r, W * r, c)


class MSResNet(nn.Module):
    n_scales: int = 3
    feats: int = 64
    kernel: int = 5
    n_blocks: int = 19
    rgb_range: float = 255.0

    @nn.compact
    def __call__(self, pyramid: Sequence[jax.Array]):
        """pyramid[0] = finest [H, W, 3] (0..rgb_range), pyramid[-1] =
        coarsest. Returns the output pyramid (same shapes)."""
        mean = self.rgb_range / 2.0
        inputs = [p - mean for p in pyramid]
        outputs = [None] * self.n_scales

        x = inputs[-1]
        for s in range(self.n_scales - 1, -1, -1):
            in_ch = 3 if s == self.n_scales - 1 else 6
            outputs[s] = ScaleResNet(in_ch, 3, self.feats, self.kernel,
                                     self.n_blocks, name=f"scale{s}")(x)
            if s > 0:
                up = _conv(12, self.kernel, name=f"up{s}")(outputs[s])
                up = pixel_shuffle(up, 2)
                x = jnp.concatenate([inputs[s - 1], up], axis=-1)
        return [o + mean for o in outputs]


def gaussian_pyramid(img: jax.Array, n_scales: int = 3) -> list:
    """skimage pyramid_gaussian equivalent: smooth (sigma=2/3) then 2x
    downsample, repeatedly. img [H, W, 3]."""
    sigma = 2.0 * 2 / 6.0
    radius = int(4 * sigma + 0.5)
    xs = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k = (k / k.sum()).astype(np.float32)
    kern = jnp.asarray(k)

    # Separable symmetric-mode Gaussian via lax convs on each axis.
    def smooth2(x):
        x = jnp.pad(x, [(radius, radius), (0, 0), (0, 0)], mode="symmetric")
        x = jax.lax.conv_general_dilated(
            x.transpose(2, 0, 1)[:, None], kern[None, None, :, None],
            (1, 1), "VALID")[:, 0].transpose(1, 2, 0)
        x = jnp.pad(x, [(0, 0), (radius, radius), (0, 0)], mode="symmetric")
        x = jax.lax.conv_general_dilated(
            x.transpose(2, 0, 1)[:, None], kern[None, None, None, :],
            (1, 1), "VALID")[:, 0].transpose(1, 2, 0)
        return x

    pyr = [img]
    for _ in range(n_scales - 1):
        sm = smooth2(pyr[-1])
        pyr.append(sm[::2, ::2])
    return pyr


def msresnet_from_variables(variables) -> MSResNet:
    """Build the MSResNet whose architecture matches a converted param
    tree (scale count / feats / block count are inferred, so checkpoints
    other than the released 3-scale/64-feat/19-block one load too)."""
    params = variables["params"]
    n_scales = sum(1 for k in params if k.startswith("scale"))
    scale0 = params["scale0"]
    feats = scale0["head"]["kernel"].shape[-1]
    kernel = scale0["head"]["kernel"].shape[0]
    n_blocks = sum(1 for k in scale0 if k.startswith("block"))
    return MSResNet(n_scales=n_scales, feats=feats, kernel=kernel,
                    n_blocks=n_blocks)


def deblur_image(variables, img01: jax.Array) -> jax.Array:
    """deblurInterface.deblurImage semantics: img in 0..1, pad to
    /2^(n_scales-1) edge-mode, pyramid, MSResNet, unpad, clamp."""
    net = msresnet_from_variables(variables)
    n_scales = net.n_scales
    H, W = img01.shape[:2]
    div = 2 ** (n_scales - 1)
    ph = (-H) % div
    pw = (-W) % div
    x = jnp.pad(img01 * 255.0, [(0, ph), (0, pw), (0, 0)], mode="edge")
    pyr = gaussian_pyramid(x, n_scales)
    out = net.apply(variables, pyr)
    fine = out[0][:H, :W]
    return jnp.clip((fine + 0.5), 0.0, 255.0) / 255.0


def convert_deepdeblur_state_dict(sd) -> dict:
    """Map DeepDeblur-PyTorch checkpoint names (body_models.{i}.body.{j},
    conv_end_models.{i}.uppath.0) onto MSResNet params. body_models is
    stored fine-first (index 0 = finest 6ch scale)."""
    import numpy as np

    def conv(prefix):
        w = np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))
        return {"kernel": w, "bias": sd[f"{prefix}.bias"]}

    n_scales = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("body_models.")
    )
    n_blocks = max(
        int(k.split(".")[3]) for k in sd if k.startswith("body_models.0.body.")
    ) - 1  # entries 0..n_blocks+1: head, blocks, tail

    params = {}
    for s in range(n_scales):
        scale = {"head": conv(f"body_models.{s}.body.0"),
                 "tail": conv(f"body_models.{s}.body.{n_blocks + 1}")}
        for b in range(n_blocks):
            scale[f"block{b}"] = {
                "conv0": conv(f"body_models.{s}.body.{b + 1}.body.0"),
                "conv1": conv(f"body_models.{s}.body.{b + 1}.body.2"),
            }
        params[f"scale{s}"] = scale
        if s > 0:
            params[f"up{s}"] = conv(f"conv_end_models.{s}.uppath.0")

    import jax.numpy as jnp

    return {"params": jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)}
