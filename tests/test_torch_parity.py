"""Numerical parity against torch CPU for the pieces whose exact semantics
the mAP budget depends on (SURVEY.md §7 hard part #1): convolution layout,
FrozenBN folding, bilinear resize, and the squint warper's
affine_grid/grid_sample convention."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from detectinblur_tpu.models.resnet import Bottleneck
from detectinblur_tpu.models.detection_transform import resize_into_bucket
from detectinblur_tpu.ops.warp import squint_warp
from detectinblur_tpu.utils.torch_convert import _conv_kernel, _fold_frozen_bn


def torch_frozen_bn(x, gamma, beta, mean, var, eps=0.0):
    scale = gamma / np.sqrt(var + eps)
    return x * scale[:, None, None] + (beta - mean * scale)[:, None, None]


def test_bottleneck_matches_torch(rng):
    """Random-weight torch bottleneck vs our flax Bottleneck w/ converted
    weights: verifies conv transpose, padding, BN folding, residual path."""
    cin, width, stride = 16, 8, 2
    sd = {}

    def add_conv(name, co, ci, k):
        sd[f"{name}.weight"] = rng.normal(0, 0.1, (co, ci, k, k)).astype(np.float32)

    def add_bn(name, c):
        sd[f"{name}.weight"] = rng.random(c).astype(np.float32) + 0.5
        sd[f"{name}.bias"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.random(c).astype(np.float32) + 0.5

    add_conv("conv1", width, cin, 1); add_bn("bn1", width)
    add_conv("conv2", width, width, 3); add_bn("bn2", width)
    add_conv("conv3", width * 4, width, 1); add_bn("bn3", width * 4)
    add_conv("downsample.0", width * 4, cin, 1); add_bn("downsample.1", width * 4)

    x = rng.normal(0, 1, (1, cin, 14, 14)).astype(np.float32)

    # torch forward
    tx = torch.from_numpy(x)
    def tbn(v, p):
        return torch_frozen_bn_t(v, p)
    def torch_frozen_bn_t(v, p):
        g = torch.from_numpy(sd[f"{p}.weight"]); b = torch.from_numpy(sd[f"{p}.bias"])
        m = torch.from_numpy(sd[f"{p}.running_mean"]); var = torch.from_numpy(sd[f"{p}.running_var"])
        s = g / torch.sqrt(var)
        return v * s[:, None, None] + (b - m * s)[:, None, None]

    import torch.nn.functional as F
    y = F.conv2d(tx, torch.from_numpy(sd["conv1.weight"]))
    y = F.relu(tbn(y, "bn1"))
    y = F.conv2d(y, torch.from_numpy(sd["conv2.weight"]), stride=stride, padding=1)
    y = F.relu(tbn(y, "bn2"))
    y = F.conv2d(y, torch.from_numpy(sd["conv3.weight"]))
    y = tbn(y, "bn3")
    idn = F.conv2d(tx, torch.from_numpy(sd["downsample.0.weight"]), stride=stride)
    idn = tbn(idn, "downsample.1")
    expected = F.relu(y + idn).numpy()

    # ours
    params = {
        "conv1": {"kernel": jnp.asarray(_conv_kernel(sd["conv1.weight"]))},
        "bn1": jax.tree.map(jnp.asarray, _fold_frozen_bn(sd, "bn1", 0.0)),
        "conv2": {"kernel": jnp.asarray(_conv_kernel(sd["conv2.weight"]))},
        "bn2": jax.tree.map(jnp.asarray, _fold_frozen_bn(sd, "bn2", 0.0)),
        "conv3": {"kernel": jnp.asarray(_conv_kernel(sd["conv3.weight"]))},
        "bn3": jax.tree.map(jnp.asarray, _fold_frozen_bn(sd, "bn3", 0.0)),
        "downsample_0": {"kernel": jnp.asarray(_conv_kernel(sd["downsample.0.weight"]))},
        "downsample_1": jax.tree.map(jnp.asarray, _fold_frozen_bn(sd, "downsample.1", 0.0)),
    }
    block = Bottleneck(width=width, stride=stride)
    ours = block.apply({"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, expected, atol=2e-4)


def test_resize_matches_torch_interpolate(rng):
    """resize_into_bucket vs torch F.interpolate(bilinear, align_corners=
    False, recompute_scale_factor=True) — the exact resize the reference
    applies (net_transforms.py:151-175)."""
    h, w = 37, 51
    img = rng.random((h, w, 3)).astype(np.float32)
    bucket = np.zeros((96, 96, 3), np.float32)
    bucket[:h, :w] = img

    for scale in (1.3, 0.7, 1.0):
        ours, new_hw = resize_into_bucket(
            jnp.asarray(bucket), jnp.array([h, w]), jnp.float32(scale), (96, 96)
        )
        nh, nw = int(new_hw[0]), int(new_hw[1])
        t = torch.from_numpy(np.transpose(img, (2, 0, 1)))[None]
        expected = torch.nn.functional.interpolate(
            t, scale_factor=scale, mode="bilinear",
            recompute_scale_factor=True, align_corners=False,
        )[0].numpy()
        assert expected.shape[1:] == (nh, nw)
        got = np.transpose(np.asarray(ours)[:nh, :nw], (2, 0, 1))
        np.testing.assert_allclose(got, expected, atol=1e-4)


def test_squint_warp_matches_torch_grid_sample(rng):
    """squint_warp vs torch affine_grid+grid_sample with the reference's
    matrix composition (warper.py:13-52), in float32."""
    B, H, W, C = 2, 24, 30, 3
    x = rng.random((B, H, W, C)).astype(np.float32)
    thetas = np.array([0.4, -1.1], np.float32)
    lam1 = np.array([0.9, 0.8], np.float32)
    lam2 = np.array([1.0, 0.85], np.float32)

    # torch oracle: reference composition
    zero = torch.zeros(B); one = torch.ones(B)
    l1 = torch.from_numpy(lam1); l2 = torch.from_numpy(lam2)
    th = -torch.from_numpy(thetas)
    S = torch.stack([torch.stack([l1, zero, zero], 1),
                     torch.stack([zero, l2, zero], 1),
                     torch.stack([zero, zero, one], 1)], 2)
    R = torch.stack([torch.stack([torch.cos(th), torch.sin(th), zero], 1),
                     torch.stack([-torch.sin(th), torch.cos(th), zero], 1),
                     torch.stack([zero, zero, one], 1)], 2)
    T = torch.stack([torch.stack([one, zero, one * W], 1),
                     torch.stack([zero, one, one * H], 1),
                     torch.stack([zero, zero, one], 1)], 2)
    fwd = torch.bmm(R, T)
    fwd_s = torch.bmm(S, fwd)
    overall = torch.bmm(torch.inverse(fwd), fwd_s)
    overall = torch.inverse(overall)[:, :2, :]
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    grid = torch.nn.functional.affine_grid(overall, xt.shape, align_corners=False)
    expected = torch.nn.functional.grid_sample(
        xt, grid, mode="bilinear", padding_mode="zeros", align_corners=False
    ).numpy()

    ours = np.asarray(squint_warp(jnp.asarray(x), jnp.asarray(thetas),
                                  jnp.asarray(lam1), jnp.asarray(lam2)))
    ours = np.transpose(ours, (0, 3, 1, 2))
    np.testing.assert_allclose(ours, expected, atol=1e-4)
