"""Deblur subsystem tests (models/deblur.py vs the DeepDeblur reference,
/root/reference/models/deblur/MSResNet.py:24-66 + ResNet.py:8-40 +
deblurInterface.py:42-63). The torch oracle below is a clean-room
functional re-statement of that architecture driven directly by the
checkpoint arrays, so converter + forward parity is pinned numerically
without importing any reference code."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectinblur_tpu.models.deblur import (
    MSResNet,
    convert_deepdeblur_state_dict,
    deblur_image,
    gaussian_pyramid,
    msresnet_from_variables,
)
from tests.synthetic_torch import synthetic_deepdeblur_state_dict

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _t_conv(x, sd, prefix):
    w = torch.tensor(np.asarray(sd[f"{prefix}.weight"], np.float32))
    b = torch.tensor(np.asarray(sd[f"{prefix}.bias"], np.float32))
    return F.conv2d(x, w, b, padding=w.shape[-1] // 2)


def torch_msresnet_oracle(sd, pyramid, n_scales, n_blocks, rgb_range=255.0):
    """MSResNet.py:24-66 forward: coarse-to-fine scale ResNets, each finer
    scale consuming cat(input_level, PixelShuffle(conv(coarse_out)))."""
    mean = rgb_range / 2.0
    inputs = [torch.tensor(p.transpose(2, 0, 1).astype(np.float32))[None]
              - mean for p in pyramid]
    outputs = [None] * n_scales
    x = inputs[-1]
    for s in range(n_scales - 1, -1, -1):
        y = _t_conv(x, sd, f"body_models.{s}.body.0")
        for b in range(n_blocks):
            z = _t_conv(y, sd, f"body_models.{s}.body.{b + 1}.body.0").relu()
            z = _t_conv(z, sd, f"body_models.{s}.body.{b + 1}.body.2")
            y = y + z
        outputs[s] = _t_conv(y, sd, f"body_models.{s}.body.{n_blocks + 1}")
        if s > 0:
            up = _t_conv(outputs[s], sd, f"conv_end_models.{s}.uppath.0")
            up = F.pixel_shuffle(up, 2)
            x = torch.cat([inputs[s - 1], up], dim=1)
    return [(o + mean)[0].permute(1, 2, 0).numpy() for o in outputs]


@pytest.fixture(scope="module")
def tiny_sd():
    return synthetic_deepdeblur_state_dict(n_scales=3, feats=8, n_blocks=2,
                                           seed=4)


def test_converter_structure(tiny_sd):
    variables = convert_deepdeblur_state_dict(tiny_sd)
    p = variables["params"]
    assert set(p) == {"scale0", "scale1", "scale2", "up1", "up2"}
    assert set(p["scale0"]) == {"head", "block0", "block1", "tail"}
    # Finest scale takes the 6ch concat, coarsest the raw 3ch image.
    assert p["scale0"]["head"]["kernel"].shape == (5, 5, 6, 8)
    assert p["scale2"]["head"]["kernel"].shape == (5, 5, 3, 8)
    assert p["up1"]["kernel"].shape == (5, 5, 3, 12)
    net = msresnet_from_variables(variables)
    assert (net.n_scales, net.feats, net.n_blocks, net.kernel) == (3, 8, 2, 5)


def test_msresnet_matches_torch_oracle(tiny_sd):
    rng = np.random.default_rng(0)
    img = (rng.random((16, 24, 3)) * 255).astype(np.float32)
    pyr = [np.asarray(p) for p in gaussian_pyramid(jnp.asarray(img), 3)]
    want = torch_msresnet_oracle(tiny_sd, pyr, n_scales=3, n_blocks=2)

    variables = convert_deepdeblur_state_dict(tiny_sd)
    got = MSResNet(n_scales=3, feats=8, n_blocks=2).apply(
        variables, [jnp.asarray(p) for p in pyr])
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-4, atol=1e-3)


def test_deblur_image_shapes_and_range(tiny_sd):
    """deblurInterface.deblurImage: pad to /4 edge-mode, pyramid, run,
    unpad, clamp to the 0..1 image range."""
    variables = convert_deepdeblur_state_dict(tiny_sd)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((30, 41, 3)), jnp.float32)  # non-/4 sizes
    out = jax.jit(deblur_image)(variables, img)
    assert out.shape == img.shape
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0
    # The net actually transformed the image (nonzero weights).
    assert float(jnp.abs(out - img).max()) > 1e-4


def test_deblur_first_changes_eval_inputs(tiny_sd):
    """--deblur_first threads the MSResNet through the shared eval
    preamble (engine.py:319-322): prepared images must differ from the
    raw batch while everything else is untouched."""
    from detectinblur_tpu.train.engine import BlurBatch, prepare_eval_batch

    variables = convert_deepdeblur_state_dict(tiny_sd)
    rng = np.random.default_rng(2)
    B, H, W = 1, 32, 32
    batch = BlurBatch(
        images=jnp.asarray(rng.random((B, H, W, 3)), jnp.float32),
        hw=jnp.array([[H, W]]),
        psfs=jnp.zeros((B, 128, 128)),
        blurring=jnp.zeros((B,), bool),
        thetas=jnp.zeros((B,)), lam1s=jnp.ones((B,)), lam2s=jnp.ones((B,)),
        param_index=jnp.full((B,), -1, jnp.int32),
        fraction_index=jnp.full((B,), -1, jnp.int32),
        gt_boxes=jnp.zeros((B, 4, 4)), gt_labels=jnp.zeros((B, 4), jnp.int32),
        gt_valid=jnp.zeros((B, 4), bool),
        est_label=jnp.full((B,), -1, jnp.int32),
    )
    plain = prepare_eval_batch(batch, None)
    assert np.allclose(np.asarray(plain.images), np.asarray(batch.images))
    deb = prepare_eval_batch(batch, None, deblur_vars=variables)
    assert float(jnp.abs(deb.images - batch.images).max()) > 1e-4
    np.testing.assert_array_equal(np.asarray(deb.gt_boxes),
                                  np.asarray(batch.gt_boxes))
