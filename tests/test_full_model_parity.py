"""Full-graph parity vs real torchvision (CPU): random weights are
converted with utils/torch_convert and the RPN proposal stacks are
compared. This exercises the entire wiring — stem/backbone/FPN numerics,
anchor generation order, box decoding, clipping, level routing, and NMS —
in one shot (the op-level golden tests cover the pieces individually)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
torchvision = pytest.importorskip("torchvision")


def _iou_matrix(a, b):
    ax1, ay1, ax2, ay2 = a[:, 0, None], a[:, 1, None], a[:, 2, None], a[:, 3, None]
    bx1, by1, bx2, by2 = b[None, :, 0], b[None, :, 1], b[None, :, 2], b[None, :, 3]
    iw = np.clip(np.minimum(ax2, bx2) - np.maximum(ax1, bx1), 0, None)
    ih = np.clip(np.minimum(ay2, by2) - np.maximum(ay1, by1), 0, None)
    inter = iw * ih
    area_a = np.clip(ax2 - ax1, 0, None) * np.clip(ay2 - ay1, 0, None)
    area_b = np.clip(bx2 - bx1, 0, None) * np.clip(by2 - by1, 0, None)
    return inter / np.maximum(area_a + area_b - inter, 1e-9)


def test_rpn_proposals_match_torchvision(rng):
    torch.manual_seed(7)
    tmodel = torchvision.models.detection.fasterrcnn_resnet50_fpn(
        weights=None, weights_backbone=None, num_classes=91,
        min_size=128, max_size=160)
    tmodel.eval()

    # Frozen-BN eps as torchvision configures it.
    eps = None
    for m in tmodel.modules():
        if m.__class__.__name__ == "FrozenBatchNorm2d":
            eps = float(m.eps)
            break
    assert eps is not None

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from detectinblur_tpu.utils.torch_convert import convert_fasterrcnn_state_dict
    from detectinblur_tpu.models.faster_rcnn import FasterRCNN, FasterRCNNConfig
    from detectinblur_tpu.models.detection_transform import preprocess_batch
    from detectinblur_tpu.models.rpn import run_rpn

    params = convert_fasterrcnn_state_dict(sd, bn_eps=eps)

    h, w = 120, 150
    img = rng.random((h, w, 3), dtype=np.float32)

    # torch side: transform -> backbone -> rpn proposals.
    timg = torch.from_numpy(img.transpose(2, 0, 1))
    with torch.no_grad():
        imgs, _ = tmodel.transform([timg])
        feats = tmodel.backbone(imgs.tensors)
        t_props = tmodel.rpn(imgs, feats)[0][0].numpy()

    cfg = FasterRCNNConfig(min_size=128, max_size=160)
    model = FasterRCNN(cfg)
    bucket = (128, 160)
    jimgs = jnp.asarray(img)[None]
    hw = jnp.asarray([[h, w]])
    batched, new_hw = preprocess_batch(jimgs, hw, bucket, None, None,
                                       cfg.min_size, cfg.max_size)
    jfeats = model._features(params, batched, None, None, None, True)
    rpn_out = run_rpn(params["rpn_head"], model.rpn_head, jfeats, new_hw,
                      training=False, cfg=cfg.rpn)
    j_props = np.asarray(rpn_out.proposals[0])
    j_valid = np.asarray(rpn_out.proposal_valid[0])
    j_props = j_props[j_valid]

    assert len(t_props) > 50 and len(j_props) > 50
    # Every torch proposal should have a (near-)identical jax proposal:
    # NMS tie handling may reorder near-equal-objectness boxes, so require
    # a high match fraction rather than exact sequence equality.
    ious = _iou_matrix(t_props[:300], j_props)
    matched = (ious.max(axis=1) > 0.98).mean()
    assert matched > 0.9, f"only {matched:.2%} of torch proposals matched"
