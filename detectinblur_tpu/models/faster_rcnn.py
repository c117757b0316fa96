"""Faster R-CNN ResNet-FPN, assembled TPU-first.

The reference's vendored torchvision detector (models/faster_rcnn.py:301-373
+ models/generalized_rcnn.py:43-161) re-expressed as one jittable function
over fixed-shape batches:

  raw bucketed images [B, Hb, Wb, 3] + valid sizes
    -> normalize + dynamic-scale resize into the model bucket
    -> (optional Squint warp, generalized_rcnn.py:131-141)
    -> ResNet-FPN backbone (P2..P6)
    -> (optional inverse Squint warp of each level)
    -> RPN -> RoI heads -> fixed-size detections, rescaled to input coords.

Everything — including NMS and RoIAlign — runs inside one XLA program; no
host synchronization anywhere in the step.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from detectinblur_tpu.models.detection_transform import (
    preprocess_batch,
    resize_boxes,
)
from detectinblur_tpu.models.resnet import ResNetFPN
from detectinblur_tpu.models.rpn import (
    RPNConfig,
    RPNHead,
    rpn_loss,
    run_rpn,
)
from detectinblur_tpu.models.roi_heads import (
    BoxHeadConfig,
    FastRCNNPredictor,
    TwoMLPHead,
    fastrcnn_loss,
    postprocess_detections,
    select_training_samples,
)
from detectinblur_tpu.ops.roi_align import multiscale_roi_align
from detectinblur_tpu.ops.warp import squint_warp


class FasterRCNNConfig(NamedTuple):
    arch: str = "resnet50"
    num_classes: int = 91
    min_size: int = 800
    max_size: int = 1333
    rpn: RPNConfig = RPNConfig()
    box: BoxHeadConfig = BoxHeadConfig()
    warp_internally: bool = False
    # None = FrozenBN affine (torchvision default). A mode string selects
    # real AdaptiveBatchNorm in the backbone (--unfrozen_batch_norm /
    # --mode_one_norm / acclimation, models/batchnorm.py remedies).
    bn_mode: Optional[str] = None
    # Use the Pallas RoIAlign kernel (ops/roi_align_pallas.py) for the
    # box-head pooling at inference; exact at every tier (oversized rois
    # rerun through fat windows / the XLA quad escape inside the wrapper).
    pallas_roi_align: bool = True   # TPU-only; other backends use XLA quad
    # Route RoIAlign through the custom_partitioning wrapper on non-TPU
    # backends too (the partitioned body there is the exact XLA quad path),
    # so CPU-mesh tests can drive the SPMD sharding rule. None = default
    # from DETECTINBLUR_CP_ROIALIGN=1 at model construction.
    cp_roi_align: Optional[bool] = None


class Detections(NamedTuple):
    boxes: jax.Array     # [B, D, 4] in *input (pre-resize) valid* coords
    scores: jax.Array    # [B, D]
    labels: jax.Array    # [B, D]
    valid: jax.Array     # [B, D]


class FasterRCNN:
    """Stateless orchestrator; parameters live in a plain pytree with
    top-level keys backbone / rpn_head / box_head / box_predictor."""

    def __init__(self, config: FasterRCNNConfig = FasterRCNNConfig()):
        import os

        if config.cp_roi_align is None:
            config = config._replace(
                cp_roi_align=os.environ.get("DETECTINBLUR_CP_ROIALIGN") == "1")
        self.cfg = config
        if config.bn_mode is None:
            self.backbone = ResNetFPN(arch=config.arch)
        else:
            import functools

            from detectinblur_tpu.models.batchnorm import AdaptiveBatchNorm

            self.backbone = ResNetFPN(
                arch=config.arch,
                norm=functools.partial(AdaptiveBatchNorm, mode=config.bn_mode),
            )
        self.rpn_head = RPNHead()
        self.box_head = TwoMLPHead()
        self.box_predictor = FastRCNNPredictor(config.num_classes)

    @property
    def has_bn(self) -> bool:
        """True when the backbone carries a batch_stats tree that must be
        threaded through predict/loss (bn_mode remedies)."""
        return self.cfg.bn_mode is not None

    def init_stats(self, bucket: Tuple[int, int] = (96, 96)):
        """Fresh batch_stats tree for bn_mode models (None otherwise)."""
        if not self.has_bn:
            return None
        variables = self.backbone.init(
            jax.random.key(0),
            jnp.zeros((1, bucket[0], bucket[1], 3), jnp.float32))
        return {"backbone": variables.get("batch_stats", {})}

    # ---------------------------------------------------------------- init
    def init(self, key: jax.Array, bucket: Tuple[int, int] = (832, 832)):
        kb, kr, kh, kp = jax.random.split(key, 4)
        dummy = jnp.zeros((1, bucket[0], bucket[1], 3), jnp.float32)
        variables = self.backbone.init(kb, dummy)
        backbone = variables["params"]
        bvars = {"params": backbone}
        mutable = False
        if "batch_stats" in variables:      # bn_mode backbones
            bvars["batch_stats"] = variables["batch_stats"]
            mutable = ["batch_stats"]
        feats = self.backbone.apply(bvars, dummy, mutable=mutable)
        if mutable:
            feats = feats[0]
        rpn_head = self.rpn_head.init(kr, feats)["params"]
        pooled = jnp.zeros((1, 256, 7, 7), jnp.float32)
        box_head = self.box_head.init(kh, pooled)["params"]
        feat_vec = jnp.zeros((1, 1024), jnp.float32)
        box_predictor = self.box_predictor.init(kp, feat_vec)["params"]
        return {
            "backbone": backbone,
            "rpn_head": rpn_head,
            "box_head": box_head,
            "box_predictor": box_predictor,
        }

    # ------------------------------------------------------------ features
    def _features(self, params, images, thetas=None, lam1s=None, lam2s=None,
                  kill_warp=False, train=False, bn_stats=None):
        """Returns (feats, new_bn_stats); new_bn_stats is None unless the
        bn_mode makes running stats mutable (train / acclimation)."""
        if self.cfg.warp_internally and not kill_warp:
            images = squint_warp(images, thetas, lam1s, lam2s)
        variables = {"params": params["backbone"]}
        mutable = False
        if self.cfg.bn_mode is not None:
            assert bn_stats is not None, "bn_mode set but no bn_stats passed"
            variables["batch_stats"] = bn_stats["backbone"]
            mutable = ["batch_stats"] if self.cfg.bn_mode in (
                "train", "acclimation") else False
        out = self.backbone.apply(variables, images, train=train,
                                  mutable=mutable)
        new_stats = None
        if mutable:
            feats, mut = out
            new_stats = {"backbone": mut["batch_stats"]}
        else:
            feats = out
        if self.cfg.warp_internally and not kill_warp:
            feats = tuple(
                squint_warp(f, thetas, 1.0 / lam1s, 1.0 / lam2s) for f in feats
            )
        return feats, new_stats

    def _head_from_pooled(self, params, pooled):
        pooled = jnp.transpose(pooled, (0, 3, 1, 2))        # torch CHW flatten
        x = self.box_head.apply({"params": params["box_head"]}, pooled)
        return self.box_predictor.apply({"params": params["box_predictor"]}, x)

    def _box_outputs(self, params, feats_i, rois):
        pooled = multiscale_roi_align(feats_i, rois)        # [R, 7, 7, C]
        return self._head_from_pooled(params, pooled)

    def _pallas_pool_plan(self, bucket: Tuple[int, int]):
        """(use_pallas, rois_per_step, win_y) — shared by predict and loss
        so inference and training window geometry can't desynchronize.

        Multi-device meshes keep the kernel: the RoIAlign entry points are
        wrapped in custom_partitioning with a batch-dim sharding rule
        (ops/roi_align_pallas.py SPMD section), so each shard runs the
        single-device kernel on its slice of the batch. On non-TPU
        backends the partitioned body is the exact XLA quad path; the
        DETECTINBLUR_CP_ROIALIGN=1 env hook forces that route on CPU
        meshes so sharding tests can drive the partitioning rule."""
        use = self.cfg.pallas_roi_align and (
            jax.default_backend() in ("tpu", "axon") or self.cfg.cp_roi_align)
        if not use:
            return False, 0, 0
        import math

        from detectinblur_tpu.models.resnet import CONV_PRECISION

        # f32 windows need double the VMEM: halve the rois per step.
        rps = 4 if CONV_PRECISION == jax.lax.Precision.DEFAULT else 2
        # Tier-1/2 window sized to the bucket's P5 geometric-mean bound
        # (sqrt(Hb*Wb)/32 + spill), rounded to the sublane multiple.
        bound = math.sqrt(bucket[0] * bucket[1]) / 32 + 3
        wy = max(32, int(math.ceil(bound / 8)) * 8)
        return True, rps, wy

    # ----------------------------------------------------------- inference
    def predict(
        self,
        params,
        images: jax.Array,      # [B, Hb0, Wb0, 3] raw 0..1, valid top-left
        hw: jax.Array,          # [B, 2] valid sizes (original coords)
        bucket: Tuple[int, int],
        means: Optional[jax.Array] = None,   # [B, 3] blur-conditional norms
        stds: Optional[jax.Array] = None,
        thetas: Optional[jax.Array] = None,
        lam1s: Optional[jax.Array] = None,
        lam2s: Optional[jax.Array] = None,
        kill_warp: bool = False,
        bn_stats=None,
    ) -> Detections:
        cfg = self.cfg
        batched, new_hw = preprocess_batch(
            images, hw, bucket, means, stds, cfg.min_size, cfg.max_size
        )
        feats, _ = self._features(params, batched, thetas, lam1s, lam2s,
                                  kill_warp, bn_stats=bn_stats)
        rpn_out = run_rpn(params["rpn_head"], self.rpn_head, feats, new_hw,
                          training=False, cfg=cfg.rpn)

        use_pallas, rps, wy = self._pallas_pool_plan(bucket)
        # Invalid proposal slots carry NMS-suppressed boxes; their pooled
        # outputs are masked out of postprocess_detections, so zero them
        # rather than let garbage slivers trip the RoIAlign oversized path.
        proposals = jnp.where(rpn_out.proposal_valid[..., None],
                              rpn_out.proposals, 0.0)
        if use_pallas:
            from detectinblur_tpu.ops.roi_align_pallas import (
                sharded_multiscale_roi_align,
            )

            pooled = sharded_multiscale_roi_align(feats[:4], proposals,
                                                  rois_per_step=rps,
                                                  win_y=wy, win_x=wy + 8)

            def per_image_pooled(pooled_i, rois, roi_valid, hw_i, orig_hw_i):
                logits, deltas = self._head_from_pooled(params, pooled_i)
                boxes, scores, labels, valid = postprocess_detections(
                    logits, deltas, rois, roi_valid, hw_i, cfg.box
                )
                return resize_boxes(boxes, hw_i, orig_hw_i), scores, labels, valid

            boxes, scores, labels, valid = jax.vmap(per_image_pooled)(
                pooled, rpn_out.proposals, rpn_out.proposal_valid, new_hw, hw
            )
            return Detections(boxes, scores, labels, valid)

        def per_image(feats_i, rois, roi_valid, hw_i, orig_hw_i):
            logits, deltas = self._box_outputs(params, feats_i, rois)
            boxes, scores, labels, valid = postprocess_detections(
                logits, deltas, rois, roi_valid, hw_i, cfg.box
            )
            boxes = resize_boxes(boxes, hw_i, orig_hw_i)
            return boxes, scores, labels, valid

        p2to5 = feats[:4]
        boxes, scores, labels, valid = jax.vmap(
            lambda f0, f1, f2, f3, rois, rv, nhw, ohw: per_image(
                (f0, f1, f2, f3), rois, rv, nhw, ohw
            )
        )(*p2to5, rpn_out.proposals, rpn_out.proposal_valid, new_hw, hw)
        return Detections(boxes, scores, labels, valid)

    # ------------------------------------------------------------ training
    def loss(
        self,
        params,
        key: jax.Array,
        images: jax.Array,       # [B, Hb0, Wb0, 3]
        hw: jax.Array,           # [B, 2]
        gt_boxes: jax.Array,     # [B, G, 4] in input coords (padded)
        gt_labels: jax.Array,    # [B, G]
        gt_valid: jax.Array,     # [B, G]
        bucket: Tuple[int, int],
        means: Optional[jax.Array] = None,
        stds: Optional[jax.Array] = None,
        thetas: Optional[jax.Array] = None,
        lam1s: Optional[jax.Array] = None,
        lam2s: Optional[jax.Array] = None,
        kill_warp: bool = False,
        bn_stats=None,
    ):
        """Returns (losses, new_bn_stats); new_bn_stats is None unless the
        backbone's bn_mode makes running stats mutable."""
        cfg = self.cfg
        B = images.shape[0]
        batched, new_hw = preprocess_batch(
            images, hw, bucket, means, stds, cfg.min_size, cfg.max_size
        )
        gt_resized = jax.vmap(resize_boxes)(gt_boxes, hw, new_hw)

        feats, new_bn_stats = self._features(params, batched, thetas, lam1s,
                                             lam2s, kill_warp, train=True,
                                             bn_stats=bn_stats)
        rpn_out = run_rpn(params["rpn_head"], self.rpn_head, feats, new_hw,
                          training=True, cfg=cfg.rpn)

        keys = jax.random.split(key, (B, 2))

        rpn_box_l, rpn_obj_l, rpn_n = jax.vmap(
            lambda k, obj, dlt, gb, gv: rpn_loss(
                k, obj, dlt, rpn_out.anchors, gb, gv, cfg.rpn
            )
        )(keys[:, 0], rpn_out.objectness, rpn_out.pred_deltas, gt_resized, gt_valid)

        def sample_one(k, rois, rv, gb, gl, gv):
            return select_training_samples(k, rois, rv, gb, gl, gv, cfg.box)

        rois, roi_labels, reg_targets, roi_valid = jax.vmap(sample_one)(
            keys[:, 1], rpn_out.proposals, rpn_out.proposal_valid,
            gt_resized, gt_labels, gt_valid,
        )
        # Invalid slots can carry arbitrary (NMS-suppressed / padded) boxes;
        # their pooled outputs are masked out of the loss, so zero the boxes
        # rather than let garbage slivers trip the RoIAlign oversized path.
        rois = jnp.where(roi_valid[..., None], rois, 0.0)

        p2to5 = feats[:4]
        use_pallas, rps, wy = self._pallas_pool_plan(bucket)
        if use_pallas:
            # Pallas forward + window-RMW backward (custom VJP): the XLA
            # quad path's take + backward scatter were ~65 ms of the
            # training step at batch 8 x 512 rois.
            from detectinblur_tpu.ops.roi_align_pallas import (
                multiscale_roi_align_fused,
            )

            # Backward windows CAN tier below the forward's
            # (DETECTINBLUR_BWD_WIN_DELTA=8 -> [32, 40] under a [40, 48]
            # forward; gradients stay exact for any window — stragglers
            # route through the take-VJP tiers). Measured on v5e r5 and
            # REJECTED as the default: the tighter window costs ~26 ms/step
            # (168.8 vs 143.0 ms at batch 8) under BOTH the from-scratch
            # and the steady-state (zeroed-delta) proposal distributions —
            # the extra oversized-tier traffic outweighs the smaller RMW
            # windows. See PERF.md "backward window tiering".
            import os as _os

            delta = int(_os.environ.get("DETECTINBLUR_BWD_WIN_DELTA", "0"))
            bwy = max(32, wy - delta)
            pooled = multiscale_roi_align_fused(p2to5, rois, 7, 2, rps,
                                                wy, wy + 8, bwy, bwy + 8)
            logits, deltas = jax.vmap(
                lambda p: self._head_from_pooled(params, p))(pooled)
        else:
            logits, deltas = jax.vmap(
                lambda f0, f1, f2, f3, r: self._box_outputs(params, (f0, f1, f2, f3), r)
            )(*p2to5, rois)

        ce_sum, box_sum, n = jax.vmap(fastrcnn_loss)(logits, deltas, roi_labels, reg_targets)
        n_tot = jnp.maximum(jnp.sum(n), 1)
        losses = {
            # torchvision loss normalization (rpn.compute_loss /
            # fastrcnn_loss): per-batch totals over sampled counts.
            "loss_objectness": jnp.sum(rpn_obj_l) / jnp.maximum(jnp.sum(rpn_n), 1),
            "loss_rpn_box_reg": jnp.sum(rpn_box_l) / jnp.maximum(jnp.sum(rpn_n), 1),
            "loss_classifier": jnp.sum(ce_sum) / n_tot,
            "loss_box_reg": jnp.sum(box_sum) / n_tot,
        }
        return losses, new_bn_stats
