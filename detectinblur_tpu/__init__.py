"""detectinblur_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for object
detection under camera-shake motion blur.

Re-designed from scratch with the capabilities of the reference framework
``mohammed-amr/detectInBlur`` (CVPR 2021, "Improved Handling of Motion Blur in
Online Object Detection"), but idiomatic JAX: fixed-shape batched pipelines,
seedable functional RNG, SPMD over device meshes, and XLA/Pallas kernels for
the hot paths (FFT blur, RoIAlign, NMS).

Layout:
  ops/       pure jittable ops: trajectory/PSF synthesis, blur kernels,
             boxes, NMS, RoIAlign, warping, JPEG, corruptions
  models/    flax.linen detection models: ResNet-FPN Faster R-CNN, blur
             estimator, deblur MSResNet, versatile backbones, BN remedies
  data/      host-side data pipeline: COCO loader, blur transform, buckets
  eval/      COCO evaluator (pure-numpy COCOeval + native RLE ops)
  parallel/  mesh construction, sharding rules, cross-host helpers
  train/     train state, engines (train_one_epoch / evaluate), checkpoints
  utils/     metric logging, torch checkpoint conversion, config
"""

__version__ = "0.1.0"
