"""centerpose_tpu — a TPU-native multi-person 2D pose estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``tensorboy/centerpose`` (CenterNet-style bottom-up pose estimation):

- interchangeable fully-convolutional backbones (ResNet, DLA-34 + deformable
  conv v2, HRNet-W32, MobileNetV2/V3, ShuffleNetV2, HardNet, Darknet-53,
  EfficientNet) producing a stride-4 feature map,
- six convolutional prediction heads (center heatmap ``hm``, box size ``wh``,
  center offset ``reg``, joint regression ``hps``, joint heatmaps ``hm_hp``,
  joint offsets ``hp_offset``),
- a fully on-device decode (3x3 max-pool NMS, top-K, center-to-joint grouping
  with heatmap-peak snapping),
- penalty-reduced focal + masked L1 losses,
- SPMD data-parallel training over a ``jax.sharding.Mesh``.

Layout mirrors the reference's *layer map* (SURVEY.md §1), not its file tree.
"""

__version__ = "0.1.0"
