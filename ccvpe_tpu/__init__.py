"""ccvpe_tpu — a TPU-native cross-view pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the CCVPE
reference (T-PAMI 2023): dense localization heatmap + dense orientation field
from a (ground image, aerial patch) pair, for the VIGOR / KITTI /
Oxford RobotCar workloads.

Layout (bottom-up):
  core/    config dataclasses, mesh/runtime init, checkpointing, metrics
  ops/     kernel library: SAME/circular padding, rolled correlation
           (jnp + Pallas), on-device GT rendering, pose decoding
  nn/      EfficientNet-B0 (Flax), descriptor heads, decoders
  models/  the configurable CVM model family
  data/    VIGOR / KITTI / Oxford pipelines + threaded prefetch loader
  train/   losses, sharded train/eval steps, epoch drivers
  utils/   PyTorch->JAX weight conversion
"""

__version__ = "0.1.0"
