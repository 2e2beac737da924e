"""deepsense6g_tii_tpu: a TPU-native (JAX/XLA/Pallas) multi-modal
beam-prediction framework with the capabilities of szy4017/DeepSense6G_TII.

Layers (mirroring SURVEY.md section 1):
  data/      feature factory + dataset pipeline (L0 + L1)
  ops/       Pallas kernels and numeric primitives
  models/    ResNet backbones, GPT/Mamba fusion, fuser top modules (L2)
  train/     engine: losses, schedule, metrics, checkpoints, steps (L3)
  rebuild/   modality-rebuild research subsystem (L4)
  parallel/  device mesh + sharding
  cli/       command-line entry points mirroring the reference flag surface
"""

__version__ = "0.1.0"

from .config import GlobalConfig  # noqa: F401
