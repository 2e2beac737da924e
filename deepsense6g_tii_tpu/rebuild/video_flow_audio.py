"""EPIC-KITCHENS video/flow/audio cross-modal-translation experiment.

Capability-context stub, documented for inventory parity (SURVEY.md
section 2a #29).

The reference file — modality_rebuild/train_video_flow_audio.py (614 lines) —
is a SimMMDG cross-modal-translation prototype over SlowFast/SlowOnly video
+ flow backbones (mmaction2 ``init_recognizer``) and an AVENet audio encoder.
It is **not runnable in the reference repo itself**: ``init_recognizer``,
``EPICDOMAIN``, ``AVENet`` and ``SupConLoss`` are referenced without imports
or definitions (train_video_flow_audio.py:271-296,306,363,438), and its
dataset (EPIC-KITCHENS) is outside the DeepSense6G distribution.

What the experiment does, structurally, is the same recipe this package
implements end-to-end for image/LiDAR/radar in ``rebuild/``:

  per-modality frozen encoders -> ProjectHead shared/specific split ->
  supervised/unsupervised contrastive alignment of the shared halves +
  distance separation of the specific halves + source->target FeatureTrans
  translation MSE -> fused prediction loss.

To reproduce it on TPU, instantiate :class:`~..rebuild.trainer.RebuildTrainer`
with encoders for the new modalities (a video backbone in place of the
ResNets) — the heads, losses and the dual-LR step are modality-agnostic: they
consume ``{modality: (N, spatial_or_time, C)}`` feature dictionaries.

This module intentionally contains no executable model: shipping a silently
broken trainer (as the reference does) would be worse than documenting the
capability and pointing at the working, tested generalization.
"""

from .losses import contrastive_loss, distance_loss, translation_loss  # noqa: F401
from .trainer import RebuildOptions, RebuildTrainer  # noqa: F401
