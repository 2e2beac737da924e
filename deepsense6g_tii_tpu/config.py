"""Global configuration for the DeepSense6G-TII TPU framework.

Mirrors the capability surface of the reference ``GlobalConfig``
(/root/reference/config_seq.py:3-45) plus every CLI flag that the reference
copies onto the config object at startup (/root/reference/train2_seq.py:30-68,
413-425).  Unlike the reference — where the config is a mutable class with
flags grafted on at runtime — this is a frozen dataclass, so every jitted
function can close over it as a static value and XLA sees fully static shapes.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class GlobalConfig:
    # ---- data (config_seq.py:6-16) ----
    seq_len: int = 5                 # input timesteps
    pred_len: int = 1                # beams predicted per sample (30to5 variant: 5)
    gps_len: int = 2                 # GPS samples per sequence
    data_root: str = "./Dataset"
    n_views: int = 1                 # camera views
    input_resolution: int = 256
    scale: int = 1
    crop: int = 256
    num_beams: int = 64

    # ---- optimization (config_seq.py:18) ----
    lr: float = 1e-4

    # ---- Mamba toggles (config_seq.py:21-22) ----
    FFM: int = 1                     # Feature Fusion Mamba (vs GPT attention fusion)
    TFM: int = 1                     # Time Fusion Mamba (vs token-sum head)

    # ---- modality missing (config_seq.py:25-26) ----
    modality_missing: Optional[str] = None        # image|lidar|radar|lidar_radar
    modality_missing_type: str = "zerolike"       # zerolike|randlike

    # ---- conv encoder anchors (config_seq.py:29-31) ----
    vert_anchors: int = 8
    horz_anchors: int = 8

    # ---- GPT encoder (config_seq.py:34-41) ----
    n_embd: int = 512
    block_exp: int = 4
    n_layer: int = 8
    n_head: int = 4
    n_scale: int = 4
    embd_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    attn_pdrop: float = 0.1

    # ---- Mamba block dims (mambafuser_seq.py:83-90) ----
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2

    # ---- flags copied onto config by the reference CLI (train2_seq.py:413-425) ----
    add_velocity: int = 1            # radar velocity map as 2nd radar channel
    add_mask: int = 0
    enhanced: int = 1
    angle_norm: int = 1
    custom_FoV_lidar: int = 1
    filtered: int = 0
    add_seg: int = 0

    # ---- TPU-native knobs (no reference equivalent) ----
    param_dtype: str = "float32"     # parameter dtype
    compute_dtype: str = "bfloat16"  # activation/matmul dtype on the MXU
    use_pallas_scan: bool = True     # Pallas selective-scan vs associative_scan ref
    # Pallas flash attention for the GPT fusion blocks (streaming softmax,
    # never materializes the 962x962 attention matrix; in-kernel prob
    # dropout) vs the einsum reference path — ops/flash_attention.py
    use_flash_attention: bool = False
    # in-kernel attention-dropout PRNG: None = auto ("hw" — the TPU hardware
    # PRNG — on a real TPU backend, the murmur-hash "hash" elsewhere).
    # Force "hash" for a backend-independent dropout stream (exact jnp
    # oracle, ~40-85% slower kernels at p=0.1 — tools/bench_flash.py).
    flash_dropout_impl: Optional[str] = None
    # rematerialization policy: "none" | "fusion" (checkpoint the token-
    # fusion stages incl. scans) | "conv" (checkpoint the ResNet stages,
    # keep the scan activations stored — cheaper recompute per HBM saved)
    # | "stem" (checkpoint only the 7x7 stems: their 128x128x64
    # intermediates are the largest activations in the model, ~500 MB at
    # B=16, and recompute for one cheap conv+BN per modality)
    remat: str = "none"
    # backbone depth override: None = reference depths (ResNet34 image,
    # ResNet18 lidar/radar — mambafuser_seq.py:23,59).  A 4-tuple of
    # per-stage block counts (e.g. (1, 1, 1, 1)) replaces ALL three
    # backbones' depths while keeping every stage/stride/width — the graphs
    # the mechanism tests (remat equality, BN sample-mask, engine, dryrun)
    # compile shrink ~3x without changing any mechanism under test.
    backbone_blocks: Optional[Tuple[int, int, int, int]] = None
    # run the lidar+radar ResNet18s (identical shapes, different weights) as
    # ONE feature_group_count=2 conv program over channel-concatenated
    # streams: half the conv/pool/upsample dispatches at double the per-conv
    # channel count (64/128/256/512 -> 128/256/512/1024, each a multiple of
    # the 128-lane register width).  Numerically exact vs two separate
    # backbones (per-channel BN; tests/test_grouped_backbone.py).
    merge_lidar_radar: bool = False
    # stage1-only variant of merge_lidar_radar: run ONLY the lidar+radar
    # stems + stage1 as one feature_group_count=2 program (64 -> 128
    # output channels — the one place the separate backbones leave half
    # the 128-lane MXU width idle; xprof r4: stage1 is 38% of all conv
    # time), then split and keep stages 2-4 separate (already >= 128
    # wide — grouping THEM is the measured r3 dead end).  Exact vs
    # separate backbones (per-channel BN).  Mutually exclusive with
    # merge_lidar_radar.
    merge_lr_stage1: bool = False
    # Mamba-path only: carry the fused token stream padded to the next
    # 128-multiple (962 -> 1024) through ALL fusion blocks instead of
    # padding/slicing around each of the 64 selective-scan kernel calls.
    # Exact for the real tokens by causality — pads always TRAIL (the
    # backward branch flips only the real prefix), so no scan output at a
    # real position ever sees a pad, and the (tokens, C) LayerNorm computes
    # its statistics over the real prefix only (fusion.py::TokenFusion).
    # Ignored on the GPT path (attention would need in-kernel real-length
    # masking; its per-call pad is already cheap there).
    padded_token_stream: bool = False
    # Mamba-path only: run each block's backward-direction branch as a
    # REVERSE Mamba over the natural-order stream (anticausal conv +
    # reversed-grid selective-scan kernel, chunks visited last-to-first)
    # instead of materializing jnp.flip of the whole (B, 962, C) stream
    # before in_proj/fc2.  The two output flips it leaves behind are
    # elementwise-fusible (XLA folds them into the gated combine), where
    # the input flip feeds matmuls and must materialize.  Same parameters
    # and math modulo conv-window float reduction order.  Ignored when
    # padded_token_stream is on (trailing pads would be scanned first).
    reverse_scan_kernel: bool = False
    # Depthwise causal conv1d lowering inside every Mamba layer
    # (ops/mamba.py::causal_depthwise_conv1d): "conv" (default) is XLA's
    # feature_group_count=d_inner grouped-conv lowering; "shift" computes
    # the width-4 depthwise conv as 4 shifted elementwise FMAs.  Same math
    # and reduction order.  MEASURED DEAD END (r5): "shift" is -1.6% e2e
    # on the mamba bench (52.82 vs 53.69 samples/s/chip, B=16 K=8 GA=2,
    # same-session A/B) — the grouped-conv backward's MXU weight-grad
    # beats the shift form's 4-tap reduction chain; the 11.1 ms fusion3/4
    # conv1d bucket (NOTES r4) is not recoverable by relowering.
    conv1d_impl: str = "conv"
    # Adam first-moment (mu) storage dtype: None = f32 (exact torch-AdamW
    # trajectory).  "bfloat16" halves mu's HBM (103M params -> 207 MB saved)
    # — enough to fit batch 16 without rematerialization on a 16G v5e.  The
    # second moment and params stay f32 (nu feeds rsqrt; bf16 there hurts).
    opt_mu_dtype: Optional[str] = None

    def __post_init__(self):
        # remat was a bool in early revisions; a stale True would otherwise
        # compare unequal to every policy string and silently disable
        # rematerialization (frozen dataclass -> object.__setattr__)
        if isinstance(self.remat, bool):
            object.__setattr__(self, "remat", "fusion" if self.remat
                               else "none")
        if self.remat not in ("none", "fusion", "conv", "stem"):
            raise ValueError(f"remat must be 'none'|'fusion'|'conv'|'stem', "
                             f"got {self.remat!r}")
        if self.backbone_blocks is not None:
            # json round-trips tuples as lists; hashability needs a tuple
            object.__setattr__(self, "backbone_blocks",
                               tuple(self.backbone_blocks))
            if len(self.backbone_blocks) != 4:
                raise ValueError("backbone_blocks must have 4 stage counts")

    @property
    def anchors(self) -> int:
        return self.vert_anchors * self.horz_anchors

    @property
    def n_tokens(self) -> int:
        """Fused token count: 3 modalities x seq_len x 8x8 anchors + gps tokens.

        962 for the 5-frame task, 1922 for the 30to5 variant
        (model2_seq.py:189; model2_seq_30to5.py:624).
        """
        return (self.n_views + 2) * self.seq_len * self.anchors + self.gps_len

    def replace(self, **kw) -> "GlobalConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "GlobalConfig":
        return cls(**json.loads(s))


# Per-scenario LiDAR field-of-view bins (data2_seq.py:190-202): (x_lo, x_hi, y_lo, y_hi)
SCENARIO_FOV: Tuple[Tuple[str, Tuple[float, float, float, float]], ...] = (
    ("scenario31", (-70.0, 0.0, -25.0, 14.0)),
    ("scenario32", (-60.0, 0.0, -40.0, 5.5)),
    ("scenario33", (-50.0, 0.0, -12.0, 7.0)),
    ("scenario34", (-50.0, 0.0, -20.0, 10.0)),
)
DEFAULT_FOV: Tuple[float, float, float, float] = (-50.0, 0.0, -50.0, 50.0)

# Per-scenario base-station boresight offsets in degrees (data2_seq.py:264-272).
SCENARIO_ANGLE_OFFSET = {
    "scenario31": -50.52,
    "scenario32": 44.8,
    "scenario33": 55.6,
    "scenario34": -60.0,
}

# GPS min-max normalization constants (data2_seq.py:251-252).
POS_MAX = (40.20955233, 52.31386139)
POS_MIN = (-7.18029715, -97.55563452)

SCENARIOS = ("scenario31", "scenario32", "scenario33", "scenario34")


def config_30to5(**overrides) -> GlobalConfig:
    """The 30-to-5 multi-step variant: 10 input frames, 5 predicted beams,
    1922 fused tokens (config_seq_30to5.py:6-7; model2_seq_30to5.py:624).
    Unlike the reference's forked files, this is the same config class —
    every jitted graph derives its static shapes from it."""
    return GlobalConfig(seq_len=10, pred_len=5, **overrides)
