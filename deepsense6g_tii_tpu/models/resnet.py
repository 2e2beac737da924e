"""ResNet backbones (NHWC, Flax) with stage-separable structure.

Equivalent of the torchvision ResNet34 image encoder and 1/2-channel ResNet18
LiDAR/radar encoders of the reference (mambafuser_seq.py:12-72).  The fusion
encoders interleave ResNet stages with cross-modal fusion
(mambafuser_seq.py:393-525), so the backbone exposes ``stem`` and
``stage1..4`` as separately callable submodules instead of one monolithic
forward.

Convs run in the configured compute dtype (bfloat16 on the MXU by default);
BatchNorm statistics stay float32.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pooling import max_pool_3x3s2

BN_MOMENTUM = 0.9   # torch momentum 0.1 == flax momentum 0.9
# Known (accepted) deviation: torch folds the UNBIASED batch variance
# (N/(N-1)) into running_var while flax uses the biased one — a ~1/N
# relative drift per update (N = B*T*H*W >= ~160k here, i.e. <1e-5).
# Inference parity is exact: imported running stats are used as-is.
BN_EPS = 1e-5


def bn_sample_mask(sample_mask, T: int):
    """(B,) validity mask -> (B*T, 1, 1, 1) bool BatchNorm mask for the
    b-major batch+time-flattened conv streams.  Single source of truth for
    the flatten order — the engine pads ragged batches and the mask keeps
    the padded rows out of the BN batch statistics (the reference trains on
    exact ragged batches, train2_seq.py:94-156)."""
    return jnp.repeat(sample_mask.astype(bool), T)[:, None, None, None]


class BasicBlock(nn.Module):
    """``groups > 1`` runs G independent per-stream blocks as ONE grouped
    conv program over channel-concatenated streams (``features`` is the
    TOTAL width).  Per-channel BatchNorm over the concatenation is exactly
    G separate BatchNorms, so grouped == separate to float associativity
    (pinned by tests/test_grouped_backbone.py)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    feature_group_count=self.groups, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn1")(
                             y, mask=mask)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype,
                    feature_group_count=self.groups, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn2")(
                             y, mask=mask)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               feature_group_count=self.groups,
                               name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                    dtype=self.dtype,
                                    name="downsample_bn")(residual, mask=mask)
        return nn.relu(y + residual)


class ResNetStem(nn.Module):
    """conv7x7/2 + BN + relu + maxpool3x3/2: 256x256xC -> 64x64x(64*groups)."""

    dtype: jnp.dtype = jnp.float32
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        x = nn.Conv(64 * self.groups, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False, dtype=self.dtype,
                    feature_group_count=self.groups, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn1")(
                             x, mask=mask)
        x = nn.relu(x)
        return max_pool_3x3s2(x)


class ResNetStage(nn.Module):
    features: int
    num_blocks: int
    stride: int
    dtype: jnp.dtype = jnp.float32
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        for i in range(self.num_blocks):
            x = BasicBlock(self.features, self.stride if i == 0 else 1,
                           dtype=self.dtype, groups=self.groups,
                           name=f"block{i}")(x, train, mask)
        return x


# torchvision block counts
RESNET18_BLOCKS: Tuple[int, ...] = (2, 2, 2, 2)
RESNET34_BLOCKS: Tuple[int, ...] = (3, 4, 6, 3)
STAGE_FEATURES: Tuple[int, ...] = (64, 128, 256, 512)
STAGE_STRIDES: Tuple[int, ...] = (1, 2, 2, 2)


class ResNetBackbone(nn.Module):
    """Stage-separable ResNet.  Call with stage='stem'|'1'|'2'|'3'|'4'.

    ``remat`` checkpoints each stage (remat="conv" policy): conv activations
    recompute in the backward pass instead of living in HBM — cheap FLOPs
    (MXU convs) for large memory, while the VPU-bound scan activations stay
    stored."""

    blocks: Sequence[int] = RESNET18_BLOCKS
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # remat="stem" policy: checkpoint ONLY the stem.  Its pre-maxpool
    # 128x128x64 conv output is the single largest activation in the model
    # (~167 MB bf16 per modality at B=16·T=5); recomputing it costs one
    # 7x7 conv + BN forward per modality in the backward pass.
    remat_stem: bool = False
    # groups=G: G independent backbones (channel-concatenated inputs,
    # block-diagonal weights) as ONE grouped-conv program — used to merge
    # the identically-shaped lidar+radar ResNet18s into half the conv
    # dispatches with double the per-conv channel count
    # (config.merge_lidar_radar).
    groups: int = 1

    def setup(self):
        stage_cls = (nn.remat(ResNetStage, static_argnums=(2,))
                     if self.remat else ResNetStage)
        stem_cls = (nn.remat(ResNetStem, static_argnums=(2,))
                    if self.remat_stem else ResNetStem)
        g = self.groups
        self.stem = stem_cls(dtype=self.dtype, groups=g)
        self.stage1 = stage_cls(STAGE_FEATURES[0] * g, self.blocks[0],
                                STAGE_STRIDES[0], dtype=self.dtype, groups=g)
        self.stage2 = stage_cls(STAGE_FEATURES[1] * g, self.blocks[1],
                                STAGE_STRIDES[1], dtype=self.dtype, groups=g)
        self.stage3 = stage_cls(STAGE_FEATURES[2] * g, self.blocks[2],
                                STAGE_STRIDES[2], dtype=self.dtype, groups=g)
        self.stage4 = stage_cls(STAGE_FEATURES[3] * g, self.blocks[3],
                                STAGE_STRIDES[3], dtype=self.dtype, groups=g)

    def __call__(self, x, train: bool = False, mask=None):
        """Full backbone pass (used for weight-port validation).

        ``mask`` ((N, 1, 1, 1) bool, broadcastable to x) excludes padded rows
        from the BatchNorm batch statistics — ragged final batches are padded
        up to the mesh size by the engine, and without the mask the duplicate
        rows would perturb the normalization of the real rows (the reference
        trains on exact ragged batches, train2_seq.py:94-156)."""
        x = self.stem(x, train, mask)
        for stage in (self.stage1, self.stage2, self.stage3, self.stage4):
            x = stage(x, train, mask)
        return x


def merge_backbone_trees(*trees):
    """Per-stream ResNetBackbone params/batch_stats -> the groups=G merged
    tree.  Conv kernels (kh, kw, cin, cout) concatenate on the output axis
    (in-channel zero-padded to the widest stream — exact: the extra input
    channels are zeros); BN vectors concatenate per channel.  Stream order
    must match the channel-concatenation order of the grouped input."""
    import jax

    def merge(*leaves):
        arrs = [jnp.asarray(a) for a in leaves]
        if arrs[0].ndim == 4:
            cin = max(a.shape[-2] for a in arrs)
            arrs = [jnp.pad(a, ((0, 0), (0, 0), (0, cin - a.shape[-2]),
                                (0, 0))) for a in arrs]
        return jnp.concatenate(arrs, axis=-1)

    return jax.tree_util.tree_map(merge, *trees)
