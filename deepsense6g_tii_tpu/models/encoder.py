"""Multi-scale multi-modal fusion encoder.

One configurable module covering both reference encoders:

* GPT-fusion ``Encoder`` (model2_seq.py:406-597) — fusion_type="gpt",
  TFM=0 (token-sum head): the 0.6671 challenge winner.
* ``EncoderWithMamba`` (mambafuser_seq.py:286-550) — fusion_type="mamba"
  with channel swap, TimeMamba head, modality-missing injection and the
  rebuild-feature hook.

Skeleton (identical in both): per-modality ResNet stem+layer1, then four
rounds of { adaptive-avgpool to 8x8 anchors; fuse with the GPS embedding
chain; bilinear-upsample back; residual-add; next ResNet stage }, then global
average pooling into per-frame 512-d tracks and a temporal head.

Layout is NHWC throughout (TPU-native); batch and time are flattened into one
leading dim for all convolutions so the MXU sees (B*T)-sized batches.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import GlobalConfig
from ..data.features import normalize_imagenet
from ..ops.pooling import adaptive_avg_pool, global_avg_pool
from ..ops.resize import interpolate_bilinear
from .fusion import TimeMamba, TokenFusion
from .resnet import (RESNET18_BLOCKS, RESNET34_BLOCKS, STAGE_FEATURES,
                     bn_sample_mask,
                     ResNetBackbone)

STAGE_UPSAMPLE = (8, 4, 2, 1)


def _flatten_bt(x: jnp.ndarray) -> jnp.ndarray:
    b, t = x.shape[:2]
    return x.reshape((b * t,) + x.shape[2:])


def _unflatten_bt(x: jnp.ndarray, b: int) -> jnp.ndarray:
    return x.reshape((b, x.shape[0] // b) + x.shape[1:])


class FusionEncoder(nn.Module):
    config: GlobalConfig

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        conv_remat = cfg.remat == "conv"
        # "conv" checkpoints stems too: the stem intermediates dwarf any
        # single stage, so a policy that remats all stages but stores the
        # stems would spend recompute without unlocking larger batches.
        stem_remat = cfg.remat in ("conv", "stem")
        img_blocks = cfg.backbone_blocks or RESNET34_BLOCKS
        oth_blocks = cfg.backbone_blocks or RESNET18_BLOCKS
        if cfg.merge_lidar_radar and cfg.merge_lr_stage1:
            raise ValueError("merge_lidar_radar and merge_lr_stage1 are "
                             "mutually exclusive grouped-conv layouts")
        self.image_backbone = ResNetBackbone(img_blocks, dtype=dtype,
                                             remat=conv_remat,
                                             remat_stem=stem_remat,
                                             name="image_encoder")
        if cfg.merge_lidar_radar:
            # one grouped-conv program for both streams (resnet.py::groups)
            self.lr_backbone = ResNetBackbone(oth_blocks, dtype=dtype,
                                              remat=conv_remat,
                                              remat_stem=stem_remat,
                                              groups=2,
                                              name="lidar_radar_encoder")
        else:
            self.lidar_backbone = ResNetBackbone(oth_blocks, dtype=dtype,
                                                 remat=conv_remat,
                                                 remat_stem=stem_remat,
                                                 name="lidar_encoder")
            self.radar_backbone = ResNetBackbone(oth_blocks, dtype=dtype,
                                                 remat=conv_remat,
                                                 remat_stem=stem_remat,
                                                 name="radar_encoder")
            if cfg.merge_lr_stage1:
                # grouped stem+stage1 only (config.merge_lr_stage1); the
                # separate backbones above still serve stages 2-4 (their
                # stem/stage1 params are simply never created)
                self.lr_backbone = ResNetBackbone(
                    oth_blocks, dtype=dtype, remat=conv_remat,
                    remat_stem=stem_remat, groups=2,
                    name="lidar_radar_stage1")

        self.vel_embs = [
            nn.Dense(STAGE_FEATURES[i], name=f"vel_emb{i + 1}")
            for i in range(4)
        ]
        fusion_type = "mamba" if cfg.FFM else "gpt"
        # remat="fusion": rematerialize each fusion stage in the backward
        # pass (jax.checkpoint) — trades ~1 extra forward of the fusion
        # stack for not keeping its activations live, the standard HBM lever
        # for larger per-chip batches.  remat="conv" instead checkpoints the
        # ResNet stages (cheap convs recompute; the expensive scans stay
        # stored) — see ResNetBackbone.
        fusion_cls = (nn.remat(TokenFusion, static_argnums=(5,))
                      if cfg.remat == "fusion" else TokenFusion)
        self.fusions = [
            fusion_cls(
                n_embd=STAGE_FEATURES[i],
                n_layer=cfg.n_layer,
                seq_len=cfg.seq_len,
                n_views=cfg.n_views,
                anchors=cfg.anchors,
                gps_tokens=cfg.gps_len,
                embd_pdrop=cfg.embd_pdrop,
                fusion_type=fusion_type,
                channel_swap=bool(cfg.FFM),
                n_head=cfg.n_head,
                block_exp=cfg.block_exp,
                attn_pdrop=cfg.attn_pdrop,
                resid_pdrop=cfg.resid_pdrop,
                use_flash=cfg.use_flash_attention,
                flash_dropout_impl=cfg.flash_dropout_impl,
                d_state=cfg.d_state,
                d_conv=cfg.d_conv,
                expand=cfg.expand,
                use_pallas=cfg.use_pallas_scan,
                conv1d_impl=cfg.conv1d_impl,
                padded_stream=cfg.padded_token_stream,
                reverse_scan_kernel=cfg.reverse_scan_kernel,
                dtype=dtype,
                name=f"fusion{i + 1}")
            for i in range(4)
        ]
        if cfg.TFM:
            self.time_mamba = TimeMamba(
                d_model=STAGE_FEATURES[3], seq_len=cfg.seq_len,
                gps_tokens=cfg.gps_len, d_state=cfg.d_state,
                d_conv=cfg.d_conv, expand=cfg.expand,
                conv1d_impl=cfg.conv1d_impl, dtype=dtype,
                name="time_mamba")

    # -- modality missing (mambafuser_seq.py:361-391) ------------------------

    def _apply_missing(self, image, lidar, radar):
        miss = self.config.modality_missing
        if miss is None:
            return image, lidar, radar
        kind = self.config.modality_missing_type

        def sub(x):
            if kind == "zerolike":
                return jnp.zeros_like(x)
            if kind == "randlike":
                return jax.random.uniform(self.make_rng("missing"), x.shape,
                                          x.dtype)
            raise ValueError(f"unknown modality_missing_type {kind!r}")

        if miss == "image":
            image = sub(image)
        elif miss == "lidar":
            lidar = sub(lidar)
        elif miss == "radar":
            radar = sub(radar)
        elif miss in ("lidar_radar", "radar_lidar"):
            lidar, radar = sub(lidar), sub(radar)
        else:
            raise ValueError(f"unknown modality_missing {miss!r}")
        return image, lidar, radar

    # -- rebuild-feature injection (mambafuser_seq.py:442-457) ---------------

    def _inject_rebuild(self, feats, rebuild, train: bool):
        miss = self.config.modality_missing
        image_f, lidar_f, radar_f = feats
        if rebuild is None or miss is None:
            return feats
        rebuild = rebuild.astype(image_f.dtype)
        if miss == "image":
            if train:
                # 25% chance per step of training on the rebuilt features
                use = jax.random.bernoulli(self.make_rng("rebuild"), 0.25)
                image_f = jnp.where(use, rebuild, image_f)
            else:
                image_f = rebuild
        elif miss == "lidar":
            lidar_f = rebuild
        elif miss == "radar":
            radar_f = rebuild
        return image_f, lidar_f, radar_f

    # -- forward --------------------------------------------------------------

    def __call__(self, image, lidar, radar, gps,
                 rebuild_feats: Optional[jnp.ndarray] = None,
                 train: bool = False,
                 return_stage1: bool = False,
                 apply_missing: bool = True,
                 sample_mask: Optional[jnp.ndarray] = None):
        """image: (B, T, H, W, 3) in [0, 255]; lidar: (B, T, H, W, 1);
        radar: (B, T, H, W, 1|2); gps: (B, gps_len, 2).

        ``sample_mask`` ((B,), 1.0 real / 0.0 padded) excludes engine-padded
        rows from the BatchNorm batch statistics so a padded ragged batch
        computes exactly the unpadded batch's gradients.

        Returns (B, 512) fused features (or also the three stage-1 feature
        maps when ``return_stage1`` — the rebuild subsystem taps them).
        """
        cfg = self.config
        B = image.shape[0]
        dtype = jnp.dtype(cfg.compute_dtype)
        # per-stream masks: the image stream carries n_views*seq_len frames
        # per sample while lidar/radar carry seq_len, so the flattened
        # row counts differ whenever n_views > 1
        bn_masks = [(None if sample_mask is None
                     else bn_sample_mask(sample_mask, x.shape[1]))
                    for x in (image, lidar, radar)]

        image = normalize_imagenet(image.astype(jnp.float32))
        lidar = lidar.astype(jnp.float32)
        radar = radar.astype(jnp.float32)
        if apply_missing:
            image, lidar, radar = self._apply_missing(image, lidar, radar)

        image = _flatten_bt(image).astype(dtype)
        lidar = _flatten_bt(lidar).astype(dtype)
        radar = _flatten_bt(radar).astype(dtype)

        merged = cfg.merge_lidar_radar

        # explicit per-modality scopes: direct sub-submodule calls
        # (bb.stage1(...)) put only "stage1/..." on the op name stack, so
        # without these the three backbones' convs aggregate into one xprof
        # row and per-conv attribution (tools/profile_step.py) is blind to
        # which modality the time belongs to
        def scoped(tag, fn, *a):
            with jax.named_scope(tag):
                return fn(*a)

        def lr_stage(name, lid_f, rad_f, m):
            """One grouped-conv dispatch over both streams.  The concat and
            the split slices are layout ops XLA fuses into the neighbouring
            convs; lidar+radar channel counts are equal at every stage."""
            lr = jnp.concatenate([lid_f, rad_f], axis=-1)
            lr = scoped("lr_backbone",
                        getattr(self.lr_backbone, name), lr, train, m)
            c = lr.shape[-1] // 2
            return lr[..., :c], lr[..., c:]

        def merged_lr_stage1(lidar, radar):
            """Grouped stem+stage1 over both raw streams.  Equal per-group
            input channels (grouped-conv requirement): zero-pad the narrower
            raw stream — exact, the padded channel's stem weights multiply
            zeros."""
            cin = max(lidar.shape[-1], radar.shape[-1])
            pad = lambda x: (x if x.shape[-1] == cin else jnp.pad(  # noqa: E731
                x, ((0, 0),) * (x.ndim - 1) + ((0, cin - x.shape[-1]),)))
            lr = jnp.concatenate([pad(lidar), pad(radar)], axis=-1)
            lr = scoped(
                "lr_backbone",
                lambda x: self.lr_backbone.stage1(
                    self.lr_backbone.stem(x, train, bn_masks[1]),
                    train, bn_masks[1]), lr)
            c = lr.shape[-1] // 2
            return lr[..., :c], lr[..., c:]

        if merged or cfg.merge_lr_stage1:
            img_f = scoped(
                "image_backbone",
                lambda x: self.image_backbone.stage1(
                    self.image_backbone.stem(x, train, bn_masks[0]),
                    train, bn_masks[0]), image)
            lid_f, rad_f = merged_lr_stage1(lidar, radar)
            feats = [img_f, lid_f, rad_f]
        else:
            feats = [None, None, None]   # filled below
        if not merged:
            backbones = (self.image_backbone, self.lidar_backbone,
                         self.radar_backbone)
            tags = ("image_backbone", "lidar_backbone", "radar_backbone")
            if not cfg.merge_lr_stage1:
                feats = [scoped(t, lambda bb=bb, x=x, m=m: bb.stage1(
                             bb.stem(x, train, m), train, m))
                         for t, bb, x, m in zip(tags, backbones,
                                                (image, lidar, radar),
                                                bn_masks)]

        feats = self._inject_rebuild(feats, rebuild_feats, train)
        stage1_feats = feats

        gps_feats = gps.astype(jnp.float32)
        for i in range(4):
            anchors = [adaptive_avg_pool(f, cfg.vert_anchors, cfg.horz_anchors)
                       for f in feats]
            anchors = [_unflatten_bt(a, B) for a in anchors]
            gps_emb = self.vel_embs[i](gps_feats).astype(dtype)
            # positional call: deterministic is a static arg under nn.remat
            img_o, lid_o, rad_o, gps_feats = self.fusions[i](
                anchors[0], anchors[1], anchors[2], gps_emb, not train)
            gps_feats = gps_feats.astype(jnp.float32)
            outs = [_flatten_bt(o) for o in (img_o, lid_o, rad_o)]
            if STAGE_UPSAMPLE[i] > 1:
                outs = [interpolate_bilinear(o, STAGE_UPSAMPLE[i]) for o in outs]
            feats = [f + o.astype(f.dtype) for f, o in zip(feats, outs)]
            if i < 3:
                if merged:
                    img_f = scoped(
                        "image_backbone",
                        getattr(self.image_backbone, f"stage{i + 2}"),
                        feats[0], train, bn_masks[0])
                    lid_f, rad_f = lr_stage(f"stage{i + 2}", feats[1],
                                            feats[2], bn_masks[1])
                    feats = [img_f, lid_f, rad_f]
                else:
                    feats = [scoped(t, getattr(bb, f"stage{i + 2}"),
                                    f, train, m)
                             for t, bb, f, m in zip(tags, backbones, feats,
                                                    bn_masks)]

        tracks = [_unflatten_bt(global_avg_pool(f), B).astype(jnp.float32)
                  for f in feats]                      # 3 x (B, T, 512)

        if cfg.TFM:
            fused = self.time_mamba(*tracks, gps_feats)
        else:
            fused = (sum(t.sum(axis=1) for t in tracks)
                     + gps_feats.sum(axis=1))          # token-sum head
        if return_stage1:
            return fused, stage1_feats
        return fused
