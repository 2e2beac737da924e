"""Modality-rebuild training subsystem (L4).

Functional port of modality_rebuild/train_image_radar_lidar_rebuild.py and
train_mambafuser_modality_rebuild.py: frozen per-modality stage-1 features
feed ProjectHeads whose outputs split into shared/specific halves; losses are

  total = alpha_trans * MSE(FeatureTrans(cat(source shared)), target_l1)
        + alpha_contrast * NT-Xent over shared pairs / 3
        + alpha_distance * (-MSE) over specific pairs / 3
        + alpha_fusion * focal loss through the full fuser with the
          translated features injected via the encoder rebuild hook

with the fusion model trained at lr 1e-6 while the heads train at the
scheduled base lr (train_image_radar_lidar_rebuild.py:742-758) — realized
with optax.multi_transform inside one jitted step instead of torch param
groups.  At eval, ``rebuild_features`` synthesizes the missing modality's
stage-1 features from the sources (lines 532-563).

The reference freezes *copies* of the stem+stage1 encoders loaded from a
split checkpoint (my_test.py); ``RebuildState`` carries the same frozen
copies (``frozen_params``/``frozen_stats``, captured at ``init_state`` from
the pretrained fusion checkpoint) and the stage-1 tap grafts them over the
live tree, so the translation/contrastive targets stay constant while the
fusion model itself trains at lr 1e-6 — exactly the reference boundary
(``split_encoder_checkpoint`` still provides the my_test equivalent for
interop).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import GlobalConfig
from ..train.losses import focal_loss
from .heads import FeatureTrans, ProjectHead
from .losses import contrastive_loss, distance_loss, translation_loss

MODALITIES = ("image", "lidar", "radar")


class RebuildHeads(nn.Module):
    """The three ProjectHeads + FeatureTrans as one module."""

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray],
                 source_domain: Sequence[str], train: bool = False):
        """feats: modality -> (N, spatial, 64) frozen stage-1 features.

        Returns (projections dict, translated target features).
        """
        proj = {m: ProjectHead(name=f"{m}_projection_l1")(f, train=train)
                for m, f in feats.items()}
        shared = {m: p[..., : p.shape[-1] // 2] for m, p in proj.items()}
        source = jnp.concatenate([shared[m] for m in source_domain], axis=-1)
        s2t = FeatureTrans(name="feat_trans_l1")(source, train=train)
        return proj, s2t


@flax.struct.dataclass
class RebuildState:
    head_params: Dict
    head_stats: Dict
    fusion_params: Dict
    fusion_stats: Dict
    # Frozen stem+stage1 copies (the reference's split-checkpoint encoders,
    # my_test.py): the stage-1 tap that produces translation/contrastive
    # targets always runs under these, never the trainable fusion_params.
    frozen_params: Dict
    frozen_stats: Dict
    opt_state: optax.OptState
    step: jnp.ndarray


_FROZEN_ENCODERS = ("image_encoder", "lidar_encoder", "radar_encoder")
_FROZEN_STAGES = ("stem", "stage1")


def _extract_frozen(tree: Dict) -> Dict:
    """Pulls the stem+stage1 subtrees out of a fuser variables tree."""
    enc = tree.get("encoder", {})
    return {name: {s: enc[name][s] for s in _FROZEN_STAGES if s in enc[name]}
            for name in _FROZEN_ENCODERS if name in enc}


def _graft_frozen(tree: Dict, frozen: Dict) -> Dict:
    """Returns ``tree`` with the frozen stem+stage1 subtrees swapped in."""
    if not frozen or "encoder" not in tree:
        return tree
    tree = dict(tree)
    enc = dict(tree["encoder"])
    for name, stages in frozen.items():
        sub = dict(enc[name])
        sub.update(stages)
        enc[name] = sub
    tree["encoder"] = enc
    return tree


@dataclasses.dataclass
class RebuildOptions:
    source_domain: Tuple[str, ...] = ("lidar", "radar")
    target_domain: str = "image"
    alpha_trans: float = 1.0
    alpha_contrast: float = 1.0
    alpha_distance: float = 1.0
    alpha_fusion: float = 1.0
    temp: float = 0.1                 # NT-Xent temperature (--temp)
    lr: float = 1e-4
    fusion_lr: float = 1e-6
    weight_decay: float = 1e-4
    seed: int = 100


def make_rebuild_optimizer(opts: RebuildOptions):
    return optax.multi_transform(
        {"heads": optax.inject_hyperparams(optax.adamw)(
            learning_rate=opts.lr, weight_decay=opts.weight_decay),
         "fusion": optax.adamw(opts.fusion_lr,
                               weight_decay=opts.weight_decay)},
        {"heads": "heads", "fusion": "fusion"})


def _set_heads_lr(opt_state, lr):
    """Functionally replaces the injected heads learning rate inside the
    multi_transform state."""
    inner = dict(opt_state.inner_states)
    hs = inner["heads"]
    wrapped = hs.inner_state if hasattr(hs, "inner_state") else hs
    hp = dict(wrapped.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    new_wrapped = wrapped._replace(hyperparams=hp)
    inner["heads"] = (hs._replace(inner_state=new_wrapped)
                      if hasattr(hs, "inner_state") else new_wrapped)
    return opt_state._replace(inner_states=inner)


class RebuildTrainer:
    """Owns the heads + a fusion model; provides jitted train/rebuild/eval.

    ``mesh``: a ('data',) device mesh enables data-parallel rebuild training
    (the reference trains this subsystem under 8 DataParallel module groups,
    train_image_radar_lidar_rebuild.py:721-728): the state replicates, each
    batch shards over the mesh via :meth:`shard`, and GSPMD partitions the
    jitted steps (incl. the batch-coupled NT-Xent similarity matrix).
    Default ``None`` keeps single-device placement."""

    def __init__(self, fusion_model, cfg: GlobalConfig, opts: RebuildOptions,
                 mesh=None):
        if cfg.modality_missing != opts.target_domain:
            raise ValueError(
                "config.modality_missing must equal the rebuild target "
                f"({opts.target_domain!r}) so the encoder injects the "
                "rebuilt features")
        self.fusion_model = fusion_model
        self.heads = RebuildHeads()
        self.cfg = cfg
        self.opts = opts
        self.mesh = mesh
        self.tx = make_rebuild_optimizer(opts)
        self.train_step = self._build_train_step()
        self.rebuild_features = self._build_eval_rebuild()
        self.eval_step = self._build_eval_step()

    # -- device placement ------------------------------------------------------

    def shard(self, batch: Dict) -> Dict:
        """Host batch -> device batch.  With a mesh, batch-sharded when the
        row count divides the device count, replicated otherwise (rebuild
        losses are batch-coupled — NT-Xent over all pairs — so ragged
        batches are not padded/masked like the main engine's)."""
        arrs = {k: np.asarray(v) for k, v in batch.items()
                if k != "scenario"}
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in arrs.items()}
        from ..parallel.mesh import replicate, shard_batch
        n = next(iter(arrs.values())).shape[0]
        if n % self.mesh.devices.size == 0:
            return shard_batch(arrs, self.mesh)
        return replicate(arrs, self.mesh)

    # -- state ---------------------------------------------------------------

    def init_state(self, fusion_variables: Dict, batch: Dict) -> RebuildState:
        feats = self._frozen_stage1(fusion_variables["params"],
                                    fusion_variables["batch_stats"], batch)
        hv = self.heads.init(jax.random.PRNGKey(self.opts.seed), feats,
                             self.opts.source_domain)
        opt_params = {"heads": hv["params"],
                      "fusion": fusion_variables["params"]}
        state = RebuildState(
            head_params=hv["params"],
            head_stats=hv.get("batch_stats", {}),
            fusion_params=fusion_variables["params"],
            fusion_stats=fusion_variables.get("batch_stats", {}),
            frozen_params=_extract_frozen(fusion_variables["params"]),
            frozen_stats=_extract_frozen(
                fusion_variables.get("batch_stats", {})),
            opt_state=self.tx.init(opt_params),
            step=jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            from ..parallel.mesh import replicate
            state = replicate(state, self.mesh)
        return state

    # -- internals -----------------------------------------------------------

    def _frozen_stage1(self, fusion_params, fusion_stats, batch,
                       frozen_params=None, frozen_stats=None):
        """(modality -> (B*T, spatial, 64)) frozen stage-1 features.

        When ``frozen_params``/``frozen_stats`` are given (the checkpoint-time
        copies carried in RebuildState), they are grafted over the live tree
        so the tap matches the reference's truly frozen encoders — constant
        targets even as the fusion model trains at lr 1e-6."""
        _, feats = self.fusion_model.apply(
            {"params": _graft_frozen(fusion_params, frozen_params or {}),
             "batch_stats": _graft_frozen(fusion_stats, frozen_stats or {})},
            batch["image"], batch["lidar"], batch["radar"], batch["gps"],
            method=self.fusion_model.encode_stage1)
        out = {}
        for m, f in zip(MODALITIES, feats):
            n, h, w, c = f.shape
            out[m] = jax.lax.stop_gradient(f.reshape(n, h * w, c))
        return out

    def _build_train_step(self):
        opts = self.opts
        cfg = self.cfg
        base_rng = jax.random.PRNGKey(opts.seed)

        def loss_fn(opt_params, head_stats, fusion_stats, batch, rngs,
                    frozen_params, frozen_stats):
            fusion_vars = {"params": opt_params["fusion"],
                           "batch_stats": fusion_stats}
            feats = self._frozen_stage1(opt_params["fusion"], fusion_stats,
                                        batch, frozen_params, frozen_stats)
            (proj, s2t), mut = self.heads.apply(
                {"params": opt_params["heads"], "batch_stats": head_stats},
                feats, opts.source_domain, train=True,
                mutable=["batch_stats"], rngs=rngs)

            shared = {m: p[..., : p.shape[-1] // 2] for m, p in proj.items()}
            spec = {m: p[..., p.shape[-1] // 2:] for m, p in proj.items()}
            pairs = (("image", "lidar"), ("image", "radar"),
                     ("lidar", "radar"))
            l_con = sum(contrastive_loss(shared[a], shared[b], cfg.seq_len,
                                         temperature=opts.temp)
                        for a, b in pairs) / 3.0
            l_dis = sum(distance_loss(spec[a], spec[b])
                        for a, b in pairs) / 3.0
            l_trans = translation_loss(s2t, feats[opts.target_domain])

            n, hw, c = s2t.shape
            side = int(np.sqrt(hw))
            rebuild = s2t.reshape(n, side, side, c)
            # Fusion forward in EVAL mode (frozen BN stats).  The reference's
            # mode handling is accidental: validate() calls .eval() on the
            # fusion model and heads and nothing restores .train()
            # (train_image_radar_lidar_rebuild.py:447-451 vs 292-294), so the
            # reference runs train-mode only during epoch 0 and eval mode for
            # every later epoch.  Eval mode is also the only coherent choice
            # here: the stage-1 features are the translation *targets*, and
            # letting the fusion BN stats move would shift those targets
            # under the translator every step.
            logits = self.fusion_model.apply(
                fusion_vars, batch["image"], batch["lidar"], batch["radar"],
                batch["gps"], rebuild_feats=rebuild, train=False, rngs=rngs)
            l_fus = focal_loss(logits, batch["beam"])

            total = (opts.alpha_trans * l_trans
                     + opts.alpha_contrast * l_con
                     + opts.alpha_distance * l_dis
                     + opts.alpha_fusion * l_fus)
            aux = {"loss": total, "trans": l_trans, "contrast": l_con,
                   "distance": l_dis, "fusion": l_fus,
                   "head_stats": mut["batch_stats"]}
            return total, aux

        @jax.jit
        def step(state: RebuildState, batch, lr):
            rngs = {"dropout": jax.random.fold_in(base_rng, state.step),
                    "rebuild": jax.random.fold_in(base_rng, state.step + 1)}
            if cfg.modality_missing_type == "randlike":
                # randlike missing substitutes fresh random tensors at the
                # fusion input every forward (mambafuser_seq.py:361-391)
                rngs["missing"] = jax.random.fold_in(base_rng, state.step + 2)
            opt_params = {"heads": state.head_params,
                          "fusion": state.fusion_params}
            grads, aux = jax.grad(loss_fn, has_aux=True)(
                opt_params, state.head_stats, state.fusion_stats, batch, rngs,
                state.frozen_params, state.frozen_stats)
            opt_state = _set_heads_lr(state.opt_state, lr)
            updates, opt_state = self.tx.update(grads, opt_state, opt_params)
            new_params = optax.apply_updates(opt_params, updates)
            return state.replace(
                head_params=new_params["heads"],
                head_stats=aux.pop("head_stats"),
                fusion_params=new_params["fusion"],
                opt_state=opt_state,
                step=state.step + 1), aux

        return step

    def _build_eval_rebuild(self):
        opts = self.opts

        @jax.jit
        def rebuild(state: RebuildState, batch):
            feats = self._frozen_stage1(state.fusion_params,
                                        state.fusion_stats, batch,
                                        state.frozen_params,
                                        state.frozen_stats)
            src = {m: feats[m] for m in opts.source_domain}
            _, s2t = self.heads.apply(
                {"params": state.head_params,
                 "batch_stats": state.head_stats},
                src, opts.source_domain, train=False)
            n, hw, c = s2t.shape
            side = int(np.sqrt(hw))
            return s2t.reshape(n, side, side, c)

        return rebuild

    def _build_eval_step(self):
        cfg = self.cfg
        base_rng = jax.random.PRNGKey(self.opts.seed)

        @jax.jit
        def eval_step(state: RebuildState, batch, batch_idx=0):
            rebuild = self.rebuild_features(state, batch)
            rngs = None
            if cfg.modality_missing_type == "randlike":
                # fresh substitute noise per eval batch, as torch.rand_like
                # draws per forward (mambafuser_seq.py:361-391)
                key = jax.random.fold_in(base_rng, state.step)
                rngs = {"missing": jax.random.fold_in(key, batch_idx)}
            logits = self.fusion_model.apply(
                {"params": state.fusion_params,
                 "batch_stats": state.fusion_stats},
                batch["image"], batch["lidar"], batch["radar"], batch["gps"],
                rebuild_feats=rebuild, train=False, rngs=rngs)
            out = {"ranks": jnp.argsort(logits, axis=-1, descending=True)}
            if "beam" in batch:
                out["loss"] = focal_loss(logits, batch["beam"])
            return out

        return eval_step


def split_encoder_checkpoint(params: Dict) -> Dict[str, Dict]:
    """my_test.py equivalent: extracts the three per-modality stem+stage1
    subtrees from full fuser params (for standalone frozen encoders)."""
    out = {}
    for name in ("image_encoder", "lidar_encoder", "radar_encoder"):
        bb = params["encoder"][name]
        out[name] = {"stem": bb["stem"], "stage1": bb["stage1"]}
    return out
