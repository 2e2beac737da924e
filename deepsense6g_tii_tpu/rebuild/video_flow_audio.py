"""EPIC-KITCHENS video/flow/audio cross-modal-translation experiment (SimMMDG).

TPU-native, runnable implementation of the recipe in
modality_rebuild/train_video_flow_audio.py (614 lines).  The reference file is
not runnable in the reference repo itself — ``init_recognizer``,
``EPICDOMAIN``, ``AVENet`` and ``SupConLoss`` are referenced without imports
or definitions (train_video_flow_audio.py:271-296,306,363,438) and its
EPIC-KITCHENS dataset is outside the DeepSense6G distribution — so this
module implements the *trainable* part of the experiment exactly, operating
on pre-extracted backbone features, which is also what the reference trains
on: every backbone call happens under ``torch.no_grad()`` and is
``.detach()``-ed (train_video_flow_audio.py:19-40).

Per train_one_step (train_video_flow_audio.py:10-137), the step is:

1. per-modality embedding heads produce ``emd`` vectors (video 2304,
   flow 2048, audio 512 in the reference; configurable here),
2. classification CE over the concatenated embeddings (lines 42-52),
3. cross-modal translation: an MLP per ordered modality pair, loss
   ``mean ||norm(trans(a)) - norm(b)||`` averaged over pairs (lines 55-103),
4. supervised contrastive (SupConLoss, Khosla et al.) over ProjectHead
   projections of the *shared* (first) half of each embedding, views stacked
   per sample (lines 105-121),
5. feature splitting: ``-MSE(shared_half, specific_half)`` per modality
   (lines 123-135),

combined as ``ce + alpha_trans*trans + alpha_contrast*supcon +
explore_loss_coeff*split`` and optimized with Adam(lr, weight_decay=1e-4)
(line 387).  Here the whole step is one jitted XLA program.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import optax

# reference embedding widths (train_video_flow_audio.py:293-296,321-339)
DEFAULT_EMD_DIMS = {"video": 2304, "flow": 2048, "audio": 512}


# -- losses (pure, unit-testable) ---------------------------------------------

def supcon_loss(features: jnp.ndarray, labels: jnp.ndarray,
                temperature: float = 0.1,
                base_temperature: float = 0.07) -> jnp.ndarray:
    """Supervised contrastive loss (Khosla et al. 2020), the ``SupConLoss``
    the reference calls at train_video_flow_audio.py:363,121.

    features: (B, n_views, D) — one row per sample, one view per modality
    projection; L2-normalized internally.  labels: (B,) ints.  The
    canonical implementation scales by temperature/base_temperature
    (base 0.07), which the reference inherits via SupConLoss(temp).
    """
    B, V, _ = features.shape
    f = features / jnp.maximum(
        jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
    f = f.reshape(B * V, -1)      # sample-major rows; anchor = all views
    lab = jnp.repeat(labels, V)
    logits = f @ f.T / temperature
    # numerical stability: subtract the rowwise max (self-sim / temperature)
    logits = logits - jax.lax.stop_gradient(logits.max(axis=1, keepdims=True))
    eye = jnp.eye(B * V, dtype=bool)
    pos_mask = (lab[:, None] == lab[None, :]) & ~eye
    exp = jnp.where(eye, 0.0, jnp.exp(logits))
    log_prob = logits - jnp.log(jnp.maximum(exp.sum(axis=1, keepdims=True),
                                            1e-12))
    n_pos = jnp.maximum(pos_mask.sum(axis=1), 1)
    mean_log_prob_pos = (pos_mask * log_prob).sum(axis=1) / n_pos
    return -(temperature / base_temperature) * mean_log_prob_pos.mean()


def normalized_translation_loss(pred: jnp.ndarray,
                                target: jnp.ndarray) -> jnp.ndarray:
    """``mean ||norm(pred) - norm(target)||_2`` — the reference's per-pair
    translation term (train_video_flow_audio.py:63-75)."""
    p = pred / jnp.maximum(jnp.linalg.norm(pred, axis=1, keepdims=True), 1e-12)
    t = target / jnp.maximum(jnp.linalg.norm(target, axis=1, keepdims=True),
                             1e-12)
    return jnp.linalg.norm(p - t, axis=1).mean()


def feature_split_loss(emd: jnp.ndarray) -> jnp.ndarray:
    """``-MSE(shared_half, specific_half)`` (train_video_flow_audio.py:125-131)
    — pushes the two halves of the embedding apart."""
    half = emd.shape[1] // 2
    return -jnp.mean((emd[:, :half] - emd[:, half:]) ** 2)


# -- modules -------------------------------------------------------------------

class _MLP(nn.Module):
    """Linear-ReLU stack: the reference's Encoder / EncoderTrans / ProjectHead
    are all this shape (train_video_flow_audio.py:178-226)."""

    features: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"fc{i + 1}")(x)
            if i + 1 < len(self.features):
                x = nn.relu(x)
        return x


class VFAHeads(nn.Module):
    """All trainable pieces of the SimMMDG step as one module: embedding
    heads, the classifier, pairwise translators and contrastive projectors."""

    modalities: Tuple[str, ...] = ("video", "flow", "audio")
    emd_dims: Tuple[int, ...] = (2304, 2048, 512)
    n_classes: int = 8                      # Encoder out_dim=8 (line 179)
    hidden_dim: int = 2048                  # --hidden_dim (line 242)
    trans_hidden: int = 2048                # --trans_hidden_num (line 241)
    proj_dim: int = 128                     # --out_dim (line 243)

    def setup(self):
        dims = dict(zip(self.modalities, self.emd_dims))
        self.emd_heads = {m: _MLP((self.hidden_dim, dims[m]),
                                  name=f"{m}_emd") for m in self.modalities}
        self.cls = _MLP((512, self.n_classes), name="mlp_cls")
        self.trans = {
            f"{a}2{b}": _MLP((self.trans_hidden, dims[b]), name=f"mlp_{a}2{b}")
            for a, b in itertools.permutations(self.modalities, 2)}
        self.projs = {m: _MLP((self.hidden_dim, self.proj_dim),
                              name=f"{m}_proj") for m in self.modalities}

    def __call__(self, feats: Dict[str, jnp.ndarray]):
        """feats: modality -> (B, feat_dim) frozen backbone features.

        Returns (logits, emds, translations, projections)."""
        order = [m for m in self.modalities if m in feats]
        emds = {m: self.emd_heads[m](feats[m]) for m in order}
        logits = self.cls(jnp.concatenate([emds[m] for m in order], axis=1))
        trans = {f"{a}2{b}": self.trans[f"{a}2{b}"](emds[a])
                 for a, b in itertools.permutations(order, 2)}
        projs = jnp.stack(
            [self.projs[m](emds[m][:, : emds[m].shape[1] // 2])
             for m in order], axis=1)       # (B, n_modalities, proj_dim)
        return logits, emds, trans, projs


@flax.struct.dataclass
class VFAState:
    params: Dict
    opt_state: optax.OptState
    step: jnp.ndarray


@dataclasses.dataclass
class VFAOptions:
    """The reference flag surface that reaches the math
    (train_video_flow_audio.py:228-260)."""

    modalities: Tuple[str, ...] = ("video", "flow", "audio")
    emd_dims: Tuple[int, ...] = (2304, 2048, 512)
    n_classes: int = 8
    lr: float = 1e-4
    alpha_trans: float = 0.1
    alpha_contrast: float = 3.0
    explore_loss_coeff: float = 0.7
    temp: float = 0.1
    hidden_dim: int = 2048
    trans_hidden: int = 2048
    proj_dim: int = 128
    seed: int = 0


class VFATrainer:
    """Jitted train/eval steps for the video/flow/audio experiment."""

    def __init__(self, opts: VFAOptions = VFAOptions()):
        self.opts = opts
        self.heads = VFAHeads(
            modalities=opts.modalities, emd_dims=opts.emd_dims,
            n_classes=opts.n_classes, hidden_dim=opts.hidden_dim,
            trans_hidden=opts.trans_hidden, proj_dim=opts.proj_dim)
        # torch.optim.Adam(lr, weight_decay=1e-4) (line 387) couples the
        # L2 term INTO the gradient before the moment updates — optax's
        # adamw (decoupled) is a different and much weaker regularizer at
        # this lr.  Chain order reproduces torch Adam exactly.
        self.tx = optax.chain(optax.add_decayed_weights(1e-4),
                              optax.scale_by_adam(),
                              optax.scale(-opts.lr))
        self.train_step = self._build_train_step()
        self.eval_step = self._build_eval_step()

    def init_state(self, feats: Dict[str, jnp.ndarray]) -> VFAState:
        params = self.heads.init(
            jax.random.PRNGKey(self.opts.seed), feats)["params"]
        return VFAState(params=params, opt_state=self.tx.init(params),
                        step=jnp.zeros((), jnp.int32))

    def _losses(self, params, feats, labels):
        opts = self.opts
        logits, emds, trans, projs = self.heads.apply({"params": params},
                                                      feats)
        order = [m for m in opts.modalities if m in feats]
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        pairs = list(itertools.permutations(order, 2))
        l_trans = sum(normalized_translation_loss(trans[f"{a}2{b}"], emds[b])
                      for a, b in pairs) / max(len(pairs), 1)
        l_con = supcon_loss(projs, labels, opts.temp)
        l_split = sum(feature_split_loss(emds[m])
                      for m in order) / len(order)
        total = (ce + opts.alpha_trans * l_trans
                 + opts.alpha_contrast * l_con
                 + opts.explore_loss_coeff * l_split)
        return total, {"loss": total, "ce": ce, "trans": l_trans,
                       "contrast": l_con, "split": l_split, "logits": logits}

    def _build_train_step(self):
        @jax.jit
        def step(state: VFAState, feats, labels):
            grads, aux = jax.grad(
                lambda p: self._losses(p, feats, labels), has_aux=True
            )(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return VFAState(params=params, opt_state=opt_state,
                            step=state.step + 1), aux

        return step

    def _build_eval_step(self):
        @jax.jit
        def step(state: VFAState, feats):
            logits, *_ = self.heads.apply({"params": state.params}, feats)
            return jnp.argmax(logits, axis=-1)

        return step
