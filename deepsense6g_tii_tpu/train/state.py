"""Functional train state.

Carries everything the reference keeps as Python-object mutable state —
model params, BatchNorm running stats, AdamW optimizer state, the EMA shadow
weights (train2_seq.py:303-334) and the step counter — as one device-resident
PyTree, so a whole optimization step is a single jitted, donated function and
EMA never round-trips to host (SURVEY.md section 5.8).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any          # EMA shadow (== params when EMA disabled)
    step: jnp.ndarray


def make_optimizer(weight_decay: float = 0.01) -> optax.GradientTransformation:
    """AdamW with injectable learning rate (torch AdamW defaults: betas
    (0.9, 0.999), eps 1e-8, wd 0.01, applied to all params — the reference's
    decay/no-decay split is dead code, SURVEY.md section 2a #19)."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=0.0, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=weight_decay)


def create_train_state(variables: dict,
                       tx: Optional[optax.GradientTransformation] = None
                       ) -> TrainState:
    tx = tx or make_optimizer()
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        step=jnp.zeros((), jnp.int32),
    )


def set_learning_rate(opt_state, lr):
    """Returns opt_state with the injected learning rate replaced (works
    inside jit: hyperparams live in the state PyTree)."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)
