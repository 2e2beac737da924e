"""Beam-prediction metrics: top-k accuracy and the DBA score.

Reference: compute_acc /root/reference/train2_seq.py:347-360,
compute_DBA_score /root/reference/train2_seq.py:363-383.  Both are provided as
vectorized NumPy (host-side epoch aggregation) and as jnp (inside eval steps).
The 30to5 multi-step variants flatten (N, pred_len, 64) rankings first
(train2_seq_30to5.py:345-370).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def compute_acc(y_pred: np.ndarray, y_true: np.ndarray,
                top_k: Sequence[int] = (1, 2, 3)) -> np.ndarray:
    """Top-k hit rates in percent, rounded to 4 decimals.

    y_pred: (N, num_beams) beam indices sorted by descending score.
    y_true: (N,) ground-truth beam index.
    """
    y_pred = np.asarray(y_pred)
    y_true = np.asarray(y_true)
    if len(y_pred) != len(y_true):
        raise ValueError("Number of predicted beams does not match number of labels.")
    hits = y_pred[:, : max(top_k)] == y_true[:, None]
    return np.round(
        np.array([hits[:, :k].any(axis=1).mean() for k in top_k]) * 100, 4)


def compute_dba_score(y_pred: np.ndarray, y_true: np.ndarray,
                      max_k: int = 3, delta: float = 5.0) -> float:
    """Distance-based accuracy: mean over k<=max_k of
    1 - mean_i min_{j<=k} min(|pred_ij - true_i| / delta, 1)."""
    y_pred = np.asarray(y_pred, dtype=np.float64)
    y_true = np.asarray(y_true, dtype=np.float64)
    dist = np.minimum(np.abs(y_pred[:, :max_k] - y_true[:, None]) / delta, 1.0)
    # running minimum over the first k columns, per k
    run_min = np.minimum.accumulate(dist, axis=1)  # (N, max_k)
    yk = 1.0 - run_min.mean(axis=0)                # (max_k,)
    return float(yk.mean())


def compute_dba_score_jnp(y_pred: jnp.ndarray, y_true: jnp.ndarray,
                          max_k: int = 3, delta: float = 5.0) -> jnp.ndarray:
    dist = jnp.minimum(
        jnp.abs(y_pred[:, :max_k].astype(jnp.float32)
                - y_true[:, None].astype(jnp.float32)) / delta, 1.0)
    run_min = jax_cummin(dist, axis=1)
    return (1.0 - run_min.mean(axis=0)).mean()


def jax_cummin(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jax.lax.associative_scan(jnp.minimum, x, axis=axis)


def flatten_multistep(y_pred: np.ndarray, y_true: np.ndarray):
    """(N, pred_len, num_beams) rankings + (N, pred_len) labels -> flat 2-D/1-D,
    the 30to5 metric convention (train2_seq_30to5.py:345-370)."""
    n, p, b = y_pred.shape
    return y_pred.reshape(n * p, b), np.asarray(y_true).reshape(n * p)
