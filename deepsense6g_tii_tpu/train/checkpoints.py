"""Checkpointing + the JSON run record.

Mirrors the reference artifact layout (train2_seq.py:254-289):
  final_model.msgpack   — params+batch_stats every epoch  (: final_model.pth)
  best_model.msgpack    — on new best val DBA             (: best_model.pth)
  best_optim.msgpack    — optimizer+EMA state at the best (: best_optim.pth)
  recent.log            — JSON training record, same keys
plus resume-from-logdir (train2_seq.py:558-583).  Serialization is flax
msgpack (host-independent, no framework pickle).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import flax.serialization
import jax


def _write(path: str, tree: Any) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(
            jax.tree_util.tree_map(lambda x: jax.device_get(x), tree)))
    os.replace(tmp, path)


def _read(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(target, f.read())


def save_model(logdir: str, name: str, params, batch_stats) -> str:
    path = os.path.join(logdir, f"{name}.msgpack")
    _write(path, {"params": params, "batch_stats": batch_stats})
    return path


def load_model(logdir: str, name: str, params, batch_stats):
    path = os.path.join(logdir, f"{name}.msgpack")
    out = _read(path, {"params": params, "batch_stats": batch_stats})
    return out["params"], out["batch_stats"]


def save_optim(logdir: str, name: str, opt_state, ema_params) -> str:
    path = os.path.join(logdir, f"{name}.msgpack")
    _write(path, {"opt_state": opt_state, "ema_params": ema_params})
    return path


def load_optim(logdir: str, name: str, opt_state, ema_params):
    path = os.path.join(logdir, f"{name}.msgpack")
    out = _read(path, {"opt_state": opt_state, "ema_params": ema_params})
    return out["opt_state"], out["ema_params"]


def write_run_record(logdir: str, record: Dict) -> None:
    """recent.log with the reference's exact schema (train2_seq.py:264-279)."""
    with open(os.path.join(logdir, "recent.log"), "w") as f:
        f.write(json.dumps(record))


def read_run_record(logdir: str) -> Optional[Dict]:
    path = os.path.join(logdir, "recent.log")
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)


def write_args(logdir: str, args: Dict) -> None:
    """args.txt JSON dump (train2_seq.py:597-599)."""
    with open(os.path.join(logdir, "args.txt"), "w") as f:
        json.dump(args, f, indent=2)


class ScalarLogger:
    """Scalar stream: JSONL of (tag, step, value) + TensorBoard event files.

    The reference logs train/val loss, per-k accuracy, per-scenario DBA to
    a SummaryWriter (train2_seq.py:70,145-148,205-215); this writes the same
    scalars to ``scalars.jsonl`` (machine-friendly) and to a real
    ``events.out.tfevents.*`` file in the run dir via the dependency-free
    writer in utils/tb_events.py.  Pass ``tensorboard=False`` (or set
    DEEPSENSE_TENSORBOARD=0) to skip the event file.
    """

    def __init__(self, logdir: str, tensorboard: Optional[bool] = None):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self._tb = None
        if tensorboard is None:
            tensorboard = os.environ.get("DEEPSENSE_TENSORBOARD", "1") != "0"
        if tensorboard:
            from ..utils.tb_events import EventFileWriter
            self._tb = EventFileWriter(logdir)

    def scalar(self, tag: str, value, step: int) -> None:
        self._f.write(json.dumps(
            {"tag": tag, "step": int(step), "value": float(value)}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.scalar(tag, float(value), int(step))

    def scalars(self, tag: str, values: Dict[str, Any], step: int) -> None:
        for k, v in values.items():
            self.scalar(f"{tag}/{k}", v, step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
