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

import atexit
import json
import os
import queue
import threading
from typing import Any, Dict, Optional

import flax.serialization
import jax
import numpy as np


class AsyncWriter:
    """Background checkpoint writer: serialization + disk IO happen on a
    worker thread, off the training critical path.

    The caller must pass HOST arrays (device_get happens synchronously in
    ``_write``): the training loop donates its state buffers every step, so
    snapshotting must complete before the next dispatch — only the msgpack
    encode and file write are deferred.  Writes are FIFO per process
    (single worker), and ``flush()`` blocks until everything queued has
    landed — call it before reading back a file written this process
    (rollback-to-best does).  Write errors surface on the next save/flush.
    """

    def __init__(self):
        self._q: queue.Queue = queue.Queue()
        self._err: list = []
        self._t: Optional[threading.Thread] = None

    def _worker(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            path, data, encode = item
            try:
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(encode(data))
                os.replace(tmp, path)
            except BaseException as e:
                self._err.append(e)
            finally:
                self._q.task_done()

    def _submit(self, path: str, data: Any, encode) -> None:
        if self._t is None or not self._t.is_alive():
            self._t = threading.Thread(target=self._worker, daemon=True)
            self._t.start()
            atexit.register(self.flush)   # daemon thread: drain before exit
        # enqueue FIRST, then surface any deferred prior-write error — the
        # current checkpoint must not be dropped because an older unrelated
        # write failed
        self._q.put((path, data, encode))
        if self._err:
            raise self._err.pop(0)

    def submit(self, path: str, host_tree: Any) -> None:
        self._submit(path, host_tree, flax.serialization.to_bytes)

    def submit_json(self, path: str, record: Any) -> None:
        """Queue a small JSON artifact BEHIND pending binary writes (FIFO):
        used for the run record so it never points at weights that have not
        landed yet (crash consistency).  Same bytes as the sync path
        (reference recent.log format: bare json.dumps)."""
        self._submit(path, record, lambda r: json.dumps(r).encode())

    def flush(self) -> None:
        self._q.join()
        if self._err:
            raise self._err.pop(0)


_ASYNC = AsyncWriter()


def flush() -> None:
    """Blocks until all pending async checkpoint writes have landed."""
    _ASYNC.flush()


def _snapshot(x):
    """Host snapshot that never aliases the caller's buffer.

    ``jax.device_get`` copies across a real device link (TPU), but on the
    CPU backend it returns a ZERO-COPY view of the device buffer (verified:
    ``unsafe_buffer_pointer() == host.ctypes.data``) — if the next jitted
    step donates and reuses that buffer while the async writer is still
    serializing, the checkpoint bytes would tear silently.  Always land on a
    fresh np array; ``np.asarray(...).copy()`` is a no-op-cost second copy on
    TPU relative to the transfer and checkpoint saves are per-epoch."""
    if isinstance(x, np.ndarray):
        return x.copy()
    if isinstance(x, jax.Array):
        return np.asarray(jax.device_get(x)).copy()
    return x  # python scalars etc. are immutable


def _write(path: str, tree: Any, async_write: bool = False) -> None:
    host = jax.tree_util.tree_map(_snapshot, tree)
    if async_write:
        _ASYNC.submit(path, host)
        return
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(host))
    os.replace(tmp, path)


def _read(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(target, f.read())


def save_model(logdir: str, name: str, params, batch_stats,
               async_write: bool = False) -> str:
    path = os.path.join(logdir, f"{name}.msgpack")
    _write(path, {"params": params, "batch_stats": batch_stats}, async_write)
    return path


def load_model(logdir: str, name: str, params, batch_stats):
    path = os.path.join(logdir, f"{name}.msgpack")
    out = _read(path, {"params": params, "batch_stats": batch_stats})
    return out["params"], out["batch_stats"]


def save_optim(logdir: str, name: str, opt_state, ema_params,
               async_write: bool = False) -> str:
    path = os.path.join(logdir, f"{name}.msgpack")
    _write(path, {"opt_state": opt_state, "ema_params": ema_params},
           async_write)
    return path


def load_optim(logdir: str, name: str, opt_state, ema_params):
    path = os.path.join(logdir, f"{name}.msgpack")
    out = _read(path, {"opt_state": opt_state, "ema_params": ema_params})
    return out["opt_state"], out["ema_params"]


def write_run_record(logdir: str, record: Dict,
                     async_write: bool = False) -> None:
    """recent.log with the reference's exact schema (train2_seq.py:264-279).

    ``async_write`` queues it behind the pending checkpoint writes (FIFO),
    so the record on disk never references weights that have not landed."""
    path = os.path.join(logdir, "recent.log")
    if async_write:
        _ASYNC.submit_json(path, record)
        return
    with open(path, "w") as f:
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


class NullLogger:
    """No-op ScalarLogger stand-in for non-lead processes in multi-host
    runs (every process computes identical metrics; only process 0 writes
    the shared logdir)."""

    def scalar(self, tag, value, step) -> None:
        pass

    def scalars(self, tag, values, step) -> None:
        pass

    def close(self) -> None:
        pass
