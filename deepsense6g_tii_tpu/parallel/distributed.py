"""Multi-host (DCN) initialization.

The reference's only distribution mechanism is single-process
``torch.nn.DataParallel`` (train2_seq.py:538).  This framework's data
parallelism is a 1-D ``('data',)`` mesh (parallel/mesh.py); the SAME jitted
train step spans hosts once ``jax.distributed.initialize`` has run — each
process contributes its local chips to the global mesh, ``jax.devices()``
returns all of them, and XLA routes the gradient all-reduce over ICI within
a host and DCN across hosts.

``initialize()`` is a thin, idempotent wrapper:

* On Cloud TPU pods the coordinator/process count/index all come from the
  TPU metadata — call with no arguments.
* Elsewhere pass them explicitly or via env (``DEEPSENSE_COORDINATOR``,
  ``DEEPSENSE_NUM_PROCESSES``, ``DEEPSENSE_PROCESS_ID``).
* ``require=True`` (what ``cli/train.py --multihost 1`` passes) skips the
  env gate and calls ``jax.distributed.initialize()`` unconditionally,
  keeping jax's own cluster auto-detection (SLURM, Open MPI, GKE, Cloud
  TPU metadata); the gated auto mode is for library code that must no-op
  in single-process runs.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               require: bool = False) -> bool:
    """Idempotent ``jax.distributed.initialize``.

    Returns True when a multi-process runtime was (or already is) set up,
    False for the single-process no-op.  Must run before the first jax
    backend use in the process.  ``require=True`` (the user explicitly
    asked for multi-host) bypasses the single-process gate and defers to
    jax's full cluster auto-detection — a mis-detected environment then
    errors loudly instead of silently training N duplicate single-process
    runs.
    """
    global _initialized
    if _initialized:
        return True

    coordinator_address = coordinator_address or os.environ.get(
        "DEEPSENSE_COORDINATOR")
    env_np = os.environ.get("DEEPSENSE_NUM_PROCESSES")
    env_id = os.environ.get("DEEPSENSE_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None)
    process_id = process_id if process_id is not None else (
        int(env_id) if env_id else None)

    on_pod = any(k in os.environ for k in
                 ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))
    if not require and coordinator_address is None and not on_pod:
        return False        # single-process: nothing to do

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True


def barrier(tag: str) -> None:
    """Cross-process sync point; no-op in single-process runs."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


def broadcast_str(s: str, max_len: int = 1024) -> str:
    """Process 0's string wins on every process (no-op single-process).
    Used to pin run-scoped paths (e.g. a timestamped logdir) that each
    process would otherwise derive independently."""
    if jax.process_count() == 1:
        return s
    import numpy as np
    from jax.experimental import multihost_utils
    buf = np.zeros(max_len, np.uint8)
    b = s.encode()[:max_len]
    buf[:len(b)] = np.frombuffer(b, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out).rstrip(b"\x00").decode()


def process_info() -> dict:
    """Process/device topology of the current runtime (for logging)."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
