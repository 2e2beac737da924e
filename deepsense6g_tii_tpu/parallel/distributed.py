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
* Single-process runs (env unset, no TPU pod metadata) are a no-op, so the
  training CLI can call it unconditionally (cli/train.py --distributed 1).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Idempotent ``jax.distributed.initialize``.

    Returns True when a multi-process runtime was (or already is) set up,
    False for the single-process no-op.  Must run before the first jax
    backend use in the process.
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
    if coordinator_address is None and not on_pod:
        return False        # single-process: nothing to do

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True


def process_info() -> dict:
    """Process/device topology of the current runtime (for logging)."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
