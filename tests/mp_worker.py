"""Worker process for test_multiprocess.py: one rank of a 2-process
jax.distributed CPU run (4 virtual devices each -> one global 8-device
('data',) mesh), training the tiny fuser for a few steps through the REAL
helpers (parallel.distributed.initialize, parallel.mesh process-aware
sharding, train.steps.make_train_step).

Prints one line per step: ``STEP <i> <loss>`` and finally
``PSUM <param checksum>``.  Invoked as:
    python mp_worker.py <process_id> <num_processes> <coordinator_port>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_LOCAL_DEVICES = 4
GLOBAL_BATCH = 16
STEPS = 3


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "step"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={N_LOCAL_DEVICES}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    # share the suite's persistent compile cache (conftest.py sets it at the
    # config level, which subprocesses don't inherit)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("DEEPSENSE_TEST_CACHE",
                                     "/tmp/jax_cache_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from deepsense6g_tii_tpu.parallel.distributed import (initialize,
                                                          process_info)
    assert initialize(coordinator_address=f"localhost:{port}",
                      num_processes=nproc, process_id=pid)
    info = process_info()
    assert info["process_count"] == nproc, info
    assert info["global_devices"] == nproc * N_LOCAL_DEVICES, info

    if mode == "engine":
        return engine_mode(sys.argv[5])
    if mode == "cli":
        return cli_mode(sys.argv[5], sys.argv[6])

    import numpy as np

    from deepsense6g_tii_tpu.config import GlobalConfig
    from deepsense6g_tii_tpu.parallel.mesh import (make_mesh, replicate,
                                                   shard_batch)
    from deepsense6g_tii_tpu.train.state import (create_train_state,
                                                 make_optimizer)
    from deepsense6g_tii_tpu.train.steps import make_train_step
    from synthetic_data import TinyFuser, jinit, make_batch

    cfg = GlobalConfig(compute_dtype="float32", use_pallas_scan=False)
    model = TinyFuser(cfg)
    # identical global batch in every process; each rank feeds its slice
    batch = make_batch(np.random.default_rng(0), B=GLOBAL_BATCH, T=2,
                       H=32, W=32)
    lo = pid * (GLOBAL_BATCH // nproc)
    local = {k: v[lo:lo + GLOBAL_BATCH // nproc]
             for k, v in batch.items()
             if k in ("image", "lidar", "radar", "gps", "beam", "beamidx")}

    mesh = make_mesh()
    assert mesh.devices.size == nproc * N_LOCAL_DEVICES
    variables = jinit(model, batch["image"][:1], batch["lidar"][:1],
                      batch["radar"][:1], batch["gps"][:1])
    tx = make_optimizer()
    state = replicate(create_train_state(variables, tx), mesh)
    step = make_train_step(model, cfg, tx, use_ema=True)

    def scalar(x):
        # replicated scalar of a cross-process global array: read the
        # locally-addressable replica
        return float(np.asarray(x.addressable_data(0)))

    dev = shard_batch(local, mesh)
    for i in range(STEPS):
        state, m = step(state, dev, 1e-3)
        print(f"STEP {i} {scalar(m['loss']):.8f}", flush=True)

    # params are replicated: the locally-addressable replica is the value
    # (device_get on a cross-process global array would need all shards)
    checksum = float(sum(
        np.abs(np.asarray(x.addressable_data(0))).sum()
        for x in jax.tree_util.tree_leaves(state.params)))
    print(f"PSUM {checksum:.6f}", flush=True)
    return 0


def engine_mode(logdir: str) -> int:
    """Full Engine loop on the 2-process mesh: sharded training data,
    identical validation/test data, lead-only artifact writes in a shared
    logdir.  Prints per-epoch ``EPOCH <e> TRAIN <dba> VAL <dba>`` lines
    (must be identical across ranks)."""
    import numpy as np

    from deepsense6g_tii_tpu.config import GlobalConfig
    from deepsense6g_tii_tpu.data.dataset import shard_for_process
    from deepsense6g_tii_tpu.data.loader import DataLoader
    from deepsense6g_tii_tpu.train import checkpoints as ckpt
    from deepsense6g_tii_tpu.train.engine import Engine, TrainOptions
    from synthetic_data import TinyFuser, make_batch

    cfg = GlobalConfig(compute_dtype="float32", use_pallas_scan=False)
    batch = make_batch(np.random.default_rng(0), B=22, T=2, H=32, W=32)
    samples = [{k: batch[k][i] for k in batch} for i in range(22)]
    train_set = shard_for_process(samples)          # 11 rows per rank
    val_set = samples[:8]                           # identical on all ranks

    # steps_per_dispatch=2 also exercises the stacked multi-step dispatch
    # (shard_stacked_batch + per-k metric extraction) across processes
    opts = TrainOptions(logdir=logdir, epochs=2, scheduler=False, ema=True,
                        lr=1e-3, steps_per_dispatch=2)
    engine = Engine(TinyFuser(cfg), cfg, opts)
    train_loader = DataLoader(train_set, 4, shuffle=True, num_workers=2)
    val_loader = DataLoader(val_set, 4, num_workers=2)
    for _ in range(2):
        tr = engine.train(train_loader)
        va = engine.validate(val_loader)
        engine.save()
        print(f"EPOCH {engine.cur_epoch} TRAIN {tr:.8f} VAL {va:.8f}",
              flush=True)
    engine.test(val_loader, out_dir=logdir)
    ckpt.flush()
    print(f"BESTVAL {engine.bestval:.8f}", flush=True)
    return 0


def cli_mode(data_root: str, logdir: str) -> int:
    """The real training CLI under --multihost: logdir broadcast, shared
    feature-cache build gating, per-process train-set shard + local batch
    size, lead-rank artifact writes.  jax.distributed is already initialized
    (main), so cli's initialize(require=True) is an idempotent no-op."""
    import deepsense6g_tii_tpu.models.fuser as fuser_mod
    from synthetic_data import TinyFuser
    fuser_mod.BeamFuser = TinyFuser       # tiny model, real everything else

    from deepsense6g_tii_tpu.cli import train as cli
    return cli.main([
        "--data_root", data_root, "--logdir", logdir,
        "--multihost", "1", "--epochs", "1", "--batch_size", "8",
        "--seq_len", "2", "--augmentation", "0", "--scheduler", "0",
        "--num_workers", "2", "--compute_dtype", "float32",
        "--cache_dir", logdir + "_cache"])


if __name__ == "__main__":
    raise SystemExit(main())
