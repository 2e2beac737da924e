"""True multi-process data parallelism over DCN-style process boundaries.

The reference's only distribution is single-process DataParallel
(train2_seq.py:538); this framework claims the same jitted step spans hosts
after ``jax.distributed.initialize`` (parallel/distributed.py).  These tests
actually RUN that: two OS processes, four virtual CPU devices each, a global
8-device ('data',) mesh with gloo cross-process collectives, training for
several steps through the production helpers — and the trajectory must match
the single-process 8-device run bit-for-bit in f32 tolerance.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int, timeout: float = 600.0, extra_args=()):
    """Launches nproc mp_worker.py ranks; returns their stdouts."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mp_worker.py"),
             str(pid), str(nproc), str(port), *extra_args],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    return outs


def _parse(out: str):
    losses = [float(m) for m in re.findall(r"STEP \d+ ([0-9.eE+-]+)", out)]
    psum = float(re.search(r"PSUM ([0-9.eE+-]+)", out).group(1))
    return losses, psum


def test_two_process_training_matches_single_process():
    outs = _run_workers(2)
    losses0, psum0 = _parse(outs[0])
    losses1, psum1 = _parse(outs[1])
    assert len(losses0) == 3

    # both ranks observe the identical global trajectory
    np.testing.assert_allclose(losses0, losses1, rtol=1e-6)
    assert abs(psum0 - psum1) / psum0 < 1e-6

    # reference: the same global batch on this process's own 8-device mesh
    # (conftest forces the 8-virtual-device CPU backend)
    import jax

    from deepsense6g_tii_tpu.config import GlobalConfig
    from deepsense6g_tii_tpu.parallel.mesh import (make_mesh, replicate,
                                                   shard_batch)
    from deepsense6g_tii_tpu.train.state import (create_train_state,
                                                 make_optimizer)
    from deepsense6g_tii_tpu.train.steps import make_train_step
    from synthetic_data import TinyFuser, jinit, make_batch

    cfg = GlobalConfig(compute_dtype="float32", use_pallas_scan=False)
    model = TinyFuser(cfg)
    batch = make_batch(np.random.default_rng(0), B=16, T=2, H=32, W=32)
    batch = {k: v for k, v in batch.items()
             if k in ("image", "lidar", "radar", "gps", "beam", "beamidx")}
    mesh = make_mesh()
    variables = jinit(model, batch["image"][:1], batch["lidar"][:1],
                      batch["radar"][:1], batch["gps"][:1])
    tx = make_optimizer()
    state = replicate(create_train_state(variables, tx), mesh)
    step = make_train_step(model, cfg, tx, use_ema=True)
    dev = shard_batch(batch, mesh)
    ref_losses = []
    for _ in range(3):
        state, m = step(state, dev, 1e-3)
        ref_losses.append(float(np.asarray(m["loss"])))
    ref_psum = float(sum(
        np.abs(np.asarray(x)).sum()
        for x in jax.tree_util.tree_leaves(state.params)))

    # cross-process gloo all-reduce vs single-program reduction ordering:
    # identical math, f32 rounding only
    np.testing.assert_allclose(losses0, ref_losses, rtol=1e-5)
    assert abs(psum0 - ref_psum) / ref_psum < 1e-5


def test_two_process_engine_loop(tmp_path):
    """The full Engine (train epochs with a sharded dataset, validation and
    test on identical data, checkpoint policy) across two processes sharing
    one logdir: metrics identical on both ranks, artifacts written exactly
    once (lead rank), test CSV row-complete."""
    logdir = str(tmp_path / "mplog")
    outs = _run_workers(2, extra_args=("engine", logdir))

    def lines(out, tag):
        return [ln for ln in out.splitlines() if ln.startswith(tag)]

    e0, e1 = lines(outs[0], "EPOCH"), lines(outs[1], "EPOCH")
    assert len(e0) == 2
    assert e0 == e1, f"rank metric divergence:\n{e0}\n{e1}"
    assert lines(outs[0], "BESTVAL") == lines(outs[1], "BESTVAL")

    import json
    rec = json.load(open(os.path.join(logdir, "recent.log")))
    assert rec["epoch"] == 2
    assert len(rec["DBA"]) == 2
    for f in ("final_model.msgpack", "best_model.msgpack", "scalars.jsonl"):
        assert os.path.exists(os.path.join(logdir, f)), f

    # test CSV: full 8 validation rows, written once by the lead rank
    pred = open(os.path.join(logdir, "beam_pred.csv")).read().strip()
    assert len(pred.split("\n")) == 1 + 8


def test_two_process_cli_multihost(tmp_path):
    """python -m ...cli.train --multihost 1 across two real processes:
    logdir broadcast, rank-gated shared cache build, per-process train
    shard with the split --batch_size, artifacts written by rank 0."""
    from synthetic_data import make_demo_root
    root = str(tmp_path / "dsroot")
    os.makedirs(root)
    make_demo_root(root, n_train=3, n_adapt=2, n_test=2, seq_len=2)
    logdir = str(tmp_path / "mh")

    outs = _run_workers(2, extra_args=("cli", root, logdir))
    rank0, rank1 = outs
    assert "train_set:" in rank0 and "train_set:" in rank1

    import json
    rec = json.load(open(os.path.join(logdir, "recent.log")))
    assert rec["epoch"] == 1
    assert os.path.exists(os.path.join(logdir, "final_model.msgpack"))
    assert os.path.exists(os.path.join(logdir, "args.txt"))
    # the shared cache was built exactly once and served both ranks
    assert os.path.exists(os.path.join(
        logdir + "_cache", "train", "manifest.json"))
