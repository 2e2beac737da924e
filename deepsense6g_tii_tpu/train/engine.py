"""The training engine: epoch driver, validation, test, checkpoint policy.

Functional equivalent of the reference ``Engine`` (train2_seq.py:71-289):
per-epoch train/validate loops with top-k + per-scenario DBA metrics,
best-model checkpointing keyed on validation DBA, optional
rollback-to-previous-best, finetune stream keyed on *train* DBA, EMA
validation weights, beam_pred.csv / confidence CSV export on test.

The device side is one jitted train step (steps.py) over a ('data',) mesh;
the engine only moves batches, accumulates rankings and writes artifacts.
"""

from __future__ import annotations

import csv
import dataclasses
import os
import queue
import threading
import time
from typing import Dict, Iterable, List, Optional

import jax
import numpy as np

from ..config import SCENARIOS, GlobalConfig
from ..parallel.mesh import (make_mesh, pad_to_multiple, replicate,
                             shard_batch, shard_stacked_batch,
                             spans_processes)
from . import checkpoints as ckpt
from .metrics import compute_acc, compute_dba_score, flatten_multistep
from .profiling import StepTimer
from .scheduler import cyclic_cosine_decay_lr
from .state import TrainState, create_train_state, make_optimizer
from .steps import (make_eval_step, make_multi_train_step,
                    make_train_step)

DEVICE_KEYS = ("image", "lidar", "radar", "gps", "beam", "beamidx",
               "rebuild_feats")


@dataclasses.dataclass
class TrainOptions:
    """The reference CLI surface that concerns the engine
    (train2_seq.py:30-60)."""

    logdir: str = "log/run"
    epochs: int = 50
    lr: float = 1e-4
    loss: str = "focal"              # 'focal' | 'ce'
    scheduler: bool = True
    ema: bool = False
    # shadow-weight decay (reference hard-codes 0.999, train2_seq.py:592);
    # configurable so short runs (e.g. tools/dba_regression.py) can use an
    # EMA horizon that fits their step count
    ema_decay: float = 0.999
    temp_coef: bool = True
    load_previous_best: bool = False
    finetune: bool = False
    clip_grad_norm: Optional[float] = None
    seed: int = 100
    prefetch: int = 2                # batches decoded+staged ahead (0 = off)
    # msgpack encode + disk write on a background thread (the device->host
    # snapshot stays synchronous — state buffers are donated every step);
    # loads flush pending writes first, so read-after-write is safe
    async_save: bool = True
    # optimizer steps fused into one device dispatch (lax.scan over stacked
    # batches).  >1 takes the host off the per-step critical path (the
    # reference dispatches eagerly per batch, train2_seq.py:94); ragged or
    # padded batches fall back to single-step dispatches.  Trajectory
    # equality with 1 is pinned by tests (TestTrainStep/TestEngineMultiStep).
    steps_per_dispatch: int = 1
    # gradient accumulation: forward/backward over K microbatches (batch
    # rows [i::K], scanned), ONE exactly-combined optimizer/EMA update —
    # activation memory scales with batch/K for effective batches that
    # don't fit at once.  Requires batch % (K * n_devices) == 0.  BN stats
    # chain per microbatch (standard grad-accum semantics); exactness vs
    # the manual weighted-average oracle is pinned by
    # tests/test_optimizer.py::TestGradAccum.
    grad_accum: int = 1
    # with steps_per_dispatch > 1 AND grad_accum > 1: build the dispatch as
    # ONE lax.scan over K*GA microbatches (conditional update every GA-th)
    # instead of a K-over-GA scan nest — identical trajectory (pinned by
    # tests/test_engine.py::test_flat_accum_matches_nested); trades per-step
    # while-loop overhead for a conditional in the loop body.  Measured A/B
    # on the Mamba flagship in NOTES_NEXT_ROUND.
    flatten_accum: bool = False


class Engine:
    def __init__(self, model, cfg: GlobalConfig, opts: TrainOptions,
                 mesh=None, init_batch=None):
        self.model = model
        self.cfg = cfg
        self.opts = opts
        self.mesh = mesh or make_mesh()
        # multi-host: every process runs the identical engine loop over its
        # own data shard; metrics are all-gathered so decisions (best model,
        # rollback) agree everywhere, and only the lead process writes the
        # (shared) logdir.  See shard_for_process / parallel/distributed.py.
        self._mp = spans_processes(self.mesh)
        self._lead = jax.process_index() == 0
        if self._mp:
            procs = [d.process_index for d in self.mesh.devices.flat]
            if procs != sorted(procs):
                raise ValueError(
                    "multi-host mesh devices must be grouped by process "
                    "(metric gathering assumes contiguous per-process rows)")
        self.logger = (ckpt.ScalarLogger(opts.logdir) if self._lead
                       else ckpt.NullLogger())
        # batch-shape granularity: per-process batches need only be a
        # multiple of the LOCAL device count (the global batch is their
        # process-order concatenation)
        self._n_shard = (sum(d.process_index == jax.process_index()
                             for d in self.mesh.devices.flat)
                         if self._mp else self.mesh.devices.size)

        self.cur_epoch = 0
        self.cur_iter = 0
        self.bestval = 0.0
        self.bestval_epoch = 0
        self.train_loss: List[float] = []
        self.val_loss: List[float] = []
        self.DBA: List[float] = []
        self.DBAft: List[float] = [0.0]      # finetune stream

        self.tx = make_optimizer(mu_dtype=cfg.opt_mu_dtype)
        step_kw = dict(loss_name=opts.loss, temp_coef=opts.temp_coef,
                       use_ema=opts.ema, ema_decay=opts.ema_decay,
                       clip_grad_norm=opts.clip_grad_norm,
                       rng_seed=opts.seed, grad_accum=opts.grad_accum)
        self.train_step = make_train_step(model, cfg, self.tx, **step_kw)
        self.multi_train_step = (
            make_multi_train_step(model, cfg, self.tx,
                                  flatten_accum=opts.flatten_accum,
                                  **step_kw)
            if opts.steps_per_dispatch > 1 else None)
        self.eval_step = make_eval_step(
            model, cfg, loss_name=opts.loss, temp_coef=opts.temp_coef,
            use_ema=opts.ema, rng_seed=opts.seed)
        # test() forwards with the raw weights: the reference's test() never
        # applies the EMA shadow — only validate() does (train2_seq.py:159-160
        # vs 224-252)
        self.test_step = (self.eval_step if not opts.ema else make_eval_step(
            model, cfg, loss_name=opts.loss, temp_coef=opts.temp_coef,
            use_ema=False, rng_seed=opts.seed))

        self.timer = StepTimer()
        self.state: Optional[TrainState] = None
        if init_batch is not None:
            self.init_state(init_batch)

    # -- state ---------------------------------------------------------------

    def init_state(self, batch: Dict) -> TrainState:
        rngs = {"params": jax.random.PRNGKey(self.opts.seed)}
        if self.cfg.modality_missing_type == "randlike" and \
                self.cfg.modality_missing is not None:
            rngs["missing"] = jax.random.PRNGKey(self.opts.seed + 1)
        # jitted init: one compiled program (persistent-cache friendly)
        # instead of thousands of eager op dispatches — eager full-model
        # init costs ~20 s on a 1-core host and minutes through a device
        # tunnel
        args = tuple(np.asarray(batch[k][:1])
                     for k in ("image", "lidar", "radar", "gps"))
        variables = jax.jit(lambda: self.model.init(rngs, *args))()
        state = create_train_state(variables, self.tx)
        self.state = replicate(state, self.mesh)
        return self.state

    def _lr(self) -> float:
        if not self.opts.scheduler:
            return self.opts.lr
        return cyclic_cosine_decay_lr(
            self.cur_epoch, base_lr=self.opts.lr, init_decay_epochs=15,
            min_decay_lr=2.5e-6, restart_interval=10, restart_lr=12.5e-5,
            warmup_epochs=10, warmup_start_lr=2.5e-6)

    def _to_device(self, batch: Dict):
        """Shards the numeric fields over the mesh, padding ragged batches up
        to a multiple of the device count.  Padded rows carry a 0 in the
        ``valid`` mask, which zeroes them out of the loss and the BatchNorm
        batch statistics (the reference trains on exact ragged batches,
        train2_seq.py:94-156); the returned metrics are sliced to n as well.
        Returns (device_batch, n_valid)."""
        dev = {k: v for k, v in batch.items() if k in DEVICE_KEYS}
        n = next(iter(dev.values())).shape[0]
        pad = pad_to_multiple(n, self._n_shard)
        if pad:
            dev = {k: np.concatenate(
                [np.asarray(v)] + [np.asarray(v[-1:])] * pad, axis=0)
                for k, v in dev.items()}
            dev["valid"] = np.concatenate(
                [np.ones(n, np.float32), np.zeros(pad, np.float32)])
        return shard_batch(dev, self.mesh), n

    # -- multi-host metric gathering ------------------------------------------

    def _ranks_rows(self, x, n: int, k: Optional[int] = None,
                    gather: bool = True) -> np.ndarray:
        """Batch-sharded device metric -> host rows of the valid (unpadded)
        samples.  Single-process: a plain readback.  Multi-process: this
        process's local block (its n valid rows), then (training, where each
        process feeds a different data shard) an all-gather so every process
        sees the identical global rows in process order — matching
        ``_gather_host`` of the corresponding host-side fields.  Eval/test
        loaders feed IDENTICAL batches on every process instead, so their
        local block already is the full data: ``gather=False``."""
        block = self._local_block(x, stacked=k is not None)
        local = (block[k] if k is not None else block)[:n]
        return self._gather_host(local) if gather and self._mp else local

    def _local_block(self, x, stacked: bool = False) -> np.ndarray:
        """Full host copy of this process's block of a device metric
        (padding and, for stacked multi-step metrics, all K steps included).
        Single-process: a plain readback of the whole array.  ``stacked``:
        the batch dim is axis 1 (a (K, B, ...) lax.scan output)."""
        if not self._mp:
            return np.asarray(x)
        bdim = 1 if stacked else 0
        if x.sharding.is_fully_replicated:
            g = np.asarray(x.addressable_data(0))
            per = g.shape[bdim] // jax.process_count()
            sl = [slice(None)] * g.ndim
            pid = jax.process_index()
            sl[bdim] = slice(pid * per, (pid + 1) * per)
            return g[tuple(sl)]
        # batch-sharded: this process's rows, deduped (a shard may be
        # replicated across local devices) and ordered by global offset
        seen: Dict[int, np.ndarray] = {}
        for s in x.addressable_shards:
            if (s.index[bdim].start or 0) not in seen:
                seen[s.index[bdim].start or 0] = np.asarray(s.data)
        return np.concatenate([seen[i] for i in sorted(seen)], bdim)

    def _gather_host(self, x: np.ndarray) -> np.ndarray:
        """Per-process host rows -> global rows (process order).  All
        processes must pass equal shapes.  No-op single-process."""
        if not self._mp:
            return x
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    def _barrier(self, tag: str) -> None:
        """Cross-process sync point (multi-host read-after-write on the
        shared logdir); no-op single-process."""
        if self._mp:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(tag)

    def _prefetched(self, gen_fn):
        """Runs ``gen_fn()`` on a background thread with a bounded
        opts.prefetch-deep queue, overlapping the loader's decode and the
        host->device transfer of item k+1 with step k's device compute (the
        reference loads synchronously between steps, train2_seq.py:94).
        device_put is async, so staging only dispatches the DMA — the step
        consuming it later is what waits, off the host's critical path.
        Worker exceptions re-raise on the main thread."""
        depth = self.opts.prefetch
        if depth <= 0:
            yield from gen_fn()
            return

        q: queue.Queue = queue.Queue(maxsize=depth)
        end = object()
        err: List[BaseException] = []
        abandoned = threading.Event()

        def put(item) -> bool:
            # bounded put that notices consumer abandonment: if train_step
            # raises and the consumer generator is closed, the worker must
            # release its staged device buffers instead of blocking on the
            # full queue for the life of the process
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in gen_fn():
                    if not put(item):
                        return
            except BaseException as e:      # surfaced on the main thread
                err.append(e)
            finally:
                put(end)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is end:
                    t.join()
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            abandoned.set()     # consumer closed/raised: unblock the worker

    def _staged(self, loader: Iterable[Dict]):
        """Yields (host_batch, device_batch, n), prefetched."""

        def gen():
            for batch in loader:
                dev, n = self._to_device(batch)
                yield batch, dev, n

        return self._prefetched(gen)

    def _group_iter(self, loader: Iterable[Dict]):
        """Groups consecutive full-size batches into stacked multi-step
        dispatches: yields ('multi', host_batches, stacked_dev, n_each) for
        groups of opts.steps_per_dispatch equal, unpadded batches, and
        ('single', [host_batch], dev, n) for ragged/odd ones."""
        K = self.opts.steps_per_dispatch
        n_dev = self._n_shard
        buf: List = []
        nominal = None

        def single(batch):
            dev, n = self._to_device(batch)
            return "single", [batch], dev, n

        for batch in loader:
            hd = {k: np.asarray(v) for k, v in batch.items()
                  if k in DEVICE_KEYS}
            n = next(iter(hd.values())).shape[0]
            # the group size locks to the first MESH-DIVISIBLE batch — a
            # ragged first batch (resume mid-dataset, finetune stream) must
            # not silently disable multi-step for the whole epoch
            if nominal is None and n % n_dev == 0:
                nominal = n
            if n == nominal and n % n_dev == 0:
                buf.append((batch, hd))
                if len(buf) == K:
                    stacked = {k: np.stack([hd[k] for _, hd in buf])
                               for k in buf[0][1]}
                    dev = shard_stacked_batch(stacked, self.mesh)
                    yield "multi", [b for b, _ in buf], dev, n
                    buf = []
            else:
                for b, _ in buf:
                    yield single(b)
                buf = []
                yield single(batch)
        for b, _ in buf:
            yield single(b)

    def _staged_train(self, loader: Iterable[Dict]):
        """Training stream: ('single'|'multi', host_batches, dev, n)."""
        if self.multi_train_step is None:
            for batch, dev, n in self._staged(loader):
                yield "single", [batch], dev, n
        else:
            yield from self._prefetched(lambda: self._group_iter(loader))

    # -- epoch loops ---------------------------------------------------------

    def train(self, loader: Iterable[Dict]) -> float:
        """One training epoch; returns the epoch's train DBA
        (train2_seq.py:94-156)."""
        lr = self._lr()
        num_batches = 0
        losses, gt_all, pred_all = [], [], []
        self.timer.reset()
        batch_size = None
        epoch_t0 = time.perf_counter()
        for kind, batches, dev, n in self._staged_train(loader):
            if self.state is None:
                self.init_state(batches[0])
            batch_size = batch_size or n
            if kind == "multi":
                self.state, m = self.multi_train_step(self.state, dev, lr)
                # stacked metrics: loss (K,), ranks (K, B, beams)
                losses.append(m["loss"])
                for k in range(len(batches)):
                    pred_all.append((m["ranks"], k, n))
            else:
                self.state, m = self.train_step(self.state, dev, lr)
                # keep metrics as device arrays — a host readback here would
                # serialize every step on the transfer link
                losses.append(m["loss"])
                pred_all.append((m["ranks"], None, n))
            for b in batches:
                gt_all.append(np.asarray(b["beamidx"]))
            self.timer.tick(len(batches))
            num_batches += len(batches)
            self.cur_iter += len(batches)
        loss_epoch = float(np.concatenate(
            [np.atleast_1d(np.asarray(l)) for l in losses]).mean()) \
            if losses else 0.0
        # one device->host read per unique metric array (a K-step dispatch
        # contributes K entries pointing at the same stacked array), then
        # ONE all-gather each for preds/gts (multi-host) — row pairing is
        # preserved because every process concatenates in the same order
        blocks: Dict[int, np.ndarray] = {}

        def rows(r, k, n):
            b = blocks.get(id(r))
            if b is None:
                b = blocks[id(r)] = self._local_block(r,
                                                      stacked=k is not None)
            return (b[k] if k is not None else b)[:n]

        pred_all = [rows(r, k, n) for r, k, n in pred_all]
        epoch_dt = time.perf_counter() - epoch_t0       # includes final sync
        if num_batches and batch_size:
            # batch_size is per-process: scale to the true global throughput
            global_bs = batch_size * (jax.process_count() if self._mp else 1)
            self.logger.scalar("perf/samples_per_sec",
                               num_batches * global_bs / epoch_dt,
                               self.cur_epoch + 1)
            self.logger.scalar("perf/step_ms_mean",
                               epoch_dt / num_batches * 1e3,
                               self.cur_epoch + 1)
        for tag, v in self.timer.stats(batch_size).items():
            self.logger.scalar(f"perf/dispatch_{tag}", v, self.cur_epoch + 1)

        pred_all = self._gather_host(np.concatenate(pred_all, 0))
        gt_all = self._gather_host(np.concatenate(gt_all, 0))
        if pred_all.ndim == 3:
            pred_all, gt_all = flatten_multistep(pred_all, gt_all)
        acc = compute_acc(pred_all, gt_all)
        dba = compute_dba_score(pred_all, gt_all)
        self.train_loss.append(loss_epoch)
        self.cur_epoch += 1
        self.logger.scalar("DBA_score_train", dba, self.cur_epoch)
        self.logger.scalars(
            "curr_acc_train",
            {f"beam{i}": a for i, a in enumerate(acc)}, self.cur_epoch)
        self.logger.scalar("curr_loss_train", loss_epoch, self.cur_epoch)
        print(f"Train top beam acc: {acc} DBA score: {dba:.4f}")

        if self.opts.finetune and dba > self.DBAft[-1]:
            self.DBAft.append(dba)
            self._save_finetune()
        return dba

    def validate(self, loader: Iterable[Dict]) -> float:
        """Validation epoch with per-scenario DBA (train2_seq.py:158-221)."""
        num_batches = 0
        losses, gt_all, pred_all, scen_all = [], [], [], []
        for batch, dev, n in self._staged(loader):
            if self.state is None:
                self.init_state(batch)
            m = self.eval_step(self.state, dev, num_batches)
            losses.append(m["loss"])
            pred_all.append((m["ranks"], n))
            gt_all.append(np.asarray(batch["beamidx"]))
            scen_all.append(np.asarray(batch["scenario"]))
            num_batches += 1
        loss_epoch = float(np.mean([np.asarray(l) for l in losses])) \
            if losses else 0.0
        # eval loaders feed identical batches on every process (multi-host):
        # the local block is the full data, host fields stay as-is
        pred_all = [self._ranks_rows(r, n, gather=False) for r, n in pred_all]
        pred_all = np.concatenate(pred_all, 0)
        gt_all = np.concatenate(gt_all, 0)
        scen_all = np.concatenate(scen_all, 0)
        if pred_all.ndim == 3:
            mp, mg = flatten_multistep(pred_all, gt_all)
        else:
            mp, mg = pred_all, gt_all

        for s in SCENARIOS:
            mask = scen_all == s
            if mask.sum() > 0:
                ps, gs = pred_all[mask], gt_all[mask]
                if ps.ndim == 3:
                    ps, gs = flatten_multistep(ps, gs)
                acc_s = compute_acc(ps, gs)
                dba_s = compute_dba_score(ps, gs)
                print(f"{s} curr_acc: {acc_s} DBA_score: {dba_s:.4f}")
                self.logger.scalars(
                    "curr_acc_val",
                    {f"{s}beam{i}": a for i, a in enumerate(acc_s)},
                    self.cur_epoch)
                self.logger.scalar(f"DBA_score_val/{s}", dba_s, self.cur_epoch)

        acc = compute_acc(mp, mg)
        dba = compute_dba_score(mp, mg)
        print(f"Val top beam acc: {acc} DBA score: {dba:.4f}")
        self.logger.scalar("DBA_score_val/scenario_all", dba, self.cur_epoch)
        self.logger.scalar("curr_loss_val", loss_epoch, self.cur_epoch)
        self.val_loss.append(loss_epoch)
        self.DBA.append(dba)
        return dba

    def test(self, loader: Iterable[Dict], out_dir: str = ".") -> np.ndarray:
        """Test pass: writes beam_pred.csv (1-indexed top-1/2/3) and the
        softmax-confidence CSV (train2_seq.py:224-252,338-346)."""
        pred_all, conf_all = [], []
        for i, (batch, dev, n) in enumerate(self._staged(loader)):
            if self.state is None:
                self.init_state(batch)
            m = self.test_step(self.state, dev, i)
            pred_all.append(self._ranks_rows(m["ranks"], n, gather=False))
            conf_all.append(self._ranks_rows(m["confidence"], n,
                                             gather=False))
        pred_all = np.concatenate(pred_all, 0)
        conf_all = np.concatenate(conf_all, 0)
        if self._lead:
            save_pred_to_csv(
                pred_all, target_csv=os.path.join(out_dir, "beam_pred.csv"))
            save_confidence_to_csv(
                conf_all, target_csv=os.path.join(
                    out_dir, "beam_pred_confidence_seq.csv"))
        return pred_all

    # -- checkpoint policy ---------------------------------------------------

    def save(self) -> None:
        """Per-epoch checkpointing with best-model/rollback policy
        (train2_seq.py:254-289)."""
        save_best = False
        if self.DBA and self.DBA[-1] >= self.bestval:
            self.bestval = self.DBA[-1]
            self.bestval_epoch = self.cur_epoch
            save_best = True

        state = self.state
        aw = self.opts.async_save
        # multi-host: metrics (and so save_best/bestval) are identical on
        # every process; only the lead writes the shared logdir
        if self._lead:
            if aw:
                ckpt.flush()    # land the previous epoch's writes (bounds
                                # the queue to one epoch of ckpts in flight)
            ckpt.save_model(self.opts.logdir, "final_model",
                            state.params, state.batch_stats, async_write=aw)
            ckpt.write_run_record(self.opts.logdir, {
                "epoch": self.cur_epoch,
                "iter": self.cur_iter,
                "bestval": self.bestval,
                "bestval_epoch": self.bestval_epoch,
                "train_loss": self.train_loss,
                "val_loss": self.val_loss,
                "DBA": self.DBA,
            }, async_write=aw)
            if save_best:
                ckpt.save_model(self.opts.logdir, "best_model",
                                state.params, state.batch_stats,
                                async_write=aw)
                ckpt.save_optim(self.opts.logdir, "best_optim",
                                state.opt_state, state.ema_params,
                                async_write=aw)
                print("====== Overwrote best model ======>")
        if not save_best and self.opts.load_previous_best:
            if self._lead:
                ckpt.flush()        # read-after-write: land pending saves
            self._barrier("rollback")   # best_model visible on the shared
                                        # logdir before non-lead reads
            params, stats = ckpt.load_model(
                self.opts.logdir, "best_model", state.params, state.batch_stats)
            opt_state, _ = ckpt.load_optim(
                self.opts.logdir, "best_optim", state.opt_state,
                state.ema_params)
            # the live EMA shadow is deliberately NOT rolled back: the
            # reference's load_previous_best restores model + optimizer only
            # and its EMA object keeps decaying from the current shadow
            # (train2_seq.py:286-289)
            self.state = replicate(
                state.replace(params=params, batch_stats=stats,
                              opt_state=opt_state), self.mesh)
            print("====== Load the previous best model ======>")

    def _save_finetune(self) -> None:
        """all_finetune_on_final_* stream keyed on train DBA
        (train2_seq.py:149-156)."""
        if not self._lead:
            return
        ckpt.save_model(self.opts.logdir, "all_finetune_on_final_model",
                        self.state.params, self.state.batch_stats,
                        async_write=self.opts.async_save)
        ckpt.save_optim(self.opts.logdir, "all_finetune_on_final_optim",
                        self.state.opt_state, self.state.ema_params,
                        async_write=self.opts.async_save)

    def resume(self) -> bool:
        """Restart-from-logdir (train2_seq.py:558-583).  Returns True if a
        run record was found."""
        rec = ckpt.read_run_record(self.opts.logdir)
        if rec is None:
            return False
        self.cur_epoch = rec["epoch"]
        self.cur_iter = rec.get("iter", 0)
        self.bestval = rec["bestval"]
        self.bestval_epoch = rec.get("bestval_epoch", 0)
        self.train_loss = rec["train_loss"]
        self.val_loss = rec["val_loss"]
        self.DBA = rec["DBA"]
        return True

    def load_weights(self, name: str = "final_model",
                     logdir: Optional[str] = None) -> None:
        if self.state is None:
            raise RuntimeError("init_state first (needs shapes)")
        ckpt.flush()                # land any pending async writes
        self._barrier("load_weights")   # multi-host: lead's writes landed
        params, stats = ckpt.load_model(
            logdir or self.opts.logdir, name, self.state.params,
            self.state.batch_stats)
        self.state = replicate(self.state.replace(
            params=params, batch_stats=stats,
            ema_params=jax.tree_util.tree_map(lambda x: x, params)),
            self.mesh)


def save_pred_to_csv(y_pred: np.ndarray, top_k=(1, 2, 3),
                     target_csv: str = "beam_pred.csv") -> None:
    """1-indexed top-k beam CSV, reference format (train2_seq.py:338-346)."""
    if y_pred.ndim == 3:            # multi-step: flatten rows
        y_pred = y_pred.reshape(-1, y_pred.shape[-1])
    with open(target_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["index"] + [f"top-{k} beam" for k in top_k])
        for i, row in enumerate(y_pred):
            w.writerow([i] + [int(row[k - 1]) + 1 for k in top_k])


def save_confidence_to_csv(conf: np.ndarray,
                           target_csv: str = "beam_pred_confidence_seq.csv"
                           ) -> None:
    with open(target_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["", "0"])
        for i, v in enumerate(conf.reshape(-1)):
            w.writerow([i, float(v)])
