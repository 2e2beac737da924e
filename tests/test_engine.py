"""Engine + train-step tests on the 8-device CPU mesh (SURVEY.md section 4):
loss decreases, EMA semantics, checkpoint/resume, rollback-to-best, CSV
exports, per-scenario metrics."""

import json
import os

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from deepsense6g_tii_tpu.config import GlobalConfig
from deepsense6g_tii_tpu.models.resnet import bn_sample_mask
from deepsense6g_tii_tpu.parallel.mesh import make_mesh
from deepsense6g_tii_tpu.train import checkpoints as ckpt
from deepsense6g_tii_tpu.train.engine import (Engine, TrainOptions,
                                              save_pred_to_csv)
from deepsense6g_tii_tpu.train.state import create_train_state, make_optimizer
from deepsense6g_tii_tpu.train.steps import (make_eval_step,
                                             make_multi_train_step,
                                             make_train_step)

from synthetic_data import TinyFuser, make_batch

CFG = GlobalConfig(seq_len=2, use_pallas_scan=False, compute_dtype="float32")


def _loader(rng, n_batches=3, **kw):
    return [make_batch(rng, **kw) for _ in range(n_batches)]


class TestTrainStep:
    def test_loss_decreases(self, rng):
        model = TinyFuser(CFG)
        batch = make_batch(rng, B=8)
        tx = make_optimizer()
        step = make_train_step(model, CFG, tx)
        variables = model.init(jax.random.PRNGKey(0), batch["image"],
                               batch["lidar"], batch["radar"], batch["gps"])
        state = create_train_state(variables, tx)
        dev = {k: jnp.asarray(v) for k, v in batch.items() if k != "scenario"}
        losses = []
        for _ in range(20):
            state, m = step(state, dev, 1e-2)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.7
        assert int(state.step) == 20

    def test_f16_batch_matches_f32(self, rng):
        """A float16-stored batch (CachedBatchLoader path) trains bit-
        identically to the same values fed as float32: the step upcasts on
        device before any math (steps.py::_upcast_f16)."""
        model = TinyFuser(CFG)
        b32 = make_batch(rng, B=4)
        b16 = {k: (v.astype(np.float16)
                   if v.dtype == np.float32 else v)
               for k, v in b32.items() if k != "scenario"}
        b32 = {k: (v.astype(np.float16).astype(np.float32)
                   if v.dtype == np.float32 else v)
               for k, v in b32.items() if k != "scenario"}
        tx = make_optimizer()
        variables = model.init(jax.random.PRNGKey(0), b32["image"],
                               b32["lidar"], b32["radar"], b32["gps"])
        step = make_train_step(model, CFG, tx)
        s16 = create_train_state(variables, tx)
        # fresh buffers: the donated s16 state must not alias s32's
        s32 = create_train_state(
            jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                   variables), tx)
        for _ in range(3):
            s16, m16 = step(s16, b16, 1e-2)
            s32, m32 = step(s32, b32, 1e-2)
        assert float(m16["loss"]) == float(m32["loss"])
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            s16.params, s32.params)

    def test_uint8_image_batch_matches_f32(self, rng):
        """A uint8-stored image batch (the cache's exact image storage)
        trains bit-identically to the same integer values fed as float32
        (steps.py::_upcast_f16 upcasts uint8 on device)."""
        model = TinyFuser(CFG)
        b = make_batch(rng, B=4)
        b = {k: v for k, v in b.items() if k != "scenario"}
        b["image"] = np.round(b["image"]).clip(0, 255).astype(np.float32)
        b8 = dict(b)
        b8["image"] = b["image"].astype(np.uint8)
        tx = make_optimizer()
        variables = model.init(jax.random.PRNGKey(0), b["image"],
                               b["lidar"], b["radar"], b["gps"])
        step = make_train_step(model, CFG, tx)
        s8 = create_train_state(variables, tx)
        s32 = create_train_state(
            jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                   variables), tx)
        for _ in range(3):
            s8, m8 = step(s8, b8, 1e-2)
            s32, m32 = step(s32, b, 1e-2)
        assert float(m8["loss"]) == float(m32["loss"])
        jax.tree_util.tree_map(
            lambda a, c: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(c)),
            s8.params, s32.params)

    def test_uint8_lidar_batch_matches_f32(self, rng):
        """A scaled-uint8 lidar batch (the cache's raw BEV clip-count
        storage, scale 5) trains bit-identically to the same hist/5 values
        fed as float32: _upcast_f16 divides by HIST_MAX_PER_PIXEL on device,
        reconstructing features.py::lidar_to_bev_np's map exactly."""
        model = TinyFuser(CFG)
        b = make_batch(rng, B=4)
        b = {k: v for k, v in b.items() if k != "scenario"}
        counts = np.random.default_rng(7).integers(
            0, 6, b["lidar"].shape).astype(np.uint8)
        b8 = dict(b)
        b8["lidar"] = counts
        b["lidar"] = counts.astype(np.float32) / np.float32(5.0)
        tx = make_optimizer()
        variables = model.init(jax.random.PRNGKey(0), b["image"],
                               b["lidar"], b["radar"], b["gps"])
        step = make_train_step(model, CFG, tx)
        s8 = create_train_state(variables, tx)
        s32 = create_train_state(
            jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                   variables), tx)
        for _ in range(3):
            s8, m8 = step(s8, b8, 1e-2)
            s32, m32 = step(s32, b, 1e-2)
        assert float(m8["loss"]) == float(m32["loss"])
        jax.tree_util.tree_map(
            lambda a, c: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(c)),
            s8.params, s32.params)

    def test_multi_step_matches_sequential(self, rng):
        """K steps fused in one lax.scan dispatch produce the exact same
        trajectory (params, opt state, EMA, losses) as K single-step
        dispatches — same per-step math, same dropout streams."""
        K = 3
        model = TinyFuser(CFG)
        batches = [make_batch(rng, B=4) for _ in range(K)]
        devs = [{k: jnp.asarray(v) for k, v in b.items() if k != "scenario"}
                for b in batches]
        tx = make_optimizer()
        variables = model.init(jax.random.PRNGKey(0), devs[0]["image"],
                               devs[0]["lidar"], devs[0]["radar"],
                               devs[0]["gps"])

        # both step flavors donate their state; give each its own buffers
        v2 = jax.tree_util.tree_map(jnp.array, variables)

        step = make_train_step(model, CFG, tx, use_ema=True)
        s_seq = create_train_state(variables, tx)
        seq_losses = []
        for d in devs:
            s_seq, m = step(s_seq, d, 1e-3)
            seq_losses.append(float(m["loss"]))

        multi = make_multi_train_step(model, CFG, tx, use_ema=True)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *devs)
        s_mul, ms = multi(create_train_state(v2, tx), stacked, 1e-3)

        assert int(s_mul.step) == K
        np.testing.assert_allclose(np.asarray(ms["loss"]), seq_losses,
                                   rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s_seq.params),
                        jax.tree_util.tree_leaves(s_mul.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(s_seq.ema_params),
                        jax.tree_util.tree_leaves(s_mul.ema_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_flat_accum_matches_nested(self, rng):
        """flatten_accum=True (one scan over K*GA microbatches with a
        conditional update) reproduces the nested K-over-GA dispatch
        exactly: same RNG streams, same d-weighted gradient combine, same
        BN-stat chain -> identical params/EMA/stats trajectory and stacked
        metrics (steps.py::_make_flat_multi_step)."""
        K, GA = 3, 2
        model = TinyFuser(CFG)
        batches = [make_batch(rng, B=4) for _ in range(K)]
        devs = [{k: jnp.asarray(v) for k, v in b.items() if k != "scenario"}
                for b in batches]
        tx = make_optimizer()
        variables = model.init(jax.random.PRNGKey(0), devs[0]["image"],
                               devs[0]["lidar"], devs[0]["radar"],
                               devs[0]["gps"])
        v2 = jax.tree_util.tree_map(jnp.array, variables)
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *devs)
        stacked2 = jax.tree_util.tree_map(jnp.array, stacked)

        nested = make_multi_train_step(model, CFG, tx, use_ema=True,
                                       grad_accum=GA)
        flat = make_multi_train_step(model, CFG, tx, use_ema=True,
                                     grad_accum=GA, flatten_accum=True)
        s_n, m_n = nested(create_train_state(variables, tx), stacked, 1e-3)
        s_f, m_f = flat(create_train_state(v2, tx), stacked2, 1e-3)

        assert int(s_f.step) == K
        np.testing.assert_allclose(np.asarray(m_f["loss"]),
                                   np.asarray(m_n["loss"]), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(m_f["ranks"]),
                                      np.asarray(m_n["ranks"]))
        for tree_n, tree_f in ((s_n.params, s_f.params),
                               (s_n.ema_params, s_f.ema_params),
                               (s_n.batch_stats, s_f.batch_stats)):
            for a, b in zip(jax.tree_util.tree_leaves(tree_n),
                            jax.tree_util.tree_leaves(tree_f)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-6, atol=1e-7)

    def test_ema_tracks_params(self, rng):
        model = TinyFuser(CFG)
        batch = make_batch(rng, B=4)
        tx = make_optimizer()
        step = make_train_step(model, CFG, tx, use_ema=True, ema_decay=0.5)
        variables = model.init(jax.random.PRNGKey(0), batch["image"],
                               batch["lidar"], batch["radar"], batch["gps"])
        state = create_train_state(variables, tx)
        p0 = jax.device_get(state.params)
        dev = {k: jnp.asarray(v) for k, v in batch.items() if k != "scenario"}
        state, _ = step(state, dev, 1e-2)
        p1, e1 = jax.device_get((state.params, state.ema_params))
        # ema = 0.5*old + 0.5*new
        want = jax.tree_util.tree_map(lambda a, b: 0.5 * a + 0.5 * b, p0, p1)
        leaves = zip(jax.tree_util.tree_leaves(e1),
                     jax.tree_util.tree_leaves(want))
        for a, b in leaves:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)

    def test_grad_clip(self, rng):
        model = TinyFuser(CFG)
        batch = make_batch(rng, B=4)
        tx = make_optimizer()
        step = make_train_step(model, CFG, tx, clip_grad_norm=1e-8)
        variables = model.init(jax.random.PRNGKey(0), batch["image"],
                               batch["lidar"], batch["radar"], batch["gps"])
        state = create_train_state(variables, tx)
        p0 = jax.device_get(state.params)
        dev = {k: jnp.asarray(v) for k, v in batch.items() if k != "scenario"}
        state, _ = step(state, dev, 1e-3)
        p1 = jax.device_get(state.params)
        # clipped to ~zero grad norm -> params nearly unchanged except wd
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)):
            np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-4)


class TestEngineMultiStep:
    def test_trajectory_matches_single_step(self, tmp_path, rng):
        """Engine with steps_per_dispatch=3 over a loader with a ragged tail
        (which falls back to single dispatch) reproduces the
        steps_per_dispatch=1 run: same epoch loss, DBA and final params."""
        loader = [make_batch(rng, B=8) for _ in range(6)] + \
            [make_batch(rng, B=5)]                          # ragged tail

        def run(k, sub):
            opts = TrainOptions(logdir=str(tmp_path / sub), epochs=1,
                                lr=1e-3, scheduler=False,
                                steps_per_dispatch=k)
            os.makedirs(opts.logdir, exist_ok=True)
            eng = Engine(TinyFuser(CFG), CFG, opts, mesh=make_mesh())
            dba = eng.train(loader)
            return eng, dba, eng.train_loss[-1]

        e1, dba1, l1 = run(1, "a")
        e3, dba3, l3 = run(3, "b")
        assert e1.cur_iter == e3.cur_iter == 7
        assert dba3 == pytest.approx(dba1)
        assert l3 == pytest.approx(l1, rel=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(e1.state.params),
                        jax.tree_util.tree_leaves(e3.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


    def test_ragged_first_batch_still_groups(self, tmp_path, rng):
        """A ragged FIRST batch must not pin the group size and silently
        disable multi-step dispatch for the rest of the epoch."""
        opts = TrainOptions(logdir=str(tmp_path / "g"), epochs=1, lr=1e-3,
                            scheduler=False, steps_per_dispatch=2,
                            prefetch=0)
        os.makedirs(opts.logdir, exist_ok=True)
        eng = Engine(TinyFuser(CFG), CFG, opts, mesh=make_mesh())
        loader = [make_batch(rng, B=5)] + \
            [make_batch(rng, B=8) for _ in range(4)]
        kinds = [k for k, *_ in eng._group_iter(loader)]
        assert kinds == ["single", "multi", "multi"]


class TestEngine:
    def _engine(self, tmp_path, rng, **opt_kw):
        opts = TrainOptions(logdir=str(tmp_path / "run"), epochs=2,
                            lr=1e-3, scheduler=False, **opt_kw)
        os.makedirs(opts.logdir, exist_ok=True)
        model = TinyFuser(CFG)
        return Engine(model, CFG, opts, mesh=make_mesh())

    def test_train_validate_save_resume(self, tmp_path, rng):
        eng = self._engine(tmp_path, rng)
        loader = _loader(rng, n_batches=2, B=8)
        eng.train(loader)
        dba = eng.validate(loader)
        eng.save()
        ckpt.flush()      # async saves are eventually-consistent; loads and
        # the next save() flush automatically — a direct file check must too
        assert 0.0 <= dba <= 1.0
        assert os.path.exists(os.path.join(eng.opts.logdir, "final_model.msgpack"))
        assert os.path.exists(os.path.join(eng.opts.logdir, "best_model.msgpack"))
        rec = json.load(open(os.path.join(eng.opts.logdir, "recent.log")))
        assert rec["epoch"] == 1 and rec["bestval"] == dba
        assert set(rec) == {"epoch", "iter", "bestval", "bestval_epoch",
                            "train_loss", "val_loss", "DBA"}

        # a second engine resumes from the same logdir
        eng2 = self._engine(tmp_path, rng)
        assert eng2.resume()
        assert eng2.cur_epoch == 1 and eng2.bestval == dba
        eng2.init_state(loader[0])
        eng2.load_weights("best_model")
        dba2 = eng2.validate(loader)
        assert dba2 == pytest.approx(dba)

    def test_rollback_to_best(self, tmp_path, rng):
        eng = self._engine(tmp_path, rng, load_previous_best=True)
        loader = _loader(rng, n_batches=1, B=8)
        eng.train(loader)
        eng.validate(loader)
        eng.save()
        best = jax.device_get(eng.state.params)
        # degrade: fake a worse epoch
        eng.cur_epoch += 1
        eng.DBA.append(-1.0)
        eng.train(loader)     # moves params away from best
        eng.save()            # not best -> rolls back
        rolled = jax.device_get(eng.state.params)
        for a, b in zip(jax.tree_util.tree_leaves(best),
                        jax.tree_util.tree_leaves(rolled)):
            np.testing.assert_allclose(a, b)

    def test_test_writes_reference_format_csv(self, tmp_path, rng):
        eng = self._engine(tmp_path, rng)
        loader = _loader(rng, n_batches=2, B=4)
        test_batches = [{k: v for k, v in b.items()
                         if k not in ("beam", "beamidx")} for b in loader]
        eng.test(test_batches, out_dir=str(tmp_path))
        lines = open(tmp_path / "beam_pred.csv").read().strip().split("\n")
        assert lines[0] == "index,top-1 beam,top-2 beam,top-3 beam"
        assert len(lines) == 1 + 8
        first = lines[1].split(",")
        assert 1 <= int(first[1]) <= 64   # 1-indexed beams
        assert os.path.exists(tmp_path / "beam_pred_confidence_seq.csv")

    def test_ema_validation_uses_shadow(self, tmp_path, rng):
        eng = self._engine(tmp_path, rng, ema=True)
        loader = _loader(rng, n_batches=1, B=8)
        eng.train(loader)
        # shadow differs from live params after updates
        p, e = jax.device_get((eng.state.params, eng.state.ema_params))
        diffs = [np.abs(a - b).max() for a, b in
                 zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(e))]
        assert max(diffs) > 0

    def test_test_uses_raw_weights_not_ema(self, tmp_path, rng):
        """The reference's test() never applies the EMA shadow — only
        validate() brackets with apply_shadow()/restore()
        (train2_seq.py:159-160 vs 224-252)."""
        eng = self._engine(tmp_path, rng, ema=True)
        loader = _loader(rng, n_batches=2, B=8)
        eng.train(loader)
        # make the shadow unmistakably different from the live params
        eng.state = eng.state.replace(ema_params=jax.tree_util.tree_map(
            jnp.zeros_like, eng.state.ema_params))
        batch, dev, n = next(iter(eng._staged(loader[:1])))
        val_conf = np.asarray(eng.eval_step(eng.state, dev, 0)["confidence"])
        test_conf = np.asarray(eng.test_step(eng.state, dev, 0)["confidence"])
        assert not np.allclose(val_conf, test_conf)   # shadow vs raw forward
        # and without EMA the two steps are literally the same program
        eng2 = self._engine(tmp_path, rng)
        assert eng2.test_step is eng2.eval_step

    def test_rollback_preserves_live_ema(self, tmp_path, rng):
        """load_previous_best restores model + optimizer only; the EMA
        shadow keeps decaying from its current value
        (train2_seq.py:286-289 — the EMA object is untouched)."""
        eng = self._engine(tmp_path, rng, ema=True,
                           load_previous_best=True)
        loader = _loader(rng, n_batches=1, B=8)
        eng.train(loader)
        eng.validate(loader)
        eng.save()                                   # epoch 0 becomes best
        eng.cur_epoch += 1
        eng.DBA.append(-1.0)                         # fake a worse epoch
        eng.train(loader)
        ema_live = jax.device_get(eng.state.ema_params)
        params_moved = jax.device_get(eng.state.params)
        eng.save()                                   # rolls back to best
        rolled = jax.device_get((eng.state.params, eng.state.ema_params))
        leaves = jax.tree_util.tree_leaves
        # params rolled back...
        moved = any(np.abs(a - b).max() > 0
                    for a, b in zip(leaves(rolled[0]), leaves(params_moved)))
        assert moved
        # ...but the live EMA shadow is untouched by the rollback
        for a, b in zip(leaves(rolled[1]), leaves(ema_live)):
            np.testing.assert_array_equal(a, b)

    def test_finetune_stream(self, tmp_path, rng):
        eng = self._engine(tmp_path, rng, finetune=True)
        loader = _loader(rng, n_batches=1, B=8)
        eng.train(loader)
        ckpt.flush()      # finetune stream saves asynchronously too
        assert os.path.exists(os.path.join(
            eng.opts.logdir, "all_finetune_on_final_model.msgpack"))


class TestCsvFormat:
    def test_matches_reference_beam_pred(self, tmp_path):
        """Byte-format parity with the published beam_pred.csv header/rows."""
        ranks = np.tile(np.arange(64), (3, 1))
        path = tmp_path / "bp.csv"
        save_pred_to_csv(ranks, target_csv=str(path))
        got = open(path).read().strip().split("\n")
        ref_head = open("/root/reference/beam_pred.csv").readline().strip()
        assert got[0] == ref_head
        assert got[1] == "0,1,2,3"


class TestPaddedBatchExactness:
    """A ragged batch padded by the engine (duplicated last row + valid mask)
    must produce exactly the unpadded batch's loss, gradients and BatchNorm
    batch statistics — the reference trains on exact ragged batches
    (train2_seq.py:94-156), so padding must not leak into the math."""

    class _BNNet(nn.Module):
        """Conv+BN+Dense, no dropout (dropout draws are shape-dependent and
        would mask the comparison)."""

        @nn.compact
        def __call__(self, image, lidar, radar, gps, rebuild_feats=None,
                     train: bool = False, sample_mask=None):
            del rebuild_feats
            B, T = image.shape[:2]
            bn_mask = (None if sample_mask is None
                       else bn_sample_mask(sample_mask, T))
            x = image.reshape((-1,) + image.shape[2:]) / 255.0
            x = nn.Conv(4, (8, 8), strides=(16, 16), name="c1")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name="bn")(x, mask=bn_mask)
            x = nn.relu(x).mean(axis=(1, 2)).reshape(B, -1)
            return nn.Dense(64, name="out")(x)

    def _grads(self, model, variables, batch):
        from deepsense6g_tii_tpu.train.steps import _compute_loss

        def loss_fn(params):
            logits, aux = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch["image"], batch["lidar"], batch["radar"], batch["gps"],
                train=True, mutable=["batch_stats"],
                sample_mask=batch.get("valid"))
            return _compute_loss(CFG, "focal", True, logits, batch), \
                aux["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        return float(loss), grads, jax.device_get(stats)

    def test_padded_grads_equal_unpadded(self, rng):
        model = self._BNNet()
        exact = {k: jnp.asarray(v) for k, v in
                 make_batch(rng, B=3).items() if k != "scenario"}
        padded = {k: jnp.concatenate([v, v[-1:]], axis=0) for k, v in
                  exact.items()}
        padded["valid"] = jnp.array([1, 1, 1, 0], jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), exact["image"],
                               exact["lidar"], exact["radar"], exact["gps"])

        l_exact, g_exact, s_exact = self._grads(model, variables, exact)
        l_pad, g_pad, s_pad = self._grads(model, variables, padded)
        assert l_pad == pytest.approx(l_exact, rel=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g_exact),
                        jax.tree_util.tree_leaves(g_pad)):
            # not bit-identical: the B=3 and masked-B=4 reductions have
            # different float association; atol covers near-zero leaves.
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s_exact),
                        jax.tree_util.tree_leaves(s_pad)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_engine_attaches_valid_mask(self, tmp_path, rng):
        opts = TrainOptions(logdir=str(tmp_path / "run"), scheduler=False)
        os.makedirs(opts.logdir, exist_ok=True)
        eng = Engine(TinyFuser(CFG), CFG, opts, mesh=make_mesh())
        ragged = make_batch(rng, B=5)            # 8-device mesh -> pad 3
        dev, n = eng._to_device(ragged)
        assert n == 5 and "valid" in dev
        np.testing.assert_array_equal(
            np.asarray(dev["valid"]), [1, 1, 1, 1, 1, 0, 0, 0])
        full = make_batch(rng, B=8)
        dev_full, _ = eng._to_device(full)
        assert "valid" not in dev_full
        # the padded batch trains end-to-end through the jitted step
        eng.train([ragged])


class TestFlattenedOptimizer:
    def test_trajectory_matches_per_leaf(self, rng):
        """flatten_transform must be a pure layout change: one AdamW+EMA
        step from identical state produces identical params (VERDICT r1 #4)."""
        from deepsense6g_tii_tpu.train.state import make_optimizer

        model = TinyFuser(CFG)
        batch = make_batch(rng, B=4)
        dev = {k: jnp.asarray(v) for k, v in batch.items() if k != "scenario"}
        variables = model.init(jax.random.PRNGKey(0), batch["image"],
                               batch["lidar"], batch["radar"], batch["gps"])
        results = []
        for flatten in (False, True):
            tx = make_optimizer(flatten=flatten)
            step = make_train_step(model, CFG, tx, use_ema=True)
            # the step donates the state; give each run its own buffers
            state = create_train_state(
                jax.tree_util.tree_map(jnp.copy, variables), tx)
            for _ in range(3):
                state, m = step(state, dev, 1e-3)
            results.append(jax.device_get((state.params, state.ema_params,
                                           float(m["loss"]))))
        (p0, e0, l0), (p1, e1, l1) = results
        assert l0 == pytest.approx(l1, rel=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(e0),
                        jax.tree_util.tree_leaves(e1)):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    def test_mu_dtype_bf16_state_and_trajectory(self, rng):
        """opt_mu_dtype=bfloat16 (GlobalConfig knob): Adam's first moment is
        stored bf16 (2 bytes/param HBM), nu and params stay f32, and a short
        trajectory stays within bf16 rounding of the exact-f32 one."""
        from deepsense6g_tii_tpu.train.state import make_optimizer

        model = TinyFuser(CFG)
        batch = make_batch(rng, B=4)
        dev = {k: jnp.asarray(v) for k, v in batch.items() if k != "scenario"}
        variables = model.init(jax.random.PRNGKey(0), batch["image"],
                               batch["lidar"], batch["radar"], batch["gps"])
        results = []
        for mu_dtype in (None, "bfloat16"):
            tx = make_optimizer(mu_dtype=mu_dtype)
            step = make_train_step(model, CFG, tx, use_ema=True)
            state = create_train_state(
                jax.tree_util.tree_map(jnp.copy, variables), tx)
            for _ in range(3):
                state, m = step(state, dev, 1e-3)
            if mu_dtype == "bfloat16":
                adam = state.opt_state.inner_state[0]
                mu_dt = {l.dtype for l in
                         jax.tree_util.tree_leaves(adam.mu)}
                nu_dt = {l.dtype for l in
                         jax.tree_util.tree_leaves(adam.nu)}
                assert mu_dt == {jnp.dtype(jnp.bfloat16)}, mu_dt
                assert nu_dt == {jnp.dtype(jnp.float32)}, nu_dt
            results.append(jax.device_get(state.params))
        for a, b in zip(jax.tree_util.tree_leaves(results[0]),
                        jax.tree_util.tree_leaves(results[1])):
            # 3 steps of lr 1e-3: params move ~1e-3/step; bf16 mu rounding
            # perturbs each update by ~2^-9 relative
            np.testing.assert_allclose(a, b, rtol=0, atol=5e-5)


class TestEngineGradAccum:
    def test_train_with_grad_accum(self, tmp_path, rng):
        """Engine + grad_accum=2: microbatched steps train end-to-end,
        including a ragged batch (padded to the device count, valid-masked
        rows d-weighted out of the combined gradient)."""
        opts = TrainOptions(logdir=str(tmp_path / "run"), epochs=2, lr=1e-3,
                            scheduler=False, grad_accum=2)
        os.makedirs(opts.logdir, exist_ok=True)
        eng = Engine(TinyFuser(CFG), CFG, opts, mesh=make_mesh())
        loader = [make_batch(rng, B=8), make_batch(rng, B=8),
                  make_batch(rng, B=6)]      # ragged -> padded to 8
        eng.train(loader)
        eng.train(loader)
        assert int(eng.state.step) == 6
        assert np.isfinite(eng.train_loss).all()
        assert len(eng.train_loss) == 2


class TestStagedPrefetch:
    def test_preserves_order_and_propagates_errors(self, tmp_path, rng):
        opts = TrainOptions(logdir=str(tmp_path / "run"), prefetch=2)
        os.makedirs(opts.logdir, exist_ok=True)
        eng = Engine(TinyFuser(CFG), CFG, opts, mesh=make_mesh())
        batches = [make_batch(rng, B=8) for _ in range(4)]
        got = [np.asarray(b["beamidx"]) for b, _, _ in eng._staged(batches)]
        for a, b in zip(got, batches):
            np.testing.assert_array_equal(a, b["beamidx"])

        def bad_loader():
            yield batches[0]
            raise ValueError("decode failed")

        with pytest.raises(ValueError, match="decode failed"):
            list(eng._staged(bad_loader()))

    def test_prefetch_zero_is_synchronous(self, tmp_path, rng):
        opts = TrainOptions(logdir=str(tmp_path / "run"), prefetch=0)
        os.makedirs(opts.logdir, exist_ok=True)
        eng = Engine(TinyFuser(CFG), CFG, opts, mesh=make_mesh())
        out = list(eng._staged([make_batch(rng, B=8)]))
        assert len(out) == 1 and out[0][2] == 8
