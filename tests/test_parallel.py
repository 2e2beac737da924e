"""Data-parallel correctness: the 8-device-sharded jitted train step
computes the same trajectory as the single-device run.

This is the capability-parity proof for the reference's DataParallel
(train2_seq.py:538 — replicate/scatter/gather every step): under GSPMD the
same single jitted program runs with the batch sharded over the ('data',)
mesh, gradients all-reduced by XLA, BatchNorm statistics global-batch by
construction.  Sharding must change the numerics only by float reduction
order.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepsense6g_tii_tpu.config import GlobalConfig
from deepsense6g_tii_tpu.parallel.mesh import (make_mesh, replicate,
                                               shard_batch)
from deepsense6g_tii_tpu.train.state import create_train_state, make_optimizer
from deepsense6g_tii_tpu.train.steps import make_train_step

from synthetic_data import TinyFuser, make_batch

CFG = GlobalConfig(seq_len=2, use_pallas_scan=False, compute_dtype="float32")


def _run(n_devices, batches, steps=3):
    mesh = make_mesh(n_devices)
    model = TinyFuser(CFG)
    tx = make_optimizer()
    step = make_train_step(model, CFG, tx, use_ema=True, rng_seed=0)
    v = model.init(jax.random.PRNGKey(0), batches[0]["image"],
                   batches[0]["lidar"], batches[0]["radar"],
                   batches[0]["gps"])
    state = replicate(create_train_state(v, tx), mesh)
    losses = []
    for b in batches[:steps]:
        dev = shard_batch({k: np.asarray(x) for k, x in b.items()
                           if k != "scenario"}, mesh)
        state, m = step(state, dev, 1e-3)
        losses.append(float(m["loss"]))
    return losses, jax.device_get((state.params, state.ema_params,
                                   state.batch_stats))


class TestDataParallelEquivalence:
    def test_sharded_equals_single_device(self, rng):
        assert len(jax.devices()) >= 8, "conftest forces the 8-device mesh"
        batches = [make_batch(rng, B=8) for _ in range(3)]
        l1, t1 = _run(1, batches)
        l8, t8 = _run(8, batches)
        # same program, different shardings: only all-reduce float
        # reassociation may differ
        np.testing.assert_allclose(l1, l8, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(t1),
                        jax.tree_util.tree_leaves(t8)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
class TestFullGeometryDataParallel:
    """The flagship at its ACTUAL shape: the 962-token, reference-depth GPT
    BeamFuser (256px, seq_len 5, ResNet34+2xResNet18, n_layer 8 x 4 fusion
    stages — model2_seq.py:406-597), one train step, 8-device mesh vs single
    device.  The mechanism tests above use reduced geometry; this is the
    proof that the production program itself shards without numeric drift
    beyond float reduction order."""

    def test_flagship_sharded_equals_single_device(self):
        assert len(jax.devices()) >= 8
        import jax.numpy as jnp
        from deepsense6g_tii_tpu.models.fuser import BeamFuser
        from deepsense6g_tii_tpu.utils.synth import make_synth_batch

        cfg = GlobalConfig(FFM=0, TFM=0, use_pallas_scan=False,
                           compute_dtype="float32")
        batch = make_synth_batch(cfg, B=8, seed=3)
        batch = {k: v for k, v in batch.items() if k != "scenario"}

        def run(n_devices):
            mesh = make_mesh(n_devices)
            model = BeamFuser(cfg)
            tx = make_optimizer()
            step = make_train_step(model, cfg, tx, use_ema=True, rng_seed=0)
            v = model.init(jax.random.PRNGKey(0), batch["image"],
                           batch["lidar"], batch["radar"], batch["gps"])
            sharded = shard_batch(batch, mesh)
            # eval forward: running BN stats, no dropout — the only
            # cross-shard reduction is none at all, so any disagreement
            # here is a REAL sharding bug, and the band can be tight
            logits = jax.jit(lambda vv, b: model.apply(
                vv, b["image"], b["lidar"], b["radar"], b["gps"],
                train=False))(replicate(v, mesh), sharded)
            state = replicate(create_train_state(v, tx), mesh)
            state, m = step(state, sharded, 1e-4)
            return (np.asarray(logits),
                    float(np.asarray(m["loss"]).ravel()[-1]),
                    jax.device_get((state.params, state.ema_params,
                                    state.batch_stats)))

        g1, l1, t1 = run(1)
        g8, l8, t8 = run(8)
        np.testing.assert_allclose(g8, g1, rtol=1e-4, atol=1e-5)
        # train step: the TRAIN forward normalizes by BATCH statistics, so
        # the GSPMD per-shard decomposition of those reductions (pure float
        # reassociation, ~1e-7 per reduce) amplifies MULTIPLICATIVELY
        # through the ~40 BN divisions of the reference-depth stack —
        # measured ~1e-3 loss drift and up to ~2e-3 absolute drift on
        # running-stat elements for this draw, while the reduced-geometry
        # test above pins the same mechanism at 1e-5 (6 BN layers) and the
        # eval check above is tight (running stats: no amplification).
        # A real sharding bug produces O(0.1+) differences everywhere.
        # Bands: loss 1%; params/EMA tight — Adam's first step is bounded
        # by +-lr (1e-4) per element regardless of gradient drift, so
        # 2.5e-4 covers sign flips with margin; batch stats statistical.
        np.testing.assert_allclose(l1, l8, rtol=1e-2)
        for got, want, atol in ((t8[0], t1[0], 2.5e-4),   # params
                                (t8[1], t1[1], 2.5e-4),   # ema_params
                                (t8[2], t1[2], 2e-2)):    # batch_stats
            for a, b in zip(jax.tree_util.tree_leaves(want),
                            jax.tree_util.tree_leaves(got)):
                np.testing.assert_allclose(b, a, rtol=1e-2, atol=atol)
