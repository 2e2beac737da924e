"""30to5 multi-step variant + profiling/rebuild-CLI coverage."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepsense6g_tii_tpu.config import GlobalConfig, config_30to5
from deepsense6g_tii_tpu.train.profiling import StepTimer, annotate
from deepsense6g_tii_tpu.train.state import create_train_state, make_optimizer
from deepsense6g_tii_tpu.train.steps import make_train_step
from deepsense6g_tii_tpu.cli import rebuild as rebuild_cli

from synthetic_data import TinyFuser, make_batch, make_fake_dataset_tree


class TestConfig30to5:
    def test_token_count(self):
        cfg = config_30to5()
        assert cfg.seq_len == 10 and cfg.pred_len == 5
        assert cfg.n_tokens == 3 * 10 * 64 + 2 == 1922

    def test_multistep_train_step_with_clip(self, rng):
        cfg = GlobalConfig(seq_len=2, pred_len=3, use_pallas_scan=False,
                           compute_dtype="float32")
        model = TinyFuser(cfg)
        batch = make_batch(rng, B=4, pred_len=3, H=128, W=128)
        tx = make_optimizer()
        step = make_train_step(model, cfg, tx, clip_grad_norm=3.0)
        v = model.init(jax.random.PRNGKey(0), batch["image"], batch["lidar"],
                       batch["radar"], batch["gps"])
        state = create_train_state(v, tx)
        dev = {k: jnp.asarray(x) for k, x in batch.items() if k != "scenario"}
        state, m = step(state, dev, 1e-3)
        assert np.isfinite(float(m["loss"]))
        assert m["ranks"].shape == (4, 3, 64)

    def test_dataset_multistep_labels(self, tmp_path, rng):
        from deepsense6g_tii_tpu.data.dataset import BeamDataset
        import pandas as pd
        root = str(tmp_path) + "/"
        csv = make_fake_dataset_tree(root, n_samples=2, seq_len=2,
                                     scenarios=("scenario32",))
        # rewrite labels to the 30to5 "b1_b2_b3" format
        df = pd.read_csv(root + csv)
        df["unit1_beam"] = ["3_5_7", "10_10_12"]
        df.to_csv(root + csv, index=False)
        cfg = GlobalConfig(seq_len=2, pred_len=3)
        s = BeamDataset(root, csv, cfg)[0]
        assert s["beam"].shape == (3, 64)
        assert list(s["beamidx"]) == [2, 4, 6]
        flipped = BeamDataset(root, csv, cfg, flip=True)[0]
        assert list(flipped["beamidx"]) == [61, 59, 57]

    def test_wrong_label_count_raises(self, tmp_path, rng):
        from deepsense6g_tii_tpu.data.dataset import BeamDataset
        root = str(tmp_path) + "/"
        csv = make_fake_dataset_tree(root, n_samples=1, seq_len=2,
                                     scenarios=("scenario32",))
        cfg = GlobalConfig(seq_len=2, pred_len=3)
        with pytest.raises(ValueError):
            BeamDataset(root, csv, cfg)[0]


class TestProfiling:
    def test_step_timer_stats(self):
        t = StepTimer()
        import time
        t.tick()
        for _ in range(5):
            time.sleep(0.002)
            t.tick()
        s = t.stats(batch_size=8)
        assert s["steps"] == 5
        assert s["step_ms_p50"] >= 2.0
        assert s["samples_per_sec"] > 0

    def test_step_timer_multi_step_normalizes(self):
        """tick(n_steps=K) dispatches report per-optimizer-step times and
        count K steps toward throughput (engine steps_per_dispatch)."""
        t = StepTimer()
        import time
        t.tick()
        for _ in range(3):
            time.sleep(0.004)
            t.tick(n_steps=4)
        s = t.stats(batch_size=2)
        assert s["steps"] == 12
        assert s["step_ms_p50"] >= 0.9        # ~4 ms / 4 steps
        single = StepTimer()
        single.tick()
        time.sleep(0.004)
        single.tick()
        assert s["step_ms_p50"] < single.stats()["step_ms_p50"]

    def test_empty_stats(self):
        assert StepTimer().stats() == {}

    def test_annotate_context(self):
        with annotate("train_step"):
            _ = jnp.ones(4).sum()


class TestRebuildCli:
    def test_parser_reference_flags(self):
        p = rebuild_cli.build_parser()
        a = p.parse_args(["-s", "lidar", "radar", "-t", "image",
                          "--alpha_trans", "2.0", "--alpha_contrast", "1.0",
                          "--alpha_distance", "0.5", "--lr", "1e-4"])
        assert a.source_domain == ["lidar", "radar"]
        assert a.target_domain == ["image"]
        assert a.alpha_trans == 2.0

    def test_requires_domains(self):
        p = rebuild_cli.build_parser()
        with pytest.raises(SystemExit):
            p.parse_args([])
