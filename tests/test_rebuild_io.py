"""Rebuild checkpoint IO: the 5-module best/final file layout."""

import os
import types

import numpy as np
import jax.numpy as jnp

from deepsense6g_tii_tpu.cli.rebuild_engine_io import (load_rebuild_state,
                                                       save_rebuild_state)


def _fake_state(seed):
    rng = np.random.default_rng(seed)
    heads = {k: {"w": jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))}
             for k in ("image_projection_l1", "lidar_projection_l1",
                       "radar_projection_l1", "feat_trans_l1")}
    stats = {k: {"bn": {"mean": jnp.zeros((4,)) + seed}} for k in heads}
    st = types.SimpleNamespace(
        head_params=heads, head_stats=stats,
        fusion_params={"join": jnp.asarray(rng.normal(size=(3,)).astype(np.float32))},
        fusion_stats={"bn": jnp.zeros((2,)) + seed},
        opt_state=(jnp.zeros((1,)) + seed,))
    st.replace = lambda **kw: types.SimpleNamespace(**{**vars(st), **kw})
    return st


class TestRebuildIO:
    def test_roundtrip_best(self, tmp_path):
        a = _fake_state(1)
        save_rebuild_state(str(tmp_path), a, best=True)
        names = sorted(os.listdir(tmp_path))
        assert "best_fusion_model.msgpack" in names
        assert "final_image_projection_l1.msgpack" in names
        assert "best_optim.msgpack" in names

        b = _fake_state(2)
        restored = load_rebuild_state(str(tmp_path), b, best=True)
        np.testing.assert_allclose(
            np.asarray(restored.head_params["feat_trans_l1"]["w"]),
            np.asarray(a.head_params["feat_trans_l1"]["w"]))
        np.testing.assert_allclose(np.asarray(restored.fusion_params["join"]),
                                   np.asarray(a.fusion_params["join"]))
        np.testing.assert_allclose(np.asarray(restored.opt_state[0]),
                                   np.asarray(a.opt_state[0]))

    def test_final_only_when_not_best(self, tmp_path):
        save_rebuild_state(str(tmp_path), _fake_state(1), best=False)
        names = os.listdir(tmp_path)
        assert not any(n.startswith("best_") for n in names)
        assert sum(n.startswith("final_") for n in names) == 5
