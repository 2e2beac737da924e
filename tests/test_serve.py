"""Serving front-end tests: checkpoint loading, bucket padding, 1-indexed
top-k output, latency self-benchmark."""

import os

import numpy as np
import jax
import pytest

from deepsense6g_tii_tpu.config import GlobalConfig
from deepsense6g_tii_tpu.serve import Predictor

# 128px / 4x4-anchor geometry (see tests/test_models.py).
CFG = GlobalConfig(seq_len=2, n_layer=1, use_pallas_scan=False,
                   compute_dtype="float32", vert_anchors=4, horz_anchors=4,
                   input_resolution=128, crop=128,
                   backbone_blocks=(1, 1, 1, 1))


def _inputs(n, T=2, rc=2):
    return (np.zeros((n, T, 128, 128, 3), np.float32),
            np.zeros((n, T, 128, 128, 1), np.float32),
            np.zeros((n, T, 128, 128, rc), np.float32),
            np.zeros((n, 2, 2), np.float32))


@pytest.fixture(scope="module")
def predictor(tmp_path_factory):
    import flax.serialization
    from deepsense6g_tii_tpu.models.fuser import BeamFuser
    model = BeamFuser(CFG)
    inp = _inputs(1)
    from synthetic_data import jinit
    v = jinit(model, *[np.asarray(x) for x in inp])
    path = tmp_path_factory.mktemp("ckpt") / "best_model.msgpack"
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(
            jax.tree_util.tree_map(np.asarray, v)))
    return Predictor.from_msgpack(str(path), CFG, batch_buckets=(1, 4))


class TestPredictor:
    def test_topk_one_indexed(self, predictor):
        beams, conf = predictor.predict(*_inputs(1))
        assert beams.shape == (1, 3)
        assert (1 <= beams).all() and (beams <= 64).all()
        assert 0.0 < conf[0] < 1.0

    def test_ragged_batch_padding(self, predictor):
        beams, conf = predictor.predict(*_inputs(3))   # pads to bucket 4
        assert beams.shape == (3, 3) and conf.shape == (3,)

    def test_batch_matches_single(self, predictor):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (4, 2, 128, 128, 3)).astype(np.float32)
        rest = _inputs(4)[1:]
        b_all, _ = predictor.predict(img, *rest)
        b_one, _ = predictor.predict(img[:1], rest[0][:1], rest[1][:1],
                                     rest[2][:1])
        np.testing.assert_array_equal(b_all[0], b_one[0])

    def test_latency_benchmark(self, predictor):
        stats = predictor.latency_benchmark(batch=1, iters=3)
        assert stats["p50_ms"] > 0 and stats["p90_ms"] >= stats["p50_ms"]


class TestExportedArtifact:
    def test_roundtrip_matches_predictor(self, predictor, tmp_path):
        """export_artifact -> ExportedPredictor: same predictions without
        model code or checkpoint (weights are baked into the artifact)."""
        from deepsense6g_tii_tpu.serve import ExportedPredictor
        path = str(tmp_path / "model.jaxexport")
        predictor.export_artifact(path, batch_size=4)
        served = ExportedPredictor(path)
        assert served.batch == 4

        rng = np.random.default_rng(1)
        img = rng.uniform(0, 255, (4, 2, 128, 128, 3)).astype(np.float32)
        rest = _inputs(4)[1:]
        b_ref, c_ref = predictor.predict(img, *rest)
        b_exp, c_exp = served.predict(img, *rest)
        np.testing.assert_array_equal(b_exp, b_ref)
        np.testing.assert_allclose(c_exp, c_ref, rtol=1e-5, atol=1e-6)

        # ragged request pads up to the artifact batch
        b3, c3 = served.predict(img[:3], rest[0][:3], rest[1][:3],
                                rest[2][:3])
        np.testing.assert_array_equal(b3, b_ref[:3])

        # oversize request is rejected, not silently truncated
        big = _inputs(5)
        with pytest.raises(ValueError, match="exceeds"):
            served.predict(*big)


class TestMeshServing:
    def test_mesh_matches_single_device(self, predictor, tmp_path):
        """use_mesh=True shards request batches over the 8-device CPU mesh
        and returns the same predictions as the single-device path."""
        import flax.serialization
        path = tmp_path / "m.msgpack"
        host_vars = jax.tree_util.tree_map(np.asarray, predictor.variables)
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(host_vars))
        mesh_pred = Predictor.from_msgpack(str(path), CFG,
                                           batch_buckets=(1,), use_mesh=True)
        n_dev = mesh_pred.mesh.devices.size
        assert n_dev == 8
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (n_dev, 2, 128, 128, 3)).astype(np.float32)
        rest = _inputs(n_dev)[1:]
        beams_m, conf_m = mesh_pred.predict(img, *rest)
        beams_s, conf_s = predictor.predict(img, *rest)
        np.testing.assert_array_equal(beams_m, beams_s)
        np.testing.assert_allclose(conf_m, conf_s, rtol=1e-5, atol=1e-6)

    def test_mesh_ragged_pads_to_mesh_bucket(self, predictor, tmp_path):
        import flax.serialization
        path = tmp_path / "m.msgpack"
        host_vars = jax.tree_util.tree_map(np.asarray, predictor.variables)
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(host_vars))
        mesh_pred = Predictor.from_msgpack(str(path), CFG,
                                           batch_buckets=(1,), use_mesh=True)
        beams, conf = mesh_pred.predict(*_inputs(3))   # 3 -> padded to 8
        assert beams.shape == (3, 3) and conf.shape == (3,)
