"""Checkpoint module tests: async writer semantics (round-trip, FIFO
last-wins ordering, error surfacing) and read-after-write via flush()."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from deepsense6g_tii_tpu.train import checkpoints as ckpt


class TestAsyncWriter:
    def test_roundtrip_after_flush(self, tmp_path):
        tree = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                "b": jnp.ones((3,))}
        path = ckpt.save_model(str(tmp_path), "m", tree["w"], tree["b"],
                               async_write=True)
        ckpt.flush()
        assert os.path.exists(path)
        w, b = ckpt.load_model(str(tmp_path), "m", tree["w"], tree["b"])
        np.testing.assert_array_equal(np.asarray(w), np.asarray(tree["w"]))
        np.testing.assert_array_equal(np.asarray(b), np.asarray(tree["b"]))

    def test_last_write_wins(self, tmp_path):
        """FIFO single-worker queue: two saves to one path land in order."""
        a = jnp.zeros((4,))
        for i in range(5):
            ckpt.save_model(str(tmp_path), "m", a + i, a, async_write=True)
        ckpt.flush()
        w, _ = ckpt.load_model(str(tmp_path), "m", a, a)
        np.testing.assert_array_equal(np.asarray(w), np.full(4, 4.0))

    def test_write_error_surfaces_on_flush(self, tmp_path):
        w = ckpt.AsyncWriter()
        w.submit(str(tmp_path / "no" / "such" / "dir" / "x.msgpack"),
                 {"a": np.zeros(2)})
        with pytest.raises(OSError):
            w.flush()

    def test_snapshot_is_synchronous(self, tmp_path):
        """The host snapshot happens in save_model itself: mutating the
        source array afterwards must not change what lands on disk (the
        training loop donates its buffers every step)."""
        src = np.zeros((4,), np.float32)
        ckpt.save_model(str(tmp_path), "m", src, src, async_write=True)
        src += 999.0                      # simulate buffer reuse
        ckpt.flush()
        w, _ = ckpt.load_model(str(tmp_path), "m", src, src)
        np.testing.assert_array_equal(np.asarray(w), np.zeros(4))


class TestDistributedInit:
    def test_single_process_noop(self, monkeypatch):
        """No coordinator env, no pod metadata -> no-op returning False."""
        from deepsense6g_tii_tpu.parallel import distributed
        for k in ("DEEPSENSE_COORDINATOR", "TPU_WORKER_HOSTNAMES",
                  "MEGASCALE_COORDINATOR_ADDRESS"):
            monkeypatch.delenv(k, raising=False)
        assert distributed.initialize() is False

    def test_process_info_shape(self):
        from deepsense6g_tii_tpu.parallel import distributed
        info = distributed.process_info()
        assert info["process_count"] == 1
        assert info["global_devices"] >= info["local_devices"] >= 1
