"""Inference / serving front-end.

The reference has no serving layer (SURVEY.md section 1: batch --Test only);
this provides the production-facing equivalent: a ``Predictor`` that loads a
checkpoint (msgpack or reference .pth), pre-compiles fixed-batch forward
functions, and serves top-k beams + confidences with ragged batches padded to
the nearest compiled bucket.  A latency self-benchmark reports p50/p90.

    pred = Predictor.from_msgpack("log/run/best_model.msgpack", cfg)
    out = pred.predict(image, lidar, radar, gps)   # -> topk (B,3), conf (B,)
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import GlobalConfig
from .models.fuser import BeamFuser
from .parallel.mesh import batch_sharding, make_mesh, replicate


class Predictor:
    """``use_mesh=True`` serves over ALL local chips: the weights replicate
    once, each request batch is sharded across the ('data',) mesh and the
    forward runs data-parallel (bucket sizes then count per-mesh, so they
    should be multiples of the device count).  Default single-device."""

    def __init__(self, variables: Dict, config: GlobalConfig,
                 batch_buckets: Sequence[int] = (1, 8),
                 top_k: int = 3, use_mesh: bool = False):
        self.config = config
        self.model = BeamFuser(config)
        self.mesh = make_mesh() if use_mesh else None
        if self.mesh is not None:
            variables = replicate(variables, self.mesh)
            self._in_sharding = batch_sharding(self.mesh)
        self.variables = variables
        self.buckets = tuple(sorted(batch_buckets))
        self.top_k = top_k

        def fwd(variables, image, lidar, radar, gps):
            logits = self.model.apply(variables, image, lidar, radar, gps,
                                      train=False)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            conf, idx = jax.lax.top_k(probs, top_k)
            return idx, conf

        self._fwd = jax.jit(fwd)

    # -- constructors ----------------------------------------------------------

    @classmethod
    def from_msgpack(cls, path: str, config: GlobalConfig, **kw) -> "Predictor":
        import flax.serialization
        model = BeamFuser(config)
        T = config.seq_len
        rc = 2 if config.add_velocity else 1
        H = config.crop
        template = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, T, H, H, 3)), jnp.zeros((1, T, H, H, 1)),
            jnp.zeros((1, T, H, H, rc)), jnp.zeros((1, config.gps_len, 2)))
        template = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), template)
        with open(path, "rb") as f:
            variables = flax.serialization.from_bytes(template, f.read())
        return cls(variables, config, **kw)

    @classmethod
    def from_torch(cls, path: str, config: GlobalConfig, **kw) -> "Predictor":
        """Directly serve a reference .pth checkpoint."""
        from .models.checkpoint_import import load_reference_checkpoint
        params, stats, _ = load_reference_checkpoint(path, config)
        return cls({"params": params, "batch_stats": stats}, config, **kw)

    # -- inference -------------------------------------------------------------

    def _bucket(self, n: int) -> int:
        m = self.mesh.devices.size if self.mesh is not None else 1
        for b in self.buckets:
            if n <= b * m:
                return b * m
        top = self.buckets[-1] * m
        return int(np.ceil(n / top)) * top

    def predict(self, image, lidar, radar, gps
                ) -> Tuple[np.ndarray, np.ndarray]:
        """NHWC sensor arrays -> (top-k 1-indexed beams (B, k), confidences
        (B,)).  Pads ragged batches to a compiled bucket size."""
        n = image.shape[0]
        b = self._bucket(n)
        if b != n:
            pad = ((0, b - n),) + ((0, 0),) * (image.ndim - 1)
            image = np.pad(image, pad[: image.ndim])
            lidar = np.pad(lidar, pad[: lidar.ndim])
            radar = np.pad(radar, pad[: radar.ndim])
            gps = np.pad(gps, ((0, b - n), (0, 0), (0, 0)))
        arrs = (image, lidar, radar, gps)
        if self.mesh is not None:
            arrs = tuple(jax.device_put(np.asarray(a), self._in_sharding)
                         for a in arrs)
        else:
            arrs = tuple(jnp.asarray(a) for a in arrs)
        idx, conf = self._fwd(self.variables, *arrs)
        return (np.asarray(idx)[:n] + 1,        # 1-indexed, beam_pred.csv
                np.asarray(conf)[:n, 0])

    def warmup(self) -> None:
        m = self.mesh.devices.size if self.mesh is not None else 1
        for b in (bk * m for bk in self.buckets):   # effective global sizes
            T = self.config.seq_len
            rc = 2 if self.config.add_velocity else 1
            H = self.config.crop
            self.predict(np.zeros((b, T, H, H, 3), np.float32),
                         np.zeros((b, T, H, H, 1), np.float32),
                         np.zeros((b, T, H, H, rc), np.float32),
                         np.zeros((b, self.config.gps_len, 2), np.float32))

    def latency_benchmark(self, batch: int = 1, iters: int = 30
                          ) -> Dict[str, float]:
        """p50/p90/mean single-call latency in ms (includes host sync)."""
        T = self.config.seq_len
        rc = 2 if self.config.add_velocity else 1
        H = self.config.crop
        args = (np.random.default_rng(0).uniform(
                    0, 255, (batch, T, H, H, 3)).astype(np.float32),
                np.zeros((batch, T, H, H, 1), np.float32),
                np.zeros((batch, T, H, H, rc), np.float32),
                np.zeros((batch, self.config.gps_len, 2), np.float32))
        self.predict(*args)              # compile
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            self.predict(*args)          # predict returns host arrays: synced
            times.append((time.perf_counter() - t0) * 1e3)
        t = np.asarray(times)
        return {"p50_ms": float(np.percentile(t, 50)),
                "p90_ms": float(np.percentile(t, 90)),
                "mean_ms": float(t.mean()),
                "batch": batch}


    # -- compiled-artifact export (jax.export) ---------------------------------

    def export_artifact(self, path: str,
                        batch_size: Optional[int] = None) -> None:
        """Serialize the forward as a self-contained StableHLO artifact.

        Weights are folded in as constants, so serving the artifact needs
        neither the model code nor the checkpoint — only jax on the same
        platform family it was exported on (``jax.export`` embeds the
        lowering platform).  Fixed batch (default: largest bucket × mesh);
        :class:`ExportedPredictor` pads ragged batches up to it.
        """
        m = self.mesh.devices.size if self.mesh is not None else 1
        b = batch_size or self.buckets[-1] * m
        T, H = self.config.seq_len, self.config.crop
        rc = 2 if self.config.add_velocity else 1
        variables = jax.device_get(self.variables)
        top_k = self.top_k
        model = self.model

        def fwd(image, lidar, radar, gps):
            logits = model.apply(variables, image, lidar, radar, gps,
                                 train=False)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            conf, idx = jax.lax.top_k(probs, top_k)
            return idx, conf

        specs = (jax.ShapeDtypeStruct((b, T, H, H, 3), jnp.float32),
                 jax.ShapeDtypeStruct((b, T, H, H, 1), jnp.float32),
                 jax.ShapeDtypeStruct((b, T, H, H, rc), jnp.float32),
                 jax.ShapeDtypeStruct((b, self.config.gps_len, 2),
                                      jnp.float32))
        exported = jax.export.export(jax.jit(fwd))(*specs)
        with open(path, "wb") as f:
            f.write(exported.serialize())


class ExportedPredictor:
    """Serves a :meth:`Predictor.export_artifact` file.

    The artifact is a compiled fixed-batch forward with the weights baked
    in; this wrapper only pads ragged request batches up to the artifact's
    batch size and converts outputs to the same contract as
    :meth:`Predictor.predict` (1-indexed top-k beams + confidences).
    """

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self._exported = jax.export.deserialize(bytearray(f.read()))
        self.batch = int(self._exported.in_avals[0].shape[0])

    def predict(self, image, lidar, radar, gps
                ) -> Tuple[np.ndarray, np.ndarray]:
        n = image.shape[0]
        b = self.batch
        if n > b:
            raise ValueError(
                f"request batch {n} exceeds the artifact's fixed batch {b}; "
                "re-export with a larger batch_size or split the request")
        arrs = []
        for a in (image, lidar, radar, gps):
            a = np.asarray(a, np.float32)
            if n < b:
                a = np.pad(a, ((0, b - n),) + ((0, 0),) * (a.ndim - 1))
            arrs.append(a)
        idx, conf = self._exported.call(*arrs)
        return (np.asarray(idx)[:n] + 1,
                np.asarray(conf)[:n, 0])


def main(argv=None) -> int:
    import argparse
    import json
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", help=".msgpack or reference .pth")
    p.add_argument("--FFM", type=int, default=1)
    p.add_argument("--TFM", type=int, default=1)
    p.add_argument("--add_velocity", type=int, default=1)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=30)
    a = p.parse_args(argv)
    on_tpu = jax.default_backend() == "tpu"
    cfg = GlobalConfig(FFM=a.FFM, TFM=a.TFM, add_velocity=a.add_velocity,
                       use_pallas_scan=on_tpu, use_flash_attention=on_tpu,
                       compute_dtype="bfloat16" if on_tpu else "float32")
    if a.checkpoint.endswith(".pth"):
        pred = Predictor.from_torch(a.checkpoint, cfg)
    else:
        pred = Predictor.from_msgpack(a.checkpoint, cfg)
    print(json.dumps(pred.latency_benchmark(a.batch, a.iters)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
