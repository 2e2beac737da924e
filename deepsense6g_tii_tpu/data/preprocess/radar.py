"""Offline radar preprocessing: raw ADC cubes -> normalized RA / RV maps.

Replaces /root/reference/Data_Preprocessing/Radar_data_preprocessing.py,
whose per-file FFT chain fans out over a 100-process joblib pool.  Here the
whole scenario is batched through one jitted, vmapped FFT pipeline
(features.radar_maps) — one device call instead of 100 processes.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import features as F


# module-level jitted callables: a fresh jax.jit wrapper per call would
# carry a fresh trace cache and re-trace/re-compile the FFT pipeline for
# every 64-cube chunk of a scenario
_jit_radar_maps = jax.jit(F.radar_maps, static_argnums=1)
_jit_radar_maps_batch = jax.jit(
    jax.vmap(F.radar_maps, in_axes=(0, None)), static_argnums=1)


def process_file(data: np.ndarray, fft_size: int = 256):
    """One raw cube (n_rx, n_samples, n_chirps) -> (ra, rv) maps in [0,1]."""
    ra, rv = _jit_radar_maps(jnp.asarray(data), fft_size)
    return np.asarray(ra), np.asarray(rv)


def process_batch(cubes: np.ndarray, fft_size: int = 256):
    """(N, n_rx, n_samples, n_chirps) -> (N, 256, 256) x 2, vmapped."""
    ra, rv = _jit_radar_maps_batch(jnp.asarray(cubes), fft_size)
    return np.asarray(ra), np.asarray(rv)


def process_scenario(raw_dir: str, ang_dir: Optional[str] = None,
                     vel_dir: Optional[str] = None,
                     batch_size: int = 64) -> List[str]:
    """Processes every .npy cube in ``raw_dir`` into radar_data_ang / _vel
    siblings (the on-disk contract of Radar_data_preprocessing.py:24-43)."""
    ang_dir = ang_dir or os.path.join(os.path.dirname(raw_dir.rstrip("/")),
                                      "radar_data_ang")
    vel_dir = vel_dir or os.path.join(os.path.dirname(raw_dir.rstrip("/")),
                                      "radar_data_vel")
    os.makedirs(ang_dir, exist_ok=True)
    os.makedirs(vel_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(raw_dir) if f.endswith(".npy"))
    written = []
    for i in range(0, len(files), batch_size):
        chunk = files[i:i + batch_size]
        cubes = np.stack([np.load(os.path.join(raw_dir, f)) for f in chunk])
        ra, rv = process_batch(cubes)
        for f, a, v in zip(chunk, ra, rv):
            np.save(os.path.join(ang_dir, f), a)
            np.save(os.path.join(vel_dir, f), v)
            written.append(f)
    return written


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("raw_dir", help=".../unit1/radar_data directory")
    p.add_argument("--ang_dir", default=None)
    p.add_argument("--vel_dir", default=None)
    p.add_argument("--batch_size", type=int, default=64)
    a = p.parse_args(argv)
    n = len(process_scenario(a.raw_dir, a.ang_dir, a.vel_dir, a.batch_size))
    print(f"processed {n} radar cubes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
