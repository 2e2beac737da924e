"""LiDAR static-background filtering.

Replaces /root/reference/Data_Preprocessing/Lidar_data_preprocessing.py,
which loops a per-point Open3D KD-tree query in Python (the dominant offline
cost).  Same two-pass algorithm, exact reference numerics:

  pass 1 (background build): iterate frames with >= min_points; for every
    current background point find its 3D nearest neighbor in the frame and
    keep the midpoint iff the *2D* (x,y) distance is below the
    distance-dependent threshold f(r) = 0.3 + 4.7 * (r / 30)^4 with
    r = 2D range of the point (Lidar_data_preprocessing.py:40-104).
  pass 2 (filter): drop every frame point whose 2D distance to its 3D-NN in
    the background is below f(r) (107-158).

Nearest-neighbor backends: scipy cKDTree (C, multithreaded — default on
host) or a jit-compiled blocked brute-force for TPU offload; both return
identical neighbors (ties broken by index may differ, distances identical).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ...utils import ply

FILTER_DISTANCE_MIN = 0.3
FILTER_DISTANCE_MAX = 5.0
LIDAR_DISTANCE_CST = 30.0
SCENARIO_MIN_POINTS = {"scenario31": 16400, "scenario32": 18000,
                       "scenario33": 18000, "scenario34": 18600}


def filter_threshold(points: np.ndarray) -> np.ndarray:
    """f(r) per point, r = 2D range (Lidar_data_preprocessing.py:90)."""
    r = np.sqrt(points[:, 0] ** 2 + points[:, 1] ** 2)
    return FILTER_DISTANCE_MIN + (FILTER_DISTANCE_MAX - FILTER_DISTANCE_MIN) \
        * (r / LIDAR_DISTANCE_CST) ** 4


def nearest_neighbors_kdtree(queries: np.ndarray,
                             points: np.ndarray) -> np.ndarray:
    """3D nearest neighbor indices of ``queries`` in ``points`` (scipy C)."""
    from scipy.spatial import cKDTree
    _, idx = cKDTree(points).query(queries, k=1, workers=-1)
    return np.asarray(idx)


def nearest_neighbors_tpu(queries: np.ndarray, points: np.ndarray,
                          block: int = 2048) -> np.ndarray:
    """Blocked brute-force 3D NN on the accelerator: one (block, N) distance
    tile at a time rides the VPU/MXU; clouds are ~20k points so the full
    pass is a few hundred MFLOPs."""
    import jax
    import jax.numpy as jnp

    pts = jnp.asarray(points, jnp.float32)

    @jax.jit
    def one_block(q):
        d2 = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        return jnp.argmin(d2, axis=1)

    n = queries.shape[0]
    pad = (-n) % block
    qp = np.pad(queries.astype(np.float32), ((0, pad), (0, 0)))
    out = [np.asarray(one_block(jnp.asarray(qp[i:i + block])))
           for i in range(0, n + pad, block)]
    return np.concatenate(out)[:n]


def _nn(queries, points, backend):
    if backend == "tpu":
        return nearest_neighbors_tpu(queries, points)
    if backend == "native":
        from ...runtime import native
        return native.KdTree(points).nearest(queries)
    return nearest_neighbors_kdtree(queries, points)


def update_background(background: np.ndarray, frame: np.ndarray,
                      backend: str = "kdtree") -> np.ndarray:
    """One background-refinement step (pass-1 inner loop, lines 69-99)."""
    idx = _nn(background, frame, backend)
    nn = frame[idx]
    d2d = np.sqrt(((background[:, :2] - nn[:, :2]) ** 2).sum(1))
    keep = d2d < filter_threshold(background)
    return (background[keep] + nn[keep]) / 2.0


def build_background(frames: List[np.ndarray], min_points: int,
                     backend: str = "kdtree") -> np.ndarray:
    """Pass 1: iterative background agreement across frames."""
    background = None
    for frame in frames:
        if frame.shape[0] < min_points:
            continue
        if background is None:
            background = frame
            continue
        background = update_background(background, frame, backend)
        if background.shape[0] == 0:
            break
    if background is None:
        raise ValueError(f"no frame reaches min_points={min_points}")
    return background


def filter_frame(frame: np.ndarray, background: np.ndarray,
                 backend: str = "kdtree") -> np.ndarray:
    """Pass 2: drop points within f(r) of the static background."""
    if background.shape[0] == 0:
        return frame
    idx = _nn(frame, background, backend)
    nn = background[idx]
    d2d = np.sqrt(((frame[:, :2] - nn[:, :2]) ** 2).sum(1))
    return frame[d2d >= filter_threshold(frame)]


def process_scenario(lidar_dirs: List[str], out_dirs: List[str],
                     scenario: str,
                     background_path: Optional[str] = None,
                     backend: str = "kdtree",
                     min_points: Optional[int] = None) -> np.ndarray:
    """Builds the scenario background from the first directory and writes
    filtered clouds for all directories (lidar_data_filtered/ contract)."""
    min_pts = (min_points if min_points is not None
               else SCENARIO_MIN_POINTS.get(scenario, 16000))
    first = sorted(os.listdir(lidar_dirs[0]))
    frames = [ply.read_points(os.path.join(lidar_dirs[0], f))
              for f in first if f.endswith(".ply")]
    background = build_background(frames, min_pts, backend)
    if background_path:
        os.makedirs(os.path.dirname(background_path), exist_ok=True)
        ply.write_points(background_path, background)

    for src, dst in zip(lidar_dirs, out_dirs):
        os.makedirs(dst, exist_ok=True)
        for f in sorted(os.listdir(src)):
            if not f.endswith(".ply"):
                continue
            cloud = ply.read_points(os.path.join(src, f))
            ply.write_points(os.path.join(dst, f),
                             filter_frame(cloud, background, backend))
    return background


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("scenario", help="scenario31..scenario34")
    p.add_argument("lidar_dirs", nargs="+")
    p.add_argument("--out_suffix", default="_filtered",
                   help="output dir = <src> with lidar_data -> "
                        "lidar_data<out_suffix>")
    p.add_argument("--background", default=None)
    p.add_argument("--backend", default="kdtree", choices=["kdtree", "native", "tpu"])
    a = p.parse_args(argv)
    outs = [d.rstrip("/").replace("lidar_data", "lidar_data" + a.out_suffix)
            for d in a.lidar_dirs]
    bg = process_scenario(a.lidar_dirs, outs, a.scenario, a.background,
                          a.backend)
    print(f"background: {bg.shape[0]} points")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
