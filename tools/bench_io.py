"""Input-pipeline throughput benchmark (host side, no TPU needed).

Generates a synthetic DeepSense-layout dataset with realistic sizes
(~20k-point LiDAR clouds, 960x540 camera JPEGs, 256x256 radar maps),
then measures samples/sec through BeamDataset + DataLoader for:
  - python PLY+histogram path vs the native C++ batch path
  - cold decode vs the pre-featurized memmap cache

Usage: python tools/bench_io.py [--samples 32] [--workers 8]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_realistic_tree(root, n_samples, seq_len=5, seed=0):
    from PIL import Image
    from deepsense6g_tii_tpu.utils import ply
    rng = np.random.default_rng(seed)
    s = "scenario32"
    base = os.path.join(root, s, "unit1")
    for sub in ("camera_data", "lidar_data", "radar_data_ang",
                "radar_data_vel"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    os.makedirs(os.path.join(root, s, "unit2", "GPS_data"), exist_ok=True)
    os.makedirs(os.path.join(base, "GPS_data"), exist_ok=True)
    np.savetxt(os.path.join(base, "GPS_data", "gps_loc.txt"),
               [33.42, -111.93])

    header = ["index"]
    for t in range(1, seq_len + 1):
        header += [f"unit1_rgb_{t}", f"unit1_lidar_{t}", f"unit1_radar_{t}"]
    header += ["unit2_loc_1", "unit2_loc_2", "unit1_loc", "unit1_beam"]
    rows = []
    img = Image.fromarray(rng.integers(0, 255, (540, 960, 3), dtype=np.uint8),
                          "RGB")
    for i in range(n_samples):
        row = [i]
        for t in range(1, seq_len + 1):
            fid = i * seq_len + t
            cam = f"./{s}/unit1/camera_data/{s}_{fid}.jpg"
            img.save(os.path.join(root, cam[2:]), quality=85)
            lid = f"./{s}/unit1/lidar_data/{fid}.ply"
            pts = rng.uniform(-60, 20, size=(20000, 3))
            ply.write_points(os.path.join(root, lid[2:]), pts, ascii=True)
            rad = f"./{s}/unit1/radar_data/{fid}.npy"
            for kind in ("ang", "vel"):
                np.save(os.path.join(base, f"radar_data_{kind}",
                                     f"{fid}.npy"),
                        rng.uniform(0, 1, (256, 256)).astype(np.float32))
            row += [cam, lid, rad]
        g1 = f"./{s}/unit2/GPS_data/{i}_1.txt"
        g2 = f"./{s}/unit2/GPS_data/{i}_2.txt"
        for g in (g1, g2):
            np.savetxt(os.path.join(root, g[2:]), [33.421, -111.929])
        row += [g1, g2, f"./{s}/unit1/GPS_data/gps_loc.txt", 31]
        rows.append(row)
    import csv
    with open(os.path.join(root, "idx.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)
    return "idx.csv"


def run(dataset, batch_size, workers, label, use_processes=False):
    from deepsense6g_tii_tpu.data.loader import DataLoader
    dl = DataLoader(dataset, batch_size, shuffle=False, num_workers=workers,
                    use_processes=use_processes)
    n = 0
    t0 = time.perf_counter()
    for b in dl:
        n += b["image"].shape[0]
    dt = time.perf_counter() - t0
    print(f"{label}: {n / dt:.1f} samples/sec "
          f"({n} samples, {dt:.1f} s, {workers} workers)")
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=32)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args()

    from deepsense6g_tii_tpu.config import GlobalConfig
    from deepsense6g_tii_tpu.data.cache import CachedDataset, build_cache
    from deepsense6g_tii_tpu.data.dataset import BeamDataset
    from deepsense6g_tii_tpu.runtime import native

    with tempfile.TemporaryDirectory() as root:
        root += "/"
        print("generating synthetic dataset...")
        csv = make_realistic_tree(root, args.samples)
        cfg = GlobalConfig()
        ds = BeamDataset(root, csv, cfg)

        print(f"native C++ loader available: {native.available()}")
        run(ds, args.batch_size, args.workers,
            "decode path (threads)")
        run(ds, args.batch_size, args.workers,
            "decode path (processes)", use_processes=True)

        cache_dir = build_cache(ds, os.path.join(root, "cache"),
                                num_workers=args.workers)
        run(CachedDataset(cache_dir), args.batch_size, args.workers,
            "memmap cache path")

        # the production hot path: one f16 fancy-index gather per modality
        # per batch, no per-sample copies, no pool round-trip
        from deepsense6g_tii_tpu.data.cache import CachedBatchLoader
        loader = CachedBatchLoader(cache_dir, args.batch_size, shuffle=True)
        n = 0
        t0 = time.perf_counter()
        for b in loader:
            n += b["image"].shape[0]
        dt = time.perf_counter() - t0
        print(f"CachedBatchLoader (f16 gather): {n / dt:.1f} samples/sec "
              f"({n} samples, {dt:.1f} s)")


if __name__ == "__main__":
    main()
