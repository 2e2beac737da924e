"""Synthetic on-disk demo dataset in the exact DeepSense6G reference layout.

Lets anyone smoke the full pipeline — dataset assembly, feature factory,
training, validation, test CSV export — without the (non-redistributable)
challenge dataset.  The tree matches what the reference's loaders expect
(/root/reference/data2_seq.py:64-132, createdata_seq.py): camera jpgs,
binary .ply LiDAR point clouds, radar .npy maps, GPS .txt files and the
sequence index CSVs.

Used by the test suite (tests/synthetic_data.py) and by
examples/quickstart.py.
"""

import os

import numpy as np


def make_fake_dataset_tree(root, scenarios=("scenario31", "scenario32"),
                           n_samples=4, seq_len=5, seed=0):
    """Creates a DeepSense-layout tree + index CSV; returns the CSV name.

    Layout per scenario (data2_seq.py:64-132, createdata_seq.py):
      unit1/camera_data/<scenario>_<id>.jpg        (enhanced camera)
      unit1/lidar_data/<id>.ply
      unit1/radar_data_{ang,vel}/<id>.npy
      unit2/GPS_data/<id>.txt ; unit1/GPS_data/gps_loc.txt
    """
    from PIL import Image

    from . import ply

    rng = np.random.default_rng(seed)
    rows = []
    header = ["index"]
    for t in range(1, seq_len + 1):
        header += [f"unit1_rgb_{t}", f"unit1_lidar_{t}", f"unit1_radar_{t}"]
    header += ["unit2_loc_1", "unit2_loc_2", "unit1_loc", "unit1_beam"]

    for s in scenarios:
        base = os.path.join(root, s, "unit1")
        for sub in ("camera_data", "lidar_data", "radar_data_ang",
                    "radar_data_vel"):
            os.makedirs(os.path.join(base, sub), exist_ok=True)
        os.makedirs(os.path.join(root, s, "unit2", "GPS_data"), exist_ok=True)
        os.makedirs(os.path.join(base, "GPS_data"), exist_ok=True)

        bs_path = f"./{s}/unit1/GPS_data/gps_loc.txt"
        np.savetxt(os.path.join(root, bs_path[2:]),
                   [33.42 + rng.normal(scale=1e-5), -111.93])

        for i in range(n_samples):
            row = [len(rows)]
            for t in range(1, seq_len + 1):
                fid = i * seq_len + t
                cam = f"./{s}/unit1/camera_data/{s}_{fid}.jpg"
                Image.fromarray(
                    rng.integers(0, 255, (32, 48, 3), dtype=np.uint8),
                    "RGB").save(os.path.join(root, cam[2:]))
                lid = f"./{s}/unit1/lidar_data/{fid}.ply"
                pts = rng.uniform(-40, 10, size=(200, 3))
                ply.write_points(os.path.join(root, lid[2:]), pts)
                rad = f"./{s}/unit1/radar_data/{fid}.npy"
                for kind in ("ang", "vel"):
                    np.save(os.path.join(
                        root, s, "unit1", f"radar_data_{kind}", f"{fid}.npy"),
                        rng.uniform(0, 1, (256, 256)).astype(np.float32))
                row += [cam, lid, rad]
            g1 = f"./{s}/unit2/GPS_data/{i}_1.txt"
            g2 = f"./{s}/unit2/GPS_data/{i}_2.txt"
            for g in (g1, g2):
                np.savetxt(os.path.join(root, g[2:]),
                           [33.42 + rng.normal(scale=1e-4),
                            -111.93 + rng.normal(scale=1e-4)])
            row += [g1, g2, bs_path, int(rng.integers(1, 65))]
            rows.append(row)

    csv_name = "fake_index.csv"
    import csv as _csv
    with open(os.path.join(root, csv_name), "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(header)
        w.writerows(rows)
    return csv_name


def make_demo_root(root, n_train=3, n_adapt=2, n_test=2, seq_len=2, seed=0):
    """Builds the full three-split data_root the training CLI expects
    (train2_seq.py:457-465,517-522): Multi_Modal (dev),
    Adaptation_dataset_multi_modal, Multi_Modal_Test, each with its
    reference-named index CSV.  Returns ``root``.
    """
    splits = [
        ("Multi_Modal", "ml_challenge_dev_multi_modal.csv", n_train, 0),
        ("Adaptation_dataset_multi_modal",
         "ml_challenge_data_adaptation_multi_modal.csv", n_adapt, 1),
        ("Multi_Modal_Test", "ml_challenge_test_multi_modal.csv", n_test, 2),
    ]
    for sub, csv_name, n, seed_off in splits:
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        tmp = make_fake_dataset_tree(d + os.sep, n_samples=n,
                                     seq_len=seq_len, seed=seed + seed_off)
        os.replace(os.path.join(d, tmp), os.path.join(d, csv_name))
    return root
