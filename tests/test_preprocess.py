"""Offline preprocessing-tool tests: radar pipeline, LiDAR background
filtering (KD-tree vs accelerator NN backends), augmentation writers, CSV
builder (SURVEY.md section 2a #6-10, #27)."""

import os

import numpy as np
import pytest
from PIL import Image

from deepsense6g_tii_tpu.data import features as F
from deepsense6g_tii_tpu.data.preprocess import augment, csv_builder, radar
from deepsense6g_tii_tpu.data.preprocess import lidar_filter as LF
from deepsense6g_tii_tpu.utils import ply


class TestRadarPipeline:
    def test_process_scenario_layout(self, tmp_path, rng):
        raw = tmp_path / "unit1" / "radar_data"
        raw.mkdir(parents=True)
        for i in range(3):
            np.save(raw / f"radar_{i}.npy",
                    rng.normal(size=(4, 64, 50)).astype(np.float32))
        written = radar.process_scenario(str(raw))
        assert len(written) == 3
        ang = np.load(tmp_path / "unit1" / "radar_data_ang" / "radar_0.npy")
        vel = np.load(tmp_path / "unit1" / "radar_data_vel" / "radar_0.npy")
        assert ang.shape == (64, 256) and vel.shape == (64, 256)
        assert 0 <= ang.min() and ang.max() == pytest.approx(1.0, abs=1e-5)

    def test_batch_matches_file(self, rng):
        cubes = rng.normal(size=(2, 4, 64, 50)).astype(np.float32)
        ra_b, rv_b = radar.process_batch(cubes)
        ra_0, rv_0 = radar.process_file(cubes[0])
        np.testing.assert_allclose(ra_b[0], ra_0, atol=1e-5)
        np.testing.assert_allclose(rv_b[0], rv_0, atol=1e-5)

    def test_repeat_calls_hit_the_jit_cache(self, rng):
        """The jitted FFT pipeline must be a module-level callable: a fresh
        jax.jit wrapper per call would re-trace for every 64-cube chunk of a
        scenario (regression)."""
        cubes = rng.normal(size=(2, 4, 64, 50)).astype(np.float32)
        radar.process_batch(cubes)
        before = radar._jit_radar_maps_batch._cache_size()
        radar.process_batch(cubes)
        radar.process_batch(cubes.copy())
        assert radar._jit_radar_maps_batch._cache_size() == before


class TestLidarFilter:
    def _static_scene(self, rng, n=500):
        return rng.uniform(-20, 20, size=(n, 3))

    def test_threshold_formula(self):
        pts = np.array([[30.0, 0.0, 5.0], [0.0, 0.0, 0.0]])
        f = LF.filter_threshold(pts)
        assert f[0] == pytest.approx(0.3 + 4.7 * 1.0)
        assert f[1] == pytest.approx(0.3)

    def test_backends_agree(self, rng):
        q = rng.normal(size=(100, 3))
        pts = rng.normal(size=(300, 3))
        a = LF.nearest_neighbors_kdtree(q, pts)
        b = LF.nearest_neighbors_tpu(q, pts, block=32)
        np.testing.assert_array_equal(pts[a], pts[b])

    def test_background_and_filter(self, rng):
        static = self._static_scene(rng)
        frames = [static + rng.normal(scale=0.01, size=static.shape)
                  for _ in range(4)]
        # a "car" far from the static background in frame 3
        moving = np.array([[5.0, 5.0, 1.0]]) + rng.normal(
            scale=0.05, size=(30, 3))
        frame_with_car = np.vstack([frames[3], moving + 50.0])
        bg = LF.build_background(frames[:3], min_points=100)
        assert bg.shape[0] > 0
        filtered = LF.filter_frame(frame_with_car, bg)
        # static points dropped, far-away car points survive
        assert filtered.shape[0] <= 40
        assert (filtered[:, 0] > 40).all()

    def test_process_scenario_writes_filtered(self, tmp_path, rng):
        src = tmp_path / "lidar_data"
        src.mkdir()
        static = self._static_scene(rng, 200)
        for i in range(3):
            ply.write_points(src / f"{i}.ply",
                             static + rng.normal(scale=0.01, size=static.shape))
        out = tmp_path / "lidar_data_filtered"
        bg = LF.process_scenario([str(src)], [str(out)], "scenario_x",
                                 background_path=str(tmp_path / "bg.ply"),
                                 min_points=100)
        assert bg.shape[0] > 0
        assert len(os.listdir(out)) == 3
        assert os.path.exists(tmp_path / "bg.ply")


class TestAugment:
    def test_image_seven_variants(self, tmp_path, rng):
        src = tmp_path / "cam"
        src.mkdir()
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8),
                        "RGB").save(src / "a.jpg")
        n = augment.augment_image_dir(str(src), str(tmp_path / "cam_aug"))
        assert n == 1
        names = sorted(os.listdir(tmp_path / "cam_aug"))
        assert names == [f"a_{k}.jpg" for k in range(1, 8)]

    def test_lidar_variants(self, rng):
        pts = rng.normal(size=(100, 3))
        down, jit = augment.augment_lidar(pts, np.random.default_rng(0))
        assert down.shape[0] == 90
        assert jit.shape == pts.shape
        assert np.abs(jit - pts).max() <= 0.4

    def test_radar_noise_bounds(self, rng):
        m = rng.uniform(0.1, 1.0, size=(16, 16))
        out = augment.augment_radar_map(m, np.random.default_rng(0))
        assert out.min() == 0.0 and out.max() == pytest.approx(1.0)

    def test_radar_dirs(self, tmp_path, rng):
        ang = tmp_path / "radar_data_ang"
        vel = tmp_path / "radar_data_vel"
        ang.mkdir(), vel.mkdir()
        np.save(ang / "r_1.npy", rng.uniform(0, 1, (8, 8)))
        np.save(vel / "r_1.npy", rng.uniform(0, 1, (8, 8)))
        n = augment.augment_radar_dirs(str(ang), str(vel))
        assert n == 1
        assert os.path.exists(tmp_path / "radar_data_ang_aug" / "r_1.npy")


class TestCsvBuilder:
    def _make_tree(self, root, rng, scen="scenario32", ids=range(12, 40, 2)):
        for sub in ("camera_data", "radar_data", "lidar_data", "mmWave_data",
                    "GPS_data"):
            os.makedirs(os.path.join(root, scen, "unit1", sub), exist_ok=True)
        os.makedirs(os.path.join(root, scen, "unit2", "GPS_data"),
                    exist_ok=True)
        for i in ids:
            open(os.path.join(root, scen, "unit1", "camera_data",
                              f"cam_{i}.jpg"), "w").close()
            open(os.path.join(root, scen, "unit1", "radar_data",
                              f"radar_{i}.npy"), "w").close()
            open(os.path.join(root, scen, "unit1", "lidar_data",
                              f"lidar_{i}.ply"), "w").close()
            pwr = rng.uniform(0, 1, 64)
            with open(os.path.join(root, scen, "unit1", "mmWave_data",
                                   f"pwr_{i}.txt"), "w") as f:
                f.write("\n".join(f"{v:.6f}" for v in pwr))
        for i in range(0, 60, 6):
            with open(os.path.join(root, scen, "unit2", "GPS_data",
                                   f"gps_{i}.txt"), "w") as f:
                f.write("33.42 -111.93")

    def test_builds_rows(self, tmp_path, rng):
        self._make_tree(str(tmp_path), rng)
        n = csv_builder.create_root_csv(str(tmp_path), "dev.csv", seq_len=3,
                                        pred_len=1,
                                        scenario_list=["scenario32"])
        assert n > 0
        import csv as _csv
        with open(tmp_path / "dev.csv") as f:
            rows = list(_csv.reader(f))
        head = rows[0]
        assert head[0] == "index" and head[1] == "unit1_rgb_1"
        assert "unit1_beam" == head[-1]
        # beam label is 1-indexed argmax of the power file
        beam = int(rows[1][-1])
        assert 1 <= beam <= 64

    def test_scenario_filter(self, tmp_path, rng):
        self._make_tree(str(tmp_path), rng)
        csv_builder.create_root_csv(str(tmp_path), "dev.csv", seq_len=3,
                                    pred_len=1, scenario_list=["scenario32"])
        n = csv_builder.create_scenario_csv(
            str(tmp_path / "dev.csv"), str(tmp_path / "scenario32"),
            "scenario32")
        assert n > 0
        assert os.path.exists(tmp_path / "scenario32.csv")
        n0 = csv_builder.create_scenario_csv(
            str(tmp_path / "dev.csv"), str(tmp_path / "scenario33"),
            "scenario33")
        assert n0 == 0


class TestImageAugmentationParity:
    """Exact torchvision parity for the two variants the VERDICT flagged:
    sharpness U(0,10) unmapped, and anisotropic Gaussian blur (9,7)/(3,5)
    (Image_data_augmentation.py:41-50)."""

    def _img(self, rng, h=40, w=56):
        return Image.fromarray(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8), "RGB")

    def test_gaussian_blur_matches_torch_oracle(self, rng):
        """Oracle: raw torch conv2d replicating torchvision's tensor path
        (_get_gaussian_kernel2d + reflect pad + round/clamp)."""
        import torch
        import torch.nn.functional as tF

        img = self._img(rng)
        got = np.asarray(augment.gaussian_blur(img, (9, 7), (3.0, 5.0)))

        def k1d(size, sigma):
            x = torch.linspace(-(size - 1) * 0.5, (size - 1) * 0.5, size)
            pdf = torch.exp(-0.5 * (x / sigma) ** 2)
            return pdf / pdf.sum()

        kx, ky = k1d(9, 3.0), k1d(7, 5.0)
        kernel2d = torch.mm(ky[:, None], kx[None, :])      # (7, 9)
        t = torch.from_numpy(np.asarray(img)).permute(2, 0, 1).float()[None]
        t = tF.pad(t, [4, 4, 3, 3], mode="reflect")
        out = tF.conv2d(t, kernel2d.expand(3, 1, 7, 9), groups=3)
        want = torch.clamp(torch.round(out), 0, 255).byte()[0] \
            .permute(1, 2, 0).numpy()
        np.testing.assert_array_equal(got, want)

    def test_sharpness_factor_unmapped(self, rng):
        """The 6th variant must be enhance(U(0,10)) with no remap: replaying
        the same rng stream through explicit ImageEnhance calls reproduces
        every variant byte-for-byte."""
        from PIL import ImageEnhance

        img = self._img(rng)
        seed_rng = np.random.default_rng(7)
        variants = list(augment.augment_image(img, seed_rng))

        replay = np.random.default_rng(7)
        ImageEnhance.Brightness(img).enhance(replay.uniform(0.5, 3))
        ImageEnhance.Contrast(img).enhance(replay.uniform(0.5, 4))
        replay.uniform(0.5, 3)                      # gamma draw
        replay.uniform(-0.5, 0.5)                   # hue draw
        ImageEnhance.Color(img).enhance(replay.uniform(0, 4))
        factor = replay.uniform(0, 10)
        want = ImageEnhance.Sharpness(img).enhance(factor)
        np.testing.assert_array_equal(np.asarray(variants[5]),
                                      np.asarray(want))
        assert 0.0 <= factor <= 10.0

    def test_adjust_gamma_matches_torchvision_lut(self, rng):
        """Oracle: torchvision F_pil.adjust_gamma builds its table as
        int((255 + 1 - 1e-3) * (i/255)**gamma) — TRUNCATION at a 255.999
        scale, not round-to-nearest (the two differ on 72/256 entries at
        gamma=2).  Applied per-pixel in NumPy, independent of img.point."""
        img = self._img(rng)
        arr = np.asarray(img).astype(np.float64)
        for gamma in (0.5, 1.0, 2.0, 2.9):
            got = np.asarray(augment.adjust_gamma(img, gamma))
            want = np.floor(
                (255 + 1 - 1e-3) * (arr / 255.0) ** gamma).astype(np.uint8)
            np.testing.assert_array_equal(got, want)
