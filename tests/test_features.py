"""Feature-factory parity tests: BEV histogram, radar FFT maps, GPS
normalization, soft targets, flips (SURVEY.md section 2a #3-6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepsense6g_tii_tpu.config import DEFAULT_FOV, SCENARIO_FOV
from deepsense6g_tii_tpu.data import features as F
from deepsense6g_tii_tpu.utils import utm


class TestUTM:
    def test_known_point(self):
        # golden value from the `utm` package documentation
        e, n, zone, letter = utm.from_latlon(51.2, 7.5)
        assert zone == 32
        assert letter == "U"
        np.testing.assert_allclose(e, 395201.3103811303, rtol=1e-9)
        np.testing.assert_allclose(n, 5673135.241182375, rtol=1e-9)

    def test_southern_hemisphere(self):
        e, n, zone, letter = utm.from_latlon(-33.92487, 18.42406)  # Cape Town
        assert zone == 34
        np.testing.assert_allclose(e, 261877.8163, rtol=1e-6)
        np.testing.assert_allclose(n, 6243185.5882, rtol=1e-6)

    def test_vectorized_matches_scalar(self):
        lats = np.array([33.42, 33.43, -12.0])
        lons = np.array([-111.93, -111.92, 45.0])
        ev, nv, zv, _ = utm.from_latlon(lats, lons)
        for i in range(3):
            e, n, z, _ = utm.from_latlon(lats[i], lons[i])
            np.testing.assert_allclose(ev[i], e)
            np.testing.assert_allclose(nv[i], n)
            assert zv[i] == z

    def test_out_of_range_raises(self):
        with pytest.raises(ValueError):
            utm.from_latlon(85.0, 0.0)


class TestLidarBEV:
    def test_np_matches_histogramdd(self, rng):
        pts = rng.uniform(-60, 60, size=(5000, 3))
        bev = F.lidar_to_bev_np(pts, DEFAULT_FOV)
        xb = np.linspace(-50, 0, 257)
        yb = np.linspace(-50, 50, 257)
        hist = np.histogramdd(pts[:, :2], bins=(xb, yb))[0]
        hist[hist > 5] = 5
        np.testing.assert_allclose(bev[0], hist / 5)
        assert bev.shape == (1, 256, 256)

    def test_jnp_matches_np(self, rng):
        for _, fov in SCENARIO_FOV + (("default", DEFAULT_FOV),):
            pts = rng.uniform(-80, 20, size=(3000, 3))
            ref = F.lidar_to_bev_np(pts, fov)
            P = 4096
            padded = np.zeros((P, 2), np.float32)
            padded[:3000] = pts[:, :2]
            mask = np.zeros((P,), np.float32)
            mask[:3000] = 1
            out = np.asarray(F.lidar_to_bev(
                jnp.asarray(padded), jnp.asarray(mask),
                jnp.asarray(fov, jnp.float32)))
            np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_clip_at_five(self):
        pts = np.tile(np.array([[-25.0, 0.0]]), (10, 1))
        bev = F.lidar_to_bev_np(pts, DEFAULT_FOV)
        assert bev.max() == 1.0

    def test_right_edge_inclusive(self):
        pts = np.array([[0.0, 50.0]])  # exactly on the max corner
        bev = F.lidar_to_bev_np(pts, DEFAULT_FOV)
        assert bev[0, 255, 255] == 0.2


class TestRadarMaps:
    def test_jnp_matches_np(self, rng):
        cube = rng.normal(size=(4, 256, 250)) + 1j * rng.normal(size=(4, 256, 250))
        ra_np = F.range_angle_map_np(cube)
        rv_np = F.range_velocity_map_np(cube)
        ra_j, rv_j = jax.jit(F.radar_maps)(jnp.asarray(cube))
        np.testing.assert_allclose(np.asarray(ra_j), F.minmax_np(ra_np), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(rv_j), F.minmax_np(rv_np), rtol=2e-5, atol=2e-5)
        assert ra_np.shape == (256, 256)
        assert rv_np.shape == (256, 256)

    def test_real_input(self, rng):
        cube = rng.normal(size=(4, 256, 250))
        ra = F.range_angle_map_np(cube)
        assert np.isfinite(ra).all()


class TestGPSNormalize:
    def _fake_positions(self, rng, n=6):
        # around the DeepSense scenario area (Phoenix, AZ)
        base = np.array([33.42, -111.93])
        ue = base + rng.normal(scale=1e-4, size=(n, 2, 2))
        bs = np.tile(base, (n, 1))
        scen = ["scenario31", "scenario32", "scenario33", "scenario34",
                "scenario31", "scenario33"][:n]
        return ue, bs, scen

    def test_minmax_path(self, rng):
        ue, bs, scen = self._fake_positions(rng)
        out = F.normalize_loc_np(ue, bs, scen, angle_norm=False)
        assert out.shape == (6, 2, 2)
        # verify the exact formula on sample 0, gps sample 0
        from deepsense6g_tii_tpu.config import POS_MAX, POS_MIN
        diff = (utm.xy_from_latlong(ue[0, 0:1]) - utm.xy_from_latlong(bs[0:1]))[0]
        expect = (diff - np.asarray(POS_MIN)) / (np.asarray(POS_MAX) - np.asarray(POS_MIN))
        np.testing.assert_allclose(out[0, 0], expect, rtol=1e-12)

    def test_angle_path_duplicates_coords(self, rng):
        ue, bs, scen = self._fake_positions(rng)
        out = F.normalize_loc_np(ue, bs, scen, angle_norm=True)
        np.testing.assert_allclose(out[:, 0, 0], out[:, 0, 1])
        np.testing.assert_allclose(out[:, 1, 0], out[:, 1, 1])
        assert (np.abs(out) <= np.pi / 2 + 1e-9).all()

    def test_angle_wrap(self):
        # construct a diff whose arctan-offset exceeds 90 degrees
        ue = np.array([[[33.42, -111.93], [33.42, -111.93]]])
        bs = np.array([[33.4201, -111.9301]])
        out = F.normalize_loc_np(ue, bs, ["scenario32"], angle_norm=True)
        assert np.isfinite(out).all()


class TestSoftTargets:
    def test_matches_scipy_formula(self):
        from scipy import stats
        for idx in [0, 3, 31, 60, 63]:
            ref = np.zeros(64)
            x = np.arange(max(idx - 5, 0), min(idx + 5, 63) + 1)
            ref[x] = stats.norm.pdf(x, idx, 0.5) * 1.25
            np.testing.assert_allclose(F.soft_beam_target_np(idx), ref, atol=1e-12)
            j = np.asarray(F.soft_beam_target(jnp.asarray(idx)))
            np.testing.assert_allclose(j, ref, atol=1e-7)

    def test_flip(self):
        beam = F.soft_beam_target(jnp.asarray(10))
        fb, fi = F.flip_beam_target(beam, jnp.asarray(10))
        assert int(fi) == 53
        np.testing.assert_allclose(np.asarray(fb), np.asarray(beam)[::-1])

    def test_batched(self):
        idx = jnp.asarray([0, 31, 63])
        out = F.soft_beam_target(idx)
        assert out.shape == (3, 64)
        np.testing.assert_allclose(np.asarray(out[1]),
                                   F.soft_beam_target_np(31), atol=1e-7)


class TestImageNorm:
    def test_channels(self):
        x = jnp.full((2, 4, 4, 3), 255.0)
        y = np.asarray(F.normalize_imagenet(x))
        np.testing.assert_allclose(y[..., 0], (1 - 0.485) / 0.229, rtol=1e-6)
        np.testing.assert_allclose(y[..., 2], (1 - 0.406) / 0.225, rtol=1e-6)


class TestFlips:
    def test_hflip_image_hwc(self, rng):
        img = rng.normal(size=(8, 8, 3)).astype(np.float32)
        out = np.asarray(F.hflip_image(jnp.asarray(img)))
        np.testing.assert_allclose(out, img[:, ::-1, :])

    def test_hflip_map(self, rng):
        m = rng.normal(size=(1, 8, 8)).astype(np.float32)
        out = np.asarray(F.hflip_map(jnp.asarray(m)))
        np.testing.assert_allclose(out, m[..., ::-1])
