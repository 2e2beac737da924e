"""Native C++ loader tests: PLY parse, BEV histogram, batch path, k-d tree —
all verified bit-for-bit against the Python implementations."""

import numpy as np
import pytest

from deepsense6g_tii_tpu.config import DEFAULT_FOV
from deepsense6g_tii_tpu.data import features as F
from deepsense6g_tii_tpu.runtime import native
from deepsense6g_tii_tpu.utils import ply

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


class TestNativePly:
    @pytest.mark.parametrize("ascii_mode", [True, False])
    def test_read_matches_python(self, tmp_path, rng, ascii_mode):
        pts = rng.normal(size=(500, 3)) * 30
        p = str(tmp_path / "c.ply")
        ply.write_points(p, pts, ascii=ascii_mode)
        got = native.read_ply(p)
        want = ply.read_points(p)
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_float32_vertices(self, tmp_path, rng):
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        p = tmp_path / "f32.ply"
        header = (b"ply\nformat binary_little_endian 1.0\n"
                  b"element vertex 10\n"
                  b"property float x\nproperty float y\nproperty float z\n"
                  b"end_header\n")
        p.write_bytes(header + pts.astype("<f4").tobytes())
        np.testing.assert_allclose(native.read_ply(str(p)), pts, rtol=1e-6)

    def test_bad_file_returns_none(self, tmp_path):
        p = tmp_path / "bad.ply"
        p.write_bytes(b"not a ply")
        assert native.read_ply(str(p)) is None


class TestNativeBev:
    def test_matches_numpy_histogram(self, rng):
        pts = rng.uniform(-60, 60, size=(20000, 3))
        want = F.lidar_to_bev_np(pts, DEFAULT_FOV)[0]
        got = native.bev_histogram(pts, DEFAULT_FOV)
        np.testing.assert_allclose(got, want, atol=1e-7)

    def test_edge_inclusive(self):
        pts = np.array([[0.0, 50.0, 1.0]])
        got = native.bev_histogram(pts, DEFAULT_FOV)
        assert got[255, 255] == pytest.approx(0.2)

    def test_batch_matches_single(self, tmp_path, rng):
        paths, fovs, singles = [], [], []
        for i in range(6):
            pts = rng.uniform(-45, 45, size=(1000, 3))
            p = str(tmp_path / f"{i}.ply")
            ply.write_points(p, pts, ascii=(i % 2 == 0))
            paths.append(p)
            fovs.append(DEFAULT_FOV)
            singles.append(F.lidar_to_bev_np(pts, DEFAULT_FOV)[0])
        out = native.batch_ply_to_bev(paths, np.asarray(fovs), n_threads=4)
        np.testing.assert_allclose(out, np.stack(singles), atol=1e-7)

    def test_batch_failure_propagates(self, tmp_path):
        p = tmp_path / "x.ply"
        p.write_bytes(b"junk")
        assert native.batch_ply_to_bev([str(p)], np.asarray([DEFAULT_FOV])) \
            is None


class TestNativeKdTree:
    def test_matches_scipy(self, rng):
        from scipy.spatial import cKDTree
        pts = rng.normal(size=(3000, 3))
        queries = rng.normal(size=(500, 3))
        tree = native.KdTree(pts)
        got = tree.nearest(queries, n_threads=4)
        _, want = cKDTree(pts).query(queries, k=1)
        # indices may differ on exact ties; compare the neighbor points
        np.testing.assert_allclose(pts[got], pts[want])

    def test_single_point(self):
        tree = native.KdTree(np.array([[1.0, 2.0, 3.0]]))
        assert tree.nearest(np.array([[0.0, 0.0, 0.0]]))[0] == 0
