"""PLY IO round-trip tests (replaces Open3D IO, SURVEY.md section 2b)."""

import numpy as np
import pytest

from deepsense6g_tii_tpu.utils import ply


class TestPly:
    def test_ascii_roundtrip(self, tmp_path, rng):
        pts = rng.normal(size=(100, 3))
        p = tmp_path / "a.ply"
        ply.write_points(p, pts, ascii=True)
        out = ply.read_points(p)
        np.testing.assert_allclose(out, pts, rtol=1e-9)

    def test_binary_roundtrip(self, tmp_path, rng):
        pts = rng.normal(size=(50, 3))
        p = tmp_path / "b.ply"
        ply.write_points(p, pts, ascii=False)
        np.testing.assert_allclose(ply.read_points(p), pts)

    def test_float32_binary(self, tmp_path, rng):
        # files written by other tools often use float32 vertices
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        p = tmp_path / "f32.ply"
        header = (b"ply\nformat binary_little_endian 1.0\n"
                  b"element vertex 10\n"
                  b"property float x\nproperty float y\nproperty float z\n"
                  b"end_header\n")
        p.write_bytes(header + pts.astype("<f4").tobytes())
        np.testing.assert_allclose(ply.read_points(p), pts, rtol=1e-6)

    def test_extra_properties(self, tmp_path):
        header = (b"ply\nformat ascii 1.0\nelement vertex 2\n"
                  b"property double x\nproperty double y\nproperty double z\n"
                  b"property uchar intensity\nend_header\n"
                  b"1 2 3 9\n4 5 6 8\n")
        p = tmp_path / "e.ply"
        p.write_bytes(header)
        out = ply.read_points(p)
        np.testing.assert_allclose(out, [[1, 2, 3], [4, 5, 6]])

    def test_empty_cloud(self, tmp_path):
        p = tmp_path / "z.ply"
        ply.write_points(p, np.zeros((0, 3)))
        assert ply.read_points(p).shape == (0, 3)

    def test_not_ply_raises(self, tmp_path):
        p = tmp_path / "bad.ply"
        p.write_bytes(b"not a ply\n")
        with pytest.raises(ValueError):
            ply.read_points(p)
