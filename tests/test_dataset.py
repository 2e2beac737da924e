"""Data-pipeline tests over a synthetic on-disk DeepSense-layout tree:
dataset loading semantics, path rewriting, flip, combinatorics, loader,
cache (SURVEY.md section 2a #3, #11)."""

import os

import numpy as np
import pytest

from deepsense6g_tii_tpu.config import GlobalConfig
from deepsense6g_tii_tpu.data.cache import CachedDataset, build_cache
from deepsense6g_tii_tpu.data.dataset import (BeamDataset, ConcatDataset,
                                              Subset, dataset_augmentation,
                                              random_split)
from deepsense6g_tii_tpu.data.loader import DataLoader

from synthetic_data import make_fake_dataset_tree

CFG = GlobalConfig(seq_len=5, enhanced=1, add_velocity=1, angle_norm=1,
                   custom_FoV_lidar=1)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ds")) + "/"
    csv = make_fake_dataset_tree(root, n_samples=4)
    return root, csv


class TestBeamDataset:
    def test_sample_contract(self, tree):
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        assert len(ds) == 8
        s = ds[0]
        assert s["image"].shape == (5, 256, 256, 3)
        assert s["lidar"].shape == (5, 256, 256, 1)
        assert s["radar"].shape == (5, 256, 256, 2)
        assert s["gps"].shape == (2, 2)
        assert s["beam"].shape == (64,)
        assert s["scenario"] in ("scenario31", "scenario32")
        assert s["beam"].argmax() == s["beamidx"]
        assert 0 <= s["beamidx"] < 64

    def test_no_velocity_single_channel(self, tree):
        root, csv = tree
        ds = BeamDataset(root, csv, CFG.replace(add_velocity=0))
        assert ds[0]["radar"].shape == (5, 256, 256, 1)

    def test_flip_mirrors_everything(self, tree):
        root, csv = tree
        a = BeamDataset(root, csv, CFG)[1]
        b = BeamDataset(root, csv, CFG, flip=True)[1]
        np.testing.assert_allclose(b["image"], a["image"][:, :, ::-1])
        np.testing.assert_allclose(b["lidar"][..., 0],
                                   a["lidar"][:, :, ::-1, 0])
        np.testing.assert_allclose(b["radar"], a["radar"][:, :, ::-1])
        assert b["beamidx"] == 63 - a["beamidx"]
        np.testing.assert_allclose(b["beam"], a["beam"][::-1])
        # gps: only column 1 negated (data2_seq.py:49-50)
        np.testing.assert_allclose(b["gps"][:, 1], -a["gps"][:, 1])
        np.testing.assert_allclose(b["gps"][:, 0], a["gps"][:, 0])

    def test_test_mode_has_no_labels(self, tree):
        root, csv = tree
        s = BeamDataset(root, csv, CFG, test=True)[0]
        assert "beam" not in s and "beamidx" not in s

    def test_gps_angle_norm_values(self, tree):
        root, csv = tree
        s = BeamDataset(root, csv, CFG)[0]
        assert (np.abs(s["gps"]) <= np.pi / 2 + 1e-6).all()
        np.testing.assert_allclose(s["gps"][:, 0], s["gps"][:, 1])


class TestCombinatorics:
    def test_concat_and_split(self, tree):
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        cat = ConcatDataset([ds, ds])
        assert len(cat) == 16
        np.testing.assert_allclose(cat[9]["gps"], ds[1]["gps"])
        a, b = random_split(cat, [12, 4], seed=100)
        assert len(a) == 12 and len(b) == 4
        # deterministic
        a2, _ = random_split(cat, [12, 4], seed=100)
        np.testing.assert_array_equal(a.indices, a2.indices)

    def test_split_validates_lengths(self, tree):
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        with pytest.raises(ValueError):
            random_split(ds, [1, 2])

    def test_augmentation_product_count(self, tree):
        """(8 camera * 3 lidar * 2 radar) - 1 = 47 combos per CSV
        (the reference's 7/2/1 augmentation counts, train2_seq.py:395-397)."""
        root, csv = tree
        aug = dataset_augmentation(root, csv, CFG, camera_aug=1, lidar_aug=1,
                                   radar_aug=1)
        # (2*2*2)-1 = 7 variants of 8 samples
        assert len(aug) == 7 * 8


class TestLoader:
    def test_batches_and_shapes(self, tree):
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        dl = DataLoader(ds, batch_size=3, shuffle=True, num_workers=4)
        batches = list(dl)
        assert len(batches) == 3
        assert batches[0]["image"].shape == (3, 5, 256, 256, 3)
        assert batches[-1]["image"].shape[0] == 2   # ragged tail kept
        assert batches[0]["scenario"].shape == (3,)

    def test_shuffle_differs_per_epoch_but_seeded(self, tree):
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        dl1 = DataLoader(ds, batch_size=8, shuffle=True, seed=7)
        e1 = next(iter(dl1))["beamidx"]
        e2 = next(iter(dl1))["beamidx"]
        dl2 = DataLoader(ds, batch_size=8, shuffle=True, seed=7)
        f1 = next(iter(dl2))["beamidx"]
        np.testing.assert_array_equal(e1, f1)   # same seed, same epoch
        assert not np.array_equal(e1, e2)       # reshuffled across epochs

    def test_drop_last(self, tree):
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        dl = DataLoader(ds, batch_size=3, drop_last=True)
        assert len(list(dl)) == 2


class TestCache:
    def test_roundtrip(self, tree, tmp_path):
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        cache_dir = build_cache(ds, str(tmp_path / "cache"))
        cds = CachedDataset(cache_dir)
        assert len(cds) == len(ds)
        a, b = ds[2], cds[2]
        np.testing.assert_allclose(b["image"], a["image"], atol=0.5)  # f16
        np.testing.assert_allclose(b["lidar"], a["lidar"], atol=1e-3)
        np.testing.assert_allclose(b["gps"], a["gps"], atol=1e-3)
        assert b["beamidx"] == a["beamidx"]
        assert b["scenario"] == a["scenario"]

    def test_idempotent(self, tree, tmp_path):
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        d = str(tmp_path / "cache2")
        assert build_cache(ds, d) == build_cache(ds, d)

    def test_multistep_labels_roundtrip(self, tmp_path):
        """30to5 variant: per-sample beamidx is (pred_len,) — the cache must
        preserve the vector labels (data2_seq_30to5.py:160-172)."""

        class _Fake:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                r = np.random.default_rng(i)
                return {
                    "image": r.uniform(0, 255, (2, 8, 8, 3)).astype(np.float32),
                    "gps": r.normal(size=(2, 2)).astype(np.float32),
                    "beam": r.uniform(0, 1, (5, 64)).astype(np.float32),
                    "beamidx": r.integers(0, 64, (5,)).astype(np.int32),
                    "scenario": f"scenario{31 + i}",
                }

        ds = _Fake()
        cds = CachedDataset(build_cache(ds, str(tmp_path / "c30to5")))
        for i in (0, 3):
            a, b = ds[i], cds[i]
            assert b["beamidx"].shape == (5,)
            np.testing.assert_array_equal(b["beamidx"], a["beamidx"])
            np.testing.assert_allclose(b["beam"], a["beam"], atol=1e-3)

    def test_feeds_loader(self, tree, tmp_path):
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        cds = CachedDataset(build_cache(ds, str(tmp_path / "cache3")))
        batch = next(iter(DataLoader(cds, batch_size=4)))
        assert batch["image"].shape == (4, 5, 256, 256, 3)

    def test_batch_loader_matches_classic(self, tree, tmp_path):
        """CachedBatchLoader (one f16 gather per modality per batch) yields
        the exact batches of DataLoader(CachedDataset) with the same
        shuffle seed, modulo the deferred f16->f32 upcast (which the train
        step does on device, train/steps.py::_upcast_f16)."""
        from deepsense6g_tii_tpu.data.cache import CachedBatchLoader
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        d = build_cache(ds, str(tmp_path / "cache4"))
        classic = DataLoader(CachedDataset(d), batch_size=3, shuffle=True,
                             seed=11, num_workers=2)
        fast = CachedBatchLoader(d, batch_size=3, shuffle=True, seed=11)
        assert len(fast) == len(classic)
        for a, b in zip(classic, fast):
            for k in ("image", "lidar", "radar", "gps", "beam"):
                # image rides the exact-uint8 storage when the imagery is
                # uint8-valued; lidar the scaled-uint8 clip-count storage
                # (raw counts over h2d, /5 on device); everything else f16
                assert b[k].dtype == (np.uint8 if k in ("image", "lidar")
                                      else np.float16)
                dq = (b[k].astype(np.float32) / np.float32(5.0)
                      if k == "lidar" else b[k].astype(np.float32))
                np.testing.assert_array_equal(a[k], dq)
            np.testing.assert_array_equal(a["beamidx"], b["beamidx"])
            np.testing.assert_array_equal(a["scenario"], b["scenario"])
        # second epoch reshuffles identically across the two loaders
        e2a = next(iter(classic))
        e2b = next(iter(fast))
        np.testing.assert_array_equal(e2a["beamidx"], e2b["beamidx"])

    def test_uint8_image_storage(self, tree, tmp_path):
        """Camera frames are uint8-valued JPEG decodes: the cache stores
        them uint8 (half the f16 bytes) and serves them back exactly;
        non-integral imagery falls back to float16."""
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        d = build_cache(ds, str(tmp_path / "c_u8"))
        import json
        with open(os.path.join(d, "manifest.json")) as f:
            specs = json.load(f)["specs"]
        assert specs["image"]["dtype"] == "uint8"
        a, b = ds[1], CachedDataset(d)[1]
        np.testing.assert_array_equal(b["image"], a["image"])  # exact
        assert b["image"].dtype == np.float32   # classic path upcasts

        class _Frac:
            def __len__(self):
                return 2

            def __getitem__(self, i):
                s = dict(ds[i])
                s["image"] = s["image"] + 0.25   # non-integral
                return s

        d2 = build_cache(_Frac(), str(tmp_path / "c_frac"))
        with open(os.path.join(d2, "manifest.json")) as f:
            assert json.load(f)["specs"]["image"]["dtype"] == "float16"

    def test_uint8_lidar_storage(self, tree, tmp_path):
        """Full-resolution BEV maps are clip-counts/5 on a six-level grid
        (features.py::lidar_to_bev_np): the cache stores the raw counts
        uint8 with scale 5 in the manifest and both read paths reconstruct
        the float32 map bit-exactly.  Off-grid maps (e.g. a block-mean
        input_resolution shrink) fall back to float16."""
        import json
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        d = build_cache(ds, str(tmp_path / "c_lid"))
        with open(os.path.join(d, "manifest.json")) as f:
            spec = json.load(f)["specs"]["lidar"]
        assert spec["dtype"] == "uint8" and spec["scale"] == 5.0
        a, b = ds[1], CachedDataset(d)[1]
        assert b["lidar"].dtype == np.float32
        np.testing.assert_array_equal(b["lidar"], a["lidar"])   # exact

        class _OffGrid:
            def __len__(self):
                return 2

            def __getitem__(self, i):
                s = dict(ds[i])
                s["lidar"] = s["lidar"] * 0.5 + 0.01   # off the /5 grid
                return s

        d2 = build_cache(_OffGrid(), str(tmp_path / "c_lid_f16"))
        with open(os.path.join(d2, "manifest.json")) as f:
            spec2 = json.load(f)["specs"]["lidar"]
        assert spec2["dtype"] == "float16" and spec2["scale"] == 1.0

    def test_uint8_radar_opt_in(self, tree, tmp_path):
        """radar_dtype="uint8" (opt-in, lossy): continuous [0, 1] minmax
        maps stored as fixed-point round(v*255) — absolute error <= 1/510;
        CachedBatchLoader ships the raw uint8 (the step divides by 255 on
        device) and CachedDataset dequantizes host-side.  Default float16
        is unaffected."""
        import json
        from deepsense6g_tii_tpu.data.cache import CachedBatchLoader
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        d = build_cache(ds, str(tmp_path / "c_ru8"), radar_dtype="uint8")
        with open(os.path.join(d, "manifest.json")) as f:
            spec = json.load(f)["specs"]["radar"]
        assert spec["dtype"] == "uint8" and spec["scale"] == 255.0
        a, b = ds[1], CachedDataset(d)[1]
        assert b["radar"].dtype == np.float32
        np.testing.assert_allclose(b["radar"], a["radar"],
                                   atol=0.5 / 255.0 + 1e-7)
        fast = next(iter(CachedBatchLoader(d, batch_size=2)))
        assert fast["radar"].dtype == np.uint8
        np.testing.assert_array_equal(
            fast["radar"][1].astype(np.float32) / np.float32(255.0),
            b["radar"])

    def test_lidar_dtype_override(self, tree, tmp_path):
        """lidar_dtype="float16" forces float16 storage even when every map
        sits on the six-level grid (mirror of image_dtype, ADVICE r3)."""
        import json
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        d = build_cache(ds, str(tmp_path / "c_lidf16"),
                        lidar_dtype="float16")
        with open(os.path.join(d, "manifest.json")) as f:
            spec = json.load(f)["specs"]["lidar"]
        assert spec["dtype"] == "float16" and spec["scale"] == 1.0

    def test_midbuild_quantize_fallback(self, tree, tmp_path):
        """Sample 0 on the uint8 grid but a later sample off it: the build
        transparently restarts with that modality forced to float16 instead
        of dying mid-build (ADVICE r3 medium)."""
        import json
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)

        class _Tricky:
            def __len__(self):
                return 3

            def __getitem__(self, i):
                s = dict(ds[i])
                if i == 0:
                    s["lidar"] = np.zeros_like(s["lidar"])   # on-grid
                    s["image"] = np.zeros_like(s["image"])   # uint8-exact
                else:
                    s["lidar"] = s["lidar"] * 0.5 + 0.01     # off-grid
                    s["image"] = s["image"] + 0.25           # non-integral
                return s

        tds = _Tricky()
        d = build_cache(tds, str(tmp_path / "c_trick"), num_workers=2)
        with open(os.path.join(d, "manifest.json")) as f:
            specs = json.load(f)["specs"]
        assert specs["lidar"]["dtype"] == "float16"
        assert specs["image"]["dtype"] == "float16"
        cds = CachedDataset(d)
        np.testing.assert_allclose(cds[2]["lidar"], tds[2]["lidar"],
                                   atol=1e-3)

    def test_explicit_uint8_request_rejected(self, tree, tmp_path):
        """image/lidar uint8 storage is auto-selected only (needs per-sample
        exactness proofs); an explicit "uint8" request could silently become
        float16 through the mid-build restart, so it is rejected up front
        (ADVICE r4)."""
        import pytest
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        with pytest.raises(ValueError, match="image_dtype"):
            build_cache(ds, str(tmp_path / "c_iu8"), image_dtype="uint8")
        with pytest.raises(ValueError, match="lidar_dtype"):
            build_cache(ds, str(tmp_path / "c_lu8"), lidar_dtype="uint8")
        with pytest.raises(ValueError, match="radar_dtype"):
            build_cache(ds, str(tmp_path / "c_rbad"), radar_dtype="int8")

    def test_radar_dtype_mismatch_raises(self, tree, tmp_path):
        """An existing manifest with a different radar storage mode must not
        be silently served (lossy vs exact values differ, ADVICE r3)."""
        import pytest
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        d = str(tmp_path / "c_swap")
        build_cache(ds, d)
        with pytest.raises(ValueError, match="radar dtype"):
            build_cache(ds, d, radar_dtype="uint8")
        build_cache(ds, d)    # matching request still idempotent

    def test_stale_format_version_rebuilds(self, tree, tmp_path):
        """A manifest from an older layout revision (no/old format_version)
        is rebuilt, not silently reused (ADVICE r3)."""
        import json
        from deepsense6g_tii_tpu.data.cache import CACHE_FORMAT_VERSION
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        d = build_cache(ds, str(tmp_path / "c_ver"))
        mp = os.path.join(d, "manifest.json")
        with open(mp) as f:
            m = json.load(f)
        m.pop("format_version")
        with open(mp, "w") as f:
            json.dump(m, f)
        build_cache(ds, d)
        with open(mp) as f:
            assert json.load(f)["format_version"] == CACHE_FORMAT_VERSION
        a, b = ds[1], CachedDataset(d)[1]
        np.testing.assert_allclose(b["lidar"], a["lidar"], atol=1e-3)

    def test_batch_loader_drop_last(self, tree, tmp_path):
        from deepsense6g_tii_tpu.data.cache import CachedBatchLoader
        root, csv = tree
        ds = BeamDataset(root, csv, CFG)
        d = build_cache(ds, str(tmp_path / "cache5"))
        n = len(ds)
        dl = CachedBatchLoader(d, batch_size=n - 1, drop_last=True)
        assert len(list(dl)) == 1


class TestShardForProcess:
    def test_equal_disjoint_truncated(self):
        from deepsense6g_tii_tpu.data.dataset import shard_for_process
        ds = list(range(10))
        shards = [shard_for_process(ds, p, 3) for p in range(3)]
        assert all(len(s) == 3 for s in shards)     # truncated to 9 rows
        seen = sorted(s[i] for s in shards for i in range(3))
        assert len(set(seen)) == 9                  # disjoint coverage

    def test_single_process_identity(self):
        from deepsense6g_tii_tpu.data.dataset import shard_for_process
        ds = list(range(5))
        assert shard_for_process(ds, 0, 1) is ds

    def test_too_many_processes_raises(self):
        from deepsense6g_tii_tpu.data.dataset import shard_for_process
        with pytest.raises(ValueError, match="sharded over"):
            shard_for_process(list(range(3)), 0, 4)
