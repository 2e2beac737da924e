"""CSV-indexed multi-modal dataset — the CARLA_Data equivalent.

Faithful port of the reference loading semantics
(/root/reference/data2_seq.py:20-173): per sample, ``seq_len`` frames of
(camera jpg resized to 256x256, LiDAR .ply -> BEV histogram, radar
range-angle [+ range-velocity] .npy), 2 normalized GPS samples, the scenario
tag, and a Gaussian soft beam target.  Path rewriting selects enhanced vs
_raw camera, _mask/_seg overlays, filtered LiDAR and the offline-augmented
variants; ``flip`` produces the horizontally-mirrored copy.

Output layout is TPU-native NHWC: image (T, 256, 256, 3) float32 0..255,
lidar (T, 256, 256, 1), radar (T, 256, 256, 1|2), gps (2, 2).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..config import GlobalConfig
from ..utils import ply
from . import features as F

def _shrink_map(arr: np.ndarray, res: int) -> np.ndarray:
    """Block-mean downsample of a square on-disk map (radar .npy / BEV are
    produced at 256) to ``config.input_resolution``.  No-op at the reference
    256 — this only serves the debug/experiment geometry knobs."""
    s = arr.shape[0]
    if s == res:
        return arr
    if s % res:
        raise ValueError(f"input_resolution {res} must divide map size {s}")
    k = s // res
    return arr.reshape(res, k, res, k).mean(axis=(1, 3)).astype(arr.dtype)


def _insert_tag(path: str, tag: str, pos: int = 30) -> str:
    """The reference's hard-coded path surgery: path[:30]+tag+path[30:]
    (data2_seq.py:109,127,132)."""
    return path[:pos] + tag + path[pos:]


class BeamDataset:
    """Map-style dataset over one index CSV.

    ``augment`` selects offline-augmentation variants per modality
    (data2_seq.py:65-88): camera k in 0..7, lidar k in 0..2, radar k in 0..1.
    """

    def __init__(self, root: str, root_csv: str, config: GlobalConfig,
                 test: bool = False,
                 augment: Optional[Dict[str, int]] = None,
                 flip: bool = False):
        import pandas as pd
        self.dataframe = pd.read_csv(root + root_csv)
        self.root = root
        self.config = config
        self.seq_len = config.seq_len
        self.test = test
        self.augment = augment or {"camera": 0, "lidar": 0, "radar": 0}
        self.flip = flip
        self.pos_input_normalized = self._load_gps()

    # -- GPS (data2_seq.py:223-281) ------------------------------------------

    def _load_gps(self) -> np.ndarray:
        df = self.dataframe
        n = len(df)
        pos_ue = np.zeros((n, 2, 2))
        pos_bs = np.zeros((n, 2))
        scenarios = []
        for i in range(n):
            pos_ue[i, 0] = np.loadtxt(
                os.path.join(self.root, df["unit2_loc_1"][i][2:]))
            pos_ue[i, 1] = np.loadtxt(
                os.path.join(self.root, df["unit2_loc_2"][i][2:]))
            pos_bs[i] = np.loadtxt(
                os.path.join(self.root, df["unit1_loc"][i][2:]))
            scenarios.append(df["unit1_loc"][i])
        return F.normalize_loc_np(pos_ue, pos_bs, scenarios,
                                  angle_norm=bool(self.config.angle_norm))

    def __len__(self) -> int:
        return len(self.dataframe)

    # -- path selection (data2_seq.py:62-132) --------------------------------

    def _camera_path(self, t: int, index: int) -> str:
        path = self.dataframe[f"unit1_rgb_{t}"][index]
        if self.augment["camera"] > 0:
            path = re.sub("camera_data/", "camera_data_aug/", path)
            return path[:-4] + "_" + str(self.augment["camera"]) + ".jpg"
        cfg = self.config
        if "scenario31" in path or "scenario32" in path:
            if cfg.add_mask:
                return _insert_tag(path, "_mask")
            return path          # seg overlay handled at load time
        if cfg.add_mask and cfg.enhanced:
            raise ValueError("mask or enhance, both are not possible")
        if cfg.add_mask:
            return _insert_tag(path, "_mask")
        if cfg.enhanced:
            return path
        return _insert_tag(path, "_raw")

    def _lidar_path(self, t: int, index: int) -> str:
        path = self.dataframe[f"unit1_lidar_{t}"][index]
        if self.augment["lidar"] > 0:
            path = re.sub("lidar_data/", "lidar_data_aug/", path)
            return path[:-4] + "_" + str(self.augment["lidar"]) + ".ply"
        if self.config.filtered:
            return re.sub("lidar_data/", "lidar_data_filtered/", path)
        return path

    def _radar_path(self, t: int, index: int) -> str:
        path = self.dataframe[f"unit1_radar_{t}"][index]
        sub = "radar_data_ang_aug/" if self.augment["radar"] > 0 \
            else "radar_data_ang/"
        return re.sub("radar_data/", sub, path)

    # -- loading -------------------------------------------------------------

    def _load_image(self, rel: str, index: int) -> np.ndarray:
        from PIL import Image
        cfg = self.config
        res = cfg.input_resolution      # reference: fixed 256 (data2_seq.py:112)
        img = np.array(Image.open(self.root + rel).resize((res, res)))
        if (self.augment["camera"] == 0 and cfg.add_seg and not cfg.add_mask
                and ("scenario31" in rel or "scenario32" in rel)):
            # blend the car-segmentation overlay (data2_seq.py:113-121):
            # imgs*0.8 + (imgs & seg_mask)*0.5, uint8-saturating like
            # cv2.addWeighted
            seg = np.array(Image.open(
                self.root + _insert_tag(rel, "_seg")).resize((res, res)))
            a = seg[..., 2:3].repeat(3, axis=2)
            seg_car = np.bitwise_and(img, a)
            img = np.clip(np.rint(img * 0.8 + seg_car * 0.5), 0,
                          255).astype(np.uint8)
        return img

    @staticmethod
    def _lidar_bev(path: str, fov) -> np.ndarray:
        """PLY -> BEV via the C++ loader when built (bit-identical to the
        Python path, tests/test_native.py), else utils.ply + NumPy."""
        from ..runtime import native
        if native.available():
            out = native.batch_ply_to_bev([path], np.asarray([fov]),
                                          n_threads=1)
            if out is not None:
                return out[0]
        return F.lidar_to_bev_np(ply.read_points(path), fov)[0]

    def __getitem__(self, index: int) -> Dict:
        cfg = self.config
        data: Dict = {}
        gps = self.pos_input_normalized[index].copy()
        if self.flip:
            gps[:, 1] = -gps[:, 1]
        data["gps"] = gps.astype(np.float32)

        # scenario tag from the frame-5 camera path (data2_seq.py:92-101)
        anchor = self.dataframe[f"unit1_rgb_{self.seq_len}"][index]
        data["scenario"] = next(
            (s for s in ("scenario31", "scenario32", "scenario33",
                         "scenario34") if s in anchor), "")
        data["loss_weight"] = 1.0

        images, lidars, radars = [], [], []
        for t in range(1, self.seq_len + 1):
            img = self._load_image(self._camera_path(t, index), index)
            if self.flip:
                img = np.ascontiguousarray(np.flip(img, 1))
            images.append(img.astype(np.float32))

            radar_ang = _shrink_map(
                np.load(self.root + self._radar_path(t, index)),
                cfg.input_resolution)
            if self.flip:
                radar_ang = np.ascontiguousarray(np.flip(radar_ang, 1))
            chans = [radar_ang]
            if cfg.add_velocity:
                vel = _shrink_map(
                    np.load(self.root
                            + self._radar_path(t, index).replace("ang", "vel")),
                    cfg.input_resolution)
                if self.flip:
                    vel = np.ascontiguousarray(np.flip(vel, 1))
                chans.append(vel)
            radars.append(np.stack(chans, axis=-1).astype(np.float32))

            lidar_rel = self._lidar_path(t, index)
            fov = F.fov_for_address(lidar_rel, bool(cfg.custom_FoV_lidar))
            bev = _shrink_map(self._lidar_bev(self.root + lidar_rel, fov),
                              cfg.input_resolution)     # (256, 256) native
            if self.flip:
                bev = np.ascontiguousarray(np.flip(bev, 1))
            lidars.append(bev[..., np.newaxis].astype(np.float32))

        data["image"] = np.stack(images)
        data["lidar"] = np.stack(lidars)
        data["radar"] = np.stack(radars)

        if not self.test:
            raw = self.dataframe["unit1_beam"][index]
            if cfg.pred_len > 1:
                # 30to5 labels: "b1_b2_..._bP" (createdata_seq.py:30-39;
                # data2_seq_30to5.py:160-172 emits pred_len soft targets)
                idxs = [int(x) - 1 for x in str(raw).split("_")]
                if len(idxs) != cfg.pred_len:
                    raise ValueError(
                        f"expected {cfg.pred_len} beam labels, got {raw!r}")
                beams = np.stack([F.soft_beam_target_np(i, cfg.num_beams)
                                  for i in idxs])
                if self.flip:
                    idxs = [cfg.num_beams - 1 - i for i in idxs]
                    beams = np.ascontiguousarray(np.flip(beams, 1))
                data["beam"] = beams.astype(np.float32)
                data["beamidx"] = np.asarray(idxs, np.int32)
            else:
                beamidx = int(raw) - 1
                beam = F.soft_beam_target_np(beamidx, cfg.num_beams)
                if self.flip:
                    beamidx = cfg.num_beams - 1 - beamidx
                    beam = np.ascontiguousarray(np.flip(beam, 0))
                data["beam"] = beam.astype(np.float32)
                data["beamidx"] = np.int32(beamidx)
        return data


class ConcatDataset:
    """torch.utils.data.ConcatDataset equivalent."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, index: int):
        di = int(np.searchsorted(self._offsets, index, side="right") - 1)
        return self.datasets[di][index - int(self._offsets[di])]


class Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = np.asarray(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, index: int):
        return self.dataset[int(self.indices[index])]


def shard_for_process(dataset, process_index: Optional[int] = None,
                      process_count: Optional[int] = None):
    """Equal-size per-process shard for multi-host training: process p gets
    rows p, p+nproc, p+2*nproc, ... truncated to a common length so every
    process sees the SAME number of batches (the jitted sharded train step
    is a collective program — unequal per-process batch counts would
    deadlock a multi-host run).  TPU-native addition; the reference is
    single-process (train2_seq.py:538)."""
    import jax
    pid = jax.process_index() if process_index is None else process_index
    nproc = jax.process_count() if process_count is None else process_count
    if nproc == 1:
        return dataset
    per = len(dataset) // nproc
    if per == 0:
        raise ValueError(
            f"dataset of {len(dataset)} samples cannot be sharded over "
            f"{nproc} processes (every process needs at least one sample)")
    return Subset(dataset, pid + np.arange(per) * nproc)


def random_split(dataset, lengths: Sequence[int], seed: int = 100):
    """torch random_split equivalent (deterministic permutation)."""
    if sum(lengths) != len(dataset):
        raise ValueError("lengths must sum to dataset size")
    perm = np.random.default_rng(seed).permutation(len(dataset))
    out, ofs = [], 0
    for n in lengths:
        out.append(Subset(dataset, perm[ofs:ofs + n]))
        ofs += n
    return out


def dataset_augmentation(root: str, root_csv: str, config: GlobalConfig,
                         camera_aug: int = 7, lidar_aug: int = 2,
                         radar_aug: int = 1) -> ConcatDataset:
    """The 47-fold augmentation product ((8*3*2)-1 combos, skipping the
    original) of one adaptation-scenario CSV (train2_seq.py:386-410)."""
    sets = []
    for i in range(camera_aug + 1):
        for j in range(lidar_aug + 1):
            for k in range(radar_aug + 1):
                if i == j == k == 0:
                    continue
                sets.append(BeamDataset(
                    root, root_csv, config, test=False,
                    augment={"camera": i, "lidar": j, "radar": k}))
    return ConcatDataset(sets)


def build_train_val_sets(config: GlobalConfig, *,
                         trainval_root: str, train_root_csv: str,
                         adaptation_root: str, adaptation_csv: str,
                         train_adapt_together: bool = True,
                         finetune: bool = False,
                         augmentation: bool = True,
                         flip: bool = False,
                         seed: int = 100):
    """Train-set assembly mirroring train2_seq.py:457-533.

    Returns (train_set, val_set); finetune mode returns (train_set, None)
    (adaptation + 25 random scenario-34 dev samples, train2_seq.py:470-476).
    """
    if finetune and train_adapt_together:
        raise ValueError(
            "train on 31 and finetune can not be done at the same time")
    if finetune:
        adaptation = BeamDataset(adaptation_root, adaptation_csv, config)
        dev34 = BeamDataset(trainval_root, "scenario34.csv", config)
        dev34_sub, _ = random_split(dev34, [25, len(dev34) - 25], seed)
        return ConcatDataset([adaptation, dev34_sub]), None

    development = BeamDataset(trainval_root, train_root_csv, config)
    if not train_adapt_together:
        n_train = int(0.8 * len(development))
        return random_split(development,
                            [n_train, len(development) - n_train], seed)

    adaptation = BeamDataset(adaptation_root, adaptation_csv, config)
    dev: List = [development]
    adapt: List = [adaptation]
    if flip:
        dev.append(BeamDataset(trainval_root, train_root_csv, config,
                               flip=True))
        adapt.append(BeamDataset(adaptation_root, adaptation_csv, config,
                                 flip=True))
    development_set = ConcatDataset(dev) if len(dev) > 1 else dev[0]
    adaptation_set = ConcatDataset(adapt) if len(adapt) > 1 else adapt[0]

    if augmentation:
        aug = ConcatDataset([
            dataset_augmentation(adaptation_root, f"scenario3{i}.csv", config)
            for i in (1, 2, 3)])
        development_set = ConcatDataset([development_set, aug])

    full = ConcatDataset([development_set, adaptation_set])
    n_train = int(0.9 * len(full))
    return random_split(full, [n_train, len(full) - n_train], seed)
