"""Recipe-level DBA regression harness.

The accuracy contract this environment cannot test directly (no challenge
dataset, no pretrained weights — README.md:94-96's 0.6671 test DBA) gets a
buildable proxy: a structured synthetic dataset whose optimal beam is a
LEARNABLE function of the modalities, trained for a few epochs through the
REAL Engine recipe — cyclic-cosine scheduler warmup, EMA shadow, Gaussian
soft targets, focal loss, held-out validation split, per-scenario DBA —
asserting that held-out DBA beats the random-prediction floor by a wide
margin and that the EMA weights validate at least as well as the raw ones.

Reference recipe being regression-tested: train2_seq.py:94-221 (train +
validate loops), 363-383 (DBA), 591-592 (EMA decay 0.999), 540-547
(CyclicCosineDecayLR warmup from 2.5e-6).

Run directly (prints JSON) or via tests/test_dba_regression.py (slow CI).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepsense6g_tii_tpu.config import GlobalConfig
from deepsense6g_tii_tpu.data import features as F
from deepsense6g_tii_tpu.models.fuser import BeamFuser
from deepsense6g_tii_tpu.train.engine import Engine, TrainOptions
from deepsense6g_tii_tpu.train.metrics import compute_dba_score
from deepsense6g_tii_tpu.train.steps import make_eval_step


def make_learnable_samples(cfg: GlobalConfig, n: int, seed: int = 0):
    """Synthetic multimodal samples whose beam index is decodable from the
    sensors, mimicking the task's physics: the best mmWave beam points at
    the transmitter, whose bearing shows up as a bright blob in the camera,
    a cluster in the LiDAR BEV and a peak in the radar range-angle map
    (data2_seq.py:20-173's output contract: NHWC, 0..255 images, 0..1
    maps).  Beam b in [0, num_beams) maps to horizontal position
    (b + 0.5) / num_beams in every modality, with additive noise so the
    mapping must actually be learned."""
    rng = np.random.default_rng(seed)
    T, H = cfg.seq_len, cfg.input_resolution
    rc = 2 if cfg.add_velocity else 1
    nb = cfg.num_beams
    beamidx = rng.integers(0, nb, size=n).astype(np.int32)
    pos = (beamidx + 0.5) / nb                       # 0..1 bearing

    cols = np.arange(H, dtype=np.float32) / H        # (H,)
    # per-sample Gaussian bump over the width axis, width ~ 1.5 beams
    bump = np.exp(-0.5 * ((cols[None, :] - pos[:, None]) / (1.5 / nb)) ** 2)
    bump = bump.astype(np.float32)                   # (n, W)

    def field(ch, gain, noise):
        # (n, T, H, W, ch): the bump painted over every row/frame + noise
        x = np.broadcast_to(bump[:, None, None, :, None],
                            (n, T, H, H, ch)).copy()
        x *= gain
        x += rng.normal(scale=noise, size=x.shape).astype(np.float32)
        return x

    image = np.clip(field(3, 200.0, 20.0) + 30.0, 0, 255).astype(np.float32)
    lidar = np.clip(field(1, 1.0, 0.1), 0, 1).astype(np.float32)
    radar = np.clip(field(rc, 1.0, 0.1), 0, 1).astype(np.float32)
    # GPS: normalized bearing in the reference's angle_norm layout
    # (radians duplicated into both coords, data2_seq.py:277-280) + noise
    ang = (pos * 2 - 1)[:, None, None] * np.ones((n, cfg.gps_len, 2))
    gps = (ang + rng.normal(scale=0.05, size=ang.shape)).astype(np.float32)
    beam = np.stack([F.soft_beam_target_np(int(b), nb)
                     for b in beamidx]).astype(np.float32)
    scenario = np.asarray([f"scenario{31 + int(b) % 4}" for b in beamidx])
    return {"image": image, "lidar": lidar, "radar": radar, "gps": gps,
            "beam": beam, "beamidx": beamidx, "scenario": scenario}


def _batches(data, idx, bs, rng=None):
    if rng is not None:
        idx = idx.copy()
        rng.shuffle(idx)
    out = []
    for lo in range(0, len(idx) - bs + 1, bs):
        sel = idx[lo:lo + bs]
        out.append({k: v[sel] for k, v in data.items()})
    return out


def run(n_train: int = 256, n_val: int = 64, batch_size: int = 16,
        epochs: int = 12, lr: float = 2e-3, res: int = 64,
        seed: int = 0, arch: str = "gpt", ema_decay: float = 0.9,
        verbose: bool = True):
    """Trains the reduced-geometry fuser through the real Engine recipe and
    returns {"dba_ema", "dba_raw", "dba_floor", "val_curve"}."""
    import jax

    on_tpu = jax.default_backend() == "tpu"
    cfg = GlobalConfig(
        seq_len=2, input_resolution=res, backbone_blocks=(1, 1, 1, 1),
        # anchors scale with resolution so the x8/x4/x2/x1 fusion upsample
        # chain lands back on each stage's map size (model2_seq.py:495-579)
        vert_anchors=max(res // 32, 1), horz_anchors=max(res // 32, 1),
        n_layer=2, use_pallas_scan=False,
        compute_dtype="bfloat16" if on_tpu else "float32",
        FFM=0 if arch == "gpt" else 1, TFM=0 if arch == "gpt" else 1)
    data = make_learnable_samples(cfg, n_train + n_val, seed=seed)
    idx = np.arange(n_train + n_val)
    np.random.default_rng(seed).shuffle(idx)         # 80/20-style split
    tr_idx, va_idx = idx[:n_train], idx[n_train:]
    val_batches = _batches(data, va_idx, batch_size)

    model = BeamFuser(cfg)
    opts = TrainOptions(
        logdir=os.environ.get("DBA_REG_LOGDIR", "/tmp/ds6g_dba_regression"),
        epochs=epochs, lr=lr, loss="focal", scheduler=True, ema=True,
        # the reference's 0.999 needs tens of thousands of steps to track;
        # this run takes epochs*(n_train/batch_size) ~ 200, so use a decay
        # whose horizon (1/(1-d)) fits the run while exercising the same
        # shadow-update/apply/restore machinery
        ema_decay=ema_decay,
        temp_coef=True, prefetch=0, async_save=False)
    engine = Engine(model, cfg, opts)
    engine.init_state(val_batches[0])

    shuffle_rng = np.random.default_rng(seed + 1)
    for _ in range(epochs):
        engine.train(_batches(data, tr_idx, batch_size, shuffle_rng))
        engine.validate(val_batches)

    # EMA vs raw weights on the identical held-out split
    raw_eval = make_eval_step(model, cfg, loss_name=opts.loss,
                              temp_coef=True, use_ema=False,
                              rng_seed=opts.seed)
    preds, gts = [], []
    for i, b in enumerate(val_batches):
        dev, n = engine._to_device(b)
        m = raw_eval(engine.state, dev, i)
        preds.append(np.asarray(m["ranks"])[:n])
        gts.append(b["beamidx"])
    dba_raw = compute_dba_score(np.concatenate(preds), np.concatenate(gts))

    # random-prediction DBA floor for this metric (top-3 of 64 beams,
    # distance credit within 5): ~0.11 analytically; measure it exactly
    rng = np.random.default_rng(seed + 2)
    rand_ranks = np.stack([rng.permutation(cfg.num_beams)
                           for _ in range(len(va_idx))])
    dba_floor = compute_dba_score(rand_ranks, data["beamidx"][va_idx])

    out = {"dba_ema": float(engine.DBA[-1]), "dba_raw": float(dba_raw),
           "dba_floor": float(dba_floor),
           "val_curve": [float(x) for x in engine.DBA]}
    if verbose:
        print(json.dumps(out))
    return out


if __name__ == "__main__":
    run()
