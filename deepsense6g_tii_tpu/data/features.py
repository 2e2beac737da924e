"""Deterministic feature factory: all L0/L1 numerics of the reference.

Each transform exists in two forms:

* a **NumPy parity version** that reproduces the reference formula on the host
  (used by the offline tools and for golden tests), and
* a **jit/vmap-able jnp version** with static shapes for on-device batch
  preprocessing (padded points + mask instead of ragged clouds).

Reference formulas:
  - LiDAR BEV histogram        /root/reference/data2_seq.py:177-211
  - radar range-angle/velocity /root/reference/Data_Preprocessing/Radar_data_preprocessing.py:7-23
  - GPS normalization          /root/reference/data2_seq.py:223-281
  - soft beam targets          /root/reference/data2_seq.py:159-172
  - ImageNet normalization     /root/reference/mambafuser_seq.py:36-45
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (DEFAULT_FOV, POS_MAX, POS_MIN, SCENARIO_ANGLE_OFFSET,
                      SCENARIO_FOV)
from ..utils import utm as _utm

# ---------------------------------------------------------------------------
# LiDAR BEV histogram
# ---------------------------------------------------------------------------

GRID = 256
HIST_MAX_PER_PIXEL = 5.0


def fov_for_address(address: str, custom_fov: bool) -> Tuple[float, float, float, float]:
    """Per-scenario field of view selected by substring match on the file path
    (data2_seq.py:190-202)."""
    if custom_fov:
        for name, fov in SCENARIO_FOV:
            if name in address:
                return fov
    return DEFAULT_FOV


def lidar_to_bev_np(points: np.ndarray,
                    fov: Tuple[float, float, float, float] = DEFAULT_FOV) -> np.ndarray:
    """(N, >=2) points -> (1, 256, 256) BEV density map, exact reference numerics
    (np.histogramdd over linspace bins, clip at 5 points/pixel, /5)."""
    x_lo, x_hi, y_lo, y_hi = fov
    xbins = np.linspace(x_lo, x_hi, GRID + 1)
    ybins = np.linspace(y_lo, y_hi, GRID + 1)
    hist = np.histogramdd(points[..., :2], bins=(xbins, ybins))[0]
    hist[hist > HIST_MAX_PER_PIXEL] = HIST_MAX_PER_PIXEL
    return (hist / HIST_MAX_PER_PIXEL)[np.newaxis].astype(np.float32)


def lidar_to_bev(points: jnp.ndarray, mask: jnp.ndarray,
                 fov: jnp.ndarray) -> jnp.ndarray:
    """Static-shape BEV histogram for the device pipeline.

    Args:
      points: (P, 2+) padded point cloud.
      mask:   (P,) 1.0 for real points, 0.0 for padding.
      fov:    (4,) [x_lo, x_hi, y_lo, y_hi].

    Returns (1, 256, 256) float32.  Uses a flat scatter-add, which XLA lowers
    to an efficient TPU sort-based scatter.
    """
    x_lo, x_hi, y_lo, y_hi = fov[0], fov[1], fov[2], fov[3]
    x = points[:, 0]
    y = points[:, 1]
    fx = (x - x_lo) / (x_hi - x_lo) * GRID
    fy = (y - y_lo) / (y_hi - y_lo) * GRID
    ix = jnp.floor(fx).astype(jnp.int32)
    iy = jnp.floor(fy).astype(jnp.int32)
    # np.histogramdd: right-most bin edge is inclusive.
    ix = jnp.where((x == x_hi), GRID - 1, ix)
    iy = jnp.where((y == y_hi), GRID - 1, iy)
    valid = (mask > 0) & (x >= x_lo) & (x <= x_hi) & (y >= y_lo) & (y <= y_hi)
    flat = jnp.where(valid, ix * GRID + iy, GRID * GRID)  # out-of-range slot dropped
    hist = jnp.zeros((GRID * GRID + 1,), jnp.float32).at[flat].add(1.0, mode="drop")
    hist = hist[: GRID * GRID].reshape(GRID, GRID)
    hist = jnp.minimum(hist, HIST_MAX_PER_PIXEL)
    return (hist / HIST_MAX_PER_PIXEL)[None]


# ---------------------------------------------------------------------------
# Radar FFT maps
# ---------------------------------------------------------------------------

def range_angle_map_np(data: np.ndarray, fft_size: int = 256) -> np.ndarray:
    """Raw radar cube (n_rx, n_samples, n_chirps) -> (n_samples, fft_size) RA map."""
    data = np.fft.fft(data, axis=1)                 # range FFT
    data = data - np.mean(data, 2, keepdims=True)   # clutter removal
    data = np.fft.fft(data, fft_size, axis=0)       # angle FFT
    return np.abs(data).sum(axis=2).T               # sum over velocity


def range_velocity_map_np(data: np.ndarray, fft_size: int = 256) -> np.ndarray:
    """Raw radar cube (n_rx, n_samples, n_chirps) -> (n_samples, fft_size) RV map."""
    data = np.fft.fft(data, axis=1)                 # range FFT
    data = np.fft.fft(data, fft_size, axis=2)       # velocity FFT
    return np.abs(data).sum(axis=0)                 # sum over antennas


def minmax_np(arr: np.ndarray) -> np.ndarray:
    return (arr - arr.min()) / (arr.max() - arr.min())


def range_angle_map(data: jnp.ndarray, fft_size: int = 256) -> jnp.ndarray:
    data = jnp.fft.fft(data, axis=1)
    data = data - jnp.mean(data, 2, keepdims=True)
    data = jnp.fft.fft(data, fft_size, axis=0)
    return jnp.abs(data).sum(axis=2).T


def range_velocity_map(data: jnp.ndarray, fft_size: int = 256) -> jnp.ndarray:
    data = jnp.fft.fft(data, axis=1)
    data = jnp.fft.fft(data, fft_size, axis=2)
    return jnp.abs(data).sum(axis=0)


def minmax(arr: jnp.ndarray) -> jnp.ndarray:
    return (arr - arr.min()) / (arr.max() - arr.min())


def radar_maps(data: jnp.ndarray, fft_size: int = 256
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused RA+RV map computation for one raw cube; vmap over samples to
    replace the reference's 100-process joblib fan-out
    (Radar_data_preprocessing.py:35-43)."""
    rng = jnp.fft.fft(data, axis=1)
    ra = jnp.fft.fft(rng - jnp.mean(rng, 2, keepdims=True), fft_size, axis=0)
    ra = jnp.abs(ra).sum(axis=2).T
    rv = jnp.abs(jnp.fft.fft(rng, fft_size, axis=2)).sum(axis=0)
    return minmax(ra), minmax(rv)


# ---------------------------------------------------------------------------
# GPS normalization
# ---------------------------------------------------------------------------

def normalize_loc_np(pos_ue: np.ndarray, pos_bs: np.ndarray,
                     scenarios: Sequence[str], angle_norm: bool) -> np.ndarray:
    """GPS normalization, exact reference semantics (data2_seq.py:223-281).

    Args:
      pos_ue:    (N, 2, 2) UE [lat, lon] for the 2 GPS samples.
      pos_bs:    (N, 2) BS [lat, lon].
      scenarios: length-N scenario name per sample (substring-matched).
      angle_norm: use per-scenario boresight-angle normalization.

    Returns (N, 2, 2) float64.
    """
    n = pos_ue.shape[0]
    ue_stacked = np.vstack((pos_ue[:, 0, :], pos_ue[:, 1, :]))
    bs_stacked = np.vstack((pos_bs, pos_bs))
    pos_diff = _utm.xy_from_latlong(ue_stacked) - _utm.xy_from_latlong(bs_stacked)

    if angle_norm:
        # L2 row-normalize (sklearn.preprocessing.normalize(axis=1))
        norms = np.linalg.norm(pos_diff, axis=1, keepdims=True)
        stacked = pos_diff / np.where(norms == 0, 1.0, norms)
    else:
        stacked = (pos_diff - np.asarray(POS_MIN)) / (np.asarray(POS_MAX) - np.asarray(POS_MIN))

    out = np.zeros((n, 2, 2))
    out[:, 0, :] = stacked[:n]
    out[:, 1, :] = stacked[n:]

    if angle_norm:
        # note: arctan (not arctan2) — parity with data2_seq.py:263
        angle = np.arctan(out[..., 1] / out[..., 0]) / np.pi * 180
        offset = np.array([_scenario_offset(s) for s in scenarios])
        angle = angle - offset[:, None]
        angle[angle > 90] -= 180
        angle[angle < -90] += 180
        rad = angle / 180 * np.pi
        out[:, 0, 0] = rad[:, 0]
        out[:, 0, 1] = rad[:, 0]
        out[:, 1, 0] = rad[:, 1]
        out[:, 1, 1] = rad[:, 1]
    return out


def _scenario_offset(scenario: str) -> float:
    for name, off in SCENARIO_ANGLE_OFFSET.items():
        if name in scenario:
            return off
    return 0.0


# ---------------------------------------------------------------------------
# Soft beam targets
# ---------------------------------------------------------------------------

_NORM_CONST = 1.0 / (0.5 * math.sqrt(2.0 * math.pi))


def soft_beam_target_np(beamidx: int, num_beams: int = 64) -> np.ndarray:
    """Gaussian-smoothed target over beams: sigma=0.5, +-5 window, x1.25
    (data2_seq.py:162-167)."""
    x = np.arange(max(beamidx - 5, 0), min(beamidx + 5, num_beams - 1) + 1)
    y = _NORM_CONST * np.exp(-0.5 * ((x - beamidx) / 0.5) ** 2)
    beam = np.zeros((num_beams,))
    beam[x] = y * 1.25
    return beam


def soft_beam_target(beamidx: jnp.ndarray, num_beams: int = 64) -> jnp.ndarray:
    """Batched jnp version: beamidx (...,) int -> (..., num_beams) float32."""
    beams = jnp.arange(num_beams, dtype=jnp.float32)
    d = beams - beamidx[..., None].astype(jnp.float32)
    pdf = _NORM_CONST * jnp.exp(-0.5 * (d / 0.5) ** 2)
    window = jnp.abs(d) <= 5.0
    return jnp.where(window, pdf * 1.25, 0.0)


def flip_beam_target(beam: jnp.ndarray, beamidx: jnp.ndarray,
                     num_beams: int = 64):
    """Horizontal-flip label transform (data2_seq.py:168-170)."""
    return jnp.flip(beam, axis=-1), (num_beams - 1) - beamidx


# ---------------------------------------------------------------------------
# Image normalization
# ---------------------------------------------------------------------------

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    """uint8-scale NHWC image -> ImageNet-normalized float
    (mambafuser_seq.py:36-45, channel-last layout)."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
    return (x / 255.0 - mean) / std


# ---------------------------------------------------------------------------
# Horizontal flip (input side, data2_seq.py:138-156)
# ---------------------------------------------------------------------------

def hflip_image(img: jnp.ndarray) -> jnp.ndarray:
    """NHWC (or HWC) image: flip the width axis (np.flip(imgs, 1) on HWC)."""
    return jnp.flip(img, axis=-2)


def hflip_map(m: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) radar/LiDAR map: flip the last (width) axis.

    Matches np.flip(radar, 1) on the (H, W) radar map (data2_seq.py:140) and
    np.flip(bev, 2) on the (1, H, W) BEV (data2_seq.py:156).
    """
    return jnp.flip(m, axis=-1)
