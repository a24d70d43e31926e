"""Trajectory export in TUM and KITTI formats.

Byte-compatible with the reference's exporters:
* TUM:   "timestamp tx ty tz qx qy qz qw" per line
         (jni/ORB_SLAM2/src/System.cc:401-454, SaveTrajectoryTUM)
* KITTI: 3x4 row-major pose per line (jni/ORB_SLAM2/src/System.cc:493-541)

The reference stores per-frame relative poses ``Tcr`` w.r.t. a reference
keyframe and walks the spanning tree past culled keyframes at save time; our
map keeps keyframe poses in arrays and the tracker records per-frame
``(Tcr, ref_kf_id)`` pairs, so export composes ``Twc = (Tcr @ Trw)^-1``.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from ..geometry import se3


def _as_np(x):
    return np.asarray(x, dtype=np.float64)


def save_tum(
    path: str | os.PathLike,
    timestamps: Sequence[float],
    Twc: np.ndarray,
) -> None:
    """Write camera-to-world poses (N,4,4) in TUM format."""
    Twc = _as_np(Twc)
    qs = np.asarray(se3.quat_from_rot(Twc[:, :3, :3].astype(np.float32)))
    with open(path, "w") as f:
        for ts, T, q in zip(timestamps, Twc, qs):
            t = T[:3, 3]
            f.write(
                f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
            )


def save_kitti(path: str | os.PathLike, Twc: np.ndarray) -> None:
    """Write camera-to-world poses (N,4,4) in KITTI 3x4 row-major format."""
    Twc = _as_np(Twc)
    with open(path, "w") as f:
        for T in Twc:
            row = T[:3, :4].reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in row) + "\n")


def load_tum(path: str | os.PathLike) -> tuple[np.ndarray, np.ndarray]:
    """Read a TUM trajectory -> (timestamps (N,), Twc (N,4,4))."""
    data = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(v) for v in line.split()]
            if len(vals) >= 8:
                data.append(vals[:8])
    arr = np.asarray(data, dtype=np.float64)
    ts = arr[:, 0]
    t = arr[:, 1:4]
    q = arr[:, 4:8].astype(np.float32)  # qx qy qz qw
    R = np.asarray(se3.rot_from_quat(q))
    Twc = np.tile(np.eye(4), (len(arr), 1, 1))
    Twc[:, :3, :3] = R
    Twc[:, :3, 3] = t
    return ts, Twc
