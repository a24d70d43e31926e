"""Per-frame timeline of the end-to-end System loop on the live platform.

Prints per-frame wall ms for the exact bench.py workload, annotating
keyframe creations and the scan path, to separate compile spikes from
steady-state cost. Usage: python tools/profile_fused.py [n_frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from weiner_slamit_v2_tpu.config import (
        CameraConfig, OrbConfig, SlamConfig, TrackingConfig,
    )
    from weiner_slamit_v2_tpu.geometry.camera import Camera
    from weiner_slamit_v2_tpu.io.datasets import make_synthetic_sequence
    from weiner_slamit_v2_tpu.tracking.system import System

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    H, W = 480, 640
    fx = fy = 500.0
    cx, cy = 320.0, 240.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    cfg = SlamConfig(
        orb=OrbConfig(n_features=1024),
        camera=CameraConfig(fx=fx, fy=fy, cx=cx, cy=cy, k1=0, k2=0, p1=0,
                            p2=0, k3=0, width=W, height=H),
        tracking=TrackingConfig(mapping_latency_frames=8, frames_per_sync=4),
    )
    cam = Camera.create(fx, fy, cx, cy, width=W, height=H)
    seq = make_synthetic_sequence(n_frames=n_frames, h=H, w=W, seed=0,
                                  motion="orbit", K=K)
    sys_ = System(cfg, cam)
    t_prev = time.perf_counter()
    for i, f in enumerate(seq.frames):
        out = sys_.track_monocular(np.asarray(f.image, np.float32), i / 30.0)
        t_now = time.perf_counter()
        dt = (t_now - t_prev) * 1e3
        t_prev = t_now
        buffered = len(sys_.tracker._img_buffer)
        print(
            f"f{i:03d} {dt:8.1f} ms state={out.state:4s} "
            f"kf={out.created_kf} defer={out.deferred} buf={buffered} "
            f"nkf={sys_.tracker.n_kf_host}",
            flush=True,
        )
    sys_.finish()


if __name__ == "__main__":
    main()
