"""Break down the fused-scan batch cost: stack, scan launch, post-slicing,
resolution fetch. Monkey-patches timers into Tracker._run_scan_batch."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from weiner_slamit_v2_tpu.config import (
        CameraConfig, OrbConfig, SlamConfig, TrackingConfig,
    )
    from weiner_slamit_v2_tpu.geometry.camera import Camera
    from weiner_slamit_v2_tpu.io.datasets import make_synthetic_sequence
    from weiner_slamit_v2_tpu.tracking import tracker as trk
    from weiner_slamit_v2_tpu.tracking.system import System

    H, W = 480, 640
    fx = fy = 500.0
    K = np.array([[fx, 0, 320.0], [0, fy, 240.0], [0, 0, 1]], np.float32)
    cfg = SlamConfig(
        orb=OrbConfig(n_features=1024),
        camera=CameraConfig(fx=fx, fy=fy, cx=320.0, cy=240.0, k1=0, k2=0,
                            p1=0, p2=0, k3=0, width=W, height=H),
        tracking=TrackingConfig(mapping_latency_frames=8, frames_per_sync=4),
    )
    cam = Camera.create(fx, fy, 320.0, 240.0, width=W, height=H)
    seq = make_synthetic_sequence(n_frames=90, h=H, w=W, seed=0,
                                  motion="orbit", K=K)
    sys_ = System(cfg, cam)
    t = sys_.tracker

    orig_run = trk.Tracker._run_scan_batch
    orig_resolve = trk.Tracker._resolve_pending

    def timed_run(self):
        recs = self._img_buffer
        if len(recs) != self.cfg.tracking.frames_per_sync or self._scan_fn is None:
            # first call compiles; let it pass untimed except total
            t0 = time.perf_counter()
            orig_run(self)
            print(f"  scan+compile total {1e3*(time.perf_counter()-t0):.1f} ms",
                  flush=True)
            return
        imgs_list = [r["img"] for r in recs]
        t0 = time.perf_counter()
        imgs = jnp.stack(imgs_list)
        t1 = time.perf_counter()
        # launch only (async)
        has_vel = self.velocity is not None
        vel = self.velocity if has_vel else self._eye4
        p = self.params.replace(local_th=jnp.asarray(1.0, jnp.float32))
        carry, outs = self._scan_fn(
            self.m, imgs, self.last_obs, self.last_feats.octave,
            self.last_feats.angle, jnp.asarray(has_vel), vel, self.last_Tcw,
            jnp.asarray(self.ref_kf, jnp.int32), self.K, self.scale_factors,
            self.inv_sigma2, p,
        )
        t2 = time.perf_counter()
        feats_s, Tcw_s, obs_s, T_cr_s, scalars_s, inc_s = outs
        mp_visible, mp_found, last_obs, _a, _b, _c, vel_new, last_Tcw = carry
        self.m = self.m.replace(mp_visible=mp_visible, mp_found=mp_found)
        self.velocity = vel_new
        self.last_Tcw = last_Tcw
        self.last_feats = jax.tree.map(lambda a: a[-1], feats_s)
        self.last_obs = last_obs
        t3 = time.perf_counter()
        snapshot = None
        self._batch_counters = snapshot
        for i, rec in enumerate(recs):
            self._pending_frames.append(dict(
                scalars=scalars_s[i],
                feats=jax.tree.map(lambda a, i=i: a[i], feats_s),
                Tcw=Tcw_s[i], cur_obs=obs_s[i], T_cr=T_cr_s[i],
                ts=rec["ts"], frame_id=rec["frame_id"], ref_kf=self.ref_kf,
                recent_reloc=rec["recent_reloc"], depth=None,
                inc_bits=(inc_s[0][i], inc_s[1][i]),
            ))
        t4 = time.perf_counter()
        self._img_buffer = []
        self._resolve_pending()
        t5 = time.perf_counter()
        print(
            f"  stack {1e3*(t1-t0):6.1f} launch {1e3*(t2-t1):6.1f} "
            f"lastslice {1e3*(t3-t2):6.1f} recslice {1e3*(t4-t3):6.1f} "
            f"resolve {1e3*(t5-t4):6.1f} ms", flush=True,
        )

    def timed_resolve(self):
        recs = self._pending_frames
        if not recs:
            return orig_resolve(self)
        t0 = time.perf_counter()
        svecs = np.asarray(jnp.stack([r["scalars"] for r in recs]))
        t1 = time.perf_counter()
        self._pending_frames = recs
        r = orig_resolve(self)
        t2 = time.perf_counter()
        print(f"    [resolve: fetch {1e3*(t1-t0):6.1f} rest {1e3*(t2-t1):6.1f}]",
              flush=True)
        return r

    trk.Tracker._run_scan_batch = timed_run
    trk.Tracker._resolve_pending = timed_resolve

    for i, f in enumerate(seq.frames):
        sys_.track_monocular(np.asarray(f.image, np.float32), i / 30.0)
    sys_.finish()


if __name__ == "__main__":
    main()
