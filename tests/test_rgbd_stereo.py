"""RGB-D and stereo pipeline tests on synthetic data."""

import jax.numpy as jnp
import numpy as np
import pytest

from weiner_slamit_v2_tpu.config import (
    CameraConfig,
    MapCapacityConfig,
    OrbConfig,
    SlamConfig,
)
from weiner_slamit_v2_tpu.geometry.camera import Camera
from weiner_slamit_v2_tpu.io.datasets import SyntheticWorld, _perlin_texture, make_synthetic_sequence
from weiner_slamit_v2_tpu.io.evaluation import ate_rmse
from weiner_slamit_v2_tpu.tracking.system import System

H, W = 240, 320
FX = 300.0
K = np.array([[FX, 0, 159.5], [0, FX, 119.5], [0, 0, 1]], np.float32)
PLANE_DEPTH = 4.0


def small_config(**cam_kwargs):
    return SlamConfig(
        orb=OrbConfig(n_features=256),
        camera=CameraConfig(
            fx=FX, fy=FX, cx=159.5, cy=119.5, k1=0, k2=0, p1=0, p2=0, k3=0,
            width=W, height=H, **cam_kwargs,
        ),
        capacity=MapCapacityConfig(
            max_keyframes=32, max_map_points=2048, max_obs_per_point=16,
            local_ba_window=8, local_ba_points=512,
        ),
    )


def synthetic_depth_for(seq):
    """Exact per-frame depth maps for the planar synthetic world: depth of
    the plane z=d along each pixel ray in the camera frame."""
    depths = []
    us, vs = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    ray = np.stack([(us - 159.5) / FX, (vs - 119.5) / FX, np.ones_like(us)], -1)
    for Twc in seq.gt_Twc:
        Tcw = np.linalg.inv(Twc)
        R = Twc[:3, :3].astype(np.float32)  # cam->world rotation
        C = Twc[:3, 3].astype(np.float32)
        ray_w = ray @ R.T
        lam = (PLANE_DEPTH - C[2]) / np.maximum(ray_w[..., 2], 1e-6)
        depths.append((lam * ray[..., 2]).astype(np.float32))  # z-depth = lam
    return depths


class TestRGBD:
    @pytest.fixture(scope="class")
    def rgbd_run(self):
        seq = make_synthetic_sequence(
            n_frames=16, h=H, w=W, seed=21, motion="orbit", K=K,
            plane_depth=PLANE_DEPTH,
        )
        depths = synthetic_depth_for(seq)
        sys_ = System(small_config(), Camera.create(FX, FX, 159.5, 119.5, width=W, height=H))
        states = []
        for f, d in zip(seq.frames, depths):
            states.append(sys_.track_rgbd(f.image, d, f.timestamp))
        return seq, sys_, states

    def test_initializes_first_frame(self, rgbd_run):
        seq, sys_, states = rgbd_run
        assert states[0].state == "OK"  # depth -> immediate init
        assert states[0].created_kf

    def test_tracks_whole_sequence(self, rgbd_run):
        seq, sys_, states = rgbd_run
        assert all(s.state == "OK" for s in states), [s.state for s in states]

    def test_metric_scale(self, rgbd_run):
        """RGB-D gives metric scale: ATE without scale alignment must be
        small in absolute meters."""
        seq, sys_, states = rgbd_run
        ts, Twc = sys_.tracker.trajectory_Twc()
        gt = seq.gt_Twc[-len(Twc):]
        err = ate_rmse(Twc, gt, align_scale=False)
        assert err < 0.08, f"metric ATE {err}"


class TestStereoOps:
    def test_stereo_depth_recovery(self):
        """Render a rectified stereo pair of the planar world and check the
        recovered per-keypoint depths against the known plane depth."""
        from weiner_slamit_v2_tpu.frontend.extractor import OrbExtractor
        from weiner_slamit_v2_tpu.ops.stereo import match_stereo

        rng = np.random.default_rng(5)
        baseline = 0.2
        world = SyntheticWorld(
            texture=_perlin_texture(int(H * 2.5), int(W * 2.5), rng),
            K=K, plane_depth=PLANE_DEPTH,
            pixels_per_meter=FX / PLANE_DEPTH,
        )
        T_left = np.eye(4)
        T_right = np.eye(4)
        T_right[0, 3] = -baseline  # world->cam: right camera at +baseline
        left = world.render(T_left, H, W)
        right = world.render(T_right, H, W)

        ex = OrbExtractor(OrbConfig(n_features=256), (H, W))
        fl = ex(jnp.asarray(left))
        fr = ex(jnp.asarray(right))
        bf = jnp.asarray(baseline * FX)
        depth, u_r = match_stereo(
            fl, fr, jnp.asarray(left), jnp.asarray(right), bf,
            jnp.asarray(baseline), jnp.asarray(ex.scales), 8,
        )
        d = np.asarray(depth)
        ok = d > 0
        assert ok.sum() > 80, f"only {ok.sum()} stereo matches"
        med_err = np.median(np.abs(d[ok] - PLANE_DEPTH))
        assert med_err < 0.15, f"median depth err {med_err}"

    def test_depth_from_depthmap(self):
        from weiner_slamit_v2_tpu.frontend.extractor import FrameFeatures
        from weiner_slamit_v2_tpu.ops.stereo import depth_from_depthmap

        depth_map = jnp.full((H, W), 3.5)
        n = 4
        feats = FrameFeatures(
            xy=jnp.asarray([[10.0, 10.0], [100.0, 50.0], [0.0, 0.0], [5.0, 5.0]]),
            xy_und=jnp.zeros((n, 2)),
            response=jnp.ones(n),
            angle=jnp.zeros(n),
            octave=jnp.zeros(n, jnp.int32),
            desc=jnp.zeros((n, 8), jnp.uint32),
            valid=jnp.asarray([True, True, True, False]),
        )
        d = depth_from_depthmap(feats, depth_map)
        np.testing.assert_allclose(np.asarray(d)[:3], 3.5)
        assert float(d[3]) == -1.0


class TestCheckpoint:
    def test_map_roundtrip(self, tmp_path):
        from weiner_slamit_v2_tpu.slam_map.checkpoint import load_map, save_map

        seq = make_synthetic_sequence(n_frames=8, h=H, w=W, seed=22, motion="orbit", K=K)
        sys_ = System(small_config(), Camera.create(FX, FX, 159.5, 119.5, width=W, height=H))
        for f in seq.frames:
            sys_.track_monocular(f.image, f.timestamp)
        p = tmp_path / "map.npz"
        save_map(str(p), sys_.map, extra={"note": np.asarray([1, 2, 3])})
        m2, extra = load_map(str(p))
        np.testing.assert_array_equal(
            np.asarray(sys_.map.mp_pos), np.asarray(m2.mp_pos)
        )
        np.testing.assert_array_equal(
            np.asarray(sys_.map.kf_obs), np.asarray(m2.kf_obs)
        )
        assert int(m2.n_kf) == int(sys_.map.n_kf)
        np.testing.assert_array_equal(extra["note"], [1, 2, 3])

    def test_localize_against_loaded_map(self, tmp_path):
        seq = make_synthetic_sequence(n_frames=12, h=H, w=W, seed=23, motion="orbit", K=K)
        sys_ = System(small_config(), Camera.create(FX, FX, 159.5, 119.5, width=W, height=H))
        for f in seq.frames[:8]:
            sys_.track_monocular(f.image, f.timestamp)
        p = tmp_path / "map.npz"
        sys_.save_map(str(p))

        sys2 = System(small_config(), Camera.create(FX, FX, 159.5, 119.5, width=W, height=H))
        sys2.load_map(str(p))
        # host mirrors restored from the checkpoint (System::SaveMap TODO,
        # include/System.h:119-121)
        assert sys2.tracker.n_kf_host == int(np.asarray(sys_.map.n_kf))
        assert sys2.tracker.state == "LOST"
        sys2.activate_localization_mode()
        out = sys2.track_monocular(seq.frames[8].image, seq.frames[8].timestamp)
        assert out.state == "OK"
        assert out.n_inliers > 20

    def test_localize_after_best_candidate_culled(self, tmp_path):
        """Relocalization must enumerate candidates from kf_valid: cull a
        keyframe after loading and the session still localizes via the
        survivors (KeyFrameDatabase::erase semantics,
        src/KeyFrameDatabase.cc:60-75)."""
        from weiner_slamit_v2_tpu.tracking.local_mapping import (
            invalidate_keyframe,
        )

        seq = make_synthetic_sequence(n_frames=12, h=H, w=W, seed=23, motion="orbit", K=K)
        sys_ = System(small_config(), Camera.create(FX, FX, 159.5, 119.5, width=W, height=H))
        for f in seq.frames[:8]:
            sys_.track_monocular(f.image, f.timestamp)
        p = tmp_path / "map.npz"
        sys_.save_map(str(p))

        sys2 = System(small_config(), Camera.create(FX, FX, 159.5, 119.5, width=W, height=H))
        sys2.load_map(str(p))
        # cull the last keyframe (the most likely best candidate for a
        # frame just past the mapped prefix) directly on the device map
        last_kf = sys2.tracker.ref_kf
        sys2.tracker.m = invalidate_keyframe(
            sys2.tracker.m, jnp.asarray(last_kf), rebuild=True
        )
        sys2.activate_localization_mode()
        out = sys2.track_monocular(seq.frames[8].image, seq.frames[8].timestamp)
        assert out.state == "OK"
        assert out.n_inliers > 20
        # the culled keyframe was never offered as a candidate
        assert not bool(sys2.tracker.m.kf_valid[last_kf])


class TestStereoKeyframeGate:
    """Stereo NeedNewKeyFrame parity (Tracking.cc:1264-1283): the c1c
    close-point gate + the 0.75 stereo ref-ratio + the bootstrap escape for
    the depth-init state (n_ref == 0) must let a stereo session grow its
    map past the initial keyframe."""

    def test_stereo_session_inserts_keyframes(self):
        baseline = 0.2
        cfg = small_config(
            baseline_times_fx=baseline * FX, depth_threshold=8.0,
        ).replace(sensor="stereo")
        seq = make_synthetic_sequence(
            n_frames=24, h=H, w=W, seed=31, motion="orbit", K=K,
            world="multi", stereo_baseline=baseline,
        )
        sys_ = System(cfg, Camera.create(FX, FX, 159.5, 119.5, width=W, height=H))
        for i, f in enumerate(seq.frames):
            sys_.track_stereo(f.image, f.image_right, i / 30.0)
        sys_.finish()
        assert sys_.tracker.state == "OK"
        assert sys_.n_keyframes() >= 2, (
            "stereo session never left the depth-init single-keyframe state"
        )
        assert sys_.n_map_points() > 100

    def test_close_point_gate_forces_insert(self):
        """need_close (tracked close < 100, untracked close > 70) must
        force c2/c1c even when the inlier ratio is healthy."""
        cfg = small_config(
            baseline_times_fx=0.2 * FX, depth_threshold=8.0,
        ).replace(sensor="stereo")
        sys_ = System(cfg, Camera.create(FX, FX, 159.5, 119.5, width=W, height=H))
        t = sys_.tracker
        t.n_kf_host = 3
        t.state = "OK"
        t.m = t.m.replace(kf_valid=t.m.kf_valid.at[0].set(True))
        t.last_kf_frame = 0
        t.frame_id = 5
        # healthy ratio (inliers == n_ref) but close-starved frame
        assert t._need_new_keyframe(
            120, 120, 3, n_close_tracked=40, n_close_untracked=90
        )
        # same frame without close starvation: no insert
        assert not t._need_new_keyframe(
            120, 120, 3, n_close_tracked=300, n_close_untracked=10
        )
