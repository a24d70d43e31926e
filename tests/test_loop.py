"""Loop-closing integration tests on an out-and-back synthetic sequence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weiner_slamit_v2_tpu.config import (
    CameraConfig,
    MapCapacityConfig,
    OrbConfig,
    LoopConfig,
    SlamConfig,
)
from weiner_slamit_v2_tpu.geometry.camera import Camera
from weiner_slamit_v2_tpu.io.datasets import FrameData, Sequence, SyntheticWorld, _perlin_texture
from weiner_slamit_v2_tpu.tracking.system import System

H, W = 240, 320
FX = 300.0
K = np.array([[FX, 0, 159.5], [0, FX, 119.5], [0, 0, 1]], np.float32)


def out_and_back_sequence(n_frames=36, seed=31):
    """Strafe out and back so the end revisits the start's view."""
    import jax.numpy as jnp

    from weiner_slamit_v2_tpu.geometry import se3

    rng = np.random.default_rng(seed)
    world = SyntheticWorld(
        texture=_perlin_texture(int(H * 2.5), int(W * 2.5), rng),
        K=K, plane_depth=4.0, pixels_per_meter=FX / 4.0,
    )
    frames = []
    gt = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        a = i / (n_frames - 1)
        # out for the first half, back for the second; slight y + yaw motion
        s = np.sin(np.pi * a)  # 0 -> 1 -> 0
        twc = np.array([0.9 * s, 0.08 * np.sin(4 * np.pi * a), 0.0])
        rot = np.array([0.0, -0.10 * s, 0.0])
        Twc = np.eye(4)
        Twc[:3, :3] = np.asarray(se3.so3_exp(jnp.asarray(rot, jnp.float32)))
        Twc[:3, 3] = twc
        gt[i] = Twc
        frames.append(
            FrameData(timestamp=i / 30.0, image=world.render(np.linalg.inv(Twc), H, W))
        )
    return Sequence(frames=frames, gt_Twc=gt)


def loop_config():
    return SlamConfig(
        orb=OrbConfig(n_features=256),
        camera=CameraConfig(
            fx=FX, fy=FX, cx=159.5, cy=119.5, k1=0, k2=0, p1=0, p2=0, k3=0,
            width=W, height=H,
        ),
        capacity=MapCapacityConfig(
            max_keyframes=32, max_map_points=2048, max_obs_per_point=16,
            local_ba_window=8, local_ba_points=512,
        ),
        # small maps -> soften the loop gates so a synthetic revisit can fire
        loop=LoopConfig(min_kfs_between_loops=4, covisibility_consistency_th=1),
    )


@pytest.fixture(scope="module")
def loop_run():
    seq = out_and_back_sequence()
    cam = Camera.create(FX, FX, 159.5, 119.5, width=W, height=H)
    sys_ = System(loop_config(), cam, enable_loop_closing=True)
    states = [sys_.track_monocular(f.image, f.timestamp) for f in seq.frames]
    return seq, sys_, states


class TestLoopClosing:
    def test_tracking_survives_loop_machinery(self, loop_run):
        seq, sys_, states = loop_run
        ok = [s for s in states if s.state == "OK"]
        assert len(ok) > 20, [s.state for s in states]

    def test_map_stays_finite_and_orthonormal(self, loop_run):
        seq, sys_, states = loop_run
        m = sys_.map
        kv = np.asarray(m.kf_valid)
        poses = np.asarray(m.kf_pose)[kv]
        assert np.isfinite(poses).all()
        for T in poses:
            assert abs(np.linalg.det(T[:3, :3]) - 1.0) < 1e-2
        pts = np.asarray(m.mp_pos)[np.asarray(m.mp_valid)]
        assert np.isfinite(pts).all()

    def test_direct_sim3_between_overlapping_keyframes(self, loop_run):
        """Drive the Sim3 stage directly on two keyframes that view the same
        region (first and last) — the ComputeSim3 contract."""
        import jax
        import jax.numpy as jnp

        from weiner_slamit_v2_tpu.frontend import matcher
        from weiner_slamit_v2_tpu.geometry import se3, sim3
        from weiner_slamit_v2_tpu.optim.sim3_solver import ransac_sim3

        seq, sys_, states = loop_run
        t = sys_.tracker
        m = t.m
        kv = np.nonzero(np.asarray(m.kf_valid))[0]
        a, b = int(kv[0]), int(kv[-1])
        if b - a < 4:
            pytest.skip("too few keyframes for a loop pair")

        has1 = (m.kf_obs[a] >= 0) & m.kf_feat_valid[a]
        has2 = (m.kf_obs[b] >= 0) & m.kf_feat_valid[b]
        idx, dist = matcher.match_by_descriptor(
            m.kf_desc[a], m.kf_desc[b], has1, has2, nn_ratio=0.75
        )
        ok = idx >= 0
        n_matches = int(ok.sum())
        assert n_matches >= 15, f"only {n_matches} loop matches"

        mp1 = jnp.maximum(m.kf_obs[a], 0)
        mp2 = jnp.maximum(m.kf_obs[b][jnp.maximum(idx, 0)], 0)
        X1 = se3.apply(m.kf_pose[a], m.mp_pos[mp1])
        X2 = se3.apply(m.kf_pose[b], m.mp_pos[mp2])
        uv1 = m.kf_xy[a]
        uv2 = m.kf_xy[b][jnp.maximum(idx, 0)]
        n = uv1.shape[0]
        S12, inl, n_inl = ransac_sim3(
            X1, X2, ok & m.mp_valid[mp1] & m.mp_valid[mp2], uv1, uv2,
            jnp.ones(n), jnp.ones(n), t.K, jax.random.PRNGKey(0),
        )
        assert int(n_inl) >= 10
        # the relative transform should be near the SE3 relative pose with
        # scale close to 1 (same map, same scale)
        s = float(sim3.scale_of(S12))
        assert 0.7 < s < 1.4, f"loop Sim3 scale {s}"


def disjoint_out_and_back(n_frames=72, seed=31, amp=2.0, depth=2.0):
    """Out-and-back whose start and apex views do NOT overlap (the frustum
    footprint at the plane is ~2.1m; the 4m path separates them), so a
    genuine loop-closure situation can be constructed."""
    import jax.numpy as jnp  # noqa: F401

    rng = np.random.default_rng(seed)
    ppm = FX / depth
    tw = int((2 * amp + W / FX * depth + 1.0) * ppm)
    th = int((H / FX * depth + 1.0) * ppm)
    world = SyntheticWorld(
        texture=_perlin_texture(th, tw, rng), K=K,
        plane_depth=depth, pixels_per_meter=ppm,
    )
    frames, gt = [], np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        a = i / (n_frames - 1)
        s = np.sin(np.pi * a)
        twc = np.array([-amp + 2 * amp * s, 0.02 * np.sin(4 * np.pi * a), 0.0])
        Twc = np.eye(4)
        Twc[:3, 3] = twc
        gt[i] = Twc
        frames.append(
            FrameData(timestamp=i / 30.0, image=world.render(np.linalg.inv(Twc), H, W))
        )
    return Sequence(frames=frames, gt_Twc=gt)


class TestLoopClosureEndToEnd:
    def test_detect_close_correct_improves_ate(self):
        """The full detect -> Sim3 -> >=40-match gate -> CorrectLoop chain
        through LoopCloser.on_keyframe: inject a gauge drift into the map's
        start region at the apex (the classic accumulated-drift situation —
        the synthetic world itself is too clean to drift), then demand that
        the revisit closes a loop and the exported trajectory's ATE drops."""
        import jax
        import jax.numpy as jnp
        from weiner_slamit_v2_tpu.config import MappingConfig, TrackingConfig
        from weiner_slamit_v2_tpu.geometry import se3
        from weiner_slamit_v2_tpu.io.evaluation import ate_rmse

        seq = disjoint_out_and_back()
        cfg = loop_config().replace(
            capacity=MapCapacityConfig(
                max_keyframes=64, max_map_points=6144, max_obs_per_point=16,
                local_ba_window=8, local_ba_points=1024,
            ),
            tracking=TrackingConfig(mapping_latency_frames=1),
        )
        cam = Camera.create(FX, FX, 159.5, 119.5, width=W, height=H)
        sys_ = System(cfg, cam, enable_loop_closing=True)
        t = sys_.tracker
        ate_pre = None
        for i, f in enumerate(seq.frames):
            sys_.track_monocular(f.image, f.timestamp)
            if i == 36:
                # gauge-drift the start region: keyframes from the first 12
                # frames and their points move by G; the revisit cannot
                # re-attach to them and must close a loop instead
                sys_.finish()
                m = t.m
                kf_sel = (m.kf_frame_id < 12) & (m.kf_frame_id >= 0) & m.kf_valid
                k_ids = np.nonzero(np.asarray(kf_sel))[0]
                mp_sel = jnp.isin(m.mp_first_kf, jnp.asarray(k_ids)) & m.mp_valid
                G = np.eye(4, dtype=np.float32)
                G[:3, 3] = [0.25, 0.1, 0.15]
                c, s = np.cos(0.1), np.sin(0.1)
                G[:3, :3] = np.array(
                    [[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32
                )
                G = jnp.asarray(G)
                t.m = m.replace(
                    kf_pose=jnp.where(
                        kf_sel[:, None, None], m.kf_pose @ se3.inv(G)[None],
                        m.kf_pose,
                    ),
                    mp_pos=jnp.where(
                        mp_sel[:, None], se3.apply(G, m.mp_pos), m.mp_pos
                    ),
                )
            if i > 40 and sys_.loop_closer.n_loops_closed == 0:
                sys_.finish()
                ts, Twc = t.trajectory_Twc()
                ate_pre = ate_rmse(Twc, seq.gt_Twc[-len(Twc):])
        sys_.finish()
        assert sys_.loop_closer.n_loops_closed >= 1
        ts, Twc = t.trajectory_Twc()
        ate_post = ate_rmse(Twc, seq.gt_Twc[-len(Twc):])
        assert ate_pre is not None and np.isfinite(ate_post)
        assert ate_post < ate_pre, f"post {ate_post} !< pre {ate_pre}"


class TestFixScale:
    """bFixScale semantics for stereo/RGB-D loop closing
    (src/Sim3Solver.cc:37-112, src/LoopClosing.cc:73, Optimizer.cc:818)."""

    def test_pose_graph_fix_scale_keeps_metric_scale(self):
        from weiner_slamit_v2_tpu.geometry import se3, sim3
        from weiner_slamit_v2_tpu.optim.pose_graph import optimize_pose_graph

        # chain of 5 poses; a loop edge measured with a 12% scale error
        K = 5
        poses = [jnp.eye(4)]
        for i in range(1, K):
            poses.append(
                np.asarray(se3.exp(jnp.asarray([0.3, 0, 0.02 * i, 0, 0.05, 0])))
                @ poses[-1]
            )
        S = jnp.stack([sim3.from_se3(jnp.asarray(p)) for p in poses])
        kf_valid = jnp.ones(K, bool)
        fixed = jnp.zeros(K, bool).at[0].set(True)
        ei = jnp.asarray([0, 1, 2, 3, 0], jnp.int32)
        ej = jnp.asarray([1, 2, 3, 4, 4], jnp.int32)
        rel = [sim3.compose(S[j], sim3.inv(S[i])) for i, j in zip(ei[:4], ej[:4])]
        # loop edge with an erroneous scale drift baked into the measurement
        bad = sim3.compose(
            jnp.diag(jnp.asarray([1.12, 1.12, 1.12, 1.0])),
            sim3.compose(S[4], sim3.inv(S[0])),
        )
        edge_S = jnp.stack(rel + [bad])
        ev = jnp.ones(5, bool)
        for fix in (False, True):
            S_opt = optimize_pose_graph(
                S, kf_valid, fixed, ei, ej, edge_S, ev, n_iters=15,
                fix_scale=fix,
            )
            scales = np.asarray(sim3.scale_of(S_opt))
            if fix:
                # metric map: scale dof frozen at exactly 1
                np.testing.assert_allclose(scales, 1.0, atol=1e-6)
            else:
                # mono: the solver spreads the measured scale drift
                assert np.abs(scales - 1.0).max() > 0.01, scales

    def test_loop_closer_fixes_scale_for_rgbd(self):
        from weiner_slamit_v2_tpu.config import SlamConfig
        from weiner_slamit_v2_tpu.geometry import sim3
        from weiner_slamit_v2_tpu.optim.sim3_solver import ransac_sim3

        cfg = SlamConfig(sensor="rgbd")
        from weiner_slamit_v2_tpu.tracking.loop_closing import LoopCloser

        lc = LoopCloser(cfg, tracker=None)
        assert lc.fix_scale is True
        assert LoopCloser(SlamConfig(), tracker=None).fix_scale is False

        # a fix-scale Sim3 RANSAC on deliberately scaled data returns s == 1
        rng = np.random.default_rng(0)
        X1 = rng.uniform(-1, 1, (60, 3)).astype(np.float32) + [0, 0, 5]
        R = np.asarray(
            [[0.9950042, -0.0998334, 0], [0.0998334, 0.9950042, 0], [0, 0, 1]],
            np.float32,
        )
        X2 = 1.25 * (X1 @ R.T) + np.asarray([0.2, -0.1, 0.3], np.float32)
        K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        z1 = np.maximum(X1[:, 2], 1e-6); z2 = np.maximum(X2[:, 2], 1e-6)
        uv1 = np.stack([500 * X1[:, 0] / z1 + 320, 500 * X1[:, 1] / z1 + 240], 1)
        uv2 = np.stack([500 * X2[:, 0] / z2 + 320, 500 * X2[:, 1] / z2 + 240], 1)
        w = jnp.ones(60)
        valid = jnp.ones(60, bool)
        S, inl, n = ransac_sim3(
            jnp.asarray(X2), jnp.asarray(X1), valid, jnp.asarray(uv2, jnp.float32),
            jnp.asarray(uv1, jnp.float32), w, w, K,
            jax.random.PRNGKey(0), fix_scale=True,
        )
        s = float(sim3.scale_of(S))
        assert abs(s - 1.0) < 1e-5, s


class TestConcurrentGlobalBA:
    """The loop-triggered global BA runs as an async device future and is
    adopted with spanning-tree propagation to keyframes created while it ran
    (RunGlobalBundleAdjustment, src/LoopClosing.cc:658-758)."""

    def test_adopt_gba_propagates_to_new_keyframes(self):
        from weiner_slamit_v2_tpu.config import MapCapacityConfig
        from weiner_slamit_v2_tpu.geometry import se3
        from weiner_slamit_v2_tpu.slam_map import types as mt
        from weiner_slamit_v2_tpu.tracking.loop_closing import _adopt_gba

        cap = MapCapacityConfig(max_keyframes=8, max_map_points=64,
                                max_obs_per_point=4)
        m = mt.empty_map(cap, n_features=16)
        N = 16
        mk = lambda xi: se3.exp(jnp.asarray(xi, jnp.float32))
        feats = dict(
            xy_und=jnp.zeros((N, 2)), octave=jnp.zeros(N, jnp.int32),
            angle=jnp.zeros(N), desc=jnp.zeros((N, 8), jnp.uint32),
            feat_valid=jnp.ones(N, bool), obs=jnp.full(N, -1, jnp.int32),
        )
        poses = [mk([0, 0, 0, 0, 0, 0]), mk([0.5, 0, 0, 0, 0.1, 0]),
                 mk([1.0, 0, 0, 0, 0.2, 0])]
        for i, T in enumerate(poses):
            m, kf = mt.add_keyframe(
                m, T, feats["xy_und"], feats["octave"], feats["angle"],
                feats["desc"], feats["feat_valid"], feats["obs"],
                jnp.asarray(i), jnp.asarray(float(i)),
                jnp.asarray(i - 1),
            )
        # a point observed by kf0 at a known camera-frame position
        m, ids = mt.add_map_points(
            m, pos=jnp.asarray([[0.0, 0.0, 5.0]]),
            desc=jnp.zeros((1, 8), jnp.uint32),
            normal=jnp.asarray([[0.0, 0.0, 1.0]]),
            min_dist=jnp.asarray([0.1]), max_dist=jnp.asarray([100.0]),
            kf1=jnp.asarray([0], jnp.int32), feat1=jnp.asarray([0], jnp.int32),
            kf2=jnp.asarray([-1], jnp.int32), feat2=jnp.asarray([0], jnp.int32),
            valid=jnp.asarray([True]),
        )
        # snapshot covers kf 0..2; a 4th keyframe arrives during the BA
        n_kf_snap = 3
        child = mk([1.5, 0.1, 0, 0, 0.3, 0])
        m, kf3 = mt.add_keyframe(
            m, child, feats["xy_und"], feats["octave"], feats["angle"],
            feats["desc"], feats["feat_valid"], feats["obs"],
            jnp.asarray(3), jnp.asarray(3.0), jnp.asarray(2),  # parent = kf2
        )
        # BA result: rigidly move the first three keyframes by delta
        delta = mk([0.05, -0.02, 0.01, 0.02, 0.01, -0.01])
        cam_ids = jnp.asarray([0, 1, 2, -1, -1, -1, -1, -1], jnp.int32)
        ba_pose = jnp.stack([poses[0] @ se3.inv(delta),
                             poses[1] @ se3.inv(delta),
                             poses[2] @ se3.inv(delta)]
                            + [jnp.eye(4)] * 5)
        # the point was in the BA too: new position = delta applied in world
        pt_new = se3.apply(delta, jnp.asarray([[0.0, 0.0, 5.0]]))
        point_ids = jnp.full(64, -1, jnp.int32).at[0].set(0)
        ba_pts = jnp.zeros((64, 3)).at[0].set(pt_new[0])
        m2 = _adopt_gba(m, ba_pose, cam_ids, ba_pts, point_ids,
                        jnp.asarray(n_kf_snap, jnp.int32))
        # kf3 (created during the BA) must follow its parent kf2: the
        # relative pose kf3->kf2 is preserved exactly
        rel_before = np.asarray(child @ se3.inv(poses[2]))
        rel_after = np.asarray(
            m2.kf_pose[3] @ se3.inv(jnp.asarray(m2.kf_pose[2]))
        )
        np.testing.assert_allclose(rel_after, rel_before, atol=1e-5)
        # and kf2 itself took the BA pose
        np.testing.assert_allclose(
            np.asarray(m2.kf_pose[2]), np.asarray(ba_pose[2]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(m2.mp_pos[0]), np.asarray(pt_new[0]), atol=1e-5
        )

    def test_tracking_continues_through_loop_gba(self, loop_run):
        """End-to-end: with the loop machinery on, the global BA is enqueued
        async and adopted at the latest by finish(); the map stays finite."""
        seq, sys_, states = loop_run
        sys_.finish()
        lc = sys_.loop_closer
        assert lc is not None
        # finish() force-adopts any in-flight global BA
        assert lc._pending_gba is None
        m = sys_.map
        assert bool(jnp.all(jnp.isfinite(m.kf_pose)))
        assert bool(jnp.all(jnp.isfinite(jnp.where(
            m.mp_valid[:, None], m.mp_pos, 0.0))))


class TestLoopRecallPipelined:
    """Loop-machinery plumbing under pipelined timing (frames_per_sync=4 +
    mapping_latency_frames=3): every keyframe created through batched scan
    resolution and adopted through the staged mapping pipeline must reach
    LoopCloser.on_keyframe exactly once, in order — the consistency
    accumulation (LoopClosing.cc:170-243) sees NO gaps, so recall is the
    same as synchronous timing.

    (Full synthetic loop closure under fps=4 was investigated and the
    drift-injection scenario degrades to RELOCALIZATION-based recovery
    instead — tracking notices the inconsistency while lost, and reloc
    re-attaches to the drifted region directly. Both recovery paths are
    exercised: loop closure by TestLoopClosureEndToEnd (synchronous),
    relocalization by TestStagedRelocalization in test_tracking.py.)"""

    def test_every_pipelined_keyframe_reaches_loop_closer(self):
        from weiner_slamit_v2_tpu.config import TrackingConfig

        seq = disjoint_out_and_back(n_frames=240)
        cfg = loop_config().replace(
            capacity=MapCapacityConfig(
                max_keyframes=96, max_map_points=8192, max_obs_per_point=16,
                local_ba_window=8, local_ba_points=1024,
            ),
            tracking=TrackingConfig(
                mapping_latency_frames=3, frames_per_sync=4,
                pipeline_warmup_kfs=6, reloc_min_inliers=20,
            ),
        )
        cam = Camera.create(FX, FX, 159.5, 119.5, width=W, height=H)
        sys_ = System(cfg, cam, enable_loop_closing=True)
        lc = sys_.loop_closer
        seen: list[int] = []
        orig = lc.on_keyframe
        lc.on_keyframe = lambda kf_id: (seen.append(kf_id), orig(kf_id))[1]
        n_lost = 0
        for f in seq.frames:
            out = sys_.track_monocular(f.image, f.timestamp)
            n_lost += out.state == "LOST"
        sys_.finish()
        t = sys_.tracker
        assert n_lost == 0, f"pipelined tracking lost {n_lost} frames"
        assert t.n_kf_host >= 20
        # every mapping-pass keyframe reached the loop closer once, in order
        expected = list(range(2, t.n_kf_host))
        assert seen == expected, (seen, expected)
