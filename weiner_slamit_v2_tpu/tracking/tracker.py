"""Per-frame tracking: the state machine of the SLAM front end.

TPU-native replacement for ``Tracking`` (jni/ORB_SLAM2/src/Tracking.cc).
States NOT_INITIALIZED / OK / LOST mirror include/Tracking.h:88-94. Each
per-frame step (projection matching, pose optimization, local-map tracking)
is a jitted batched program; only the small state-machine decisions run in
Python on pulled scalars — the analogue of the reference's per-frame logic,
minus the threads and mutexes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..frontend import matcher
from ..frontend.extractor import FrameFeatures, OrbExtractor
from ..frontend.initializer import initialize_two_view
from ..geometry import se3
from ..geometry.camera import Camera
from ..optim.pnp import ransac_pnp
from ..optim.pose_opt import optimize_pose
from ..slam_map import types as mt
from ..slam_map.point_stats import predict_octave, refresh_point_stats
from ..slam_map.types import SlamMap

NO_IMAGES_YET = "NO_IMAGES_YET"
NOT_INITIALIZED = "NOT_INITIALIZED"
OK = "OK"
LOST = "LOST"


@partial(jax.jit, static_argnames=("n_levels",))
def _track_last_frame(
    m: SlamMap,
    feats: FrameFeatures,
    last_obs: jnp.ndarray,      # (N,) mp ids of last frame's features
    last_octave: jnp.ndarray,   # (N,)
    Tcw_pred: jnp.ndarray,
    K: jnp.ndarray,
    window: jnp.ndarray,
    scale_factors: jnp.ndarray,
    n_levels: int,
):
    """SearchByProjection last->current (ORBmatcher.cc:1332-1474): project
    the last frame's tracked map points with the predicted pose and match
    against current features in a scale-gated window.

    Returns cur_obs (N,) int32: map-point id per current feature (-1 none).
    """
    has = last_obs >= 0
    mp = jnp.maximum(last_obs, 0)
    has = has & m.mp_valid[mp]
    X = m.mp_pos[mp]
    Pc = se3.apply(Tcw_pred, X)
    z = Pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    pred = jnp.stack(
        [K[0, 0] * Pc[:, 0] / zs + K[0, 2], K[1, 1] * Pc[:, 1] / zs + K[1, 2]],
        axis=1,
    )
    has = has & (z > 0)

    # window scaled by the last octave's scale factor (ORBmatcher.cc:1352)
    sf = scale_factors[jnp.clip(last_octave, 0, n_levels - 1)]
    win = window * sf
    idx, dist = matcher.match_with_window(
        m.mp_desc[mp],
        feats.desc,
        has,
        feats.valid,
        pred_xy=pred,
        xy2=feats.xy_und,
        window=win,
        max_dist=matcher.TH_HIGH,
        nn_ratio=0.9,
        octave2=feats.octave,
        octave_lo=jnp.clip(last_octave - 1, 0, n_levels - 1),
        octave_hi=jnp.clip(last_octave + 1, 0, n_levels - 1),
    )
    n = feats.xy.shape[0]
    cur_obs = jnp.full((n,), -1, jnp.int32)
    ok = idx >= 0
    cur_obs = cur_obs.at[jnp.where(ok, idx, n)].set(
        jnp.where(ok, mp, -1), mode="drop"
    )
    return cur_obs, ok.sum()


@partial(jax.jit, static_argnames=("n_levels", "max_local_points", "local_kf_cap"))
def _track_local_map(
    m: SlamMap,
    feats: FrameFeatures,
    cur_obs: jnp.ndarray,
    Tcw: jnp.ndarray,
    K: jnp.ndarray,
    scale_factors: jnp.ndarray,
    th: jnp.ndarray,
    n_levels: int,
    max_local_points: int = 4096,
    local_kf_cap: int = 80,
):
    """TrackLocalMap's point harvest + projection matching
    (Tracking::UpdateLocalKeyFrames/SearchLocalPoints,
    src/Tracking.cc:1409-1626): vote for keyframes observing the currently
    tracked points, union their map points, frustum-filter, and match.

    Returns (new cur_obs, visible-point mask over M).
    """
    # --- vote for local keyframes ----------------------------------------
    has = (cur_obs >= 0) & m.mp_valid[jnp.maximum(cur_obs, 0)]
    mp = jnp.maximum(cur_obs, 0)
    obs_kf = m.mp_obs_kf[mp]                 # (N, O)
    obs_ok = has[:, None] & (obs_kf >= 0)
    votes = jnp.zeros(m.max_kf, jnp.int32).at[
        jnp.where(obs_ok, obs_kf, m.max_kf)
    ].add(1, mode="drop")
    votes = jnp.where(m.kf_valid, votes, 0)
    kvals, kidx = jax.lax.top_k(votes, min(local_kf_cap, m.max_kf))
    local_kf = jnp.zeros(m.max_kf, bool).at[
        jnp.where(kvals > 0, kidx, m.max_kf)
    ].set(True, mode="drop")

    # --- local point set --------------------------------------------------
    flat = jnp.where((local_kf & m.kf_valid)[:, None], m.kf_obs, -1).reshape(-1)
    in_local = jnp.zeros(m.max_mp, bool).at[
        jnp.where(flat >= 0, flat, m.max_mp)
    ].set(True, mode="drop")
    in_local = in_local & m.mp_valid
    already = jnp.zeros(m.max_mp, bool).at[jnp.where(has, mp, m.max_mp)].set(
        True, mode="drop"
    )
    cand = in_local & ~already

    # --- frustum filter (Frame::isInFrustum, src/Frame.cc:389-445) --------
    X = m.mp_pos
    Pc = se3.apply(Tcw, X)
    z = Pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K[0, 0] * Pc[:, 0] / zs + K[0, 2]
    v = K[1, 1] * Pc[:, 1] / zs + K[1, 2]
    C = -jnp.einsum("ji,j->i", Tcw[:3, :3], Tcw[:3, 3])
    ray = X - C
    dist = jnp.linalg.norm(ray, axis=1)
    viewcos = jnp.sum(ray * m.mp_normal, axis=1) / jnp.maximum(dist, 1e-9)
    H = 2.0 * K[1, 2]
    Wd = 2.0 * K[0, 2]
    in_frustum = (
        cand
        & (z > 0)
        & (u >= 0) & (u < Wd) & (v >= 0) & (v < H)
        & (dist >= 0.8 * m.mp_min_dist) & (dist <= 1.2 * m.mp_max_dist)
        & (viewcos > 0.5)
    )

    # take up to max_local_points candidates
    sel_score = jnp.where(in_frustum, m.mp_n_obs, -1)
    pvals, pid = jax.lax.top_k(sel_score, min(max_local_points, m.max_mp))
    p_ok = pvals >= 0
    pid_s = jnp.maximum(pid, 0)

    pred_oct = predict_octave(
        dist[pid_s], m.mp_max_dist[pid_s], scale_factors[1], n_levels
    )
    # radius by viewing cos (ORBmatcher.cc:65-71): 2.5 if cos>0.998 else 4.0
    r = jnp.where(viewcos[pid_s] > 0.998, 2.5, 4.0)
    win = r * th * scale_factors[jnp.clip(pred_oct, 0, n_levels - 1)]

    free_feat = feats.valid & (cur_obs < 0)
    idx, dsts = matcher.match_with_window(
        m.mp_desc[pid_s],
        feats.desc,
        p_ok,
        free_feat,
        pred_xy=jnp.stack([u[pid_s], v[pid_s]], axis=1),
        xy2=feats.xy_und,
        window=win,
        max_dist=matcher.TH_HIGH,
        nn_ratio=0.8,
        octave2=feats.octave,
        octave_lo=jnp.clip(pred_oct - 1, 0, n_levels - 1),
        octave_hi=jnp.clip(pred_oct, 0, n_levels - 1),
    )
    n = feats.xy.shape[0]
    ok = idx >= 0
    cur_obs = cur_obs.at[jnp.where(ok, idx, n)].set(
        jnp.where(ok, pid_s, -1), mode="drop"
    )
    visible = jnp.zeros(m.max_mp, bool).at[
        jnp.where(p_ok, pid_s, m.max_mp)
    ].set(True, mode="drop")
    return cur_obs, visible


@jax.jit
def _pose_opt_on_obs(
    m: SlamMap,
    feats: FrameFeatures,
    cur_obs: jnp.ndarray,
    Tcw0: jnp.ndarray,
    K: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
):
    """Motion-only optimization over the frame's current map-point matches."""
    has = (cur_obs >= 0) & m.mp_valid[jnp.maximum(cur_obs, 0)] & feats.valid
    mp = jnp.maximum(cur_obs, 0)
    X = m.mp_pos[mp]
    w = inv_sigma2[jnp.clip(feats.octave, 0, inv_sigma2.shape[0] - 1)]
    Tcw, inl, n_inl = optimize_pose(
        Tcw0, X, feats.xy_und, w, has, K
    )
    cur_obs = jnp.where(inl | ~has, cur_obs, -1)
    return Tcw, cur_obs, n_inl


@jax.jit
def _update_point_counters(m: SlamMap, visible, cur_obs):
    """IncreaseVisible / IncreaseFound counters (Tracking.cc:1409-1447)."""
    found = jnp.zeros(m.max_mp, bool).at[
        jnp.where(cur_obs >= 0, jnp.maximum(cur_obs, 0), m.max_mp)
    ].set(True, mode="drop")
    return m.replace(
        mp_visible=m.mp_visible + (visible | found).astype(jnp.int32),
        mp_found=m.mp_found + found.astype(jnp.int32),
    )


@dataclass
class TrackerOutput:
    state: str
    Tcw: np.ndarray | None
    n_inliers: int
    created_kf: bool


class Tracker:
    """Monocular tracking session. Owns the map and per-frame state."""

    def __init__(self, cfg: SlamConfig, camera: Camera):
        self.cfg = cfg
        self.camera = camera
        hw = (camera.height, camera.width)
        self.extractor = OrbExtractor(cfg.orb, hw)
        self.K = jnp.asarray(np.asarray(camera.K), jnp.float32)
        self.scale_factors = jnp.asarray(self.extractor.scales)
        self.sigma2 = jnp.asarray(self.extractor.sigma2)
        self.inv_sigma2 = jnp.asarray(self.extractor.inv_sigma2)

        self.m = mt.empty_map(cfg.capacity, cfg.orb.n_features)
        self.state = NO_IMAGES_YET
        self.frame_id = -1
        self.last_feats: Optional[FrameFeatures] = None
        self.last_obs: Optional[jnp.ndarray] = None
        self.last_Tcw: Optional[jnp.ndarray] = None
        self.velocity: Optional[jnp.ndarray] = None
        self.ref_kf = 0
        self.last_kf_frame = 0
        self.init_feats: Optional[FrameFeatures] = None
        self._cur_depth: Optional[jnp.ndarray] = None
        self.trajectory: list[tuple[float, np.ndarray]] = []
        self.mapping_hook = None  # set by System: called with (new_kf_id)
        self.allow_keyframes = True  # cleared in localization-only mode
        from ..bow.database import BowIndex

        self.bow = BowIndex(cfg.capacity.max_keyframes)

    # ------------------------------------------------------------------
    def process_frame(
        self,
        image: np.ndarray,
        timestamp: float,
        depth: np.ndarray | None = None,
        image_right: np.ndarray | None = None,
    ) -> TrackerOutput:
        """Track one frame. `depth` (H, W) meters enables the RGB-D path;
        `image_right` enables the stereo path (rectified pair)."""
        self.frame_id += 1
        feats = self.extractor(jnp.asarray(image, jnp.float32))
        feats = feats.replace(xy_und=self.camera.undistort_points(feats.xy))

        # per-feature depth for stereo / RGB-D frames
        feat_depth = None
        if depth is not None:
            from ..ops.stereo import depth_from_depthmap

            feat_depth = depth_from_depthmap(feats, jnp.asarray(depth, jnp.float32))
        elif image_right is not None:
            from ..ops.stereo import match_stereo

            feats_r = self.extractor(jnp.asarray(image_right, jnp.float32))
            bf = jnp.asarray(self.cfg.camera.baseline_times_fx, jnp.float32)
            min_z = bf / jnp.asarray(self.camera.fx)
            feat_depth, _ = match_stereo(
                feats, feats_r, jnp.asarray(image, jnp.float32),
                jnp.asarray(image_right, jnp.float32), bf, min_z,
                self.scale_factors, self.cfg.orb.n_levels,
            )
        self._cur_depth = feat_depth

        if self.state in (NO_IMAGES_YET, NOT_INITIALIZED):
            if feat_depth is not None:
                out = self._initialize_with_depth(feats, feat_depth, timestamp)
            else:
                out = self._try_initialize(feats, timestamp)
        elif self.state == OK:
            out = self._track(feats, timestamp)
        else:
            out = self._relocalize(feats, timestamp)

        if out.Tcw is not None:
            self.trajectory.append((timestamp, out.Tcw))
        elif self.trajectory:
            self.trajectory.append((timestamp, self.trajectory[-1][1]))
        return out

    def _initialize_with_depth(
        self, feats: FrameFeatures, feat_depth: jnp.ndarray, ts: float
    ) -> TrackerOutput:
        """Stereo/RGB-D initialization (Tracking::StereoInitialization,
        src/Tracking.cc:700-748): one keyframe, map points unprojected from
        depth — no two-view geometry needed."""
        cfg = self.cfg
        n_valid = int(feats.valid.sum())
        if n_valid <= 100:  # ref demands N>500 at 2000 feats; scale to budget
            return TrackerOutput(NOT_INITIALIZED, None, 0, False)

        N = feats.n
        m, kf0 = mt.add_keyframe(
            self.m, jnp.eye(4), feats.xy_und, feats.octave, feats.angle,
            feats.desc, feats.valid, jnp.full(N, -1, jnp.int32),
            jnp.asarray(self.frame_id), jnp.asarray(ts, jnp.float32),
            jnp.asarray(-1),
        )
        has_d = feats.valid & (feat_depth > 0)
        X = self.camera.unproject(feats.xy_und, feat_depth)
        m, ids = mt.add_map_points(
            m,
            pos=X,
            desc=feats.desc,
            normal=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (N, 1)),
            min_dist=jnp.full(N, 0.1),
            max_dist=jnp.full(N, 100.0),
            kf1=jnp.full(N, int(kf0), jnp.int32),
            feat1=jnp.arange(N, dtype=jnp.int32),
            kf2=jnp.full(N, -1, jnp.int32),
            feat2=jnp.zeros(N, jnp.int32),
            valid=has_d,
        )
        m = refresh_point_stats(m, self.scale_factors)
        self.m = m
        self.last_feats = feats
        self.last_obs = self.m.kf_obs[int(kf0)]
        self.last_Tcw = jnp.eye(4)
        self.velocity = None
        self.ref_kf = int(kf0)
        self.last_kf_frame = self.frame_id
        self.state = OK
        self._register_kf_bow(int(kf0))
        return TrackerOutput(OK, np.eye(4), int(has_d.sum()), True)

    # ------------------------------------------------------------------
    def _try_initialize(self, feats: FrameFeatures, ts: float) -> TrackerOutput:
        cfg = self.cfg
        n_valid = int(feats.valid.sum())
        if self.init_feats is None:
            if n_valid > cfg.tracking.init_min_keypoints:
                self.init_feats = feats
                self.init_ts = ts
                self.state = NOT_INITIALIZED
            return TrackerOutput(self.state, None, 0, False)

        if n_valid <= cfg.tracking.init_min_keypoints:
            self.init_feats = None
            return TrackerOutput(self.state, None, 0, False)

        idx, dist = matcher.search_for_initialization(
            self.init_feats, feats, window=cfg.tracking.init_window,
            nn_ratio=cfg.matcher.nn_ratio_motion,
        )
        n_matches = int((idx >= 0).sum())
        if n_matches < cfg.tracking.init_min_matches:
            self.init_feats = feats  # restart with the newer frame
            self.init_ts = ts
            return TrackerOutput(self.state, None, n_matches, False)

        # two-view reconstruction on the matched subset (padded)
        N = feats.n
        ok = idx >= 0
        uv1 = self.init_feats.xy_und
        uv2 = feats.xy_und[jnp.maximum(idx, 0)]
        # per-match noise scale: the coarser octave of the pair
        oct_pair = jnp.maximum(
            self.init_feats.octave, feats.octave[jnp.maximum(idx, 0)]
        )
        sig2 = self.sigma2[jnp.clip(oct_pair, 0, self.cfg.orb.n_levels - 1)]
        res = initialize_two_view(
            uv1, uv2, ok, self.K, jax.random.PRNGKey(cfg.seed + self.frame_id),
            sigma2=sig2,
        )
        if not bool(res.success):
            return TrackerOutput(self.state, None, n_matches, False)

        self._create_initial_map(feats, idx, res, ts)
        self.state = OK
        return TrackerOutput(
            OK, np.asarray(self.last_Tcw), int(res.n_good), True
        )

    def _create_initial_map(self, feats, idx, res, ts):
        """CreateInitialMapMonocular (src/Tracking.cc:852-957): two
        keyframes, triangulated points, init BA, median-depth rescale."""
        cfg = self.cfg
        good = np.array(res.is_point & (idx >= 0))
        pts = np.array(res.points)
        # median-depth normalization
        depths = pts[good, 2]
        med = float(np.median(depths)) if good.any() else 1.0
        med = med if med > 1e-6 else 1.0
        pts = pts / med
        Tcw2 = np.array(res.Tcw2)
        Tcw2[:3, 3] /= med

        N = feats.n
        idx_np = np.asarray(idx)

        # keyframe 0 (init frame, identity pose)
        obs0 = np.full(N, -1, np.int32)
        # keyframe 1 (current); feature j of kf1 = idx[i] for match i
        obs1 = np.full(N, -1, np.int32)

        m = self.m
        m, kf0 = mt.add_keyframe(
            m, jnp.eye(4), self.init_feats.xy_und, self.init_feats.octave,
            self.init_feats.angle, self.init_feats.desc, self.init_feats.valid,
            jnp.full(N, -1, jnp.int32), jnp.asarray(self.frame_id - 1),
            jnp.asarray(self.init_ts, jnp.float32), jnp.asarray(-1),
        )
        m, kf1 = mt.add_keyframe(
            m, jnp.asarray(Tcw2), feats.xy_und, feats.octave,
            feats.angle, feats.desc, feats.valid,
            jnp.full(N, -1, jnp.int32), jnp.asarray(self.frame_id),
            jnp.asarray(ts, jnp.float32), kf0,
        )
        m, ids = mt.add_map_points(
            m,
            pos=jnp.asarray(pts),
            desc=self.init_feats.desc,
            normal=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (N, 1)),
            min_dist=jnp.full(N, 0.1),
            max_dist=jnp.full(N, 100.0),
            kf1=jnp.full(N, int(kf0), jnp.int32),
            feat1=jnp.arange(N, dtype=jnp.int32),
            kf2=jnp.full(N, int(kf1), jnp.int32),
            feat2=jnp.maximum(idx, 0),
            valid=jnp.asarray(good),
        )
        m = refresh_point_stats(m, self.scale_factors)

        # init BA (GlobalBundleAdjustemnt(map, 20) — Tracking.cc:894)
        from ..optim.ba_extract import extract_global_ba, write_back_ba
        from ..optim.local_ba import solve_ba

        prob, cam_ids, point_ids = extract_global_ba(m, self.K, self.inv_sigma2)
        ba = solve_ba(prob, 5, 15)
        m = write_back_ba(m, ba, prob, cam_ids, point_ids)
        m = refresh_point_stats(m, self.scale_factors)
        self.m = m

        # tracked obs of the current frame = the kf1 observations
        cur_obs = np.asarray(self.m.kf_obs[int(kf1)])
        self.last_feats = feats
        self.last_obs = jnp.asarray(cur_obs)
        self.last_Tcw = jnp.asarray(self.m.kf_pose[int(kf1)])
        self.velocity = None
        self.ref_kf = int(kf1)
        self.last_kf_frame = self.frame_id

    # ------------------------------------------------------------------
    def _track(self, feats: FrameFeatures, ts: float) -> TrackerOutput:
        cfg = self.cfg
        # motion model prediction (Tracking.cc:431-453)
        if self.velocity is not None:
            Tcw_pred = self.velocity @ self.last_Tcw
        else:
            Tcw_pred = self.last_Tcw

        cur_obs, n_m = _track_last_frame(
            self.m, feats, self.last_obs, self.last_feats.octave, Tcw_pred,
            self.K, jnp.asarray(cfg.tracking.motion_search_window),
            self.scale_factors, cfg.orb.n_levels,
        )
        n_matches = int(n_m)
        if n_matches < cfg.tracking.min_matches_motion:
            # widen window 2x (Tracking.cc:1108-1121)
            cur_obs, n_m = _track_last_frame(
                self.m, feats, self.last_obs, self.last_feats.octave, Tcw_pred,
                self.K, jnp.asarray(2.0 * cfg.tracking.motion_search_window),
                self.scale_factors, cfg.orb.n_levels,
            )
            n_matches = int(n_m)
        if n_matches < cfg.tracking.min_matches_motion:
            # TrackReferenceKeyFrame fallback (Tracking.cc:449): match
            # current descriptors against ref KF's map points brute force
            cur_obs, n_matches = self._track_reference_kf(feats)
            Tcw_pred = self.last_Tcw
            if n_matches < cfg.tracking.min_matches_refkf:
                self.state = LOST
                self._maybe_auto_reset()
                return TrackerOutput(LOST, None, n_matches, False)

        Tcw, cur_obs, n_inl = _pose_opt_on_obs(
            self.m, feats, cur_obs, Tcw_pred, self.K, self.inv_sigma2
        )
        if int(n_inl) < cfg.tracking.min_inliers_motion:
            self.state = LOST
            return TrackerOutput(LOST, None, int(n_inl), False)

        # track local map (Tracking.cc:1163-1207)
        cur_obs, visible = _track_local_map(
            self.m, feats, cur_obs, Tcw, self.K, self.scale_factors,
            jnp.asarray(1.0), cfg.orb.n_levels,
            max_local_points=cfg.capacity.local_ba_points,
            local_kf_cap=cfg.tracking.local_map_kf_cap,
        )
        Tcw, cur_obs, n_inl = _pose_opt_on_obs(
            self.m, feats, cur_obs, Tcw, self.K, self.inv_sigma2
        )
        n_inliers = int(n_inl)
        self.m = _update_point_counters(self.m, visible, cur_obs)

        if n_inliers < cfg.tracking.min_inliers_localmap:
            self.state = LOST
            self._maybe_auto_reset()
            return TrackerOutput(LOST, None, n_inliers, False)

        # motion model update
        if self.last_Tcw is not None:
            self.velocity = Tcw @ se3.inv(self.last_Tcw)
        self.last_Tcw = Tcw
        self.last_feats = feats
        self.last_obs = cur_obs

        created = False
        if self._need_new_keyframe(n_inliers):
            self._create_keyframe(feats, Tcw, cur_obs, ts)
            created = True

        return TrackerOutput(OK, np.asarray(Tcw), n_inliers, created)

    def _maybe_auto_reset(self):
        """Reset the whole session when tracking is lost soon after
        initialization (Tracking.cc:646-656: LOST with <= 5 keyframes)."""
        if int(self.m.kf_valid.sum()) <= self.cfg.tracking.auto_reset_max_kfs:
            self.reset()

    def reset(self):
        """Tracking::Reset (src/Tracking.cc:1835-1870): clear the map,
        database, and per-frame state; keep the trajectory log."""
        from ..bow.database import BowIndex

        self.m = mt.empty_map(self.cfg.capacity, self.cfg.orb.n_features)
        self.state = NO_IMAGES_YET
        self.last_feats = None
        self.last_obs = None
        self.last_Tcw = None
        self.velocity = None
        self.ref_kf = 0
        self.last_kf_frame = 0
        self.init_feats = None
        self._cur_depth = None
        self.bow = BowIndex(self.cfg.capacity.max_keyframes)

    def _track_reference_kf(self, feats: FrameFeatures):
        """TrackReferenceKeyFrame (src/Tracking.cc:977-1024): descriptor
        matching (the reference uses BoW buckets; full matrix here) against
        the reference keyframe's map points."""
        m = self.m
        k = self.ref_kf
        ref_has = (m.kf_obs[k] >= 0) & m.kf_feat_valid[k]
        idx, dist = matcher.match_by_descriptor(
            m.kf_desc[k], feats.desc, ref_has, feats.valid,
            nn_ratio=self.cfg.matcher.nn_ratio_refkf,
        )
        n = feats.n
        ok = idx >= 0
        cur_obs = jnp.full((n,), -1, jnp.int32).at[
            jnp.where(ok, idx, n)
        ].set(jnp.where(ok, m.kf_obs[k], -1), mode="drop")
        return cur_obs, int(ok.sum())

    def _need_new_keyframe(self, n_inliers: int) -> bool:
        """NeedNewKeyFrame (src/Tracking.cc:1210-1310), monocular branch.
        Localization-only mode never inserts (Tracking.cc:1213)."""
        cfg = self.cfg
        if not self.allow_keyframes:
            return False
        if int(self.m.n_kf) >= self.m.max_kf - 1:
            return False
        # nRefMatches: tracked points in ref KF (>= 3 obs when map is mature)
        k = self.ref_kf
        min_obs = 3 if int(self.m.n_kf) > 2 else 2
        ref_obs = np.asarray(self.m.kf_obs[k])
        valid_ref = ref_obs >= 0
        nobs = np.asarray(self.m.mp_n_obs)[np.maximum(ref_obs, 0)]
        n_ref = int((valid_ref & (nobs >= min_obs)).sum())

        c1a = self.frame_id >= self.last_kf_frame + cfg.tracking.max_frames_between_kf
        c1b = self.frame_id >= self.last_kf_frame + cfg.tracking.min_frames_between_kf
        c2 = (n_inliers < n_ref * cfg.tracking.keyframe_min_ratio) and n_inliers > 15
        return bool((c1a or c1b) and c2)

    def _create_keyframe(self, feats, Tcw, cur_obs, ts):
        """CreateNewKeyFrame (src/Tracking.cc:1312-1407) + synchronous
        local-mapping pass (the reference queues to the mapping thread)."""
        m, kf_id = mt.add_keyframe(
            self.m, Tcw, feats.xy_und, feats.octave, feats.angle, feats.desc,
            feats.valid, cur_obs, jnp.asarray(self.frame_id),
            jnp.asarray(ts, jnp.float32), jnp.asarray(self.ref_kf),
        )
        kf = int(kf_id)
        if kf < 0:
            return
        # stereo/RGB-D: create close points directly from depth for features
        # without a map point (Tracking::CreateNewKeyFrame,
        # src/Tracking.cc:1340-1395)
        if self._cur_depth is not None:
            N = feats.n
            free = feats.valid & (m.kf_obs[kf] < 0) & (self._cur_depth > 0)
            close = self._cur_depth < self.cfg.camera.depth_threshold
            Xc = self.camera.unproject(feats.xy_und, self._cur_depth)
            Twc = se3.inv(Tcw)
            Xw = se3.apply(Twc, Xc)
            m, _ = mt.add_map_points(
                m,
                pos=Xw,
                desc=feats.desc,
                normal=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (N, 1)),
                min_dist=jnp.full(N, 0.1),
                max_dist=jnp.full(N, 100.0),
                kf1=jnp.full(N, kf, jnp.int32),
                feat1=jnp.arange(N, dtype=jnp.int32),
                kf2=jnp.full(N, -1, jnp.int32),
                feat2=jnp.zeros(N, jnp.int32),
                valid=free & close,
            )
            m = refresh_point_stats(m, self.scale_factors)
        self.m = m
        self.ref_kf = kf
        self.last_kf_frame = self.frame_id
        self._register_kf_bow(kf)
        if self.mapping_hook is not None:
            self.mapping_hook(kf)
            # mapping may have adjusted poses: refresh the cached last pose
            self.last_Tcw = self.m.kf_pose[kf]
            self.last_obs = self.m.kf_obs[kf]

    # ------------------------------------------------------------------
    def _register_kf_bow(self, kf: int) -> None:
        """Add the new keyframe to the recognition database; train the
        vocabulary once enough descriptor corpus has accumulated (no
        ORBvoc.txt exists — see bow/vocabulary.py)."""
        m = self.m
        self.bow.add(kf, m.kf_desc[kf], m.kf_feat_valid[kf])
        if not self.bow.ready and int(m.n_kf) >= 4:
            n_train = int(m.n_kf)
            desc = m.kf_desc[:n_train].reshape(-1, 8)
            valid = m.kf_feat_valid[:n_train].reshape(-1)
            self.bow.maybe_train(
                desc, valid, jax.random.PRNGKey(self.cfg.seed + 7)
            )

    def _reloc_candidates(self, feats: FrameFeatures) -> list[int]:
        """BoW candidate keyframes for relocalization
        (KeyFrameDatabase::DetectRelocalizationCandidates,
        src/KeyFrameDatabase.cc:208-328)."""
        if not self.bow.ready:
            return [self.ref_kf]
        from ..bow.database import query_candidates
        from ..slam_map.covisibility import covisibility_matrix

        v = self.bow.query_vector(feats.desc, feats.valid)
        W = covisibility_matrix(self.m)
        acc, keep = query_candidates(
            self.bow.db, v, jnp.zeros(self.m.max_kf, bool), W.astype(jnp.float32)
        )
        acc = np.asarray(jnp.where(keep, acc, -1.0))
        order = np.argsort(-acc)
        return [int(k) for k in order[:3] if acc[k] > 0] or [self.ref_kf]

    def _relocalize(self, feats: FrameFeatures, ts: float) -> TrackerOutput:
        """Relocalization (Tracking::Relocalization,
        src/Tracking.cc:1628-1833): BoW candidates -> descriptor matching ->
        RANSAC PnP -> pose optimization, accept at >= reloc_min_inliers."""
        cfg = self.cfg
        m = self.m
        best = None
        for cand in self._reloc_candidates(feats):
            kf_obs = m.kf_obs[cand]
            ref_has = (kf_obs >= 0) & m.kf_feat_valid[cand]
            idx, dist = matcher.match_by_descriptor(
                m.kf_desc[cand], feats.desc, ref_has, feats.valid,
                nn_ratio=cfg.matcher.nn_ratio_bow,
            )
            n = feats.n
            ok = idx >= 0
            cur_obs = jnp.full((n,), -1, jnp.int32).at[
                jnp.where(ok, idx, n)
            ].set(jnp.where(ok, kf_obs, -1), mode="drop")
            if int(ok.sum()) < cfg.tracking.min_matches_refkf:
                continue
            has = (cur_obs >= 0) & m.mp_valid[jnp.maximum(cur_obs, 0)]
            X = m.mp_pos[jnp.maximum(cur_obs, 0)]
            w = self.inv_sigma2[jnp.clip(feats.octave, 0, cfg.orb.n_levels - 1)]
            Tcw0, inl, n_inl = ransac_pnp(
                X, feats.xy_und, has, w, self.K,
                jax.random.PRNGKey(cfg.seed + 31 * self.frame_id + cand),
            )
            if int(n_inl) < 10:   # minInliers (Tracking.cc:1694)
                continue
            Tcw, cur_obs2, n_opt = _pose_opt_on_obs(
                m, feats, jnp.where(inl, cur_obs, -1), Tcw0, self.K,
                self.inv_sigma2,
            )
            # widen with the local map before the final acceptance gate
            cur_obs3, _ = _track_local_map(
                m, feats, cur_obs2, Tcw, self.K, self.scale_factors,
                jnp.asarray(1.0), cfg.orb.n_levels,
                max_local_points=cfg.capacity.local_ba_points,
                local_kf_cap=cfg.tracking.local_map_kf_cap,
            )
            Tcw, cur_obs3, n_opt = _pose_opt_on_obs(
                m, feats, cur_obs3, Tcw, self.K, self.inv_sigma2
            )
            if best is None or int(n_opt) > best[0]:
                best = (int(n_opt), Tcw, cur_obs3)
            if int(n_opt) >= cfg.tracking.reloc_min_inliers:
                break
        if best is None or best[0] < cfg.tracking.min_inliers_motion:
            n = 0 if best is None else best[0]
            return TrackerOutput(LOST, None, n, False)
        n_inl, Tcw, cur_obs = best
        self.state = OK
        self.last_Tcw = Tcw
        self.last_feats = feats
        self.last_obs = cur_obs
        self.velocity = None
        return TrackerOutput(OK, np.asarray(Tcw), n_inl, False)

    # ------------------------------------------------------------------
    def trajectory_Twc(self) -> tuple[np.ndarray, np.ndarray]:
        """(timestamps (F,), Twc (F,4,4)) for export/eval."""
        ts = np.asarray([t for t, _ in self.trajectory])
        Tcw = np.stack([p for _, p in self.trajectory])
        Twc = np.linalg.inv(Tcw)
        return ts, Twc
