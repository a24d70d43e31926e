"""Extract fixed-shape BA problems from the map + write results back.

The array analogue of the graph-construction half of
``Optimizer::LocalBundleAdjustment`` (jni/ORB_SLAM2/src/Optimizer.cc:453-615):
gather the covisible window, the boundary (fixed) cameras, the local points
and their observations into the dense ``BAProblem`` layout; after the solve,
scatter poses/points back and erase outlier observations
(Optimizer.cc:700-760).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..slam_map.covisibility import covisibility_matrix
from ..slam_map.types import SlamMap, rebuild_observation_lists
from .local_ba import BAProblem, BAResult


def extract_local_ba(
    m: SlamMap,
    center_kf: jnp.ndarray,
    K: jnp.ndarray,
    inv_sigma2_by_octave: jnp.ndarray,
    window: int,
    n_fixed: int,
    max_points: int,
    bf: float = 0.0,
) -> tuple[BAProblem, jnp.ndarray, jnp.ndarray]:
    """Build a local BA problem around `center_kf`.

    Returns (problem, cam_ids (C,), point_ids (P,)) where C = window+n_fixed.
    cam slots [0, window) are the active covisible window (center first);
    slots [window, window+n_fixed) are fixed boundary cameras. Invalid slots
    have cam_ids == -1.
    """
    W = covisibility_matrix(m)
    row = W[center_kf]
    vals, idx = jax.lax.top_k(row, window - 1)
    neigh_ok = vals > 0
    active = jnp.concatenate(
        [center_kf[None], jnp.where(neigh_ok, idx, -1)]
    )  # (window,)

    # -1 (empty) slots must scatter out of bounds, not clobber keyframe 0
    is_active = jnp.zeros(m.max_kf, bool).at[
        jnp.where(active >= 0, active, m.max_kf)
    ].set(True, mode="drop")

    # local points: observed by any active cam
    obs_by_active = jnp.where(
        (is_active & m.kf_valid)[:, None], m.kf_obs, -1
    )  # (K, N)
    flat = obs_by_active.reshape(-1)
    in_local = jnp.zeros(m.max_mp, bool).at[jnp.where(flat >= 0, flat, m.max_mp)].set(
        True, mode="drop"
    )
    in_local = in_local & m.mp_valid
    # pick up to max_points (prefer more-observed points)
    score = jnp.where(in_local, m.mp_n_obs, -1)
    pvals, point_ids = jax.lax.top_k(score, max_points)
    p_ok = pvals >= 0
    point_ids = jnp.where(p_ok, point_ids, -1)

    # fixed cams: observe local points but not active
    pid_safe = jnp.maximum(point_ids, 0)
    obs_kfs = m.mp_obs_kf[pid_safe]                      # (P, O)
    obs_ok = (obs_kfs >= 0) & p_ok[:, None]
    kf_hit = jnp.zeros(m.max_kf, bool).at[
        jnp.where(obs_ok, obs_kfs, m.max_kf)
    ].set(True, mode="drop")
    fixed_cand = kf_hit & m.kf_valid & ~is_active
    fvals, fidx = jax.lax.top_k(fixed_cand.astype(jnp.int32), n_fixed)
    fixed_ids = jnp.where(fvals > 0, fidx, -1)

    cam_ids = jnp.concatenate([active, fixed_ids])       # (C,)
    C = cam_ids.shape[0]
    kf_to_slot = jnp.full(m.max_kf + 1, -1, jnp.int32).at[
        jnp.where(cam_ids >= 0, cam_ids, m.max_kf)
    ].set(jnp.arange(C, dtype=jnp.int32), mode="promise_in_bounds")

    # observations of local points, mapped to cam slots
    obs_cam = kf_to_slot[jnp.clip(obs_kfs, 0, m.max_kf - 1)]
    obs_feat = jnp.maximum(m.mp_obs_feat[pid_safe], 0)
    kf_safe = jnp.maximum(obs_kfs, 0)
    # stale-observation guard: keyframe must still reference this point
    backref = m.kf_obs[kf_safe, obs_feat] == pid_safe[:, None]
    obs_uv = m.kf_xy[kf_safe, obs_feat]
    octv = m.kf_octave[kf_safe, obs_feat]
    inv_s2 = inv_sigma2_by_octave[jnp.clip(octv, 0, inv_sigma2_by_octave.shape[0] - 1)]
    obs_valid = obs_ok & (obs_cam >= 0) & backref

    cam_ok = cam_ids >= 0
    ur = m.kf_ur[kf_safe, obs_feat]
    prob = BAProblem(
        cam_pose=m.kf_pose[jnp.maximum(cam_ids, 0)],
        cam_fixed=jnp.arange(C) >= active.shape[0],
        cam_valid=cam_ok,
        points=m.mp_pos[pid_safe],
        point_valid=p_ok,
        obs_cam=jnp.where(obs_valid, obs_cam, -1),
        obs_uv=obs_uv,
        obs_inv_sigma2=inv_s2,
        obs_valid=obs_valid,
        K=K,
        # stereo right-u observations (kf_ur = mvuRight); compiled out for
        # monocular sessions (bf == 0)
        obs_ur=ur if bf > 0 else None,
        obs_has_ur=(ur >= 0) & obs_valid if bf > 0 else None,
        bf=jnp.asarray(bf, jnp.float32) if bf > 0 else None,
    )
    return prob, cam_ids, point_ids


def extract_global_ba(
    m: SlamMap,
    K: jnp.ndarray,
    inv_sigma2_by_octave: jnp.ndarray,
    gauge_kf: int = 0,
    bf: float = 0.0,
) -> tuple[BAProblem, jnp.ndarray, jnp.ndarray]:
    """Build the full-map BA problem (GlobalBundleAdjustemnt [sic],
    Optimizer.cc:41-47): every valid keyframe and point, gauge fixed at
    keyframe `gauge_kf`."""
    C = m.max_kf
    cam_ids = jnp.where(m.kf_valid, jnp.arange(C, dtype=jnp.int32), -1)
    point_ids = jnp.where(
        m.mp_valid, jnp.arange(m.max_mp, dtype=jnp.int32), -1
    )
    obs_kfs = m.mp_obs_kf
    obs_feat = jnp.maximum(m.mp_obs_feat, 0)
    kf_safe = jnp.maximum(obs_kfs, 0)
    backref = m.kf_obs[kf_safe, obs_feat] == jnp.arange(m.max_mp)[:, None]
    obs_ok = (obs_kfs >= 0) & m.mp_valid[:, None] & m.kf_valid[kf_safe] & backref
    octv = m.kf_octave[kf_safe, obs_feat]
    ur = m.kf_ur[kf_safe, obs_feat]
    prob = BAProblem(
        cam_pose=m.kf_pose,
        cam_fixed=jnp.arange(C) == gauge_kf,
        cam_valid=m.kf_valid,
        points=m.mp_pos,
        point_valid=m.mp_valid,
        obs_cam=jnp.where(obs_ok, obs_kfs, -1),
        obs_uv=m.kf_xy[kf_safe, obs_feat],
        obs_inv_sigma2=inv_sigma2_by_octave[
            jnp.clip(octv, 0, inv_sigma2_by_octave.shape[0] - 1)
        ],
        obs_valid=obs_ok,
        K=K,
        obs_ur=ur if bf > 0 else None,
        obs_has_ur=(ur >= 0) & obs_ok if bf > 0 else None,
        bf=jnp.asarray(bf, jnp.float32) if bf > 0 else None,
    )
    return prob, cam_ids, point_ids


def write_back_ba(
    m: SlamMap,
    res: BAResult,
    prob: BAProblem,
    cam_ids: jnp.ndarray,
    point_ids: jnp.ndarray,
    erase_outliers: bool = True,
    rebuild: bool = True,
) -> SlamMap:
    """Scatter optimized poses/points into the map and erase outlier
    observations (set the keyframe's feature slot back to -1, then rebuild
    the per-point observation lists)."""
    cam_w = jnp.where(cam_ids >= 0, cam_ids, m.max_kf)
    kf_pose = m.kf_pose.at[cam_w].set(res.cam_pose, mode="drop")
    pt_w = jnp.where(point_ids >= 0, point_ids, m.max_mp)
    mp_pos = m.mp_pos.at[pt_w].set(res.points, mode="drop")
    m = m.replace(kf_pose=kf_pose, mp_pos=mp_pos)

    if erase_outliers:
        bad = prob.obs_valid & ~res.obs_inlier  # (P, O)
        obs_kfs = m.mp_obs_kf[jnp.maximum(point_ids, 0)]
        obs_fts = jnp.maximum(m.mp_obs_feat[jnp.maximum(point_ids, 0)], 0)
        kf_w = jnp.where(bad & (obs_kfs >= 0), obs_kfs, m.max_kf)
        kf_obs = m.kf_obs.at[kf_w, obs_fts].set(-1, mode="drop")
        m = m.replace(kf_obs=kf_obs)
        if rebuild:
            m = rebuild_observation_lists(m)
    return m
