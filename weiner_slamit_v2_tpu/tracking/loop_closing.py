"""Loop closing: detection, Sim3 estimation, pose-graph correction.

TPU-native replacement for the ``LoopClosing`` thread
(jni/ORB_SLAM2/src/LoopClosing.cc). Runs synchronously per keyframe (the
pipeline analogue of the reference's 5ms polling loop):

1. detect (DetectLoop, LoopClosing.cc:111-245): BoW candidates excluding the
   covisibility group, gated at the minimum covis score, accepted after
   `covisibility_consistency_th` consecutive hits;
2. compute Sim3 (ComputeSim3, LoopClosing.cc:247-416): descriptor matching
   between the two keyframes' map points -> RANSAC Horn Sim3 -> GN
   refinement, accept at >= 20 inliers;
3. correct (CorrectLoop, LoopClosing.cc:418-598): build the essential graph
   (spanning tree + covis >= 100 + loop edge), optimize Sim3 poses, recover
   SE3, correct map points by their reference keyframe's transform.

The reference spawns a global-BA thread afterwards (RunGlobalBundleAdjustment,
LoopClosing.cc:658-758); here an optional synchronous global BA follows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..frontend import matcher
from ..geometry import se3, sim3
from ..optim.pose_graph import correct_map_after_pose_graph, optimize_pose_graph
from ..optim.sim3_solver import ransac_sim3, refine_sim3
from ..slam_map.covisibility import covisibility_matrix


class LoopCloser:
    def __init__(self, cfg: SlamConfig, tracker):
        self.cfg = cfg
        self.tracker = tracker
        self.last_loop_kf = -1_000
        self.consistency: list[set[int]] = []  # candidate groups history
        self.consistency_counts: dict[int, int] = {}
        self.n_loops_closed = 0
        self.run_global_ba = True

    # ------------------------------------------------------------------
    def on_keyframe(self, kf_id: int) -> bool:
        """Process a new keyframe; returns True if a loop was closed."""
        cfg = self.cfg
        t = self.tracker
        if not t.bow.ready:
            return False
        if kf_id < self.last_loop_kf + cfg.loop.min_kfs_between_loops:
            return False
        cand = self._detect(kf_id)
        if cand is None:
            return False
        ok = self._close(kf_id, cand)
        if ok:
            self.last_loop_kf = kf_id
            self.n_loops_closed += 1
            self.consistency_counts.clear()
        return ok

    # ------------------------------------------------------------------
    def _detect(self, kf_id: int):
        """BoW loop candidates with covisibility-consistency accumulation."""
        cfg = self.cfg
        t = self.tracker
        m = t.m
        from ..bow.database import query_candidates

        W = covisibility_matrix(m)
        Wnp = np.asarray(W)
        covis_group = set(np.nonzero(Wnp[kf_id] > 0)[0].tolist()) | {kf_id}

        # min score among covisible neighbors (LoopClosing.cc:137-153)
        v = t.bow.db.bow[kf_id]
        neigh = [k for k in covis_group if k != kf_id]
        if neigh:
            from ..bow.vocabulary import l1_score

            scores = np.asarray(l1_score(t.bow.db.bow[jnp.asarray(neigh)], v))
            min_score = float(scores.min())
        else:
            min_score = 0.0

        exclude = np.zeros(m.max_kf, bool)
        for k in covis_group:
            exclude[k] = True
        # also exclude very recent keyframes (id gap, LoopClosing.cc:124)
        recent = np.arange(m.max_kf) > kf_id - cfg.loop.min_kfs_between_loops
        exclude |= recent

        acc, keep = query_candidates(
            t.bow.db, v, jnp.asarray(exclude), W.astype(jnp.float32),
            jnp.asarray(min_score, jnp.float32),
        )
        keep_np = np.asarray(keep)
        cands = np.nonzero(keep_np)[0]
        if len(cands) == 0:
            self.consistency_counts.clear()
            return None

        # covisibility-consistency over consecutive keyframes
        # (LoopClosing.cc:170-243): a candidate's covis group must have been
        # seen in the previous keyframe's candidate set too.
        new_counts: dict[int, int] = {}
        chosen = None
        for c in cands:
            group = set(np.nonzero(Wnp[c] > 0)[0].tolist()) | {int(c)}
            prev = max(
                (self.consistency_counts.get(g, 0) for g in group), default=0
            )
            cnt = prev + 1
            for g in group:
                new_counts[g] = max(new_counts.get(g, 0), cnt)
            if cnt >= self.cfg.loop.covisibility_consistency_th:
                chosen = int(c)
        self.consistency_counts = new_counts
        return chosen

    # ------------------------------------------------------------------
    def _close(self, kf_id: int, cand: int) -> bool:
        cfg = self.cfg
        t = self.tracker
        m = t.m

        # --- match map points of the two keyframes by descriptor ----------
        has1 = (m.kf_obs[kf_id] >= 0) & m.kf_feat_valid[kf_id]
        has2 = (m.kf_obs[cand] >= 0) & m.kf_feat_valid[cand]
        idx, dist = matcher.match_by_descriptor(
            m.kf_desc[kf_id], m.kf_desc[cand], has1, has2,
            nn_ratio=cfg.matcher.nn_ratio_bow,
        )
        ok = idx >= 0
        if int(ok.sum()) < cfg.loop.min_bow_matches:
            return False

        # 3D positions in each camera frame
        mp1 = jnp.maximum(m.kf_obs[kf_id], 0)
        mp2 = jnp.maximum(m.kf_obs[cand][jnp.maximum(idx, 0)], 0)
        X1 = se3.apply(m.kf_pose[kf_id], m.mp_pos[mp1])
        X2 = se3.apply(m.kf_pose[cand], m.mp_pos[mp2])
        uv1 = m.kf_xy[kf_id]
        uv2 = m.kf_xy[cand][jnp.maximum(idx, 0)]
        s2_1 = t.inv_sigma2[jnp.clip(m.kf_octave[kf_id], 0, cfg.orb.n_levels - 1)]
        oct2 = m.kf_octave[cand][jnp.maximum(idx, 0)]
        s2_2 = t.inv_sigma2[jnp.clip(oct2, 0, cfg.orb.n_levels - 1)]
        valid = ok & m.mp_valid[mp1] & m.mp_valid[mp2]

        S12, inl, n_inl = ransac_sim3(
            X1, X2, valid, uv1, uv2, s2_1, s2_2, t.K,
            jax.random.PRNGKey(cfg.seed + 97 * kf_id),
        )
        if int(n_inl) < cfg.loop.min_sim3_inliers:
            return False
        S12, inl, n_inl = refine_sim3(
            S12, X1, X2, valid & inl, uv1, uv2, s2_1, s2_2, t.K,
            chi2_th=cfg.loop.sim3_chi2,
        )
        if int(n_inl) < cfg.loop.min_sim3_inliers:
            return False

        self._correct(kf_id, cand, S12)
        return True

    # ------------------------------------------------------------------
    def _correct(self, kf_id: int, cand: int, S12: jnp.ndarray):
        """Essential-graph optimization + map correction."""
        cfg = self.cfg
        t = self.tracker
        m = t.m
        K_ = m.max_kf

        W = covisibility_matrix(m)
        Wnp = np.asarray(W)
        poses = m.kf_pose  # (K, 4, 4) SE3 == Sim3 with s=1

        # --- edge list ---------------------------------------------------
        # spanning tree + strong covis + the loop edge; measurements from
        # the *current* relative poses (pre-correction), loop edge from S12.
        edges_i, edges_j, edges_S = [], [], []
        kf_valid_np = np.asarray(m.kf_valid)
        parent_np = np.asarray(m.kf_parent)
        poses_np = poses

        def rel(i, j):
            # S_ji = T_j @ T_i^-1 (scale-1 measurement)
            return poses[j] @ se3.inv(poses[i])

        for k in range(K_):
            if not kf_valid_np[k]:
                continue
            p = int(parent_np[k])
            if p >= 0 and kf_valid_np[p]:
                edges_i.append(k)
                edges_j.append(p)
                edges_S.append(rel(k, p))
        strong = np.argwhere(
            np.triu(Wnp, 1) >= cfg.loop.essential_min_covis_weight
        )
        for i, j in strong:
            edges_i.append(int(i))
            edges_j.append(int(j))
            edges_S.append(rel(int(i), int(j)))
        # loop edge: S12 aligns camera-2 (cand) coords to camera-1 (kf),
        # i.e. S_1w ~ S12 @ S_2w, so the (i=cand, j=kf) measurement
        # S_ji = S_1w S_2w^-1 = S12
        edges_i.append(cand)
        edges_j.append(kf_id)
        edges_S.append(S12)

        E = len(edges_i)
        edge_i = jnp.asarray(edges_i, jnp.int32)
        edge_j = jnp.asarray(edges_j, jnp.int32)
        edge_S = jnp.stack(edges_S)
        edge_valid = jnp.ones(E, bool)

        # --- optimize ----------------------------------------------------
        fixed = jnp.zeros(K_, bool).at[cand].set(True)  # fix the loop KF
        S_old = poses
        S_new = optimize_pose_graph(
            S_old, m.kf_valid, fixed, edge_i, edge_j, edge_S, edge_valid,
            n_iters=cfg.optim.essential_graph_iters,
        )

        # --- write back: SE3 poses + corrected points --------------------
        T_new = jax.vmap(sim3.to_se3)(S_new)
        T_new = jax.vmap(se3.orthonormalize)(T_new)
        mp_pos = correct_map_after_pose_graph(
            m.mp_pos, m.mp_valid, m.mp_first_kf, S_old, S_new
        )
        t.m = m.replace(
            kf_pose=jnp.where(m.kf_valid[:, None, None], T_new, m.kf_pose),
            mp_pos=mp_pos,
        )
        # tracking continuity: refresh the cached last pose to the corrected
        # current keyframe
        t.last_Tcw = t.m.kf_pose[kf_id]
        t.velocity = None

        # --- optional synchronous global BA (the reference's GBA thread) --
        if self.run_global_ba:
            from ..optim.ba_extract import extract_global_ba, write_back_ba
            from ..optim.local_ba import solve_ba
            from ..slam_map.point_stats import refresh_point_stats

            prob, cam_ids, point_ids = extract_global_ba(
                t.m, t.K, t.inv_sigma2, gauge_kf=cand
            )
            res = solve_ba(prob, 5, cfg.optim.global_ba_iters - 5)
            t.m = write_back_ba(t.m, res, prob, cam_ids, point_ids)
            t.m = refresh_point_stats(t.m, t.scale_factors)
            t.last_Tcw = t.m.kf_pose[kf_id]
