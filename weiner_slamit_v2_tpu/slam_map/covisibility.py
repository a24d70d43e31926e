"""Covisibility graph & local-window queries as dense matrix ops.

TPU-native replacement for ``KeyFrame::UpdateConnections`` and friends
(jni/ORB_SLAM2/src/KeyFrame.cc:296-386): the reference maintains mutable
adjacency maps per keyframe under mutexes; here the covisibility weight
matrix is *derived* on demand from the observation relation with one
indicator matmul (MXU work), so it can never be stale and needs no locks.
"""

from __future__ import annotations

import jax.numpy as jnp

from .types import SlamMap, observation_indicator

MIN_COVIS_WEIGHT = 15   # edge threshold (KeyFrame.cc:337-383)


def covisibility_matrix(m: SlamMap) -> jnp.ndarray:
    """(K, K) int32 — number of map points shared by each keyframe pair.

    W = I @ I^T over the (K, M) observation indicator, diagonal zeroed,
    invalid keyframes masked out.
    """
    ind = observation_indicator(m) & m.mp_valid[None, :]
    indf = ind.astype(jnp.float32)
    W = (indf @ indf.T).astype(jnp.int32)
    K = W.shape[0]
    W = W * (1 - jnp.eye(K, dtype=jnp.int32))
    vv = m.kf_valid
    return jnp.where(vv[:, None] & vv[None, :], W, 0)


def best_covisible(
    W: jnp.ndarray, kf_id: jnp.ndarray, k: int, min_weight: int = MIN_COVIS_WEIGHT
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k covisible neighbors of kf_id by weight.

    Returns (ids (k,) int32 with -1 padding, weights (k,)). Mirrors
    GetBestCovisibilityKeyFrames (KeyFrame.cc:142) including the reference's
    rule that the single best neighbor is kept even below the threshold.
    """
    row = W[kf_id]
    import jax

    vals, idx = jax.lax.top_k(row, k)
    ok = vals >= min_weight
    ok = ok.at[0].set(vals[0] > 0)  # always keep the best connection
    return jnp.where(ok, idx, -1), jnp.where(ok, vals, 0)


def local_keyframes(
    W: jnp.ndarray, obs_counts_in_frame: jnp.ndarray, cap: int
) -> jnp.ndarray:
    """Keyframes sharing observations with the current frame, best first.

    obs_counts_in_frame: (K,) — how many of the frame's tracked map points
    each keyframe observes (the vote counting of UpdateLocalKeyFrames,
    src/Tracking.cc:1512-1570). Returns (cap,) kf ids, -1 padded.
    """
    import jax

    vals, idx = jax.lax.top_k(obs_counts_in_frame, cap)
    return jnp.where(vals > 0, idx, -1)
