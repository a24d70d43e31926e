"""Batched two-view triangulation (DLT via SVD).

TPU-native replacement for ``Initializer::Triangulate``
(jni/ORB_SLAM2/src/Initializer.cc:743-805) and the SVD triangulation inside
``LocalMapping::CreateNewMapPoints`` (jni/ORB_SLAM2/src/LocalMapping.cc:221-505).
The reference triangulates one correspondence at a time with cv::SVD; here a
whole batch is solved at once with vmapped 4x4 SVDs, which XLA maps well.
"""

from __future__ import annotations

import jax.numpy as jnp


def _projection_matrix(K: jnp.ndarray, Tcw: jnp.ndarray) -> jnp.ndarray:
    """P = K [R|t], shapes K (3,3), Tcw (...,4,4) -> (...,3,4)."""
    return jnp.einsum("ij,...jk->...ik", K, Tcw[..., :3, :4])


def triangulate_dlt(
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    P1: jnp.ndarray,
    P2: jnp.ndarray,
) -> jnp.ndarray:
    """Triangulate batched correspondences.

    Args:
      uv1, uv2: (..., 2) rectified pixel coordinates in views 1 and 2.
      P1, P2: (3, 4) or (..., 3, 4) projection matrices.

    Returns:
      (..., 3) world points (homogeneous DLT solution dehomogenized).
    """
    P1 = jnp.broadcast_to(P1, uv1.shape[:-1] + (3, 4))
    P2 = jnp.broadcast_to(P2, uv2.shape[:-1] + (3, 4))
    rows = jnp.stack(
        [
            uv1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
            uv1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
            uv2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
            uv2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
        ],
        axis=-2,
    )  # (..., 4, 4)
    # Null vector of A: right singular vector of smallest singular value.
    _, _, vt = jnp.linalg.svd(rows)
    Xh = vt[..., 3, :]
    w = Xh[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return Xh[..., :3] / w_safe[..., None]


def depth_in_view(Tcw: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """z-coordinate of world points X (...,3) in camera frame of Tcw."""
    return (
        jnp.einsum("...j,...j->...", Tcw[..., 2, :3], X) + Tcw[..., 2, 3]
    )


def parallax_cos(C1: jnp.ndarray, C2: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Cosine of the ray angle at X between camera centers C1, C2 (batched).

    Mirrors the parallax check in Initializer::CheckRT
    (jni/ORB_SLAM2/src/Initializer.cc:866-886).
    """
    n1 = X - C1
    n2 = X - C2
    d1 = jnp.linalg.norm(n1, axis=-1)
    d2 = jnp.linalg.norm(n2, axis=-1)
    return jnp.sum(n1 * n2, axis=-1) / jnp.maximum(d1 * d2, 1e-12)


def camera_center(Tcw: jnp.ndarray) -> jnp.ndarray:
    """World-frame camera center -R^T t of a world->camera pose (batched)."""
    R = Tcw[..., :3, :3]
    t = Tcw[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", R, t)
