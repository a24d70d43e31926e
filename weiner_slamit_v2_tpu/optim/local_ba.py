"""Bundle adjustment: Levenberg–Marquardt with blocked Schur complement.

TPU-native replacement for g2o-based ``Optimizer::LocalBundleAdjustment`` /
``BundleAdjustment`` (jni/ORB_SLAM2/src/Optimizer.cc:453-778, :49-237). The
reference builds a sparse graph and factorizes with Eigen sparse Cholesky;
here the solver exploits the classic SfM structure directly with dense
blocks, which is what maps to the MXU:

  * point blocks Hpp are (P, 3, 3) — batched closed-form inverses;
  * camera blocks Hcc / cross blocks Hcp are scatter-added over observations;
  * the reduced camera system S = Hcc - Hcp Hpp^-1 Hpc is a (6C, 6C) dense
    matrix assembled with one einsum (C is the local window, <= ~64, so dense
    Cholesky is exact and tiny);
  * points are back-substituted in batch.

The observation layout is point-major (P, O): each point carries up to O
observations (cam slot, uv, information) — the array form of
MapPoint::mObservations. The same solver serves local BA (fixed boundary
cams — Optimizer.cc:504-521), global BA (no fixed cams but gauge fixed at
kf0), and the distributed variant (parallel/sharded_ba.py shards the
scatter-accumulation and psums the reduced system).
"""

from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp

from ..geometry import se3

CHI2_MONO = 5.991
HUBER2 = 5.991  # Huber delta^2 (delta = sqrt(5.991), Optimizer.cc:536)


@flax.struct.dataclass
class BAProblem:
    """A fixed-shape bundle-adjustment problem extracted from the map."""

    cam_pose: jnp.ndarray      # (C, 4, 4) world->camera
    cam_fixed: jnp.ndarray     # (C,) bool — pose held constant
    cam_valid: jnp.ndarray     # (C,) bool — slot in use
    points: jnp.ndarray        # (P, 3)
    point_valid: jnp.ndarray   # (P,) bool
    obs_cam: jnp.ndarray       # (P, O) int32 cam slot or -1
    obs_uv: jnp.ndarray        # (P, O, 2) rectified pixels
    obs_inv_sigma2: jnp.ndarray  # (P, O)
    obs_valid: jnp.ndarray     # (P, O) bool
    K: jnp.ndarray             # (3, 3)


@flax.struct.dataclass
class BAResult:
    cam_pose: jnp.ndarray      # (C, 4, 4) optimized
    points: jnp.ndarray        # (P, 3) optimized
    obs_inlier: jnp.ndarray    # (P, O) bool — chi2 <= th and positive depth
    final_cost: jnp.ndarray    # () robust cost on the final estimate


def _project_residuals(cam_pose, points, K, obs_cam, obs_uv):
    """Residuals + Jacobians for all observations.

    Returns r (P,O,2), J_c (P,O,2,6), J_p (P,O,2,3), z (P,O).
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    cam = jnp.maximum(obs_cam, 0)
    T = cam_pose[cam]                      # (P, O, 4, 4)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    P3 = jnp.einsum("poij,pj->poi", R, points) + t   # (P, O, 3)
    x, y, z = P3[..., 0], P3[..., 1], P3[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    iz = 1.0 / z_safe
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    r = jnp.stack([u, v], axis=-1) - obs_uv

    zero = jnp.zeros_like(x)
    du = jnp.stack([fx * iz, zero, -fx * x * iz * iz], axis=-1)
    dv = jnp.stack([zero, fy * iz, -fy * y * iz * iz], axis=-1)
    dproj = jnp.stack([du, dv], axis=-2)   # (P, O, 2, 3)

    # camera: left-mult update exp(xi) T -> dP/dxi = [I | -hat(P3)]
    eye = jnp.broadcast_to(jnp.eye(3), P3.shape[:-1] + (3, 3))
    dP_c = jnp.concatenate([eye, -se3.hat(P3)], axis=-1)  # (P, O, 3, 6)
    J_c = jnp.einsum("poij,pojk->poik", dproj, dP_c)

    # point: dP/dX = R
    J_p = jnp.einsum("poij,pojk->poik", dproj, R)
    return r, J_c, J_p, z


def _inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    # relative clamp: near-singular blocks (low-parallax depth directions)
    # must not overflow f32 in adj/det
    scale = jnp.maximum(jnp.abs(a) + jnp.abs(e) + jnp.abs(i), 1e-12)
    det_min = 1e-7 * scale * scale * scale
    det = jnp.where(jnp.abs(det) < det_min, jnp.sign(det + 1e-30) * det_min, det)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=-1),
            jnp.stack([A21, A22, A23], axis=-1),
            jnp.stack([A31, A32, A33], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def _robust_weight(chi2, robust):
    w = jnp.where(chi2 <= HUBER2, 1.0, jnp.sqrt(HUBER2 / jnp.maximum(chi2, 1e-12)))
    return jnp.where(robust, w, 1.0)


def _robust_cost(chi2, robust):
    rho = jnp.where(
        chi2 <= HUBER2, chi2, 2.0 * jnp.sqrt(HUBER2 * jnp.maximum(chi2, 1e-12)) - HUBER2
    )
    return jnp.where(robust, rho, chi2)


def build_normal_equations(
    cam_pose, points, K, obs_cam, obs_uv, w, C: int
):
    """Accumulate the BA normal equations.

    w: (P, O) final per-observation weights (information x robust x masks).
    Returns Hcc (C,6,6), bc (C,6), Hpp (P,3,3), bp (P,3), Hcp (C,P,6,3).
    This function is the sharding point for distributed BA: observations can
    be partitioned and the outputs psum-reduced.
    """
    r, J_c, J_p, z = _project_residuals(cam_pose, points, K, obs_cam, obs_uv)
    w = w * (z > 0)

    Jc_w = J_c * w[..., None, None]
    Jp_w = J_p * w[..., None, None]

    Hpp = jnp.einsum("poij,poik->pjk", Jp_w, J_p)
    bp = -jnp.einsum("poij,poi->pj", Jp_w, r)

    P, O = w.shape
    cam_flat = jnp.maximum(obs_cam, 0).reshape(-1)
    Hcc_contrib = jnp.einsum("poij,poik->pojk", Jc_w, J_c).reshape(P * O, 6, 6)
    bc_contrib = -jnp.einsum("poij,poi->poj", Jc_w, r).reshape(P * O, 6)
    Hcc = jnp.zeros((C, 6, 6)).at[cam_flat].add(Hcc_contrib)
    bc = jnp.zeros((C, 6)).at[cam_flat].add(bc_contrib)

    Hcp_contrib = jnp.einsum("poij,poik->pojk", Jc_w, J_p)  # (P, O, 6, 3)
    p_flat = jnp.repeat(jnp.arange(P), O)
    Hcp = jnp.zeros((C, P, 6, 3)).at[cam_flat, p_flat].add(
        Hcp_contrib.reshape(P * O, 6, 3)
    )
    return Hcc, bc, Hpp, bp, Hcp


def schur_solve(Hcc, bc, Hpp, bp, Hcp, cam_free, point_free, lam):
    """Solve the damped normal equations by marginalizing points.

    cam_free: (C,) bool — optimizable cameras; fixed/invalid get dx = 0.
    point_free: (P,) bool. lam: LM damping. Returns (dc (C,6), dp (P,3)).
    """
    C = Hcc.shape[0]
    P = Hpp.shape[0]

    # Marquardt damping: scale each diagonal entry by (1 + lam)
    Hcc_d = Hcc + (lam * jnp.maximum(jnp.einsum("cii->ci", Hcc), 1e-6))[..., None] * jnp.eye(6)
    Hpp_d = Hpp + (lam * jnp.maximum(jnp.einsum("pii->pi", Hpp), 1e-6))[..., None] * jnp.eye(3)

    # mask out frozen points: make their block identity, rhs zero
    Hpp_d = jnp.where(point_free[:, None, None], Hpp_d, jnp.eye(3))
    bp = jnp.where(point_free[:, None], bp, 0.0)
    Hcp = jnp.where(point_free[None, :, None, None], Hcp, 0.0)

    Hpp_inv = _inv3x3(Hpp_d)
    Wcp = jnp.einsum("cpij,pjk->cpik", Hcp, Hpp_inv)          # (C, P, 6, 3)
    S_off = jnp.einsum("cpij,dpkj->cdik", Wcp, Hcp)           # (C, C, 6, 6)
    S = -S_off
    S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc_d)
    b_red = bc - jnp.einsum("cpij,pj->ci", Wcp, bp)

    # freeze fixed cameras: identity rows/cols
    free = cam_free
    mask2 = free[:, None] & free[None, :]
    S = jnp.where(mask2[:, :, None, None], S, 0.0)
    S = S.at[jnp.arange(C), jnp.arange(C)].add(
        jnp.where(free, 0.0, 1.0)[:, None, None] * jnp.eye(6)
    )
    b_red = jnp.where(free[:, None], b_red, 0.0)

    S_dense = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
    S_dense = S_dense + 1e-8 * jnp.eye(C * 6)
    dc = jax.scipy.linalg.solve(S_dense, b_red.reshape(-1), assume_a="pos")
    dc = dc.reshape(C, 6)
    dc = jnp.where(free[:, None], dc, 0.0)

    # back-substitute points: dp = Hpp^-1 (bp - Hpc dc)
    rhs = bp - jnp.einsum("cpij,ci->pj", Hcp, dc)
    dp = jnp.einsum("pij,pj->pi", Hpp_inv, rhs)
    dp = jnp.where(point_free[:, None], dp, 0.0)
    return dc, dp


def _total_cost(cam_pose, points, K, prob: BAProblem, active_obs, robust):
    r, _, _, z = _project_residuals(cam_pose, points, K, prob.obs_cam, prob.obs_uv)
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
    cost = _robust_cost(chi2, robust)
    ok = active_obs & (z > 0)
    return jnp.sum(jnp.where(ok, cost, 0.0)), chi2, z


@partial(jax.jit, static_argnames=("iters1", "iters2"))
def solve_ba(
    prob: BAProblem,
    iters1: int = 5,
    iters2: int = 10,
    chi2_th: float = CHI2_MONO,
    lambda_init: float = 1e-4,
) -> BAResult:
    """Two-phase LM bundle adjustment (the LocalBundleAdjustment schedule:
    5 robust iters, chi2 outlier rejection, 10 non-robust iters —
    Optimizer.cc:617-680)."""
    C = prob.cam_pose.shape[0]
    base_obs = (
        prob.obs_valid
        & (prob.obs_cam >= 0)
        & prob.point_valid[:, None]
        & prob.cam_valid[jnp.maximum(prob.obs_cam, 0)]
    )
    cam_free = prob.cam_valid & ~prob.cam_fixed
    # points with at least one observation are free
    point_free = prob.point_valid & (base_obs.sum(axis=1) > 0)

    def lm_phase(cam_pose, points, active_obs, robust, n_iters, lam0):
        def step(_, state):
            cam_pose, points, lam = state
            r, _, _, z = _project_residuals(
                cam_pose, points, prob.K, prob.obs_cam, prob.obs_uv
            )
            chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2
            w = prob.obs_inv_sigma2 * _robust_weight(chi2, robust)
            w = jnp.where(active_obs, w, 0.0)
            Hcc, bc, Hpp, bp, Hcp = build_normal_equations(
                cam_pose, points, prob.K, prob.obs_cam, prob.obs_uv, w, C
            )
            dc, dp = schur_solve(Hcc, bc, Hpp, bp, Hcp, cam_free, point_free, lam)

            new_pose = jax.vmap(se3.retract)(cam_pose, dc)
            new_pts = points + dp

            c0, _, _ = _total_cost(cam_pose, points, prob.K, prob, active_obs, robust)
            c1, _, _ = _total_cost(new_pose, new_pts, prob.K, prob, active_obs, robust)
            # a NaN/Inf state must never be accepted (a NaN cost masks to 0
            # through the validity gates, which would look like a decrease)
            finite = (
                jnp.isfinite(c1)
                & jnp.all(jnp.isfinite(dc))
                & jnp.all(jnp.isfinite(dp))
            )
            accept = (c1 < c0) & finite
            cam_pose = jnp.where(accept, new_pose, cam_pose)
            points = jnp.where(accept, new_pts, points)
            # floor the damping: monocular BA has gauge/low-parallax null
            # directions; letting lam -> 0 sends points sliding to infinity
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 8.0), 1e-5, 1e3)
            return cam_pose, points, lam

        cam_pose, points, _ = jax.lax.fori_loop(
            0, n_iters, step, (cam_pose, points, lam0)
        )
        return cam_pose, points

    cam_pose, points = lm_phase(
        prob.cam_pose, prob.points, base_obs, jnp.asarray(True), iters1, lambda_init
    )

    # outlier classification (Optimizer.cc:640-655)
    _, chi2, z = _total_cost(cam_pose, points, prob.K, prob, base_obs, jnp.asarray(True))
    inlier = base_obs & (chi2 <= chi2_th) & (z > 0)

    cam_pose, points = lm_phase(
        cam_pose, points, inlier, jnp.asarray(False), iters2, lambda_init
    )

    cam_pose = jax.vmap(se3.orthonormalize)(cam_pose)
    final_cost, chi2, z = _total_cost(
        cam_pose, points, prob.K, prob, inlier, jnp.asarray(False)
    )
    obs_inlier = base_obs & (chi2 <= chi2_th) & (z > 0)
    return BAResult(
        cam_pose=cam_pose, points=points, obs_inlier=obs_inlier, final_cost=final_cost
    )
