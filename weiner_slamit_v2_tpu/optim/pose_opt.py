"""Motion-only pose optimization: Levenberg–Marquardt on SE(3).

TPU-native replacement for ``Optimizer::PoseOptimization``
(jni/ORB_SLAM2/src/Optimizer.cc:239-451): the reference builds a g2o graph
with one SE3 vertex and N monocular projection edges, runs 4 rounds x 10 LM
iterations with Huber (delta = sqrt(5.991)) and reclassifies inliers by chi2
between rounds, dropping the robust kernel for the final rounds.

Here the whole solve is one jit program: residuals/Jacobians for all N
observations are batched (N x 2 x 6 einsums -> a 6x6 normal system), the LM
loop is a ``lax.fori_loop`` with accept/reject damping, and the inter-round
chi2 reclassification is a masked update. No graph construction, no sparse
solver — the reduced system is always 6x6.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3

CHI2_MONO = 5.991
HUBER_MONO = 2.4476519  # sqrt(5.991), Optimizer.cc:287


def _residuals_jacobian(Tcw, X, uv, fx, fy, cx, cy):
    """Batched residual r = proj(Tcw X) - uv and Jacobian wrt left-mult
    tangent update [upsilon, omega]. Returns (r (N,2), J (N,2,6), z (N,))."""
    P = se3.apply(Tcw, X)  # (N, 3)
    x, y, z = P[:, 0], P[:, 1], P[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    iz = 1.0 / z_safe
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    r = jnp.stack([u, v], axis=1) - uv

    # d(proj)/dP
    zero = jnp.zeros_like(x)
    du = jnp.stack([fx * iz, zero, -fx * x * iz * iz], axis=1)
    dv = jnp.stack([zero, fy * iz, -fy * y * iz * iz], axis=1)
    dproj = jnp.stack([du, dv], axis=1)  # (N, 2, 3)

    # dP/dxi for P' = exp(xi) (R X + t): [ I | -hat(P) ]
    N = X.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3), (N, 3, 3))
    dP = jnp.concatenate([eye, -se3.hat(P)], axis=2)  # (N, 3, 6)

    J = jnp.einsum("nij,njk->nik", dproj, dP)  # (N, 2, 6)
    return r, J, z


def _weighted_normal_system(r, J, w):
    """H = sum w J^T J, b = -sum w J^T r over the batch. w: (N,)."""
    Jw = J * w[:, None, None]
    H = jnp.einsum("nij,nik->jk", Jw, J)
    b = -jnp.einsum("nij,ni->j", Jw, r)
    return H, b


def _robust_weight(chi2, delta2, robust):
    """IRLS weight for the Huber kernel on chi2 = ||r||^2_Sigma."""
    w = jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
    return jnp.where(robust, w, 1.0)


@partial(jax.jit, static_argnames=("n_rounds", "n_iters"))
def optimize_pose(
    Tcw0: jnp.ndarray,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    n_rounds: int = 4,
    n_iters: int = 10,
    chi2_th: float = CHI2_MONO,
    lambda_init: float = 1e-3,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Optimize a single camera pose against fixed 3D points.

    Args:
      Tcw0: (4,4) initial world->camera pose.
      X: (N,3) world points; uv: (N,2) observed rectified pixels.
      inv_sigma2: (N,) per-observation information (1/sigma^2 by octave).
      valid: (N,) observation mask.
      K: (3,3) intrinsics.

    Returns (Tcw (4,4), inliers (N,) bool, n_inliers ()).
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    delta2 = CHI2_MONO  # Huber delta^2

    def chi2_of(Tcw):
        r, _, z = _residuals_jacobian(Tcw, X, uv, fx, fy, cx, cy)
        c = jnp.sum(r * r, axis=1) * inv_sigma2
        return c, z

    inliers = valid

    def round_body(carry, robust):
        Tcw, inliers = carry

        def lm_step(_, state):
            Tcw, lam = state
            r, J, z = _residuals_jacobian(Tcw, X, uv, fx, fy, cx, cy)
            chi2 = jnp.sum(r * r, axis=1) * inv_sigma2
            w = inv_sigma2 * _robust_weight(chi2, delta2, robust)
            w = jnp.where(inliers & (z > 0), w, 0.0)
            H, b = _weighted_normal_system(r, J, w)
            # current robust cost
            rho = jnp.where(
                (chi2 <= delta2) | ~robust,
                chi2,
                2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2,
            )
            cost0 = jnp.sum(jnp.where(inliers & (z > 0), rho, 0.0))

            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
            dx = jnp.linalg.solve(Hd, b)
            T_new = se3.retract(Tcw, dx)

            c_new, z_new = chi2_of(T_new)
            rho_new = jnp.where(
                (c_new <= delta2) | ~robust,
                c_new,
                2.0 * jnp.sqrt(delta2 * jnp.maximum(c_new, 1e-12)) - delta2,
            )
            cost1 = jnp.sum(jnp.where(inliers & (z_new > 0), rho_new, 0.0))

            finite = jnp.isfinite(cost1) & jnp.all(jnp.isfinite(dx))
            accept = (cost1 < cost0) & finite
            Tcw = jnp.where(accept, T_new, Tcw)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-6, 1e3)
            return Tcw, lam

        Tcw, _ = jax.lax.fori_loop(0, n_iters, lm_step, (Tcw, lambda_init))
        # chi2 reclassification (both directions, like the reference's
        # setLevel dance at Optimizer.cc:390-420)
        chi2, z = chi2_of(Tcw)
        inliers = valid & (chi2 <= chi2_th) & (z > 0)
        return (Tcw, inliers), None

    Tcw, cur_inliers = Tcw0, inliers
    # robust kernel on for rounds 0,1; off for 2,3 (Optimizer.cc:432:
    # e->setRobustKernel(0) at it==2)
    for rnd in range(n_rounds):
        robust = jnp.asarray(rnd < 2)
        (Tcw, cur_inliers), _ = round_body((Tcw, cur_inliers), robust)

    return se3.orthonormalize(Tcw), cur_inliers, cur_inliers.sum()
