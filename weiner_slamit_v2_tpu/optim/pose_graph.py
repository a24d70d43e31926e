"""Essential-graph optimization: Gauss-Newton over Sim3 keyframe poses.

TPU-native replacement for ``Optimizer::OptimizeEssentialGraph``
(jni/ORB_SLAM2/src/Optimizer.cc:781-1044): the reference builds a g2o graph
with Sim3 vertices (BlockSolver_7_3, lambda 1e-16, 20 iterations) over
spanning-tree + covisibility(>=100) + loop edges. Here:

* all edge residuals r_e = log(S_meas^-1 S_j S_i^-1) are evaluated in one
  vmapped batch, with Jacobians from jax.jacfwd in the tangent space
  (replacing g2o's numeric/analytic edge jacobians);
* the normal equations are assembled dense over 7K variables (K = keyframe
  capacity, <= a few hundred -> a small dense Cholesky on the MXU);
* fixed gauge: the loop keyframe (Optimizer.cc:840).

After convergence the Sim3 poses are mapped back to SE3 (t / s — the same
recovery as Optimizer.cc:1003-1012) and map points are corrected with the
relative transform of their reference keyframe (Optimizer.cc:1015-1041).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import sim3


@partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def optimize_pose_graph(
    S_init: jnp.ndarray,      # (K, 4, 4) initial Sim3 poses (world->kf)
    kf_valid: jnp.ndarray,    # (K,) bool
    fixed: jnp.ndarray,       # (K,) bool — gauge-fixed vertices
    edge_i: jnp.ndarray,      # (E,) int32 source vertex (or -1 for padding)
    edge_j: jnp.ndarray,      # (E,) int32 target vertex
    edge_S_ji: jnp.ndarray,   # (E, 4, 4) measured relative Sim3 S_j S_i^-1
    edge_valid: jnp.ndarray,  # (E,)
    n_iters: int = 20,
    lambda_init: float = 1e-6,
    fix_scale: bool = False,
) -> jnp.ndarray:
    """Returns optimized (K, 4, 4) Sim3 poses.

    fix_scale freezes the log-scale dof of every vertex (VertexSim3Expmap
    _fix_scale for stereo/RGB-D — src/Optimizer.cc:818, set from bFixScale
    at src/LoopClosing.cc:73): a metric map must never be rescaled by a
    loop closure."""
    K = S_init.shape[0]
    E = edge_i.shape[0]
    ei = jnp.maximum(edge_i, 0)
    ej = jnp.maximum(edge_j, 0)
    ev = edge_valid & (edge_i >= 0) & (edge_j >= 0)
    ev = ev & kf_valid[ei] & kf_valid[ej]
    S_meas_inv = jax.vmap(sim3.inv)(edge_S_ji)

    free = kf_valid & ~fixed

    def edge_residual(xi_i, xi_j, Si, Sj, Sm_inv):
        """r = log(S_meas^-1 · exp(xi_j) Sj · (exp(xi_i) Si)^-1) — 7-vector."""
        Sj_new = sim3.exp(xi_j) @ Sj
        Si_new = sim3.exp(xi_i) @ Si
        return sim3.log(Sm_inv @ Sj_new @ sim3.inv(Si_new))

    def all_residuals(S):
        zero = jnp.zeros(7)
        return jax.vmap(
            lambda i, j, sm: edge_residual(zero, zero, S[i], S[j], sm)
        )(ei, ej, S_meas_inv)

    def cost_of(S):
        r = all_residuals(S)
        return jnp.sum(jnp.where(ev[:, None], r * r, 0.0))

    def step(_, carry):
        S, lam = carry
        zero = jnp.zeros(7)
        # residuals + jacobians per edge (autodiff in tangent space)
        def per_edge(i, j, sm):
            Si, Sj = S[i], S[j]
            r = edge_residual(zero, zero, Si, Sj, sm)
            Ji = jax.jacfwd(lambda x: edge_residual(x, zero, Si, Sj, sm))(zero)
            Jj = jax.jacfwd(lambda x: edge_residual(zero, x, Si, Sj, sm))(zero)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(per_edge)(ei, ej, S_meas_inv)  # (E,7),(E,7,7),(E,7,7)
        w = ev.astype(jnp.float32)
        Ji = Ji * w[:, None, None]
        Jj = Jj * w[:, None, None]

        # assemble dense H (K,7,K,7) via scatter-adds of the four blocks
        Hii = jnp.einsum("eij,eik->ejk", Ji, Ji)
        Hjj = jnp.einsum("eij,eik->ejk", Jj, Jj)
        Hij = jnp.einsum("eij,eik->ejk", Ji, Jj)
        bi = -jnp.einsum("eij,ei->ej", Ji, r * w[:, None])
        bj = -jnp.einsum("eij,ei->ej", Jj, r * w[:, None])

        H = jnp.zeros((K, K, 7, 7))
        H = H.at[ei, ei].add(Hii)
        H = H.at[ej, ej].add(Hjj)
        H = H.at[ei, ej].add(Hij)
        H = H.at[ej, ei].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((K, 7)).at[ei].add(bi).at[ej].add(bj)

        # damping + freeze fixed/invalid vertices
        dd = jnp.einsum("kkij->kij", H)  # (K,7,7) diagonal blocks
        damp = lam * jnp.maximum(jnp.einsum("kii->ki", dd), 1e-6)
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            damp[:, :, None] * jnp.eye(7)
        )
        mask2 = free[:, None] & free[None, :]
        H = jnp.where(mask2[:, :, None, None], H, 0.0)
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            jnp.where(free, 0.0, 1.0)[:, None, None] * jnp.eye(7)
        )
        b = jnp.where(free[:, None], b, 0.0)
        if fix_scale:
            # freeze the sigma (log-scale) dof: zero its rows/cols, unit
            # diagonal -> dx[:, 6] == 0 exactly
            sel = jnp.arange(7) == 6
            H = jnp.where(sel[None, None, :, None] | sel[None, None, None, :], 0.0, H)
            H = H.at[jnp.arange(K), jnp.arange(K), 6, 6].set(1.0)
            b = jnp.where(sel[None, :], 0.0, b)

        Hd = H.transpose(0, 2, 1, 3).reshape(K * 7, K * 7) + 1e-8 * jnp.eye(K * 7)
        dx = jax.scipy.linalg.solve(Hd, b.reshape(-1), assume_a="pos").reshape(K, 7)
        dx = jnp.where(free[:, None], dx, 0.0)

        S_new = jax.vmap(lambda s, x: sim3.exp(x) @ s)(S, dx)
        c0 = cost_of(S)
        c1 = cost_of(S_new)
        ok = (c1 < c0) & jnp.all(jnp.isfinite(S_new))
        S = jnp.where(ok, S_new, S)
        lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 8.0), 1e-8, 1e3)
        return S, lam

    S, _ = jax.lax.fori_loop(0, n_iters, step, (S_init, lambda_init))
    return S


def correct_map_after_pose_graph(
    mp_pos: jnp.ndarray,       # (M, 3)
    mp_valid: jnp.ndarray,
    mp_ref_kf: jnp.ndarray,    # (M,) reference keyframe per point
    S_old: jnp.ndarray,        # (K, 4, 4) pre-optimization Sim3 (world->kf)
    S_new: jnp.ndarray,        # (K, 4, 4) optimized
) -> jnp.ndarray:
    """Transform map points with their reference keyframe's correction:
    X' = S_new_ref^-1 · S_old_ref · X (Optimizer.cc:1015-1041)."""
    ref = jnp.maximum(mp_ref_kf, 0)
    corr = jax.vmap(lambda a, b: sim3.inv(a) @ b)(S_new, S_old)  # (K,4,4)
    Xc = jax.vmap(lambda T, x: sim3.apply(T, x))(corr[ref], mp_pos)
    ok = mp_valid & (mp_ref_kf >= 0)
    return jnp.where(ok[:, None], Xc, mp_pos)
