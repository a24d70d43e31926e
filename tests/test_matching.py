import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weiner_slamit_v2_tpu.frontend import matcher
from weiner_slamit_v2_tpu.frontend.initializer import initialize_two_view
from weiner_slamit_v2_tpu.geometry import se3
from weiner_slamit_v2_tpu.geometry.camera import Camera
from weiner_slamit_v2_tpu.optim.pose_opt import optimize_pose


def random_desc(rng, n):
    return jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))


class TestRotationConsistency:
    def test_keeps_consistent(self):
        n = 100
        angle1 = jnp.zeros(n)
        angle2 = jnp.full(n, 0.3)  # uniform offset -> single bin
        valid = jnp.ones(n, bool)
        keep = matcher.rotation_consistency_mask(angle1, angle2, valid)
        assert bool(keep.all())

    def test_rejects_outlier_rotation(self):
        n = 100
        angle1 = jnp.zeros(n)
        angle2 = jnp.concatenate([jnp.full(97, 0.3), jnp.full(3, 2.5)])
        valid = jnp.ones(n, bool)
        keep = matcher.rotation_consistency_mask(angle1, angle2, valid)
        assert bool(keep[:97].all())
        assert not bool(keep[97:].any())


class TestWindowMatcher:
    def test_matches_within_window_only(self):
        rng = np.random.default_rng(0)
        desc = random_desc(rng, 4)
        xy1 = jnp.asarray([[10.0, 10.0], [50.0, 50.0], [90.0, 90.0], [10.0, 90.0]])
        # same descriptors but positions of item 1 moved far away
        xy2 = xy1.at[1].set(jnp.asarray([200.0, 200.0]))
        valid = jnp.ones(4, bool)
        idx, dist = matcher.match_with_window(
            desc, desc, valid, valid, pred_xy=xy1, xy2=xy2, window=15.0,
            nn_ratio=1.0,
        )
        np.testing.assert_array_equal(np.asarray(idx), [0, -1, 2, 3])

    def test_column_dedup(self):
        rng = np.random.default_rng(1)
        d2 = random_desc(rng, 2)
        # two rows both identical to column 0; row 1 is closer (exact)
        d1 = jnp.stack([d2[0] ^ jnp.asarray([1, 0, 0, 0, 0, 0, 0, 0], jnp.uint32), d2[0]])
        xy = jnp.zeros((2, 2))
        valid = jnp.ones(2, bool)
        idx, dist = matcher.match_with_window(
            d1, d2, valid, valid, pred_xy=xy, xy2=jnp.zeros((2, 2)), window=50.0,
            nn_ratio=1.0, max_dist=100,
        )
        assert int(idx[1]) == 0
        assert int(idx[0]) == -1  # lost the column to the closer row


class TestInitializer:
    def _make_case(self, planar: bool, seed=0, n=300, noise=0.0):
        rng = np.random.default_rng(seed)
        cam = Camera.create(500.0, 500.0, 320.0, 240.0)
        K = np.asarray(cam.K)
        if planar:
            X = np.stack(
                [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), np.full(n, 4.0)],
                axis=1,
            )
        else:
            X = np.stack(
                [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 7, n)],
                axis=1,
            )
        T2 = se3.exp(jnp.asarray([0.4, 0.05, 0.02, 0.01, -0.05, 0.005]))
        uv1 = cam.project(jnp.asarray(X, jnp.float32))
        uv2 = cam.project(se3.apply(T2, jnp.asarray(X, jnp.float32)))
        if noise:
            uv1 = uv1 + rng.normal(0, noise, uv1.shape).astype(np.float32)
            uv2 = uv2 + rng.normal(0, noise, uv2.shape).astype(np.float32)
        valid = jnp.asarray(cam.in_image(uv1) & cam.in_image(uv2))
        return uv1, uv2, valid, jnp.asarray(K, jnp.float32), np.asarray(T2), X

    def _check_pose(self, res, T2_true):
        R_est = np.asarray(res.Tcw2)[:3, :3]
        t_est = np.asarray(res.Tcw2)[:3, 3]
        R_true = T2_true[:3, :3]
        t_true = T2_true[:3, 3]
        # rotation error
        dR = R_est.T @ R_true
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.01, f"rotation error {np.degrees(ang)} deg"
        # translation direction (scale is unobservable)
        cos = abs(
            float(
                t_est @ t_true / (np.linalg.norm(t_est) * np.linalg.norm(t_true))
            )
        )
        assert cos > 0.995, f"translation direction cos {cos}"

    def test_planar_scene_homography(self):
        uv1, uv2, valid, K, T2, X = self._make_case(planar=True)
        res = initialize_two_view(uv1, uv2, valid, K, jax.random.PRNGKey(0))
        assert bool(res.success)
        assert bool(res.used_homography)
        self._check_pose(res, T2)

    def test_general_scene_fundamental(self):
        uv1, uv2, valid, K, T2, X = self._make_case(planar=False)
        res = initialize_two_view(uv1, uv2, valid, K, jax.random.PRNGKey(1))
        assert bool(res.success)
        assert not bool(res.used_homography)
        self._check_pose(res, T2)
        # triangulated points match ground truth up to the scale factor
        pts = np.asarray(res.points)
        mask = np.asarray(res.is_point)
        scale = np.median(pts[mask, 2] / X[mask, 2])
        np.testing.assert_allclose(pts[mask] / scale, X[mask], atol=0.05)

    def test_noisy_case(self):
        uv1, uv2, valid, K, T2, X = self._make_case(planar=False, noise=0.5, seed=2)
        res = initialize_two_view(uv1, uv2, valid, K, jax.random.PRNGKey(2))
        assert bool(res.success)
        self._check_pose(res, T2)

    def test_rejects_pure_rotation(self):
        # no translation -> no parallax -> must not initialize
        rng = np.random.default_rng(3)
        cam = Camera.create(500.0, 500.0, 320.0, 240.0)
        n = 300
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 7, n)],
            axis=1,
        ).astype(np.float32)
        T2 = se3.exp(jnp.asarray([0.0, 0.0, 0.0, 0.02, -0.03, 0.01]))
        uv1 = cam.project(jnp.asarray(X))
        uv2 = cam.project(se3.apply(T2, jnp.asarray(X)))
        valid = jnp.asarray(cam.in_image(uv1) & cam.in_image(uv2))
        res = initialize_two_view(
            uv1, uv2, valid, jnp.asarray(np.asarray(cam.K)), jax.random.PRNGKey(3)
        )
        assert not bool(res.success)


class TestPoseOptimization:
    def _make_case(self, seed=0, n=200, outlier_frac=0.0, noise=0.5):
        rng = np.random.default_rng(seed)
        cam = Camera.create(500.0, 500.0, 320.0, 240.0)
        K = jnp.asarray(np.asarray(cam.K), jnp.float32)
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 8, n)],
            axis=1,
        ).astype(np.float32)
        T_true = se3.exp(jnp.asarray([0.1, -0.05, 0.2, 0.03, 0.05, -0.02]))
        uv = np.array(cam.project(se3.apply(T_true, jnp.asarray(X))))
        uv += rng.normal(0, noise, uv.shape).astype(np.float32)
        n_out = int(outlier_frac * n)
        if n_out:
            uv[:n_out] += rng.uniform(20, 80, (n_out, 2)) * np.sign(
                rng.normal(size=(n_out, 2))
            )
        return K, jnp.asarray(X), jnp.asarray(uv, jnp.float32), T_true, n_out

    def test_converges_from_perturbed_start(self):
        K, X, uv, T_true, _ = self._make_case()
        T0 = se3.retract(T_true, jnp.asarray([0.1, 0.1, -0.1, 0.03, -0.03, 0.02]))
        n = X.shape[0]
        Tcw, inl, n_inl = optimize_pose(
            T0, X, uv, jnp.ones(n), jnp.ones(n, bool), K
        )
        err = np.asarray(se3.log(se3.inv(T_true) @ Tcw))
        assert np.abs(err).max() < 5e-3, err
        assert int(n_inl) > 0.95 * n

    def test_rejects_outliers(self):
        K, X, uv, T_true, n_out = self._make_case(outlier_frac=0.25, seed=1)
        T0 = se3.retract(T_true, jnp.asarray([0.05, -0.05, 0.05, 0.02, 0.01, -0.01]))
        n = X.shape[0]
        Tcw, inl, n_inl = optimize_pose(
            T0, X, uv, jnp.ones(n), jnp.ones(n, bool), K
        )
        err = np.asarray(se3.log(se3.inv(T_true) @ Tcw))
        assert np.abs(err).max() < 1e-2, err
        inl = np.asarray(inl)
        assert not inl[:n_out].any()   # outliers flagged
        assert inl[n_out:].sum() > 0.9 * (n - n_out)

    def test_respects_valid_mask(self):
        K, X, uv, T_true, _ = self._make_case(seed=2)
        n = X.shape[0]
        valid = jnp.arange(n) < n // 2
        # corrupt the masked-out half badly; solution must not care
        uv = uv.at[n // 2 :].add(500.0)
        Tcw, inl, n_inl = optimize_pose(T_true, X, uv, jnp.ones(n), valid, K)
        err = np.asarray(se3.log(se3.inv(T_true) @ Tcw))
        assert np.abs(err).max() < 1e-2
        assert int(n_inl) <= n // 2
