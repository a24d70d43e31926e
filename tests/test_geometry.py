import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weiner_slamit_v2_tpu.geometry import se3, sim3, triangulate, epipolar
from weiner_slamit_v2_tpu.geometry.camera import Camera, pixel4_camera


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        xi = jnp.asarray(rng.normal(scale=0.5, size=(64, 6)), dtype=jnp.float32)
        T = se3.exp(xi)
        xi2 = se3.log(T)
        np.testing.assert_allclose(xi, xi2, atol=2e-5)

    def test_exp_zero_is_identity(self):
        T = se3.exp(jnp.zeros(6))
        np.testing.assert_allclose(T, np.eye(4), atol=1e-6)

    def test_inv(self):
        xi = jnp.asarray([0.1, -0.2, 0.3, 0.2, -0.1, 0.15])
        T = se3.exp(xi)
        np.testing.assert_allclose(T @ se3.inv(T), np.eye(4), atol=1e-6)

    def test_rotation_orthonormal(self):
        xi = jnp.asarray([1.0, 2.0, 3.0, 0.5, -1.2, 0.7])
        R = se3.exp(xi)[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-5

    def test_apply_matches_matmul(self):
        xi = jnp.asarray([0.3, 0.1, -0.2, 0.05, 0.2, -0.1])
        T = se3.exp(xi)
        X = jnp.asarray([[1.0, 2.0, 3.0], [0.0, -1.0, 4.0]])
        Xh = jnp.concatenate([X, jnp.ones((2, 1))], axis=1)
        np.testing.assert_allclose(se3.apply(T, X), (Xh @ T.T)[:, :3], atol=1e-6)

    def test_quat_roundtrip(self):
        rng = np.random.default_rng(1)
        omega = jnp.asarray(rng.normal(scale=1.2, size=(32, 3)), dtype=jnp.float32)
        R = se3.so3_exp(omega)
        q = se3.quat_from_rot(R)
        R2 = se3.rot_from_quat(q)
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_jit_and_vmap(self):
        f = jax.jit(jax.vmap(se3.exp))
        xi = jnp.zeros((4, 6))
        out = f(xi)
        assert out.shape == (4, 4, 4)


class TestSim3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(2)
        xi = np.concatenate(
            [rng.normal(scale=0.5, size=(64, 6)), rng.normal(scale=0.3, size=(64, 1))],
            axis=1,
        )
        xi = jnp.asarray(xi, dtype=jnp.float32)
        S = sim3.exp(xi)
        xi2 = sim3.log(S)
        np.testing.assert_allclose(xi, xi2, atol=5e-4)

    def test_scale_recovery(self):
        S = sim3.from_rts(jnp.eye(3), jnp.zeros(3), 2.5)
        assert abs(float(sim3.scale_of(S)) - 2.5) < 1e-6

    def test_inv_compose(self):
        xi = jnp.asarray([0.1, 0.2, -0.3, 0.3, -0.2, 0.1, 0.4])
        S = sim3.exp(xi)
        np.testing.assert_allclose(S @ sim3.inv(S), np.eye(4), atol=1e-5)

    def test_apply_scales(self):
        S = sim3.from_rts(jnp.eye(3), jnp.zeros(3), 3.0)
        X = jnp.asarray([1.0, 1.0, 1.0])
        np.testing.assert_allclose(sim3.apply(S, X), [3.0, 3.0, 3.0], atol=1e-6)

    def test_to_se3(self):
        xi = jnp.asarray([0.1, 0.2, -0.3, 0.3, -0.2, 0.1, 0.5])
        S = sim3.exp(xi)
        T = sim3.to_se3(S)
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        # translation divided by scale
        np.testing.assert_allclose(
            T[:3, 3] * sim3.scale_of(S), sim3.trans_of(S), atol=1e-5
        )


class TestCamera:
    def test_project_unproject(self):
        cam = Camera.create(500.0, 500.0, 320.0, 240.0)
        X = jnp.asarray([[0.5, -0.3, 2.0], [0.0, 0.0, 1.0]])
        uv = cam.project(X)
        X2 = cam.unproject(uv, X[:, 2])
        np.testing.assert_allclose(X, X2, atol=1e-5)

    def test_undistort_inverts_distort(self):
        cam = pixel4_camera()
        # points in the central region where the distortion model is stable
        rng = np.random.default_rng(3)
        X = np.stack(
            [
                rng.uniform(-0.3, 0.3, 128),
                rng.uniform(-0.25, 0.25, 128),
                np.ones(128),
            ],
            axis=1,
        ).astype(np.float32)
        uv_dist = cam.project(jnp.asarray(X), distort=True)
        uv_rect = cam.undistort_points(uv_dist)
        uv_true = cam.project(jnp.asarray(X), distort=False)
        np.testing.assert_allclose(uv_rect, uv_true, atol=0.05)

    def test_in_image(self):
        cam = Camera.create(500.0, 500.0, 320.0, 240.0, width=640, height=480)
        uv = jnp.asarray([[0.0, 0.0], [640.5, 100.0], [-1.0, 5.0], [320.0, 240.0]])
        np.testing.assert_array_equal(
            cam.in_image(uv), [True, False, False, True]
        )


class TestTriangulation:
    def test_dlt_exact(self):
        K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        T1 = se3.identity()
        T2 = se3.exp(jnp.asarray([0.3, 0.0, 0.0, 0.0, 0.05, 0.0]))
        rng = np.random.default_rng(4)
        X = jnp.asarray(
            np.stack(
                [rng.uniform(-1, 1, 50), rng.uniform(-1, 1, 50), rng.uniform(3, 6, 50)],
                axis=1,
            ),
            dtype=jnp.float32,
        )
        cam = Camera.create(500.0, 500.0, 320.0, 240.0)
        uv1 = cam.project(se3.apply(T1, X))
        uv2 = cam.project(se3.apply(T2, X))
        P1 = triangulate._projection_matrix(K, T1)
        P2 = triangulate._projection_matrix(K, T2)
        Xr = triangulate.triangulate_dlt(uv1, uv2, P1, P2)
        np.testing.assert_allclose(Xr, X, atol=1e-2)

    def test_depth_and_parallax(self):
        T = se3.identity()
        X = jnp.asarray([[0.0, 0.0, 5.0]])
        assert float(triangulate.depth_in_view(T, X)[0]) == pytest.approx(5.0)
        C1 = jnp.zeros(3)
        C2 = jnp.asarray([1.0, 0.0, 0.0])
        cosp = triangulate.parallax_cos(C1, C2, X[0])
        assert 0.97 < float(cosp) < 1.0


class TestEpipolar:
    def test_epipolar_constraint(self):
        K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        T1 = se3.identity()
        T2 = se3.exp(jnp.asarray([0.2, 0.05, 0.0, 0.0, 0.03, 0.01]))
        rng = np.random.default_rng(5)
        X = jnp.asarray(
            np.stack(
                [rng.uniform(-1, 1, 20), rng.uniform(-1, 1, 20), rng.uniform(3, 6, 20)],
                axis=1,
            ),
            dtype=jnp.float32,
        )
        cam = Camera.create(500.0, 500.0, 320.0, 240.0)
        uv1 = cam.project(se3.apply(T1, X))
        uv2 = cam.project(se3.apply(T2, X))
        F12 = epipolar.fundamental_from_poses(T1, T2, K, K)
        d2 = epipolar.epipolar_dist_sq(uv1, uv2, F12)
        np.testing.assert_array_less(np.asarray(d2), 1e-4)


class TestTrajectoryIO:
    def test_tum_roundtrip(self, tmp_path):
        from weiner_slamit_v2_tpu.io import trajectory

        rng = np.random.default_rng(6)
        n = 10
        xi = jnp.asarray(rng.normal(scale=0.3, size=(n, 6)), dtype=jnp.float32)
        Twc = np.asarray(se3.exp(xi))
        ts = np.arange(n) * 0.1
        p = tmp_path / "traj.txt"
        trajectory.save_tum(p, ts, Twc)
        ts2, Twc2 = trajectory.load_tum(p)
        np.testing.assert_allclose(ts, ts2, atol=1e-6)
        np.testing.assert_allclose(Twc, Twc2, atol=1e-4)

    def test_kitti_format(self, tmp_path):
        from weiner_slamit_v2_tpu.io import trajectory

        Twc = np.tile(np.eye(4), (3, 1, 1))
        p = tmp_path / "kitti.txt"
        trajectory.save_kitti(p, Twc)
        rows = np.loadtxt(p)
        assert rows.shape == (3, 12)
        np.testing.assert_allclose(rows[0], np.eye(4)[:3].reshape(-1))


class TestEvaluation:
    def test_ate_zero_for_identical(self):
        from weiner_slamit_v2_tpu.io.evaluation import ate_rmse

        rng = np.random.default_rng(7)
        xi = jnp.asarray(rng.normal(scale=0.3, size=(20, 6)), dtype=jnp.float32)
        Twc = np.asarray(se3.exp(xi))
        assert ate_rmse(Twc, Twc) < 1e-9

    def test_ate_invariant_to_sim3(self):
        from weiner_slamit_v2_tpu.io.evaluation import ate_rmse

        rng = np.random.default_rng(8)
        xi = jnp.asarray(rng.normal(scale=0.3, size=(20, 6)), dtype=jnp.float32)
        Twc = np.asarray(se3.exp(xi)).astype(np.float64)
        S = np.eye(4)
        S[:3, :3] = 2.0 * np.asarray(se3.so3_exp(jnp.asarray([0.1, 0.2, 0.3])))
        S[:3, 3] = [1.0, -2.0, 0.5]
        Twc2 = np.einsum("ij,njk->nik", S, Twc)
        assert ate_rmse(Twc2, Twc, align_scale=True) < 1e-6

    def test_rpe(self):
        from weiner_slamit_v2_tpu.io.evaluation import rpe_rmse

        Twc = np.tile(np.eye(4), (5, 1, 1))
        for i in range(5):
            Twc[i, 0, 3] = i * 0.1
        t_err, r_err = rpe_rmse(Twc, Twc)
        assert t_err < 1e-12 and r_err < 1e-6


class TestSyntheticData:
    def test_sequence_renders(self):
        from weiner_slamit_v2_tpu.io.datasets import make_synthetic_sequence

        seq = make_synthetic_sequence(n_frames=3, h=120, w=160, seed=0)
        assert len(seq) == 3
        assert seq.frames[0].image.shape == (120, 160)
        assert seq.gt_Twc.shape == (3, 4, 4)
        # images have contrast (not blank)
        assert seq.frames[0].image.std() > 10.0

    def test_deterministic(self):
        from weiner_slamit_v2_tpu.io.datasets import make_synthetic_sequence

        a = make_synthetic_sequence(n_frames=2, h=60, w=80, seed=3)
        b = make_synthetic_sequence(n_frames=2, h=60, w=80, seed=3)
        np.testing.assert_array_equal(a.frames[1].image, b.frames[1].image)

    def test_config_yaml_roundtrip(self, tmp_path):
        from weiner_slamit_v2_tpu.config import SlamConfig, load_config, save_config

        cfg = SlamConfig()
        p = tmp_path / "cfg.yaml"
        save_config(cfg, str(p))
        cfg2 = load_config(str(p))
        assert cfg == cfg2
