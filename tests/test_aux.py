"""Auxiliary subsystem tests: posenet head, viz, CLI."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestPoseNet:
    def test_forward_shapes(self):
        from weiner_slamit_v2_tpu.models import posenet

        params = posenet.init_params(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 257, 257, 3))
        hm, off, df, db = posenet.PoseNet().apply(params, x)
        assert hm.shape == (1, 9, 9, 17)   # Posenet.cc:211-240 output dims
        assert off.shape == (1, 9, 9, 34)
        assert df.shape == (1, 9, 9, 32)
        assert db.shape == (1, 9, 9, 32)

    def test_single_pose_decode(self):
        from weiner_slamit_v2_tpu.models import posenet

        params = posenet.init_params(jax.random.PRNGKey(1))
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 255, (257, 257, 3)).astype(np.float32))
        pos, scores = posenet.estimate_single_pose(params, img)
        assert pos.shape == (17, 2)
        assert scores.shape == (17,)
        assert bool((scores >= 0).all() and (scores <= 1).all())
        assert bool((pos >= -20).all() and (pos <= 277).all())

    def test_frame_helper(self):
        from weiner_slamit_v2_tpu.models import posenet

        params = posenet.init_params(jax.random.PRNGKey(2))
        img = jnp.zeros((240, 320))
        pos, scores, keep = posenet.person_keypoints_for_frame(params, img)
        assert pos.shape == (17, 2)
        assert keep.dtype == bool


class TestViz:
    def test_plots_write_files(self, tmp_path):
        from weiner_slamit_v2_tpu.viz.plotting import plot_trajectory

        n = 10
        Twc = np.tile(np.eye(4), (n, 1, 1))
        Twc[:, 0, 3] = np.linspace(0, 1, n)
        p = tmp_path / "traj.png"
        plot_trajectory(str(p), Twc, Twc)
        assert p.exists() and p.stat().st_size > 1000


class TestCLI:
    def test_synthetic_run(self, tmp_path):
        """End-to-end CLI: synthetic replay + export + eval + checkpoint."""
        out = tmp_path / "traj.txt"
        ckpt = tmp_path / "map.npz"
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + " --xla_cpu_max_isa=AVX2"
        ).strip()  # see tests/conftest.py
        env["PYTHONPATH"] = REPO
        r = subprocess.run(
            [
                sys.executable, "-m", "weiner_slamit_v2_tpu.cli",
                "--dataset", "synthetic", "--frames", "10", "--seed", "11",
                "--out", str(out), "--checkpoint", str(ckpt), "--eval",
                "--no-loop-closing",
            ],
            capture_output=True, text=True, timeout=560, env=env, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        summary = json.loads(r.stdout.strip().splitlines()[-1])
        assert summary["frames"] == 10
        assert summary["tracked_ok"] > 5
        assert "ate_rmse" in summary
        assert out.exists() and ckpt.exists()


class TestPoseNetParams:
    """Param checkpoint round-trip + CLI wiring (the posenet_model.tflite
    load flow, src/Posenet.cc:30-42): externally supplied params must load,
    validate, and change the decoded keypoints deterministically."""

    def test_roundtrip_and_decoding_changes(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from weiner_slamit_v2_tpu.models import posenet

        p1 = posenet.init_params(jax.random.PRNGKey(3))
        p2 = posenet.init_params(jax.random.PRNGKey(4))
        f = tmp_path / "posenet.npz"
        posenet.save_params(str(f), p1)
        loaded = posenet.load_params(str(f))

        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 255, (257, 257, 3)), jnp.float32)
        pos_a, sc_a = posenet.estimate_single_pose(loaded, img)
        pos_ref, _ = posenet.estimate_single_pose(p1, img)
        pos_b, _ = posenet.estimate_single_pose(p2, img)
        # loaded params reproduce the saved model exactly...
        np.testing.assert_allclose(
            np.asarray(pos_a), np.asarray(pos_ref), atol=1e-4
        )
        # ...and different params decode different keypoints
        assert float(jnp.abs(pos_a - pos_b).max()) > 1.0

    def test_load_rejects_wrong_shapes(self, tmp_path):
        import numpy as np
        import pytest

        from weiner_slamit_v2_tpu.models import posenet

        f = tmp_path / "bad.npz"
        np.savez(str(f), **{"params/Conv_0/kernel": np.zeros((3, 3, 3, 8))})
        with pytest.raises(ValueError):
            posenet.load_params(str(f))

    def test_cli_flag_enables_head(self, tmp_path):
        import jax

        from weiner_slamit_v2_tpu import cli
        from weiner_slamit_v2_tpu.models import posenet

        params = posenet.init_params(jax.random.PRNGKey(5))
        f = tmp_path / "pn.npz"
        posenet.save_params(str(f), params)
        out = tmp_path / "traj.txt"
        cli.main([
            "--dataset", "synthetic", "--frames", "6",
            "--posenet-params", str(f), "--out", str(out),
            "--no-loop-closing",
        ])
        assert out.exists()
