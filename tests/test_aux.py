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
        env["PYTHONPATH"] = REPO
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
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
