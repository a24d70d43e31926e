"""Pallas kernel correctness vs the XLA reference implementations
(interpret mode — runs on CPU)."""

import jax.numpy as jnp
import numpy as np

from weiner_slamit_v2_tpu.ops import fast
from weiner_slamit_v2_tpu.ops.fast_pallas import fast_score_nms_pallas


class TestFastPallas:
    def _reference(self, img):
        return np.asarray(fast.nms_3x3(fast.fast_score(jnp.asarray(img), 0.0)))

    def test_matches_xla_on_texture(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (192, 256)).astype(np.float32)
        ref = self._reference(img)
        out = np.asarray(fast_score_nms_pallas(jnp.asarray(img), interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_matches_on_checkerboard(self):
        yy, xx = np.mgrid[0:128, 0:256]
        img = (((yy // 12) + (xx // 12)) % 2).astype(np.float32) * 200.0
        ref = self._reference(img)
        out = np.asarray(fast_score_nms_pallas(jnp.asarray(img), interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-4)
        assert (out > 0).sum() > 20  # corners found

    def test_nonmultiple_height(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 255, (150, 256)).astype(np.float32)  # 150 % 64 != 0
        ref = self._reference(img)
        out = np.asarray(fast_score_nms_pallas(jnp.asarray(img), interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-4)
