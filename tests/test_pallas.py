"""Pallas kernel correctness vs the XLA reference implementations
(interpret mode — runs on CPU)."""

import jax.numpy as jnp
import numpy as np

from weiner_slamit_v2_tpu.ops import fast
from weiner_slamit_v2_tpu.ops.fast_pallas import fast_score_nms_pallas


def blob_image(h=160, w=256, seed=3):
    """Corner-rich image: bright axis-aligned squares on a dark background
    (every square corner is a FAST-9 corner, unlike a checkerboard whose
    saddle corners have no 9-contiguous arc)."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 20.0, np.float32)
    for _ in range(40):
        y = rng.integers(8, h - 24)
        x = rng.integers(8, w - 24)
        s = rng.integers(6, 16)
        img[y : y + s, x : x + s] = 220.0
    return img


class TestFastPallas:
    def _reference(self, img):
        return np.asarray(fast.nms_3x3(fast.fast_score(jnp.asarray(img), 0.0)))

    def test_matches_xla_on_texture(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (192, 256)).astype(np.float32)
        ref = self._reference(img)
        out = np.asarray(fast_score_nms_pallas(jnp.asarray(img), interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-4)
        assert (out > 0).sum() > 20  # random texture is corner-dense

    def test_matches_on_blobs(self):
        img = blob_image()
        ref = self._reference(img)
        out = np.asarray(fast_score_nms_pallas(jnp.asarray(img), interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-4)
        assert (out > 0).sum() > 20  # square corners are FAST-9 corners

    def test_checkerboard_agrees_with_xla(self):
        # A perfect checkerboard has NO FAST-9 corners (a saddle point's
        # ring alternates bright/dark every quarter turn: max contiguous
        # arc is 8 < 9) — the kernels must agree on that too.
        yy, xx = np.mgrid[0:128, 0:256]
        img = (((yy // 12) + (xx // 12)) % 2).astype(np.float32) * 200.0
        ref = self._reference(img)
        out = np.asarray(fast_score_nms_pallas(jnp.asarray(img), interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_nonmultiple_height(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 255, (150, 256)).astype(np.float32)  # 150 % 64 != 0
        ref = self._reference(img)
        out = np.asarray(fast_score_nms_pallas(jnp.asarray(img), interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-4)


class TestExtractorPallasPath:
    def test_extractor_pallas_path_matches_xla_path(self):
        """The production wiring: an extractor forced onto the Pallas path
        (interpret mode on CPU) must produce identical features to the XLA
        path."""
        from weiner_slamit_v2_tpu.config import OrbConfig
        from weiner_slamit_v2_tpu.frontend.extractor import OrbExtractor
        from weiner_slamit_v2_tpu.ops import fast_pallas

        img = jnp.asarray(blob_image(192, 256, seed=7))
        cfg = OrbConfig(n_features=128, n_levels=2)
        ex_xla = OrbExtractor(cfg, (192, 256), use_pallas=False)
        f_xla = ex_xla._extract_impl(img)  # eager, like the pallas run below

        # route the pallas path through interpret mode for the CPU test
        orig = fast_pallas.fast_score_nms_pallas
        import weiner_slamit_v2_tpu.frontend.extractor as ext_mod

        ext_mod.fast_score_nms_pallas = lambda im: orig(im, interpret=True)
        try:
            ex_p = OrbExtractor(cfg, (192, 256), use_pallas=True)
            f_p = ex_p._extract_impl(img)  # un-jitted: picks up the patch
        finally:
            ext_mod.fast_score_nms_pallas = orig

        np.testing.assert_allclose(np.asarray(f_p.xy), np.asarray(f_xla.xy))
        np.testing.assert_array_equal(
            np.asarray(f_p.desc), np.asarray(f_xla.desc)
        )
        np.testing.assert_array_equal(
            np.asarray(f_p.valid), np.asarray(f_xla.valid)
        )
        assert int(f_xla.valid.sum()) > 32


class TestWindowedMatcherPallas:
    """ops/match_pallas.py::windowed_best2_pallas must be bit-identical to
    the XLA reference (masked_distance_matrix + best_and_second) for every
    gate combination, including under vmap (the fuse-targets pattern)."""

    def _inputs(self, seed=0, N1=200, N2=300):
        rng = np.random.default_rng(seed)
        d1 = jnp.asarray(rng.integers(0, 2**32, (N1, 8), dtype=np.uint32))
        d2 = jnp.asarray(rng.integers(0, 2**32, (N2, 8), dtype=np.uint32))
        v1 = jnp.asarray(rng.random(N1) > 0.1)
        v2 = jnp.asarray(rng.random(N2) > 0.1)
        px = jnp.asarray(rng.uniform(0, 320, (N1, 2)), jnp.float32)
        x2 = jnp.asarray(rng.uniform(0, 320, (N2, 2)), jnp.float32)
        win = jnp.asarray(rng.uniform(20, 120, (N1,)), jnp.float32)
        lo = jnp.asarray(rng.integers(0, 3, N1), jnp.int32)
        o2 = jnp.asarray(rng.integers(0, 6, N2), jnp.int32)
        w2 = jnp.asarray(rng.uniform(0.3, 1.0, (N2,)), jnp.float32)
        return d1, d2, v1, v2, px, x2, win, lo, lo + 2, o2, w2

    def _reference(self, d1, d2, v1, v2, px, x2, win, lo, hi, o2,
                   w2=None, th=0.0):
        from weiner_slamit_v2_tpu.ops import hamming

        du = jnp.abs(x2[None, :, 0] - px[:, None, 0])
        dv = jnp.abs(x2[None, :, 1] - px[:, None, 1])
        pair = (du < win[:, None]) & (dv < win[:, None])
        pair = pair & (o2[None, :] >= lo[:, None]) & (o2[None, :] <= hi[:, None])
        if w2 is not None and th > 0:
            c2 = ((x2[None, :, 0] - px[:, None, 0]) ** 2
                  + (x2[None, :, 1] - px[:, None, 1]) ** 2) * w2[None, :]
            pair = pair & (c2 <= th)
        dist = hamming.masked_distance_matrix(d1, d2, v1, v2, pair)
        return hamming.best_and_second(dist)

    def test_matches_xla_reference(self):
        from weiner_slamit_v2_tpu.ops.match_pallas import windowed_best2_pallas

        d1, d2, v1, v2, px, x2, win, lo, hi, o2, w2 = self._inputs()
        ri, rb, rs = self._reference(d1, d2, v1, v2, px, x2, win, lo, hi, o2)
        bi, bd, sd = windowed_best2_pallas(
            d1, d2, v1, v2, px, x2, win, lo, hi, o2, interpret=True
        )
        ok = np.asarray(rb) < 10_000
        np.testing.assert_array_equal(np.asarray(bd), np.asarray(rb))
        np.testing.assert_array_equal(np.asarray(bi)[ok], np.asarray(ri)[ok])
        np.testing.assert_array_equal(np.asarray(sd), np.asarray(rs))

    def test_chi2_gate(self):
        from weiner_slamit_v2_tpu.ops.match_pallas import windowed_best2_pallas

        d1, d2, v1, v2, px, x2, win, lo, hi, o2, w2 = self._inputs(seed=5)
        th = 50.0
        ri, rb, rs = self._reference(
            d1, d2, v1, v2, px, x2, win, lo, hi, o2, w2, th
        )
        bi, bd, sd = windowed_best2_pallas(
            d1, d2, v1, v2, px, x2, win, lo, hi, o2,
            chi2_w=w2, chi2_th=th, interpret=True,
        )
        ok = np.asarray(rb) < 10_000
        np.testing.assert_array_equal(np.asarray(bd), np.asarray(rb))
        np.testing.assert_array_equal(np.asarray(bi)[ok], np.asarray(ri)[ok])
        np.testing.assert_array_equal(np.asarray(sd), np.asarray(rs))

    def test_vmap_over_targets(self):
        import jax

        from weiner_slamit_v2_tpu.ops.match_pallas import windowed_best2_pallas

        d1, d2, v1, v2, px, x2, win, lo, hi, o2, w2 = self._inputs(seed=9)
        ri, rb, rs = self._reference(d1, d2, v1, v2, px, x2, win, lo, hi, o2)
        B = 3
        bi, bd, sd = jax.vmap(
            lambda dd, xx, oo, vv: windowed_best2_pallas(
                d1, dd, v1, vv, px, xx, win, lo, hi, oo, interpret=True
            )
        )(jnp.stack([d2] * B), jnp.stack([x2] * B),
          jnp.stack([o2] * B), jnp.stack([v2] * B))
        for b in range(B):
            np.testing.assert_array_equal(np.asarray(bd[b]), np.asarray(rb))
