import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weiner_slamit_v2_tpu.config import OrbConfig
from weiner_slamit_v2_tpu.ops import fast, hamming, orb, pattern, pyramid, topk_grid
from weiner_slamit_v2_tpu.frontend.extractor import OrbExtractor, level_budgets


def checkerboard(h=96, w=128, sq=12):
    yy, xx = np.mgrid[0:h, 0:w]
    img = (((yy // sq) + (xx // sq)) % 2).astype(np.float32) * 200.0 + 20.0
    return jnp.asarray(img)


class TestPyramid:
    def test_level_shapes(self):
        shapes = pyramid.level_shapes(480, 640, 8, 1.2)
        assert shapes[0] == (480, 640)
        assert shapes[1] == (400, 533)
        assert len(shapes) == 8
        # monotone decreasing
        for a, b in zip(shapes, shapes[1:]):
            assert b[0] < a[0] and b[1] < a[1]

    def test_pyramid_values(self):
        img = checkerboard()
        levels = pyramid.build_pyramid(img, 4, 1.2)
        assert len(levels) == 4
        # mean intensity approximately preserved by bilinear resize
        for lvl in levels:
            assert abs(float(lvl.mean()) - float(img.mean())) < 10.0

    def test_gaussian_blur_preserves_mean_and_smooths(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 255, (64, 64)).astype(np.float32))
        out = pyramid.gaussian_blur(img)
        assert abs(float(out.mean()) - float(img.mean())) < 1.0
        assert float(out.std()) < float(img.std())

    def test_blur_matches_scipy(self):
        from scipy.ndimage import gaussian_filter

        rng = np.random.default_rng(1)
        img = rng.uniform(0, 255, (48, 48)).astype(np.float32)
        ours = np.asarray(pyramid.gaussian_blur(jnp.asarray(img), ksize=7, sigma=2.0))
        ref = gaussian_filter(img, sigma=2.0, truncate=1.5, mode="mirror")
        # interior only (border handling differs slightly in truncation)
        np.testing.assert_allclose(ours[8:-8, 8:-8], ref[8:-8, 8:-8], atol=2.0)


class TestFast:
    def test_detects_corner(self):
        # single bright square on dark background -> corners at its 4 corners
        img = np.zeros((64, 64), dtype=np.float32)
        img[24:40, 24:40] = 200.0
        score = fast.fast_score(jnp.asarray(img), 20.0)
        assert float(score.max()) > 20.0
        ys, xs = np.nonzero(np.asarray(score))
        # all detections near the square's corners
        for y, x in zip(ys, xs):
            d = min(
                abs(y - 24) + abs(x - 24), abs(y - 24) + abs(x - 39),
                abs(y - 39) + abs(x - 24), abs(y - 39) + abs(x - 39),
            )
            assert d <= 6

    def test_no_corners_on_flat(self):
        img = jnp.full((32, 32), 100.0)
        score = fast.fast_score(img, 7.0)
        assert float(score.max()) == 0.0

    def test_no_corners_on_edge_line(self):
        # a straight step edge has arcs of exactly 8, below the 9 threshold
        img = np.zeros((32, 32), dtype=np.float32)
        img[:, 16:] = 200.0
        score = fast.fast_score(jnp.asarray(img), 20.0)
        assert float(score.max()) == 0.0

    def test_score_is_max_threshold(self):
        img = np.zeros((32, 32), dtype=np.float32)
        img[12:20, 12:20] = 50.0
        s = np.asarray(fast.fast_score(jnp.asarray(img), 7.0))
        smax = s.max()
        assert 0 < smax <= 50.0
        # detection at threshold t keeps pixels with score > t
        s20 = np.asarray(fast.fast_score(jnp.asarray(img), 20.0))
        np.testing.assert_array_equal(s20 > 0, s > 20.0)

    def test_nms_keeps_single_peak(self):
        score = np.zeros((16, 16), dtype=np.float32)
        score[8, 8] = 10.0
        score[8, 9] = 9.0
        out = np.asarray(fast.nms_3x3(jnp.asarray(score)))
        assert out[8, 8] == 10.0 and out[8, 9] == 0.0

    def test_nms_plateau_single_survivor(self):
        score = np.zeros((16, 16), dtype=np.float32)
        score[5:7, 5:7] = 4.0
        out = np.asarray(fast.nms_3x3(jnp.asarray(score)))
        assert (out > 0).sum() == 1


class TestSelect:
    def test_budget_and_margin(self):
        rng = np.random.default_rng(2)
        score = jnp.asarray(rng.uniform(0, 50, (96, 128)).astype(np.float32))
        xy, resp, valid = topk_grid.select_keypoints(score, budget=32, margin=19)
        assert xy.shape == (32, 2)
        assert bool(valid.all())
        x, y = np.asarray(xy[:, 0]), np.asarray(xy[:, 1])
        assert (x >= 19).all() and (x < 128 - 19).all()
        assert (y >= 19).all() and (y < 96 - 19).all()

    def test_spatial_uniformity(self):
        # two clusters of corners; rank-0-first selection must take from both
        score = np.zeros((96, 128), dtype=np.float32)
        score[24:28, 24:28] = 30.0  # strong cluster
        score[60:62, 90:92] = 10.0  # weak cluster, different cell
        xy, resp, valid = topk_grid.select_keypoints(
            jnp.asarray(score), budget=2, per_cell_cap=4, cell_size=32
        )
        cells = set()
        for x, y in np.asarray(xy):
            cells.add((int(y) // 32, int(x) // 32))
        assert len(cells) == 2  # one from each cell, not two from the strong one

    def test_high_threshold_priority(self):
        score = np.zeros((64, 64), dtype=np.float32)
        score[30, 30] = 25.0   # passes high th (20)
        score[32, 32] = 15.0   # same cell, low-th only
        xy, resp, valid = topk_grid.select_keypoints(
            jnp.asarray(score), budget=1, cell_size=64, margin=8
        )
        assert int(xy[0, 0]) == 30 and bool(valid[0])

    def test_invalid_when_no_corners(self):
        score = jnp.zeros((64, 64))
        xy, resp, valid = topk_grid.select_keypoints(score, budget=8)
        assert not bool(valid.any())


class TestOrientation:
    def test_gradient_orientation(self):
        # intensity increasing along +x -> centroid to the right -> angle ~ 0
        img = jnp.asarray(np.tile(np.arange(64, dtype=np.float32), (64, 1)))
        xy = jnp.asarray([[32.0, 32.0]])
        ang = orb.orientations(img, xy)
        assert abs(float(ang[0])) < 0.05

    def test_rotated_gradient(self):
        img = jnp.asarray(np.tile(np.arange(64, dtype=np.float32)[:, None], (1, 64)))
        xy = jnp.asarray([[32.0, 32.0]])
        ang = orb.orientations(img, xy)  # increasing along +y -> pi/2
        assert abs(float(ang[0]) - np.pi / 2) < 0.05


class TestDescriptors:
    def test_shape_and_determinism(self):
        img = checkerboard()
        blurred = pyramid.gaussian_blur(img)
        xy = jnp.asarray([[40.0, 40.0], [52.0, 40.0]])
        ang = jnp.zeros(2)
        d1 = orb.brief_descriptors(blurred, xy, ang)
        d2 = orb.brief_descriptors(blurred, xy, ang)
        assert d1.shape == (2, 8) and d1.dtype == jnp.uint32
        np.testing.assert_array_equal(d1, d2)

    def test_rotation_invariance(self):
        """Descriptor computed with the patch's own orientation should be
        stable when the image is rotated 90 degrees."""
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 255, (128, 128)).astype(np.float32)
        img_s = np.asarray(pyramid.gaussian_blur(jnp.asarray(img), sigma=3.0))
        rot = np.rot90(img_s, k=1)  # CCW 90
        x, y = 64, 64
        a0 = orb.orientations(jnp.asarray(img_s), jnp.asarray([[x, y]], dtype=jnp.float32))
        d0 = orb.brief_descriptors(jnp.asarray(img_s), jnp.asarray([[x, y]], dtype=jnp.float32), a0)
        # the same point in the rotated image: (x, y) -> (y, H-1-x) for rot90 CCW
        xr, yr = y, 128 - 1 - x
        a1 = orb.orientations(jnp.asarray(rot), jnp.asarray([[xr, yr]], dtype=jnp.float32))
        d1 = orb.brief_descriptors(jnp.asarray(rot), jnp.asarray([[xr, yr]], dtype=jnp.float32), a1)
        dist = int(hamming.hamming_distance(d0, d1)[0])
        assert dist < 60  # well below the 128 chance level; TH_LOW=50 scale


class TestHamming:
    def test_known_distance(self):
        a = jnp.asarray([[0xFFFFFFFF] + [0] * 7], dtype=jnp.uint32)
        b = jnp.zeros((1, 8), dtype=jnp.uint32)
        assert int(hamming.distance_matrix(a, b)[0, 0]) == 32

    def test_identity_zero(self):
        rng = np.random.default_rng(4)
        d = jnp.asarray(rng.integers(0, 2**32, (16, 8), dtype=np.uint32))
        dist = hamming.distance_matrix(d, d)
        assert (np.diag(np.asarray(dist)) == 0).all()

    def test_mutual_best(self):
        d1 = jnp.asarray(
            [[0, 0, 0, 0, 0, 0, 0, 0], [0xFF, 0, 0, 0, 0, 0, 0, 0]], dtype=jnp.uint32
        )
        d2 = jnp.asarray(
            [[0xFF, 0, 0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0, 0, 0]], dtype=jnp.uint32
        )
        dist = hamming.distance_matrix(d1, d2)
        idx, best = hamming.mutual_best(dist)
        np.testing.assert_array_equal(np.asarray(idx), [1, 0])

    def test_best_and_second(self):
        dist = jnp.asarray([[5, 2, 9], [1, 4, 0]], dtype=jnp.int32)
        idx, b1, b2 = hamming.best_and_second(dist)
        np.testing.assert_array_equal(np.asarray(idx), [1, 2])
        np.testing.assert_array_equal(np.asarray(b1), [2, 0])
        np.testing.assert_array_equal(np.asarray(b2), [5, 1])


class TestExtractor:
    def test_budgets_sum(self):
        b = level_budgets(1024, 8, 1.2)
        assert sum(b) == 1024
        assert all(x > 0 for x in b)
        assert b[0] > b[1] > b[2]

    def test_end_to_end(self):
        from weiner_slamit_v2_tpu.io.datasets import make_synthetic_sequence

        seq = make_synthetic_sequence(n_frames=1, h=240, w=320, seed=5)
        img = jnp.asarray(seq.frames[0].image)
        cfg = OrbConfig(n_features=256)
        ex = OrbExtractor(cfg, (240, 320))
        feats = ex(img)
        n_valid = int(feats.valid.sum())
        assert n_valid > 150, f"only {n_valid} keypoints"
        assert feats.desc.shape == (256, 8)
        # valid keypoints are inside the image
        xy = np.asarray(feats.xy)[np.asarray(feats.valid)]
        assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 320).all()
        assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 240).all()
        # multiple octaves represented
        octs = np.unique(np.asarray(feats.octave)[np.asarray(feats.valid)])
        assert len(octs) >= 3

    def test_repeatability_under_shift(self):
        """Keypoints should mostly re-detect under a small translation."""
        from weiner_slamit_v2_tpu.io.datasets import make_synthetic_sequence

        seq = make_synthetic_sequence(n_frames=2, h=240, w=320, seed=6, motion="strafe")
        cfg = OrbConfig(n_features=256)
        ex = OrbExtractor(cfg, (240, 320))
        f0 = ex(jnp.asarray(seq.frames[0].image))
        f1 = ex(jnp.asarray(seq.frames[1].image))
        d = hamming.masked_distance_matrix(f0.desc, f1.desc, f0.valid, f1.valid)
        idx, best = hamming.mutual_best(d)
        good = (np.asarray(best) <= 50) & (np.asarray(idx) >= 0)  # TH_LOW
        assert good.sum() > 40, f"only {good.sum()} mutual matches <= TH_LOW"
