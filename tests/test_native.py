"""Native C++ component tests (vocabulary parser, image decoder)."""

import os

import numpy as np
import pytest

from weiner_slamit_v2_tpu.native import (
    get_lib,
    load_dbow2_text_native,
    load_image_gray_native,
)


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable (g++ build failed)")
    return lib


class TestImageIO:
    def test_png_roundtrip(self, lib, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
        p = tmp_path / "test.png"
        Image.fromarray(img, mode="L").save(p)
        out = load_image_gray_native(str(p))
        assert out is not None
        np.testing.assert_allclose(out, img.astype(np.float32), atol=0.5)

    def test_rgb_png_luma(self, lib, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
        p = tmp_path / "rgb.png"
        Image.fromarray(img, mode="RGB").save(p)
        out = load_image_gray_native(str(p))
        assert out is not None
        luma = (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        )
        np.testing.assert_allclose(out, luma, atol=1.0)

    def test_pgm(self, lib, tmp_path):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (20, 30), dtype=np.uint8)
        p = tmp_path / "t.pgm"
        with open(p, "wb") as f:
            f.write(b"P5\n30 20\n255\n")
            f.write(img.tobytes())
        out = load_image_gray_native(str(p))
        assert out is not None
        np.testing.assert_array_equal(out, img.astype(np.float32))

    def test_missing_file(self, lib):
        assert load_image_gray_native("/nonexistent/x.png") is None

    def test_dataset_loader_uses_native(self, lib, tmp_path):
        from PIL import Image

        from weiner_slamit_v2_tpu.io.datasets import _load_gray

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        p = tmp_path / "f.png"
        Image.fromarray(img, mode="L").save(p)
        out = _load_gray(str(p))
        np.testing.assert_allclose(out, img.astype(np.float32), atol=0.5)


class TestVocLoader:
    def test_parse_small_vocab(self, lib, tmp_path):
        """Write a tiny DBoW2-format file and parse it back."""
        rng = np.random.default_rng(4)
        n_nodes = 12
        lines = ["10 6 0 0"]
        descs = rng.integers(0, 256, (n_nodes, 32))
        for i in range(n_nodes):
            d = " ".join(str(int(x)) for x in descs[i])
            lines.append(f"{i // 3} {int(i % 2)} {d} {0.25 * i:.6f}")
        p = tmp_path / "voc.txt"
        p.write_text("\n".join(lines) + "\n")

        out = load_dbow2_text_native(str(p))
        assert out is not None
        k, L, data = out
        assert (k, L) == (10, 6)
        assert data["parent"].shape == (n_nodes,)
        np.testing.assert_array_equal(data["desc"], descs)
        np.testing.assert_allclose(
            data["weight"], 0.25 * np.arange(n_nodes), atol=1e-9
        )
        np.testing.assert_array_equal(
            data["is_leaf"], (np.arange(n_nodes) % 2).astype(bool)
        )

    def test_python_parser_agrees(self, lib, tmp_path):
        from weiner_slamit_v2_tpu.bow.vocabulary import load_dbow2_text

        rng = np.random.default_rng(5)
        lines = ["5 3 0 0"]
        descs = rng.integers(0, 256, (6, 32))
        for i in range(6):
            d = " ".join(str(int(x)) for x in descs[i])
            lines.append(f"{i} 1 {d} {0.5 * i}")
        p = tmp_path / "voc2.txt"
        p.write_text("\n".join(lines) + "\n")
        k1, L1, d1 = load_dbow2_text(str(p))
        k2, L2, d2 = load_dbow2_text_native(str(p))
        assert (k1, L1) == (k2, L2)
        np.testing.assert_array_equal(d1["desc"], d2["desc"])
        np.testing.assert_allclose(d1["weight"], d2["weight"])
