from . import fast, hamming, orb, pattern, pyramid, topk_grid  # noqa: F401
