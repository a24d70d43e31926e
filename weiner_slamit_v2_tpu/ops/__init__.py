from . import fast, hamming, orb, pattern, pyramid, stereo, topk_grid  # noqa: F401
