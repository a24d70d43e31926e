from . import posenet  # noqa: F401
