from . import extractor, initializer, matcher  # noqa: F401
from .extractor import FrameFeatures, OrbExtractor  # noqa: F401
