from . import checkpoint, covisibility, point_stats, types  # noqa: F401
from .types import SlamMap, empty_map  # noqa: F401
