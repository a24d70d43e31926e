from . import covisibility, types  # noqa: F401
from .types import SlamMap, empty_map  # noqa: F401
