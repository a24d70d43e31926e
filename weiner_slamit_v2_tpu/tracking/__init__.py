from . import local_mapping, loop_closing, tracker, system  # noqa: F401
from .system import System  # noqa: F401
