from . import camera, epipolar, se3, sim3, triangulate  # noqa: F401
from .camera import Camera  # noqa: F401
