from . import profiling, sensor_fusion  # noqa: F401
