from . import data_parallel, sharded_ba  # noqa: F401
