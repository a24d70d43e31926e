from . import datasets, evaluation, trajectory  # noqa: F401
