from . import database, vocabulary  # noqa: F401
