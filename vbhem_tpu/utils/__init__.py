from . import numeric  # noqa: F401
