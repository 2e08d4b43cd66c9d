from . import fb, gmm  # noqa: F401
