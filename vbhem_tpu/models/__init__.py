from . import hmm_tools, vbhmm  # noqa: F401
