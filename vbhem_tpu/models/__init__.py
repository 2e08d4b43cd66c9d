from . import (ccfd, dic, hmm_tools, ppk, vbhem, vbhmm,  # noqa: F401
               vhem)
