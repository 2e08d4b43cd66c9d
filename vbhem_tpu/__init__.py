"""vbhem_tpu — TPU-native clustering of hidden Markov models with
variational Bayesian hierarchical EM.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference MATLAB toolbox "Clustering Hidden Markov Models with
Variational Bayesian Hierarchical EM" (emhmm): VBEM learning of
Gaussian-emission HMMs, VBHEM clustering of HMM banks, the VHEM / DIC /
PPK-SC / CCFD baselines, and the evaluation metrics.
"""

__version__ = "0.1.0"

from .config import HEMConfig, VBConfig, VBHEMConfig  # noqa: F401
from .containers import (H3M, HMM, HMMPosterior, NIW, SeqBatch,  # noqa: F401
                         VBHMMResult, pack_sequences)
