"""The synthetic ground-truth benchmark — data generation, the full
multi-method pipeline, and evaluation.

Parity map: `Synthetic_experiment/exprmt1_sampledata.m` (ground truth:
2 HMMs x 2 states, shared Gaussians at (0,0)/(3,3) with identity
covariance, transition matrices [.6 .4;.4 .6] vs [.4 .6;.6 .4];
datasets of 2 clusters x 20 HMMs x 25 seqs x T=50 plus N(0, 0.1)
noise), `exprmt1_demo.m` (VBEM -> VBHEM grid -> VHEM -> CCFD -> PPK),
and the recovery scoring of `syn_evluate.m` / `evaluate_vbhem_jounarl.m`
(Rand index, purity, P(K correct), P(S correct)).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HEMConfig, VBConfig, VBHEMConfig
from ..containers import HMM, SeqBatch
from ..models import hmm_tools, vbhem, vbhmm, vhem
from ..utils.metrics import purity, rand_index


def gt_hmms(dtype=jnp.float64):
    """The two ground-truth HMMs (`exprmt1_sampledata.m:21-43`)."""
    mean = jnp.asarray([[0.0, 0.0], [3.0, 3.0]], dtype)
    cov = jnp.broadcast_to(jnp.eye(2, dtype=dtype), (2, 2, 2))
    prior = jnp.asarray([0.5, 0.5], dtype)
    h1 = HMM(prior=prior, trans=jnp.asarray([[0.6, 0.4], [0.4, 0.6]], dtype),
             mean=mean, cov=cov)
    h2 = HMM(prior=prior, trans=jnp.asarray([[0.4, 0.6], [0.6, 0.4]], dtype),
             mean=mean, cov=cov)
    return h1, h2


class SyntheticDataset(NamedTuple):
    batches: List[SeqBatch]     # one per subject (HMM)
    labels: np.ndarray          # [Kb] ground-truth cluster of each subject


def sample_dataset(key, n_per_cluster: int = 20, n_seqs: int = 25,
                   t: int = 50, noise: float = 0.1,
                   dtype=jnp.float64) -> SyntheticDataset:
    """Sample one dataset (`exprmt1_sampledata.m:51-87`)."""
    h1, h2 = gt_hmms(dtype)
    batches, labels = [], []
    for gi, h in enumerate([h1, h2]):
        for si in range(n_per_cluster):
            k = jax.random.fold_in(jax.random.fold_in(key, gi), si)
            _, x = hmm_tools.sample(k, h, t=t, n=n_seqs)
            x = x + noise * jax.random.normal(jax.random.fold_in(k, 99),
                                              x.shape, dtype)
            batches.append(SeqBatch(x=x, lengths=jnp.full((n_seqs,), t,
                                                          jnp.int32)))
            labels.append(gi)
    return SyntheticDataset(batches=batches, labels=np.asarray(labels))


def default_vb_config() -> VBConfig:
    """VBEM settings of `exprmt1_demo.m:28-47` (S=2, default hyps with
    the synthetic-data m0/W0)."""
    return VBConfig(mu0=(1.5, 1.5), w0=1.0, numtrials=20)


def default_vbhem_config(trials: int = 50) -> VBHEMConfig:
    """VBHEM settings of `exprmt1_demo.m:66-79`."""
    return VBHEMConfig(alpha0=1e6, m0=(1.5, 1.5), w0=1.0, nv=100,
                       tau=50, trials=trials, initmode="baseem",
                       learn_hyps=False)


def learn_subject_hmms(key, ds: SyntheticDataset, s: int = 2,
                       config: Optional[VBConfig] = None):
    """Per-subject VBEM (`exprmt1_demo.m:47`, vbhmm_learn_batch)."""
    config = config or default_vb_config()
    results = []
    for i, batch in enumerate(ds.batches):
        res, _ = vbhmm.learn(jax.random.fold_in(key, i), batch, s, config)
        results.append(res)
    return results


class RecoveryScore(NamedTuple):
    rand_index: float
    purity: float
    best_k: int
    best_s: int


def run_vbhem(key, results, labels, k_grid=range(1, 7), s_grid=range(1, 6),
              config: Optional[VBHEMConfig] = None):
    """VBHEM over the (K,S) grid + recovery scoring
    (`exprmt1_demo.m:64-108` + `evaluate_vbhem_jounarl.m:86-118`)."""
    config = config or default_vbhem_config()
    base = vbhem.h3m_from_results(results, use_post=config.use_post)
    res, info = vbhem.cluster(key, base, list(k_grid), list(s_grid), config)
    res = vbhem.remove_empty_clusters(res)
    lab = np.asarray(res.label)
    ri, _, _, _ = rand_index(lab, labels)
    return res, info, RecoveryScore(rand_index=ri,
                                    purity=purity(lab, labels),
                                    best_k=info["model_best_k"],
                                    best_s=info["model_best_s"])


def run_vhem(key, results, labels, k: int = 2, s: int = 2,
             config: Optional[HEMConfig] = None):
    """VHEM baseline on the same bank (`exprmt1_demo.m:114-148`)."""
    config = config or HEMConfig(trials=20, nv=100, tau=10)
    base = vbhem.h3m_from_results(results, use_post=False)
    res = vhem.cluster(key, base, k, s, config)
    lab = np.asarray(res.label)
    ri, _, _, _ = rand_index(lab, labels)
    return res, RecoveryScore(rand_index=ri, purity=purity(lab, labels),
                              best_k=k, best_s=s)
