"""Pytree containers for HMMs, variational posteriors, and H3M banks.

The reference toolbox carries these as MATLAB structs with duplicated,
renamed fields between layers (`hmm.varpar.{alpha,epsilon,beta,v,m,W}`
in `src/hmm/vbhmm_em.m:486-491` vs `hmm_r.{eta,epsilon}` +
`emit{k}.{lambda,v,m,W}` in `src/vbhem/vbhem_mstep_component.m:42-70`,
re-unified by `src/vbhem/form_outputH3M.m:18-28`).  Here there is ONE
definition of each container, shared by both engines, and everything is
a dense, statically-shaped JAX pytree so it vmaps/shards cleanly.

Conventions (differ from the reference's MATLAB layout on purpose):
  * means are row-major: ``m`` is [K, D] (reference: [D, K]);
  * transition matrices are row-stochastic: ``trans[i, j] = p(j | i)``
    (same as the reference's "row format", `vbhmm_fb.m:76`);
  * banks of HMMs are stacked on a leading axis and padded to the max
    state count with a boolean ``state_mask``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class NIW(NamedTuple):
    """Normal-inverse-Wishart variational posterior over (mu, Lambda).

    Matches Bishop ch.10 parameterization used throughout the reference:
    mu | Lambda ~ N(m, (beta Lambda)^-1);  Lambda ~ Wishart(W, v).
    The VBHEM layer calls ``beta`` "lambda" (`vbhem_mstep_component.m:49`);
    we keep one name.
    """
    beta: jnp.ndarray   # [..., K]
    v: jnp.ndarray      # [..., K]
    m: jnp.ndarray      # [..., K, D]
    w: jnp.ndarray      # [..., K, D, D]   Wishart scale (precision-like)

    @property
    def dim(self) -> int:
        return self.m.shape[-1]

    @property
    def num_states(self) -> int:
        return self.m.shape[-2]

    def expected_cov(self) -> jnp.ndarray:
        """E[Sigma] = W^{-1} / (v - D - 1); falls back to v when the mean of
        the inverse-Wishart does not exist (`vbhmm_em.m:394-408`)."""
        from .utils.numeric import inv_psd, sym
        d = self.dim
        winv = inv_psd(self.w)
        denom = jnp.where(self.v > d + 1, self.v - d - 1.0, self.v)
        return sym(winv / denom[..., None, None])


class HMMPosterior(NamedTuple):
    """Variational posterior of one Gaussian-emission HMM (VBEM's ``varpar``,
    `vbhmm_em.m:486-491`).  alpha: Dirichlet over the initial state;
    epsilon: row-wise Dirichlet over transitions; niw: per-state emission."""
    alpha: jnp.ndarray    # [..., K]
    epsilon: jnp.ndarray  # [..., K, K]
    niw: NIW              # [..., K] states

    @property
    def num_states(self) -> int:
        return self.alpha.shape[-1]

    def to_point(self) -> "HMM":
        """Normalize counts into a point-estimate HMM (`vbhmm_em.m:424-464`)."""
        prior = self.alpha / jnp.sum(self.alpha, axis=-1, keepdims=True)
        esum = jnp.sum(self.epsilon, axis=-1, keepdims=True)
        esum = jnp.where(esum == 0, 1.0, esum)
        trans = self.epsilon / esum
        return HMM(prior=prior, trans=trans, mean=self.niw.m,
                   cov=self.niw.expected_cov())


class HMM(NamedTuple):
    """Point-estimate Gaussian-emission HMM (prior/trans/pdf in the
    reference's output structs, `vbhmm_em.m:424-464`)."""
    prior: jnp.ndarray  # [..., K]
    trans: jnp.ndarray  # [..., K, K] row-stochastic
    mean: jnp.ndarray   # [..., K, D]
    cov: jnp.ndarray    # [..., K, D, D]

    @property
    def num_states(self) -> int:
        return self.prior.shape[-1]

    @property
    def dim(self) -> int:
        return self.mean.shape[-1]


class VBHMMResult(NamedTuple):
    """Output of vbhmm learning for one subject: posterior + point model +
    sufficient statistics, mirroring `vbhmm_em.m:424-492`."""
    post: HMMPosterior
    model: HMM
    ll: jnp.ndarray        # ELBO at convergence
    gamma: jnp.ndarray     # [N, T, K] responsibilities (masked)
    counts_n1: jnp.ndarray  # [K]   initial-state soft counts (Nk1)
    counts: jnp.ndarray     # [K]   total state soft counts (Nk)
    trans_counts: jnp.ndarray  # [K, K] soft transition counts (M)
    state_mask: Optional[jnp.ndarray] = None  # [K] valid-state mask


class H3M(NamedTuple):
    """A bank of point-estimate HMMs with mixture weights — the reference's
    "base" H3M (`hmms_to_h3m_hem.m`).  Stacked on axis 0 and padded to the
    max state count; ``state_mask`` marks real states."""
    omega: jnp.ndarray       # [Kb]
    hmm: HMM                 # fields have leading [Kb] axis, padded to Sb_max
    state_mask: jnp.ndarray  # [Kb, Sb_max] bool

    @property
    def num_hmms(self) -> int:
        return self.omega.shape[-1]


class H3MPosterior(NamedTuple):
    """Variational posterior of the reduced H3M learned by VBHEM
    (`vbhem_h3m_c_step_fc.m`): Dirichlet over cluster weights (alpha),
    per-cluster Dirichlets over initial states (eta) and transitions
    (epsilon), and per-cluster-state NIW emissions."""
    alpha: jnp.ndarray    # [Kr]
    eta: jnp.ndarray      # [Kr, Sr]
    epsilon: jnp.ndarray  # [Kr, Sr, Sr]
    niw: NIW              # beta/v: [Kr, Sr]; m: [Kr, Sr, D]; w: [Kr, Sr, D, D]

    @property
    def num_clusters(self) -> int:
        return self.alpha.shape[-1]

    @property
    def num_states(self) -> int:
        return self.eta.shape[-1]

    def to_h3m(self) -> H3M:
        """Posterior -> point-estimate H3M (`convert_h3mrtoh3mb.m`)."""
        omega = self.alpha / jnp.sum(self.alpha, axis=-1, keepdims=True)
        prior = self.eta / jnp.sum(self.eta, axis=-1, keepdims=True)
        esum = jnp.sum(self.epsilon, axis=-1, keepdims=True)
        esum = jnp.where(esum == 0, 1.0, esum)
        trans = self.epsilon / esum
        hmm = HMM(prior=prior, trans=trans, mean=self.niw.m,
                  cov=self.niw.expected_cov())
        mask = jnp.ones(self.eta.shape, dtype=bool)
        return H3M(omega=omega, hmm=hmm, state_mask=mask)


class SeqBatch(NamedTuple):
    """Dense padded batch of variable-length sequences.

    Replaces the reference's cell arrays `data{n} = [T_n x D]`
    (`vbhmm_learn.m` input contract) with `[N, T_max, D]` + length mask,
    the layout JAX/XLA wants.
    """
    x: jnp.ndarray        # [N, T_max, D]
    lengths: jnp.ndarray  # [N] int32

    @property
    def mask(self) -> jnp.ndarray:  # [N, T_max] bool
        t = jnp.arange(self.x.shape[-2])
        return t[None, :] < self.lengths[:, None]

    @property
    def total(self) -> jnp.ndarray:
        return jnp.sum(self.lengths)


def pack_sequences(seqs, dtype=None, t_max: Optional[int] = None) -> SeqBatch:
    """Pack a python list of [T_i, D] arrays into a SeqBatch."""
    import numpy as np
    n = len(seqs)
    d = np.asarray(seqs[0]).shape[-1]
    tm = t_max if t_max is not None else max(int(np.asarray(s).shape[0]) for s in seqs)
    x = np.zeros((n, tm, d), dtype=dtype or np.asarray(seqs[0]).dtype)
    lengths = np.zeros((n,), dtype=np.int32)
    for i, s in enumerate(seqs):
        s = np.asarray(s)
        x[i, : s.shape[0]] = s
        lengths[i] = s.shape[0]
    return SeqBatch(x=jnp.asarray(x), lengths=jnp.asarray(lengths))
