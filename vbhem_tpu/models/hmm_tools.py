"""Point-estimate HMM utilities: likelihood, Viterbi decoding, sampling,
KL divergence, entropy.

Parity map: `vbhmm_ll.m`, `vbhmm_map_state.m` (viterbi_path),
`vbhmm_random_sample.m`, `vbhmm_kld.m`, `vbhmm_entropy.m`,
`vbhmm_prob_state.m` in the reference's `src/hmm/`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..containers import HMM, SeqBatch


def _log_gauss_obs(x: jnp.ndarray, hmm: HMM) -> jnp.ndarray:
    """log N(x_t | mean_k, cov_k): x [N, T, D] -> [N, T, K]."""
    from ..utils.numeric import inv_psd, logdet_psd
    d = x.shape[-1]
    prec = inv_psd(hmm.cov)                                       # [K, D, D]
    diff = x[:, :, None, :] - hmm.mean[None, None, :, :]          # [N,T,K,D]
    quad = jnp.einsum("ntkd,kde,ntke->ntk", diff, prec, diff)
    logdet = logdet_psd(hmm.cov)
    return -0.5 * (quad + logdet[None, None] +
                   d * jnp.log(jnp.asarray(2 * jnp.pi, x.dtype)))


def loglik(batch: SeqBatch, hmm: HMM, normalize: bool = False) -> jnp.ndarray:
    """Per-sequence data log-likelihood via the scaled forward recursion
    (`vbhmm_ll.m`).  ``normalize`` divides by sequence length
    (`vbhmm_ll.m:108-114`).  Densities are floored at the smallest
    positive double, as the reference floors at 4.94e-323
    (`vbhmm_ll.m:70-72`)."""
    mask = batch.mask
    logb = _log_gauss_obs(batch.x, hmm)                           # [N,T,K]
    maxb = jnp.max(logb, axis=-1)
    b = jnp.exp(logb - maxb[..., None])

    alpha0 = hmm.prior[None, :] * b[:, 0, :]
    c0 = jnp.sum(alpha0, axis=-1)
    c0 = jnp.maximum(c0, jnp.finfo(batch.x.dtype).tiny)
    a0 = alpha0 / c0[:, None]

    def step(alpha_prev, inp):
        b_t, valid = inp
        al = (alpha_prev @ hmm.trans) * b_t
        c = jnp.sum(al, axis=-1)
        c = jnp.maximum(c, jnp.finfo(al.dtype).tiny)
        al = al / c[:, None]
        al = jnp.where(valid[:, None], al, alpha_prev)
        c = jnp.where(valid, c, 1.0)
        return al, c

    xs = (jnp.moveaxis(b[:, 1:], 1, 0), jnp.moveaxis(mask[:, 1:], 1, 0))
    _, c_rest = jax.lax.scan(step, a0, xs)
    log_c = jnp.concatenate([jnp.log(c0)[None], jnp.log(c_rest)], axis=0)
    ll = jnp.sum(log_c, axis=0) + jnp.sum(
        maxb * mask.astype(batch.x.dtype), axis=-1)
    if normalize:
        ll = ll / batch.lengths.astype(ll.dtype)
    return ll


def viterbi(batch: SeqBatch, hmm: HMM) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MAP state sequences (`vbhmm_map_state.m:41-103`).

    Returns (paths [N, T] int32 with -1 on padding, log probability [N]).
    """
    mask = batch.mask
    logb = _log_gauss_obs(batch.x, hmm)
    log_a = jnp.log(hmm.trans)
    d0 = jnp.log(hmm.prior)[None, :] + logb[:, 0, :]              # [N, K]

    def step(delta_prev, inp):
        logb_t, valid = inp
        cand = delta_prev[:, :, None] + log_a[None]               # [N,K,K]
        best = jnp.max(cand, axis=1) + logb_t
        arg = jnp.argmax(cand, axis=1)
        delta = jnp.where(valid[:, None], best, delta_prev)
        return delta, (delta, arg)

    xs = (jnp.moveaxis(logb[:, 1:], 1, 0), jnp.moveaxis(mask[:, 1:], 1, 0))
    delta_T, (_, args) = jax.lax.scan(step, d0, xs)
    logp = jnp.max(delta_T, axis=-1)
    last = jnp.argmax(delta_T, axis=-1)                           # [N]

    def back(state_next, inp):
        arg_t, valid_next = inp                                    # [N,K],[N]
        state = jnp.take_along_axis(arg_t, state_next[:, None], 1)[:, 0]
        state = jnp.where(valid_next, state, state_next)
        return state, state

    _, states_rev = jax.lax.scan(
        back, last, (args, jnp.moveaxis(mask[:, 1:], 1, 0)), reverse=True)
    paths = jnp.concatenate([states_rev, last[None]], axis=0)
    paths = jnp.moveaxis(paths, 0, 1).astype(jnp.int32)
    paths = jnp.where(mask, paths, -1)
    return paths, logp


def sample(key: jax.Array, hmm: HMM, t: int, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ancestral sampling of n sequences of length t
    (`vbhmm_random_sample.m`): hidden chain + Gaussian emissions via
    Cholesky.  Returns (states [N, T], x [N, T, D])."""
    k_state, k_emit = jax.random.split(key)
    chol = jnp.linalg.cholesky(hmm.cov)
    d = hmm.dim

    def chain(carry, key_t):
        z_prev, first = carry
        logits = jnp.where(first[:, None], jnp.log(hmm.prior)[None, :],
                           jnp.log(hmm.trans)[z_prev])
        z = jax.random.categorical(key_t, logits, axis=-1).astype(jnp.int32)
        return (z, jnp.zeros_like(first)), z

    keys = jax.random.split(k_state, t)
    z0 = jnp.zeros((n,), dtype=jnp.int32)
    _, states = jax.lax.scan(chain, (z0, jnp.ones((n,), bool)), keys)
    states = jnp.moveaxis(states, 0, 1)                           # [N, T]

    eps = jax.random.normal(k_emit, (n, t, d), dtype=hmm.mean.dtype)
    x = hmm.mean[states] + jnp.einsum("ntde,nte->ntd", chol[states], eps)
    return states, x


def kld(key: jax.Array, hmm1: HMM, hmm2: HMM,
        batch: Optional[SeqBatch] = None,
        n_samples: int = 100, t: int = 50) -> jnp.ndarray:
    """Monte-Carlo KL(hmm1 || hmm2) ~= mean(ll1 - ll2) on hmm1's data
    (`vbhmm_kld.m`).  If no data is given, samples from hmm1
    (`vbhmm_kld.m:36-40`)."""
    if batch is None:
        _, x = sample(key, hmm1, t, n_samples)
        batch = SeqBatch(x=x, lengths=jnp.full((n_samples,), t, jnp.int32))
    ll1 = loglik(batch, hmm1)
    ll2 = loglik(batch, hmm2)
    return jnp.mean(ll1 - ll2)


def entropy(batch: SeqBatch, hmm: HMM) -> jnp.ndarray:
    """Mean normalized negative log-likelihood (`vbhmm_entropy.m`)."""
    return -jnp.mean(loglik(batch, hmm, normalize=True))


def state_seq_logprob(states: jnp.ndarray, hmm: HMM) -> jnp.ndarray:
    """log p(z_1..z_T) of hidden-state sequences [N, T]
    (`vbhmm_prob_state.m`)."""
    lp0 = jnp.log(hmm.prior)[states[:, 0]]
    lpt = jnp.log(hmm.trans)[states[:, :-1], states[:, 1:]]
    return lp0 + jnp.sum(lpt, axis=-1)
