"""Float64 NumPy re-evaluation of the VBHEM lower bound.

TPU compute runs in float32; model selection compares per-(K,S)-cell
ELBOs whose legitimate differences can be a few hundred nats out of
~1e6 — and an f32-evaluated bound after aggressive hyperparameter
optimization was observed to carry a +21k-nat phantom for specific
cells (RESULTS.md round-4), silently corrupting the (K,S) choice.
This module recomputes the EXACT 10-term bound (`vbhemh3m_lb.m:88-186`)
plus the hierarchical backward recursion for the data term
(`vbhem_hmm_bwd_fwd_fast.m:166-257`, LL only) in pure NumPy float64 —
independent of JAX's x64 flag, so it works on the host even inside a
TPU-pinned process.  It doubles as an independent oracle for the JAX
implementation (tests/test_rescore.py asserts 1e-9-level agreement
with `models.vbhem.elbo` in f64).
"""
from __future__ import annotations

import numpy as np
from scipy.special import digamma, gammaln

TINY = 1e-50  # the reference's +1e-50 mass floor


def _logsumexp(a: np.ndarray, axis: int = -1) -> np.ndarray:
    mx = np.max(a, axis=axis, keepdims=True)
    mx = np.where(np.isfinite(mx), mx, 0.0)
    return np.squeeze(mx, axis) + np.log(
        np.sum(np.exp(a - mx), axis=axis))


def _logdet_psd(a: np.ndarray) -> np.ndarray:
    sign, logdet = np.linalg.slogdet(a)
    return logdet


def _e_log_dirichlet(conc: np.ndarray, axis: int = -1) -> np.ndarray:
    return digamma(conc) - digamma(np.sum(conc, axis=axis, keepdims=True))


def _e_log_det_lambda(v: np.ndarray, w: np.ndarray) -> np.ndarray:
    d = w.shape[-1]
    i = np.arange(1, d + 1, dtype=np.float64)
    t = np.sum(digamma(0.5 * (v[..., None] + 1.0 - i)), axis=-1)
    return t + d * np.log(2.0) + _logdet_psd(w)


def _log_dirichlet_const(conc: np.ndarray, axis: int = -1) -> np.ndarray:
    return gammaln(np.sum(conc, axis=axis)) - np.sum(gammaln(conc),
                                                     axis=axis)


def _log_wishart_b(logdet_winv, v, d: int):
    v = np.asarray(v, np.float64)
    i = np.arange(1, d + 1, dtype=np.float64)
    return (0.5 * v * logdet_winv - 0.5 * v * d * np.log(2.0)
            - 0.25 * d * (d - 1) * np.log(np.pi)
            - np.sum(gammaln(0.5 * (v[..., None] + 1.0 - i)), axis=-1))


def pair_ll_elbo_f64(prior_b, trans_b, log_pi, log_a, ell,
                     tau: int) -> np.ndarray:
    """LL_elbo [Kb, Kr] of the hierarchical backward recursion
    (`vbhem_hmm_bwd_fwd_fast.m:166-257`), data term only."""
    ll_old = np.zeros_like(ell)                        # [i,j,b,r]
    for _ in range(tau - 1):
        logtheta = (log_a[None, :, :, None, :]
                    + (ell + ll_old)[:, :, None, :, :])
        lse = _logsumexp(logtheta, axis=-1)            # [i,j,rp,b]
        ll_old = np.einsum("ibc,ijrc->ijbr", trans_b, lse)
    logtheta1 = log_pi[None, :, None, :] + ell + ll_old
    lse1 = _logsumexp(logtheta1, axis=-1)              # [i,j,b]
    return np.einsum("ib,ijb->ij", prior_b, lse1)


def elbo_f64(base, post, hyps, nv: int, tau: int) -> float:
    """The full 10-term VBHEM bound in float64 for an UNPADDED
    (K, S) model.  ``base``/``post``/``hyps`` are the JAX pytrees
    (H3M / H3MPosterior / VBHEMHyps); everything is pulled to NumPy."""
    f = lambda a: np.asarray(a, np.float64)  # noqa: E731
    omega_b, prior_b, trans_b = f(base.omega), f(base.hmm.prior), \
        f(base.hmm.trans)
    mean_b, cov_b = f(base.hmm.mean), f(base.hmm.cov)
    alpha, eta, eps = f(post.alpha), f(post.eta), f(post.epsilon)
    lam, v, m, w = f(post.niw.beta), f(post.niw.v), f(post.niw.m), \
        f(post.niw.w)
    alpha0, eta0, eps0 = float(hyps.alpha0), float(hyps.eta0), \
        float(hyps.epsilon0)
    lam0, v0 = float(hyps.lambda0), float(hyps.v0)
    m0, w0 = f(hyps.m0), f(hyps.w0)

    kb = omega_b.shape[0]
    kr, sr = eta.shape
    d = m.shape[-1]

    # ---- digamma expectations ----
    log_omega = _e_log_dirichlet(alpha)
    log_pi = _e_log_dirichlet(eta)
    log_a = _e_log_dirichlet(eps)
    log_lam = _e_log_det_lambda(v, w)

    # ---- expected emission LL (E3logN, full covariance) ----
    tr = np.einsum("jrde,ibed->ijbr", w, cov_b)
    diff = mean_b[:, None, :, None, :] - m[None, :, None, :, :]
    quad = np.einsum("ijbrd,jrde,ijbre->ijbr", diff, w, diff)
    ell = -0.5 * (d * np.log(2 * np.pi) - log_lam[None, :, None, :]
                  + d / lam[None, :, None, :]
                  + v[None, :, None, :] * (tr + quad))

    ll_elbo = pair_ll_elbo_f64(prior_b, trans_b, log_pi, log_a, ell, tau)

    # ---- soft assignments (`vbhem_h3m_c_step_fc.m:275-283`) ----
    tilde_n = (nv * kb) * omega_b
    log_z = tilde_n[:, None] * (log_omega[None, :] + ll_elbo)
    hat_z = np.exp(log_z - _logsumexp(log_z, axis=-1)[:, None]) + TINY
    z_ni = hat_z * tilde_n[:, None]
    nj = np.sum(z_ni, axis=0) + TINY

    # ---- the 10 terms (`vbhemh3m_lb.m:88-186`) ----
    logdet_w0inv = float(np.sum(np.log(1.0 / w0)))
    w0inv_diag = 1.0 / w0
    log_c_alpha0 = gammaln(kr * alpha0) - kr * gammaln(alpha0)
    log_c_eta0 = gammaln(sr * eta0) - sr * gammaln(eta0)
    log_c_eps0 = gammaln(sr * eps0) - sr * gammaln(eps0)
    log_b0 = _log_wishart_b(logdet_w0inv, v0, d)

    lt1 = np.sum(z_ni * ll_elbo)
    lt2 = np.sum(nj * log_omega)
    lt3 = kr * log_c_eta0 + (eta0 - 1.0) * np.sum(log_pi)
    lt4 = kr * sr * log_c_eps0 + (eps0 - 1.0) * np.sum(log_a)

    dm = m - m0
    m_w_m = np.einsum("jrd,jrde,jre->jr", dm, w, dm)
    tr_w0inv_w = np.einsum("d,jrdd->jr", w0inv_diag, w)
    const2 = d * np.log(lam0 / (2 * np.pi))
    lt51 = 0.5 * np.sum(const2 + log_lam - d * lam0 / lam
                        - lam0 * v * m_w_m)
    lt52 = (kr * sr * log_b0 + 0.5 * (v0 - d - 1.0) * np.sum(log_lam)
            - 0.5 * np.sum(v * tr_w0inv_w))
    lt5 = lt51 + lt52

    lt6 = log_c_alpha0 + (alpha0 - 1.0) * np.sum(log_omega)
    lt7 = np.sum(hat_z * np.log(hat_z))
    lt8 = _log_dirichlet_const(alpha) + np.sum((alpha - 1.0) * log_omega)
    lt9 = (np.sum(_log_dirichlet_const(eta))
           + np.sum((eta - 1.0) * log_pi)
           + np.sum(_log_dirichlet_const(eps))
           + np.sum((eps - 1.0) * log_a))

    log_bk = _log_wishart_b(-_logdet_psd(w), v, d)
    h_ent = np.sum(-log_bk - 0.5 * (v - d - 1.0) * log_lam + 0.5 * v * d)
    lt10 = 0.5 * np.sum(log_lam + d * np.log(lam / (2 * np.pi))) \
        - 0.5 * d * kr * sr - h_ent

    return float(lt1 + lt2 + lt3 + lt4 + lt5 + lt6 - lt7 - lt8 - lt9
                 - lt10)
