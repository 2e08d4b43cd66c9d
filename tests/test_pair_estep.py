"""Pair E-step kernel tests: explicit-loop NumPy oracle + invariants.

The oracle re-implements the hierarchical backward/forward recursion of
`vbhem_hmm_bwd_fwd_fast.m` with naive per-index loops, following the
equations (not the code), mirroring the reference's dual-implementation
discipline (`vbhem_h3m_c_step_fc.m:250-262`)."""
import numpy as np
import jax.numpy as jnp
import pytest

from vbhem_tpu.ops.pair_estep import (expected_pair_ll_point,
                                      expected_pair_ll_variational,
                                      pair_bwd_fwd)


def oracle_pair(prior_b, trans_b, log_pi_r, log_a_r, ell, tau):
    """One (i,j) pair, explicit loops.  ell: [Sb, Sr]."""
    sb, sr = ell.shape

    def lse(v):
        m = v.max()
        return m + np.log(np.exp(v - m).sum())

    ll_old = np.zeros((sb, sr))
    thetas = {}  # t -> [rho_prev, beta_t, rho_t]
    for t in range(tau, 1, -1):
        logtheta = np.zeros((sr, sb, sr))
        for rp in range(sr):
            for b in range(sb):
                for rc in range(sr):
                    logtheta[rp, b, rc] = (log_a_r[rp, rc] + ell[b, rc]
                                           + ll_old[b, rc])
        lse_v = np.zeros((sr, sb))
        for rp in range(sr):
            for b in range(sb):
                lse_v[rp, b] = lse(logtheta[rp, b])
        thetas[t] = np.exp(logtheta - lse_v[..., None])
        ll_new = np.zeros((sb, sr))
        for bp in range(sb):
            for rp in range(sr):
                ll_new[bp, rp] = sum(trans_b[bp, b] * lse_v[rp, b]
                                     for b in range(sb))
        ll_old = ll_new

    # terminate
    logtheta1 = np.zeros((sb, sr))
    for b in range(sb):
        for r in range(sr):
            logtheta1[b, r] = log_pi_r[r] + ell[b, r] + ll_old[b, r]
    lse1 = np.array([lse(logtheta1[b]) for b in range(sb)])
    theta1 = np.exp(logtheta1 - lse1[:, None])
    ll_elbo = float(prior_b @ lse1)

    # forward
    nu = np.zeros((sr, sb))
    for r in range(sr):
        for b in range(sb):
            nu[r, b] = prior_b[b] * theta1[b, r]
    nu_1 = nu.sum(axis=1)
    sum_t_nu = nu.copy()
    sum_xi = np.zeros((sr, sr))
    for t in range(2, tau + 1):
        foo = nu @ trans_b                       # [rho_prev, b_cur]
        xi = np.zeros((sr, sb, sr))
        for rp in range(sr):
            for b in range(sb):
                for rc in range(sr):
                    xi[rp, b, rc] = foo[rp, b] * thetas[t][rp, b, rc]
        sum_xi += xi.sum(axis=1)
        nu = xi.sum(axis=0).T                    # [rho_cur, b_cur]
        sum_t_nu += nu
    return ll_elbo, nu_1, sum_xi, sum_t_nu


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    kb, kr, sb, sr, tau = 4, 3, 3, 2, 6
    prior_b = rng.dirichlet(np.ones(sb), size=kb)
    trans_b = rng.dirichlet(np.ones(sb), size=(kb, sb))
    # sub-normalized reduced scores (like digamma expectations)
    log_pi_r = np.log(rng.dirichlet(np.ones(sr), size=kr) * 0.9)
    log_a_r = np.log(rng.dirichlet(np.ones(sr), size=(kr, sr)) * 0.85)
    ell = rng.normal(size=(kb, kr, sb, sr)) - 2.0
    return prior_b, trans_b, log_pi_r, log_a_r, ell, tau


def test_pair_bwd_fwd_matches_oracle(problem):
    prior_b, trans_b, log_pi_r, log_a_r, ell, tau = problem
    out = pair_bwd_fwd(jnp.asarray(prior_b), jnp.asarray(trans_b),
                       jnp.asarray(log_pi_r), jnp.asarray(log_a_r),
                       jnp.asarray(ell), tau)
    kb, kr = ell.shape[:2]
    for i in range(kb):
        for j in range(kr):
            ll, nu1, sxi, stn = oracle_pair(prior_b[i], trans_b[i],
                                            log_pi_r[j], log_a_r[j],
                                            ell[i, j], tau)
            np.testing.assert_allclose(float(out.ll_elbo[i, j]), ll, rtol=1e-10)
            np.testing.assert_allclose(np.asarray(out.nu_1)[i, j], nu1,
                                       atol=1e-12)
            np.testing.assert_allclose(np.asarray(out.sum_xi)[i, j], sxi,
                                       atol=1e-12)
            np.testing.assert_allclose(np.asarray(out.sum_t_nu)[i, j], stn,
                                       atol=1e-12)


def test_pair_counts_invariants(problem):
    """With a normalized base HMM, nu_1 sums to 1, sum_t_nu to tau, and
    sum_xi to tau-1 over all states (per pair)."""
    prior_b, trans_b, log_pi_r, log_a_r, ell, tau = problem
    out = pair_bwd_fwd(jnp.asarray(prior_b), jnp.asarray(trans_b),
                       jnp.asarray(log_pi_r), jnp.asarray(log_a_r),
                       jnp.asarray(ell), tau)
    np.testing.assert_allclose(np.asarray(out.nu_1).sum(-1), 1.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.sum_t_nu).sum((-1, -2)), tau,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.sum_xi).sum((-1, -2)), tau - 1,
                               atol=1e-9)


def test_padded_base_states_inert(problem):
    """Zero-padding base states (prior/A rows zero) must not change any
    output for real states."""
    prior_b, trans_b, log_pi_r, log_a_r, ell, tau = problem
    kb, kr, sb, sr = ell.shape
    out1 = pair_bwd_fwd(jnp.asarray(prior_b), jnp.asarray(trans_b),
                        jnp.asarray(log_pi_r), jnp.asarray(log_a_r),
                        jnp.asarray(ell), tau)
    # pad base with one dead state
    pb = np.concatenate([prior_b, np.zeros((kb, 1))], axis=1)
    tb = np.zeros((kb, sb + 1, sb + 1))
    tb[:, :sb, :sb] = trans_b
    el = np.concatenate([ell, np.full((kb, kr, 1, sr), 3.3)], axis=2)
    out2 = pair_bwd_fwd(jnp.asarray(pb), jnp.asarray(tb),
                        jnp.asarray(log_pi_r), jnp.asarray(log_a_r),
                        jnp.asarray(el), tau)
    np.testing.assert_allclose(np.asarray(out2.ll_elbo),
                               np.asarray(out1.ll_elbo), atol=1e-10)
    np.testing.assert_allclose(np.asarray(out2.nu_1),
                               np.asarray(out1.nu_1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out2.sum_xi),
                               np.asarray(out1.sum_xi), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out2.sum_t_nu)[..., :sb],
                               np.asarray(out1.sum_t_nu), atol=1e-12)
    assert np.allclose(np.asarray(out2.sum_t_nu)[..., sb], 0.0)


def test_expected_pair_ll_point_matches_direct():
    """VHEM flavor: E_{N(mb,Sb)}[log N(y|mr,Sr)] against the closed form."""
    rng = np.random.default_rng(4)
    kb, kr, sb, sr, d = 2, 2, 2, 2, 2
    mean_b = rng.normal(size=(kb, sb, d))
    a = rng.normal(size=(kb, sb, d, d))
    cov_b = np.einsum("ksde,ksfe->ksdf", a, a) + 2 * np.eye(d)
    mean_r = rng.normal(size=(kr, sr, d))
    a = rng.normal(size=(kr, sr, d, d))
    cov_r = np.einsum("ksde,ksfe->ksdf", a, a) + 2 * np.eye(d)
    got = np.asarray(expected_pair_ll_point(
        jnp.asarray(mean_b), jnp.asarray(cov_b),
        jnp.asarray(mean_r), jnp.asarray(cov_r)))
    for i in range(kb):
        for j in range(kr):
            for b in range(sb):
                for r in range(sr):
                    prec = np.linalg.inv(cov_r[j, r])
                    diff = mean_b[i, b] - mean_r[j, r]
                    want = -0.5 * (d * np.log(2 * np.pi)
                                   + np.log(np.linalg.det(cov_r[j, r]))
                                   + np.trace(prec @ cov_b[i, b])
                                   + diff @ prec @ diff)
                    np.testing.assert_allclose(got[i, j, b, r], want,
                                               rtol=1e-9)


def test_expected_pair_ll_variational_matches_direct():
    from scipy.special import digamma
    rng = np.random.default_rng(5)
    kb, kr, sb, sr, d = 2, 2, 2, 2, 2
    mean_b = rng.normal(size=(kb, sb, d))
    a = rng.normal(size=(kb, sb, d, d))
    cov_b = np.einsum("ksde,ksfe->ksdf", a, a) + 2 * np.eye(d)
    m_r = rng.normal(size=(kr, sr, d))
    a = rng.normal(size=(kr, sr, d, d))
    w_r = np.einsum("ksde,ksfe->ksdf", a, a) + 2 * np.eye(d)
    v_r = np.abs(rng.normal(size=(kr, sr))) + d + 2
    lam_r = np.abs(rng.normal(size=(kr, sr))) + 1
    loglam = np.zeros((kr, sr))
    for j in range(kr):
        for r in range(sr):
            loglam[j, r] = (digamma(0.5 * (v_r[j, r] + 1
                                           - np.arange(1, d + 1))).sum()
                            + d * np.log(2)
                            + np.log(np.linalg.det(w_r[j, r])))
    got = np.asarray(expected_pair_ll_variational(
        jnp.asarray(mean_b), jnp.asarray(cov_b), jnp.asarray(m_r),
        jnp.asarray(w_r), jnp.asarray(v_r), jnp.asarray(lam_r),
        jnp.asarray(loglam)))
    for i in range(kb):
        for j in range(kr):
            for b in range(sb):
                for r in range(sr):
                    diff = mean_b[i, b] - m_r[j, r]
                    want = -0.5 * (d * np.log(2 * np.pi) - loglam[j, r]
                                   + d / lam_r[j, r]
                                   + v_r[j, r] * (np.trace(w_r[j, r] @ cov_b[i, b])
                                                  + diff @ w_r[j, r] @ diff))
                    np.testing.assert_allclose(got[i, j, b, r], want, rtol=1e-9)
