"""Diagonal-covariance mode (covar_type='diag') end-to-end.

Reference semantics: in diag mode the Wishart scale W is a vector —
scatter enters the M-step as diag(S) and the stored W is the diagonal
of the inverse (`vbhem_mstep_component.m:55-63`); every downstream
formula then evaluates the diag vector re-embedded as a diagonal matrix
(`vbhemh3m_lb.m:127`).  Here the embedding is kept dense throughout, so
'diag' must (a) produce exactly diagonal W / covariances and (b) match
the reference's diag update formula.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbhem_tpu.config import HEMConfig, VBConfig, VBHEMConfig
from vbhem_tpu.containers import HMM, SeqBatch
from vbhem_tpu.models import hmm_tools, vbhem, vbhmm, vhem


def _offdiag_max(a):
    a = np.asarray(a)
    d = a.shape[-1]
    return float(np.abs(a * (1.0 - np.eye(d))).max())


def gt_hmm_diag():
    """2-state HMM with diagonal (anisotropic) emission covariances."""
    return HMM(prior=jnp.asarray([0.5, 0.5]),
               trans=jnp.asarray([[0.7, 0.3], [0.3, 0.7]]),
               mean=jnp.asarray([[0.0, 0.0], [4.0, 4.0]]),
               cov=jnp.asarray([np.diag([1.0, 0.25]),
                                np.diag([0.5, 2.0])]))


@pytest.fixture(scope="module")
def batch():
    _, x = hmm_tools.sample(jax.random.key(0), gt_hmm_diag(), t=60, n=40)
    return SeqBatch(x=x, lengths=jnp.full((40,), 60, jnp.int32))


def test_vbem_mstep_diag_matches_reference_formula(batch):
    cfg = VBConfig(mu0=(2.0, 2.0), w0=1.0, covar_type="diag")
    hyps = vbhmm.VBHyps.from_config(cfg, 2)
    post0 = vbhmm.random_init(jax.random.key(1), batch, 2, hyps, "diag")
    fb = vbhmm.e_step(batch, post0)
    stats = vbhmm.suff_stats(batch, fb)
    post = vbhmm.m_step(stats, hyps, "diag")

    # manual reference formula (vbhem_mstep_component.m diag case)
    nk = np.asarray(stats.nk)
    s = np.asarray(stats.s)
    xbar = np.asarray(stats.xbar)
    m0 = np.asarray(hyps.m0)
    w0inv = np.diag(np.asarray(hyps.w0inv_diag))
    for k in range(2):
        mult1 = float(hyps.beta0) * nk[k] / (float(hyps.beta0) + nk[k])
        diff = (xbar[k] - m0)[:, None]
        a = w0inv + nk[k] * np.diag(np.diag(s[k])) + mult1 * (diff @ diff.T)
        w_ref = np.diag(np.diag(np.linalg.inv(a)))
        np.testing.assert_allclose(np.asarray(post.niw.w[k]), w_ref,
                                   rtol=1e-10)
    assert _offdiag_max(post.niw.w) == 0.0


def test_vbem_diag_recovers_diagonal_covs(batch):
    cfg = VBConfig(mu0=(2.0, 2.0), w0=1.0, numtrials=5, covar_type="diag")
    res, _ = vbhmm.learn(jax.random.key(2), batch, 2, cfg)
    cov = np.asarray(res.model.cov)
    assert _offdiag_max(cov) < 1e-12, "diag mode must produce diag covs"
    # recover the GT variances (order-insensitive via sorted diags)
    got = np.sort(np.stack([np.diag(c) for c in cov]).ravel())
    want = np.sort(np.array([1.0, 0.25, 0.5, 2.0]))
    np.testing.assert_allclose(got, want, rtol=0.35)
    # means recovered
    means = np.asarray(res.model.mean)
    d2 = np.linalg.norm(np.sort(means, axis=0)
                        - np.array([[0, 0], [4, 4]]), axis=-1)
    assert d2.max() < 0.5


def test_vbem_diag_vs_full_parity_on_diagonal_data(batch):
    """On axis-aligned data the two modes must agree closely."""
    kw = dict(mu0=(2.0, 2.0), w0=1.0, numtrials=5)
    res_f, _ = vbhmm.learn(jax.random.key(3), batch, 2,
                           VBConfig(covar_type="full", **kw))
    res_d, _ = vbhmm.learn(jax.random.key(3), batch, 2,
                           VBConfig(covar_type="diag", **kw))
    mf = np.sort(np.asarray(res_f.model.mean), axis=0)
    md = np.sort(np.asarray(res_d.model.mean), axis=0)
    np.testing.assert_allclose(mf, md, atol=0.15)
    vf = np.sort(np.stack([np.diag(c)
                           for c in np.asarray(res_f.model.cov)]).ravel())
    vd = np.sort(np.stack([np.diag(c)
                           for c in np.asarray(res_d.model.cov)]).ravel())
    np.testing.assert_allclose(vf, vd, rtol=0.15)


@pytest.fixture(scope="module")
def base_bank(batch):
    cfg = VBConfig(mu0=(2.0, 2.0), w0=1.0, numtrials=3, covar_type="diag")
    results = []
    for i in range(6):
        key = jax.random.key(10 + i)
        _, x = hmm_tools.sample(key, gt_hmm_diag(), t=40, n=15)
        b = SeqBatch(x=x, lengths=jnp.full((15,), 40, jnp.int32))
        res, _ = vbhmm.learn(jax.random.fold_in(key, 1), b, 2, cfg)
        results.append(res)
    return results


def test_vbhem_diag_em(base_bank):
    cfg = VBHEMConfig(alpha0=1e6, m0=(2.0, 2.0), w0=1.0, nv=10, tau=5,
                      trials=4, covar_type="diag", learn_hyps=False,
                      initmode="baseem")
    base = vbhem.h3m_from_results(base_bank, covar_type="diag")
    assert _offdiag_max(base.hmm.cov) == 0.0
    hyps = vbhem.VBHEMHyps.from_config(cfg, 2)
    st = vbhem.fit_single_ks(jax.random.key(4), base, 2, 2, cfg, hyps,
                             initmode="baseem")
    best = vbhem.select_best_trial(st)
    assert np.isfinite(float(best.ll))
    assert _offdiag_max(best.post.niw.w) == 0.0
    # cluster() end-to-end with diag
    res, info = vbhem.cluster(jax.random.key(5), base, [1, 2], 2, cfg, hyps)
    assert _offdiag_max(res.post.niw.w) == 0.0
    assert np.isfinite(info["model_ll"]).any()


def test_vhem_diag(base_bank):
    cfg = HEMConfig(trials=4, nv=10, tau=5, covar_type="diag",
                    initmode="baseem")
    base = vbhem.h3m_from_results(base_bank, use_post=False,
                                  covar_type="diag")
    res = vhem.cluster(jax.random.key(6), base, 2, 2, cfg)
    assert _offdiag_max(res.h3m.hmm.cov) == 0.0
