"""VHEM / PPK-SC / CCFD / DIC baseline tests: each method must recover
the 2-cluster structure of the synthetic GT bank (the role these play
in `Synthetic_experiment/exprmt1_demo.m:114-258`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbhem_tpu.config import HEMConfig, VBHEMConfig
from vbhem_tpu.containers import HMM
from vbhem_tpu.models import ccfd, dic, ppk, vbhem, vhem
from vbhem_tpu.utils.metrics import rand_index
from tests.test_vbhem import gt_hmm


@pytest.fixture(scope="module")
def bank():
    """12 noisy copies of two GT HMMs differing in means AND dynamics
    (differing means makes PPK/CCFD discriminative at small sample
    sizes)."""
    rng = np.random.default_rng(0)
    hmms, labels = [], []
    for gi, (trans, shift) in enumerate([
            ([[0.6, 0.4], [0.4, 0.6]], 0.0),
            ([[0.3, 0.7], [0.7, 0.3]], 2.0)]):
        for si in range(6):
            h = gt_hmm(trans)
            mean = np.asarray(h.mean) + shift + rng.normal(0, 0.15, (2, 2))
            trans_n = np.asarray(h.trans) + rng.uniform(0, 0.05, (2, 2))
            trans_n = trans_n / trans_n.sum(-1, keepdims=True)
            hmms.append(HMM(prior=h.prior, trans=jnp.asarray(trans_n),
                            mean=jnp.asarray(mean), cov=h.cov))
            labels.append(gi)
    return hmms, np.array(labels)


def test_vhem_recovers_clusters(bank):
    hmms, labels = bank
    base = vbhem.h3m_from_hmms(hmms)
    cfg = HEMConfig(trials=8, nv=100, tau=10)
    res = vhem.cluster(jax.random.key(0), base, 2, 2, cfg)
    ri, _, _, _ = rand_index(np.asarray(res.label), labels)
    assert ri == pytest.approx(1.0), np.asarray(res.label)
    # omega should split roughly evenly
    np.testing.assert_allclose(np.asarray(res.h3m.omega), 0.5, atol=0.1)


def test_vhem_ll_monotone(bank):
    hmms, _ = bank
    base = vbhem.h3m_from_hmms(hmms)
    cfg = HEMConfig(trials=1, nv=100, tau=10, max_iter=30)
    init = vhem.init_baseem(jax.random.key(3), base, 2, 2, cfg)
    st = vhem.vhem_em(base, init, cfg)
    assert np.isfinite(float(st.ll))
    assert float(st.ll) >= float(st.last_ll) - 1e-6 * abs(float(st.last_ll))


def test_ppk_sc_recovers_clusters(bank):
    hmms, labels = bank
    res = ppk.ppk_sc(jax.random.key(1), hmms, 2)
    ri, _, _, _ = rand_index(res.label, labels)
    assert ri == pytest.approx(1.0), res.label
    # centers belong to their own clusters
    assert res.label[res.center_idx[0]] != res.label[res.center_idx[1]]


def test_ppk_gram_symmetric_positive(bank):
    hmms, _ = bank
    a = ppk.gram_matrix(hmms[:5])
    np.testing.assert_allclose(a, a.T, rtol=1e-10)
    assert np.all(a > 0)
    # self-affinity should dominate cross-cluster affinity
    assert a[0, 0] > a[0, 4] or a[4, 4] > a[0, 4]


def test_ccfd_recovers_clusters(bank):
    hmms, labels = bank
    res = ccfd.ccfd(jax.random.key(2), hmms, slope=3.0, n_samples=60)
    assert len(res.center_idx) == 2, res.center_idx
    ri, _, _, _ = rand_index(res.label, labels)
    assert ri == pytest.approx(1.0), res.label


def test_dic_prefers_true_k(bank):
    """DIC (min is better) should prefer K=2 over K=1 and K=4 on the
    2-cluster bank, using VBHEM fits."""
    hmms, labels = bank
    base = vbhem.h3m_from_hmms(hmms)
    cfg = VBHEMConfig(alpha0=1e6, m0=(1.5, 1.5), w0=1.0, trials=6,
                      nv=100, tau=10, initmode="baseem", learn_hyps=False)
    dics = {}
    for k in [1, 2, 4]:
        st = vbhem.select_best_trial(
            vbhem.fit_single_ks(jax.random.key(4), base, k, 2, cfg))
        res = vbhem.finalize(st)
        _, dval = dic.dic(base, res, tau=cfg.tau, lambda0=cfg.lambda0)
        dics[k] = dval
    assert dics[2] < dics[1], dics
    assert dics[2] <= dics[4] + 1e-6, dics


def test_vhem_gmmnew_init(bank):
    """gmmNew initializer (mixture-hierarchies GMM reduction) also
    recovers the clustering (`initialize_hem_h3m_c.m:276-494`)."""
    hmms, labels = bank
    base = vbhem.h3m_from_hmms(hmms)
    cfg = HEMConfig(trials=8, nv=100, tau=10, initmode="gmmNew")
    res = vhem.cluster(jax.random.key(3), base, 2, 2, cfg)
    ri, _, _, _ = rand_index(np.asarray(res.label), labels)
    assert ri == pytest.approx(1.0), np.asarray(res.label)


def test_vhem_split_mode(bank):
    """'split' incremental growing recovers the clustering
    (`hem_h3m_c.m:91-226`)."""
    hmms, labels = bank
    base = vbhem.h3m_from_hmms(hmms)
    cfg = HEMConfig(trials=1, nv=100, tau=10)
    res = vhem.cluster_split(jax.random.key(0), base, 2, 2, cfg)
    ri, _, _, _ = rand_index(np.asarray(res.label), labels)
    assert ri == pytest.approx(1.0), np.asarray(res.label)
    assert res.h3m.hmm.prior.shape == (2, 2)
