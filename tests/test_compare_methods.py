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


# ---------------------------------------------------------------------------
# degenerate repair (hem_fix_degenerate_component.m / hem_fix_degenerate_hmm.m)
# ---------------------------------------------------------------------------

def test_fix_degenerate_components_identity_when_healthy(bank):
    hmms, _ = bank
    base = vbhem.h3m_from_hmms(hmms)
    h3m = vhem.init_baseem(jax.random.key(5), base, 3, 2, HEMConfig())
    fixed = vhem.fix_degenerate_components(h3m, jax.random.key(6))
    np.testing.assert_allclose(np.asarray(fixed.omega),
                               np.asarray(h3m.omega), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(fixed.hmm.mean),
                                  np.asarray(h3m.hmm.mean))
    np.testing.assert_array_equal(np.asarray(fixed.hmm.trans),
                                  np.asarray(h3m.hmm.trans))


def test_fix_degenerate_components_splits_heaviest(bank):
    hmms, _ = bank
    base = vbhem.h3m_from_hmms(hmms)
    h3m = vhem.init_baseem(jax.random.key(5), base, 3, 2, HEMConfig())
    omega = np.array([0.0, 0.7, 0.3])
    h3m = h3m._replace(omega=jnp.asarray(omega, h3m.omega.dtype))
    fixed = vhem.fix_degenerate_components(h3m, jax.random.key(6))
    w = np.asarray(fixed.omega)
    assert np.all(w > 0) and w.sum() == pytest.approx(1.0)
    assert w[0] == pytest.approx(0.35) and w[1] == pytest.approx(0.35)
    # degenerate cluster copies the donor's emissions
    np.testing.assert_array_equal(np.asarray(fixed.hmm.mean[0]),
                                  np.asarray(h3m.hmm.mean[1]))
    # rows of the fresh A are stochastic
    np.testing.assert_allclose(np.asarray(fixed.hmm.trans[0]).sum(-1),
                               1.0, rtol=1e-5)


def test_fix_degenerate_states_splits_heaviest(bank):
    hmms, _ = bank
    base = vbhem.h3m_from_hmms(hmms)
    h3m = vhem.init_baseem(jax.random.key(7), base, 2, 3, HEMConfig())
    counts = jnp.asarray([[5.0, 0.0, 1.0], [2.0, 3.0, 4.0]])
    fixed = vhem.fix_degenerate_states(h3m, counts, jax.random.key(8))
    prior = np.asarray(fixed.hmm.prior)
    trans = np.asarray(fixed.hmm.trans)
    np.testing.assert_allclose(prior.sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(trans.sum(-1), 1.0, rtol=1e-5)
    # cluster 0, state 1 was repaired from donor state 0
    assert prior[0, 1] > 0
    np.testing.assert_allclose(np.asarray(fixed.hmm.mean[0, 1]),
                               np.asarray(h3m.hmm.mean[0, 0]), rtol=0.02)
    np.testing.assert_array_equal(np.asarray(fixed.hmm.cov[0, 1]),
                                  np.asarray(h3m.hmm.cov[0, 0]))
    # healthy cluster 1 untouched
    np.testing.assert_array_equal(np.asarray(fixed.hmm.mean[1]),
                                  np.asarray(h3m.hmm.mean[1]))


def test_vhem_em_recovers_from_collapsed_init(bank):
    """An init with one cluster far from all data collapses its omega;
    the degenerate repair must keep the model finite and all clusters
    populated (the role of hem_fix_degenerate_component in the EM)."""
    hmms, _ = bank
    base = vbhem.h3m_from_hmms(hmms)
    cfg = HEMConfig(trials=1, nv=100, tau=10, max_iter=30)
    init = vhem.init_baseem(jax.random.key(9), base, 3, 2, cfg)
    far_mean = init.hmm.mean.at[0].set(1e4)
    init = init._replace(hmm=init.hmm._replace(mean=far_mean))
    st = vhem.vhem_em(base, init, cfg, key=jax.random.key(10))
    assert np.isfinite(float(st.ll))
    assert np.all(np.asarray(st.h3m.omega) > 0)
    np.testing.assert_allclose(
        np.asarray(st.h3m.hmm.trans).sum(-1), 1.0, rtol=1e-4)


def test_init_highp_and_trick(bank):
    hmms, _ = bank
    base = vbhem.h3m_from_hmms(hmms)
    # skew the base weights so 'highp' has a defined order
    omega = np.linspace(1, 2, base.num_hmms)
    base = base._replace(omega=jnp.asarray(omega / omega.sum(),
                                           base.omega.dtype))
    cfg = HEMConfig()
    h_hp = vhem.init_highp(jax.random.key(0), base, 3, 2, cfg)
    np.testing.assert_allclose(np.asarray(h_hp.omega), 1 / 3, rtol=1e-6)
    # centers = the 3 heaviest base HMMs (last three of the linspace)
    np.testing.assert_array_equal(
        np.sort(np.asarray(h_hp.hmm.mean), axis=0),
        np.sort(np.asarray(base.hmm.mean[-3:]), axis=0))
    h_tr = vhem.init_trick(jax.random.key(0), base, 3, 2, cfg)
    assert np.asarray(h_tr.omega).sum() == pytest.approx(1.0)
    np.testing.assert_array_equal(np.asarray(h_tr.hmm.mean),
                                  np.asarray(base.hmm.mean)[[0, 4, 8]])


def test_vhem_gmmNew2_and_auto(bank):
    """'gmmNew2' produces a valid init and 'auto' (try baseem/gmmNew/
    gmmNew2, keep best LL; vhem_cluster.m:210-233) still recovers the
    clusters."""
    hmms, labels = bank
    base = vbhem.h3m_from_hmms(hmms)
    cfg = HEMConfig(trials=4, nv=100, tau=10)
    init = vhem.init_gmmNew2(jax.random.key(2), base, 2, 2, cfg)
    assert np.asarray(init.omega).sum() == pytest.approx(1.0)
    np.testing.assert_allclose(np.asarray(init.hmm.trans).sum(-1), 1.0,
                               rtol=1e-6)
    # the 2*2=4 reduced Gaussians are distinct blocks (not broadcast)
    means = np.asarray(init.hmm.mean).reshape(-1, 2)
    assert len(np.unique(means.round(6), axis=0)) > 1
    res = vhem.cluster(jax.random.key(0), base, 2, 2, cfg, initmode="auto")
    ri, _, _, _ = rand_index(np.asarray(res.label), labels)
    assert ri == pytest.approx(1.0), np.asarray(res.label)


def test_ppk_gram_batched_matches_loop(bank):
    """The one-dispatch padded Gram matrix must equal the host pair
    loop, including on heterogeneous state counts (padding inertness)."""
    hmms, _ = bank
    # add a 3-state HMM to exercise the state padding
    h3 = HMM(prior=jnp.asarray([0.5, 0.3, 0.2]),
             trans=jnp.asarray([[0.6, 0.3, 0.1], [0.2, 0.6, 0.2],
                                [0.1, 0.3, 0.6]]),
             mean=jnp.asarray([[0.0, 0.0], [3.0, 3.0], [1.0, -2.0]]),
             cov=jnp.broadcast_to(jnp.eye(2), (3, 2, 2)))
    sub = list(hmms[:4]) + [h3]
    a_loop = ppk._gram_matrix_loop(sub)
    a_bat = ppk.gram_matrix(sub)
    np.testing.assert_allclose(a_bat, a_loop, rtol=1e-8, atol=1e-12)


def test_skl_batched_matches_loop(bank):
    """The one-dispatch LLm-table SKL distance matrix must equal the
    reference-style pair loop when each HMM carries its own data."""
    from vbhem_tpu.containers import SeqBatch
    from vbhem_tpu.models import hmm_tools
    hmms, _ = bank
    sub = list(hmms[:5])
    data = []
    for i, h in enumerate(sub):
        _, x = hmm_tools.sample(jax.random.key(100 + i), h, t=30, n=8)
        data.append(SeqBatch(x=x, lengths=jnp.full((8,), 30, jnp.int32)))
    key = jax.random.key(7)
    d_loop = ccfd._skl_distance_matrix_loop(key, sub, data)
    d_bat = ccfd.skl_distance_matrix(key, sub, data)
    np.testing.assert_allclose(d_bat, d_loop, rtol=1e-8, atol=1e-10)


def test_dic_synthetic_path(bank):
    """The issyn variant (`myDIC.m:98-154`) uses inv(expected cov) as
    the Sigma plug-in; it must still prefer the true K and differ from
    the vb path only through the Sigma term."""
    hmms, labels = bank
    base = vbhem.h3m_from_hmms(hmms)
    cfg = VBHEMConfig(alpha0=1e6, m0=(1.5, 1.5), w0=1.0, trials=6,
                      nv=100, tau=10, initmode="baseem", learn_hyps=False)
    dics = {}
    for k in [1, 2]:
        st = vbhem.select_best_trial(
            vbhem.fit_single_ks(jax.random.key(4), base, k, 2, cfg))
        res = vbhem.finalize(st)
        pd_vb, d_vb = dic.dic(base, res, tau=cfg.tau, lambda0=cfg.lambda0)
        pd_sy, d_sy = dic.dic(base, res, tau=cfg.tau, lambda0=cfg.lambda0,
                              synthetic=True)
        assert np.isfinite(d_sy) and d_sy != d_vb
        dics[k] = d_sy
    assert dics[2] < dics[1], dics


def test_vhem_kr_eq_kb_identity_shortcut(bank):
    """`hem_h3m_c.m:19-25`: K == Kb returns the inputs unchanged with
    identity assignments and LogL = 0."""
    hmms, labels = bank
    base = vbhem.h3m_from_hmms(hmms)
    cfg = HEMConfig(trials=2, nv=10, tau=5)
    res = vhem.cluster(jax.random.key(0), base, len(hmms), 2, cfg)
    assert float(res.ll) == 0.0
    np.testing.assert_array_equal(np.asarray(res.label),
                                  np.arange(len(hmms)))
    np.testing.assert_allclose(np.asarray(res.h3m.hmm.mean),
                               np.asarray(base.hmm.mean))
    np.testing.assert_array_equal(np.asarray(res.z), np.eye(len(hmms)))


def test_vhem_manova_moments(bank):
    """compute_stats returns the Z-weighted emission moments
    (`hem_mstep_component.m:115-116,169-174`): for the fitted model,
    emit_mu2 must be PSD-ish per state and consistent with the moment
    identity mu2 >= mu mu^T in the Loewner sense up to noise."""
    hmms, labels = bank
    base = vbhem.h3m_from_hmms(hmms)
    cfg = HEMConfig(trials=6, nv=100, tau=10)
    res = vhem.cluster(jax.random.key(0), base, 2, 2, cfg)
    stats = vhem.compute_stats(res, base, tau=cfg.tau, smooth=cfg.smooth)
    mu2 = stats["emit_mu2"]                    # [Kr, Sr, D, D]
    mu = stats["emit_mu"]
    assert mu2.shape == (2, 2, 2, 2)
    # second moment of base means around the learned centre: the
    # "covariance of the assigned base means" must be PSD
    cov_means = mu2 - mu[..., :, None] * mu[..., None, :]
    evs = np.linalg.eigvalsh(cov_means.reshape(-1, 2, 2))
    assert evs.min() > -1e-6, evs.min()
    # weights normalized
    np.testing.assert_allclose(stats["weights"].sum(), 1.0, rtol=1e-9)


def test_vhem_gmm_init_ladder_mode(bank):
    """'gmm' initializer (`initialize_hem_h3m_c.m:495-593`) — the
    NaN-retry ladder's fallback (`hem_h3m_c.m:304-320`): every
    (cluster, state) starts from the SAME pooled Gaussian (weighted
    moment match of the base bank at M=1), random dynamics; EM from it
    must still converge to a finite, valid solution (it is a rescue
    initializer, so solution QUALITY is not asserted — symmetric
    emission starts may merge clusters, which the reference accepts
    too: the ladder returns whatever stops NaNing)."""
    hmms, labels = bank
    base = vbhem.h3m_from_hmms(hmms)
    cfg = HEMConfig(trials=8, nv=100, tau=10, initmode="gmm")

    # init structure: all emissions identical = pooled Gaussian
    h0 = vhem.init_gmm(jax.random.key(5), base, 2, 2, cfg)
    mean = np.asarray(h0.hmm.mean)
    assert np.allclose(mean, mean[0, 0])
    # oracle: the pooled Gaussian is the long-run-weighted moment match
    w = []
    for i in range(base.omega.shape[0]):
        p = np.asarray(base.hmm.prior)[i]
        a = np.asarray(base.hmm.trans)[i]
        for _ in range(50):
            p = p @ a
        w.append(p)
    w = (np.asarray(w) * np.asarray(base.state_mask)).reshape(-1)
    w = w / w.sum()
    mu_pool = (w[:, None] * np.asarray(base.hmm.mean).reshape(-1, 2)).sum(0)
    np.testing.assert_allclose(mean[0, 0], mu_pool, rtol=1e-4)

    res = vhem.cluster(jax.random.key(6), base, 2, 2, cfg)
    assert np.isfinite(float(res.ll))
    om = np.asarray(res.h3m.omega)
    np.testing.assert_allclose(om.sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res.h3m.hmm.trans).sum(-1), 1.0, rtol=1e-5)
