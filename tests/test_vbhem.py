"""VBHEM engine tests: ELBO monotonicity and ground-truth cluster
recovery — the acceptance test of the reference's synthetic benchmark
(`Synthetic_experiment/exprmt1_*.m`, SURVEY.md section 4.1)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbhem_tpu.config import VBConfig, VBHEMConfig
from vbhem_tpu.containers import HMM, SeqBatch
from vbhem_tpu.models import hmm_tools, vbhem, vbhmm
from vbhem_tpu.utils.metrics import purity, rand_index


def gt_hmm(trans):
    return HMM(prior=jnp.asarray([0.5, 0.5]),
               trans=jnp.asarray(trans, jnp.float64),
               mean=jnp.asarray([[0.0, 0.0], [3.0, 3.0]]),
               cov=jnp.broadcast_to(jnp.eye(2), (2, 2, 2)))


@pytest.fixture(scope="module")
def learned_bank():
    """Mini version of the synthetic benchmark: 2 GT HMMs x 6 subjects
    each, VBEM per subject (exprmt1_demo.m:47 scale reduced for CI)."""
    h1 = gt_hmm([[0.6, 0.4], [0.4, 0.6]])
    h2 = gt_hmm([[0.4, 0.6], [0.6, 0.4]])
    cfg = VBConfig(mu0=(1.5, 1.5), w0=1.0, numtrials=3)
    results, labels = [], []
    for gi, h in enumerate([h1, h2]):
        for si in range(6):
            key = jax.random.key(100 + gi * 10 + si)
            _, x = hmm_tools.sample(key, h, t=50, n=15)
            batch = SeqBatch(x=x, lengths=jnp.full((15,), 50, jnp.int32))
            res, _ = vbhmm.learn(jax.random.fold_in(key, 1), batch, 2, cfg)
            results.append(res)
            labels.append(gi)
    return results, np.array(labels)


@pytest.fixture(scope="module")
def base(learned_bank):
    results, _ = learned_bank
    return vbhem.h3m_from_results(results, use_post=True)


@pytest.fixture(scope="module")
def vbhem_cfg():
    # The synthetic benchmark settings (exprmt1_demo.m:66-79):
    # alpha0=1e6, Nv=100, tau=T=50 — the large alpha0 keeps clusters
    # alive when they differ only in transition dynamics.
    return VBHEMConfig(alpha0=1e6, m0=(1.5, 1.5), w0=1.0, trials=8,
                       nv=100, tau=50, initmode="baseem",
                       learn_hyps=False)  # hyp-opt covered by test_hyp.py


def test_h3m_posterior_form(base, learned_bank):
    results, _ = learned_bank
    # posterior form: prior = exp(E[log pi]) is sub-normalized
    prior = np.asarray(base.hmm.prior)
    assert np.all(prior.sum(axis=1) <= 1.0 + 1e-12)
    # covariance scaled by (beta+1)/beta > plain expected covariance
    cov0 = np.asarray(results[0].post.niw.expected_cov())
    assert np.all(np.diagonal(np.asarray(base.hmm.cov)[0, 0]) >
                  np.diagonal(cov0[0]) - 1e-12)


def test_vbhem_elbo_monotone(base, vbhem_cfg):
    hyps = vbhem.VBHEMHyps.from_config(vbhem_cfg, 2)
    post = vbhem.init_baseem(jax.random.key(0), base, 2, 2, hyps,
                             vbhem_cfg.nv)
    tilde_n = (vbhem_cfg.nv * base.num_hmms) * base.omega
    lls = []
    for _ in range(40):
        exps = vbhem.reduced_expectations(post)
        pair = vbhem.e_step(base, post, exps, vbhem_cfg.tau)
        hat_z, z_ni, nj = vbhem.soft_assignments(tilde_n, exps.log_omega,
                                                 pair.ll_elbo)
        ll = float(vbhem.elbo(post, exps, pair, hat_z, z_ni, nj, hyps))
        lls.append(ll)
        stats = vbhem.aggregate_stats(base, pair, z_ni, nj)
        post = vbhem.m_step(stats, hyps)
        if len(lls) > 2 and abs((lls[-1] - lls[-2]) / lls[-2]) < 1e-9:
            break
    diffs = np.diff(lls)
    assert np.all(diffs >= -1e-6 * np.abs(np.array(lls[:-1]))), lls


def test_vbhem_recovers_clusters(base, learned_bank, vbhem_cfg):
    _, labels_true = learned_bank
    st = vbhem.select_best_trial(
        vbhem.fit_single_ks(jax.random.key(1), base, 2, 2, vbhem_cfg))
    res = vbhem.finalize(st)
    ri, _, _, _ = rand_index(np.asarray(res.label), labels_true)
    assert ri == pytest.approx(1.0), (np.asarray(res.label), labels_true)
    assert purity(np.asarray(res.label), labels_true) == pytest.approx(1.0)
    # cluster-center transition matrices recover the two GT dynamics
    trans = np.asarray(res.h3m.hmm.trans)
    diag_mass = np.array([np.trace(trans[j]) for j in range(2)])
    assert (diag_mass.max() > 1.05) and (diag_mass.min() < 0.95), trans


def test_vbhem_model_selection(base, learned_bank, vbhem_cfg):
    _, labels_true = learned_bank
    res, info = vbhem.cluster(jax.random.key(2), base, [1, 2, 3], 2,
                              vbhem_cfg)
    assert info["model_best_k"] == 2, info["model_ll"]
    ri, _, _, _ = rand_index(np.asarray(res.label), labels_true)
    assert ri == pytest.approx(1.0)


def test_empty_cluster_pruning(base, vbhem_cfg):
    """K=4 on 2-group data: extra clusters should end up (near) empty and
    prunable."""
    st = vbhem.select_best_trial(
        vbhem.fit_single_ks(jax.random.key(3), base, 4, 2, vbhem_cfg))
    res = vbhem.finalize(st)
    pruned = vbhem.remove_empty_clusters(res, cluster_thresh=1.0)
    assert pruned.nj.shape[-1] <= 4
    hz = np.asarray(pruned.hat_z)
    np.testing.assert_allclose(hz.sum(axis=1), 1.0, atol=1e-9)


def test_initializers_produce_valid_posteriors(base, vbhem_cfg):
    hyps = vbhem.VBHEMHyps.from_config(vbhem_cfg, 2)
    for name, fn in vbhem._INITIALIZERS.items():
        post = fn(jax.random.key(7), base, 3, 2, hyps, vbhem_cfg.nv)
        assert np.all(np.asarray(post.alpha) > 0), name
        assert np.all(np.asarray(post.eta) > 0), name
        assert np.all(np.asarray(post.epsilon) > 0), name
        assert np.all(np.asarray(post.niw.beta) > 0), name
        # W must be PSD
        eigs = np.linalg.eigvalsh(np.asarray(post.niw.w))
        assert np.all(eigs > 0), (name, eigs.min())


def test_metrics():
    ri, r, m, h = rand_index([0, 0, 1, 1], [1, 1, 0, 0])
    assert ri == pytest.approx(1.0) and r == pytest.approx(1.0)
    assert purity([0, 0, 1, 1], [1, 1, 0, 0]) == pytest.approx(1.0)
    ri2, _, _, _ = rand_index([0, 1, 0, 1], [0, 0, 1, 1])
    assert ri2 < 0.2


def test_mix_hier_em_recovers_pooled_clusters():
    """Reducing a pool of Gaussians drawn around two well-separated
    centers must place the two reduced components near those centers
    (GMM_MixHierEM.m behavior)."""
    from vbhem_tpu.ops.gmm import mix_hier_em
    rng = np.random.default_rng(0)
    c1, c2 = np.array([0.0, 0.0]), np.array([6.0, 6.0])
    means = np.concatenate([c1 + 0.2 * rng.normal(size=(10, 2)),
                            c2 + 0.2 * rng.normal(size=(10, 2))])
    covs = np.broadcast_to(np.eye(2), (20, 2, 2)).copy()
    red, lp = mix_hier_em(jax.random.key(0), jnp.asarray(means),
                          jnp.asarray(covs), jnp.ones((20,)), 2, nv=100)
    got = np.sort(np.asarray(red.mean), axis=0)
    np.testing.assert_allclose(got[0], c1, atol=0.3)
    np.testing.assert_allclose(got[1], c2, atol=0.3)
    # log-posterior assigns each pooled component to the near center
    lab = np.argmax(np.asarray(lp), axis=0)
    assert len(set(lab[:10])) == 1 and len(set(lab[10:])) == 1
    assert lab[0] != lab[-1]


def test_gmmnew_init_clusters_synthetic(base, learned_bank):
    """gmmNew initializer must produce a valid posterior that the EM
    drives to the correct 2-cluster solution."""
    _, labels = learned_bank
    cfg = VBHEMConfig(alpha0=1e6, m0=(1.5, 1.5), w0=1.0, nv=100, tau=50,
                      trials=8, initmode="gmmNew", learn_hyps=False)
    res, info = vbhem.cluster(jax.random.key(7), base, 2, 2, cfg)
    lab = np.asarray(res.label)
    ri = rand_index(lab, labels)[0]
    assert ri > 0.9, (ri, lab)


def test_masked_padded_em_equals_unpadded(base, vbhem_cfg):
    """The single-program padded sweep's masked EM at (Kmax,Smax) with a
    (K,S) mask must reproduce the unpadded EM exactly (same init)."""
    import dataclasses
    import jax.numpy as jnp
    cfg = dataclasses.replace(vbhem_cfg, max_iter=15)
    hyps = vbhem.VBHEMHyps.from_config(cfg, 2)
    k, s, kmax, smax = 2, 2, 4, 3
    post0 = vbhem.init_baseem(jax.random.key(5), base, k, s, hyps, cfg.nv)

    st_ref = vbhem.vbhem_em(base, post0, hyps, nv=cfg.nv, tau=cfg.tau,
                            max_iter=cfg.max_iter, min_diff=cfg.min_diff)

    # pad the SAME init with inert (prior-valued) slots
    d = 2
    def pad2(a, fill):
        out = jnp.full((kmax, smax) + a.shape[2:], fill, a.dtype)
        return out.at[:k, :s].set(a)
    alpha = jnp.full((kmax,), hyps.alpha0).at[:k].set(post0.alpha)
    eta = pad2(post0.eta, hyps.eta0)
    eps = jnp.full((kmax, smax, smax), hyps.epsilon0,
                   post0.epsilon.dtype).at[:k, :s, :s].set(post0.epsilon)
    m = jnp.broadcast_to(hyps.m0, (kmax, smax, d)).at[:k, :s].set(
        post0.niw.m)
    w_fill = jnp.broadcast_to(jnp.eye(d) * hyps.w0[0], (kmax, smax, d, d))
    w = w_fill.at[:k, :s].set(post0.niw.w)
    from vbhem_tpu.containers import H3MPosterior, NIW
    post0_p = H3MPosterior(
        alpha=alpha, eta=eta, epsilon=eps,
        niw=NIW(beta=pad2(post0.niw.beta, hyps.lambda0),
                v=pad2(post0.niw.v, hyps.v0 + d + 1.0), m=m, w=w))

    cmask = jnp.arange(kmax) < k
    smask = jnp.arange(smax) < s
    st_pad = vbhem.vbhem_em_masked(base, post0_p, hyps, nv=cfg.nv,
                                   tau=cfg.tau, cmask=cmask, smask=smask,
                                   max_iter=cfg.max_iter,
                                   min_diff=cfg.min_diff)
    np.testing.assert_allclose(float(st_pad.ll), float(st_ref.ll),
                               rtol=1e-9)
    assert int(st_pad.it) == int(st_ref.it)
    np.testing.assert_allclose(np.asarray(st_pad.hat_z[:, :k]),
                               np.asarray(st_ref.hat_z), atol=1e-9)
    np.testing.assert_allclose(np.asarray(st_pad.post.niw.m[:k, :s]),
                               np.asarray(st_ref.post.niw.m), atol=1e-8)


def test_cluster_batched_matches_grid(base, learned_bank):
    """Single-program sweep selects the same (K,S) and labels as the
    per-cell path on the synthetic bank."""
    _, labels = learned_bank
    cfg = VBHEMConfig(alpha0=1e6, m0=(1.5, 1.5), w0=1.0, trials=6,
                      nv=100, tau=50, initmode="baseem",
                      learn_hyps=False)
    res, info = vbhem.cluster_batched(jax.random.key(11), base,
                                      [1, 2, 3], [1, 2], cfg)
    assert info["model_best_k"] == 2 and info["model_best_s"] == 2, info
    ri = rand_index(np.asarray(res.label), labels)[0]
    assert ri == pytest.approx(1.0), np.asarray(res.label)


def test_cluster_batched_learn_hyps(base, learned_bank):
    """cluster_batched with learn_hyps: the grid-level vmapped L-BFGS
    (one lane per (cell, unique solution)) must improve the selected
    model's ELBO over the no-hyp sweep and still select (K,S)=(2,2)."""
    cfg = VBHEMConfig(alpha0=1e6, m0=(1.5, 1.5), w0=1.0, trials=4,
                      nv=100, tau=10, initmode="baseem",
                      learn_hyps=False, max_iter=100)
    res0, info0 = vbhem.cluster_batched(jax.random.key(5), base,
                                        [1, 2, 3], [2], cfg)
    cfg_h = dataclasses.replace(cfg, learn_hyps=True, hyp_max_steps=15,
                                max_hyp_solutions=2)
    res1, info1 = vbhem.cluster_batched(jax.random.key(5), base,
                                        [1, 2, 3], [2], cfg_h)
    assert info1["model_best_k"] == 2 and info1["model_best_s"] == 2
    # hyp optimization can only improve the per-cell best ELBO
    assert float(res1.ll) >= float(res0.ll) - 1e-9, (float(res1.ll),
                                                     float(res0.ll))


def test_cluster_batched_auto_initmode(base):
    """'auto' on the single-program sweep concatenates the three
    initmodes' trials; per cell its best LL must dominate every single
    mode's best (union property, `vbhem_h3m_cluster.m:363-399`)."""
    from vbhem_tpu.config import VBHEMConfig
    cfg_auto = VBHEMConfig(alpha0=1e6, m0=(1.5, 1.5), w0=1.0, nv=10,
                           tau=5, trials=4, initmode="auto",
                           learn_hyps=False, max_iter=30)
    res_a, info_a = vbhem.cluster_batched(jax.random.key(3), base,
                                          [1, 2], [2], cfg_auto)
    for mode in ("baseem", "gmmNew", "wtkmeans"):
        cfg_m = VBHEMConfig(alpha0=1e6, m0=(1.5, 1.5), w0=1.0, nv=10,
                            tau=5, trials=4, initmode=mode,
                            learn_hyps=False, max_iter=30)
        # same fold_in(key, mi) keying as the auto path uses per mode
        mi = ("baseem", "gmmNew", "wtkmeans").index(mode)
        res_m, info_m = vbhem.cluster_batched(
            jax.random.fold_in(jax.random.key(3), mi), base,
            [1, 2], [2], cfg_m)
        assert (np.asarray(info_a["model_ll"])
                >= np.asarray(info_m["model_ll"]) - 1e-9).all()


def test_fit_grid_batched_trial_chunking(base):
    """Chunked trials (lax.map over vmapped chunks — the HBM-bounded
    path used on accelerators) must equal the fully vmapped sweep."""
    from vbhem_tpu.config import VBHEMConfig
    cfg = VBHEMConfig(alpha0=1e6, m0=(1.5, 1.5), w0=1.0, nv=10, tau=5,
                      trials=4, initmode="baseem", learn_hyps=False,
                      max_iter=20)
    hyps = vbhem.VBHEMHyps.from_config(cfg, 2)
    st_full, cells, _, _ = vbhem.fit_grid_batched(
        jax.random.key(5), base, [1, 2], [2], cfg, hyps)
    st_chunk, cells2, _, _ = vbhem.fit_grid_batched(
        jax.random.key(5), base, [1, 2], [2], cfg, hyps, trial_chunk=2)
    assert cells == cells2
    np.testing.assert_allclose(np.asarray(st_chunk.ll),
                               np.asarray(st_full.ll), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(st_chunk.it),
                                  np.asarray(st_full.it))


def test_init_random_niw_conversion_oracle(base, vbhem_cfg):
    """init_random's hyper-space conversion must follow
    `vbhemhmm_init.m:983-1030` exactly: given the per-cluster GMM fit
    and the member masses N_j = sum(Nv*omega_b), check
    lambda/v/m/W/eta/epsilon/alpha against a NumPy oracle."""
    kr, sr = 3, 2
    hyps = vbhem.VBHEMHyps.from_config(vbhem_cfg, 2)
    key = jax.random.key(11)
    post = vbhem.init_random(key, base, kr, sr, hyps, vbhem_cfg.nv)

    # --- replicate the member masses and per-cluster GMM fits ---
    import jax.numpy as jnp
    from vbhem_tpu.ops.gmm import fit_gmm
    kb, sb_max = np.asarray(base.state_mask).shape
    d = base.hmm.mean.shape[-1]
    k1, k2 = jax.random.split(key)
    perm = np.asarray(jax.random.permutation(k1, kb))
    rand_lab = np.asarray(jax.random.randint(
        jax.random.fold_in(k1, 1), (kb,), 0, kr, dtype=jnp.int32))
    labels = np.zeros((kb,), np.int32)
    labels[perm[:kr]] = np.arange(kr)
    labels[perm[kr:]] = rand_lab[perm[kr:]]

    means_flat = np.asarray(base.hmm.mean).reshape(kb * sb_max, d)
    base_of = np.repeat(np.arange(kb), sb_max)
    valid = np.asarray(base.state_mask).reshape(-1)
    keys = jax.random.split(k2, kr)

    lam0 = float(hyps.lambda0)
    v0 = float(hyps.v0)
    m0 = np.asarray(hyps.m0)
    w0inv = np.diag(np.asarray(hyps.w0inv_diag))
    n_i = vbhem_cfg.nv * np.asarray(base.omega)
    for j in range(kr):
        w_c = ((labels[base_of] == j) & valid).astype(np.float64)
        mix = fit_gmm(keys[j], jnp.asarray(means_flat), sr,
                      weights=jnp.asarray(w_c), start_weighted=True)
        n_j = float(n_i[labels == j].sum())
        nj_rho = n_j * np.asarray(mix.weight)                  # [Sr]
        ybar = np.asarray(mix.mean)                            # [Sr,D]
        np.testing.assert_allclose(np.asarray(post.niw.beta)[j],
                                   lam0 + nj_rho, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(post.niw.v)[j],
                                   v0 + nj_rho + 1.0, rtol=1e-10)
        want_m = (lam0 * m0 + nj_rho[:, None] * ybar) \
            / (lam0 + nj_rho)[:, None]
        np.testing.assert_allclose(np.asarray(post.niw.m)[j], want_m,
                                   rtol=1e-8)
        for s in range(sr):
            mult1 = lam0 * nj_rho[s] / (lam0 + nj_rho[s])
            diff = ybar[s] - m0
            want_w = np.linalg.inv(
                w0inv + nj_rho[s] * np.asarray(mix.cov)[s]
                + mult1 * np.outer(diff, diff))
            np.testing.assert_allclose(np.asarray(post.niw.w)[j, s],
                                       want_w, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(post.alpha)[j],
                                   float(hyps.alpha0) + n_j, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(post.eta)[j],
                                   float(hyps.eta0) + n_j / sr, rtol=1e-10)
    # every cluster non-empty by construction
    assert len(np.unique(labels)) == kr


def test_vbh3m_remove_empty_full_semantics(base, vbhem_cfg):
    """`vbh3m_remove_empty.m:15-83` parity: cluster pruning PLUS
    per-cluster state pruning (thresh 1e-3) PLUS standardize of each
    pruned HMM ('f': first state = start of the most-likely greedy
    path)."""
    st = vbhem.select_best_trial(
        vbhem.fit_single_ks(jax.random.key(3), base, 4, 3, vbhem_cfg))
    res = vbhem.finalize(st)
    pruned, hmms = vbhem.vbh3m_remove_empty(res)
    assert len(hmms) == pruned.nj.shape[-1]
    for j, r in enumerate(hmms):
        counts = np.asarray(r.counts)
        # every surviving state has soft count >= 1e-3
        assert np.all(counts >= 1e-3)
        prior = np.asarray(r.model.prior)
        trans = np.asarray(r.model.trans)
        np.testing.assert_allclose(prior.sum(), 1.0, rtol=1e-6)
        np.testing.assert_allclose(trans.sum(-1), 1.0, rtol=1e-6)
        # standardize 'f': state 0 is the most probable initial state
        assert int(np.argmax(prior)) == 0


def test_single_mode_entry_points_reject_auto(base, vbhem_cfg):
    """'auto' initmode (try-all, `vbhem_h3m_cluster.m:363-399`) is a
    cluster()/cluster_batched() front-end feature; the single-mode
    workers must raise rather than silently degrade to 'baseem'."""
    import dataclasses
    cfg_auto = dataclasses.replace(vbhem_cfg, initmode="auto")
    with pytest.raises(ValueError, match="auto"):
        vbhem.fit_single_ks(jax.random.key(0), base, 2, 2, cfg_auto)
    hyps = vbhem.VBHEMHyps.from_config(cfg_auto, 2)
    with pytest.raises(ValueError, match="auto"):
        vbhem.fit_grid_batched(jax.random.key(0), base, [2], [2],
                               cfg_auto, hyps)
    with pytest.raises(ValueError, match="unknown initmode"):
        vbhem.fit_single_ks(jax.random.key(0), base, 2, 2, vbhem_cfg,
                            initmode="nope")


def test_two_stage_selection_matches_reference_rule():
    """`vbhem_h3m_cluster.m:261-345`: S* per K maximizes LL+gammaln(S+1);
    K* maximizes the winner's RAW LL + gammaln(K+1) — the S correction
    does not propagate.  Construct a grid where joint argmax and the
    reference rule disagree."""
    from scipy.special import gammaln as gl
    ks, ss = [1, 2], [2, 3]
    ll = np.asarray([[-103.0, -100.0],   # K=1: S*=3
                     [-100.0, -102.0]])  # K=2: S*=2
    scores = ll + np.asarray([[gl(k + 1) + gl(s + 1) for s in ss]
                              for k in ks])
    # joint argmax: (1,3) scores -100+gl(4) = -98.21, beating (2,2) at
    # -100+gl(3)+gl(3) = -98.61 -> joint would pick (1,3).
    # reference rule: model_ll_k = [LL(1,3)+gl(2), LL(2,2)+gl(3)] =
    # [-100, -99.31] -> K*=2, S*=2.  The rules DISAGREE on this grid.
    joint = np.unravel_index(np.argmax(scores), scores.shape)
    assert (ks[joint[0]], ss[joint[1]]) == (1, 3)
    bk, bs, mlk, s_star = vbhem._two_stage_select(scores, ks, ss)
    assert (bk, bs) == (2, 2)
    np.testing.assert_allclose(mlk, [-100.0 + gl(2), -100.0 + gl(3)])
    assert s_star == [3, 2]
