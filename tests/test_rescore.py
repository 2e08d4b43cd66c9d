"""The NumPy f64 rescoring oracle must match the JAX ELBO exactly in
float64 (models/rescore.py is what guards f32 model selection, so it
has to be provably the same bound)."""
import jax
import jax.numpy as jnp
import numpy as np

from vbhem_tpu.config import VBHEMConfig
from vbhem_tpu.containers import H3M, HMM
from vbhem_tpu.models import rescore, vbhem


def _random_problem(key, kb=9, sb=2, kr=3, sr=2, d=2):
    ks = jax.random.split(key, 6)
    dtype = jnp.float64
    mean = jax.random.normal(ks[0], (kb, sb, d), dtype) * 2.0
    a = jax.random.normal(ks[1], (kb, sb, d, d), dtype) * 0.2
    cov = jnp.einsum("ksde,ksfe->ksdf", a, a) + jnp.eye(d, dtype=dtype)
    prior = jax.random.dirichlet(ks[2], jnp.ones((sb,), dtype), (kb,))
    trans = jax.random.dirichlet(ks[3], jnp.ones((sb,), dtype), (kb, sb))
    base = H3M(omega=jnp.full((kb,), 1.0 / kb, dtype),
               hmm=HMM(prior=prior, trans=trans, mean=mean, cov=cov),
               state_mask=jnp.ones((kb, sb), bool))
    cfg = VBHEMConfig(m0=(0.0,) * d, w0=0.7, nv=10, tau=6, alpha0=2.0)
    hyps = vbhem.VBHEMHyps.from_config(cfg, d, dtype)
    post = vbhem.init_baseem(ks[4], base, kr, sr, hyps, cfg.nv)
    return base, post, hyps, cfg


def test_rescore_matches_jax_elbo_f64():
    base, post, hyps, cfg = _random_problem(jax.random.key(3))
    # run a couple of EM iterations so the posterior is non-trivial
    st = vbhem.vbhem_em(base, post, hyps, nv=cfg.nv, tau=cfg.tau,
                        max_iter=4, min_diff=0.0)
    post = st.post

    exps = vbhem.reduced_expectations(post)
    pair = vbhem.e_step(base, post, exps, cfg.tau)
    tilde_n = (cfg.nv * base.omega.shape[0]) * base.omega
    hat_z, z_ni, nj = vbhem.soft_assignments(tilde_n, exps.log_omega,
                                             pair.ll_elbo)
    want = float(vbhem.elbo(post, exps, pair, hat_z, z_ni, nj, hyps))

    got = rescore.elbo_f64(base, post, hyps, cfg.nv, cfg.tau)
    np.testing.assert_allclose(got, want, rtol=1e-10)

    # the data-term recursion alone must also agree
    ll_np = rescore.pair_ll_elbo_f64(
        np.asarray(base.hmm.prior), np.asarray(base.hmm.trans),
        np.asarray(exps.log_pi), np.asarray(exps.log_a),
        np.asarray(vbhem.expected_pair_ll_variational(
            base.hmm.mean, base.hmm.cov, post.niw.m, post.niw.w,
            post.niw.v, post.niw.beta, exps.log_lam)), cfg.tau)
    np.testing.assert_allclose(ll_np, np.asarray(pair.ll_elbo),
                               rtol=1e-10)


def test_cluster_batched_f32_selects_on_f64_scores():
    """On f32 inputs cluster_batched re-evaluates every cell winner in
    float64 and selects on those scores; at benign (non-degenerate)
    scales the f32 and f64 bounds agree closely, and both grids are
    reported."""
    base, post, hyps, cfg = _random_problem(jax.random.key(1), kb=8)
    base32 = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if a.dtype == jnp.float64 else a, base)
    import dataclasses
    cfg32 = dataclasses.replace(cfg, trials=3, learn_hyps=False,
                                initmode="baseem", verbose=0)
    res, info = vbhem.cluster_batched(jax.random.key(2), base32,
                                      [1, 2], [1, 2], cfg32)
    assert "model_ll_device" in info
    ll64 = np.asarray(info["model_ll"])
    ll32 = np.asarray(info["model_ll_device"])
    assert np.isfinite(ll64).all() and np.isfinite(ll32).all()
    # f32 vs f64 relative agreement at this benign scale
    np.testing.assert_allclose(ll64, ll32, rtol=1e-3)


def test_vbem_rescore_matches_jax_elbo_f64():
    """The VBEM 8-term NumPy oracle (`vbem_elbo_f64`) must equal the JAX
    elbo to ~1e-10 in float64, on a converged masked ragged batch."""
    from vbhem_tpu.config import VBConfig
    from vbhem_tpu.containers import SeqBatch
    from vbhem_tpu.models import vbhmm

    key = jax.random.key(7)
    dtype = jnp.float64
    n, t, d, k = 6, 12, 2, 3
    x = jax.random.normal(jax.random.key(1), (n, t, d), dtype) * 1.5
    x = x + jnp.arange(n, dtype=dtype)[:, None, None] * 0.3
    lengths = jnp.asarray([12, 9, 12, 7, 12, 10], jnp.int32)
    batch = SeqBatch(x=x, lengths=lengths)
    cfg = VBConfig(mu0=(0.0, 0.0), w0=1.0, numtrials=1)
    hyps = vbhmm.VBHyps.from_config(cfg, d, dtype)
    post0 = vbhmm.random_init(key, batch, k, hyps, "full")
    st = vbhmm.vbem_em(batch, post0, hyps, max_iter=6, min_diff=0.0)

    fb = vbhmm.e_step(batch, st.post)
    stats = vbhmm.suff_stats(batch, fb)
    want = float(vbhmm.elbo(batch, st.post, fb, stats, hyps))
    got = rescore.vbem_elbo_f64(x, lengths, st.post, hyps)
    np.testing.assert_allclose(got, want, rtol=1e-10)

    # batched lane form: shared data + per-lane hyps axis
    posts_b = jax.tree.map(lambda a: jnp.stack([a, a]), st.post)
    hyps_b = jax.tree.map(lambda a: jnp.stack([a, a]), hyps)
    lls = rescore.vbem_rescore_lanes(np.asarray(x), np.asarray(lengths),
                                     posts_b, hyps_b)
    np.testing.assert_allclose(lls, [want, want], rtol=1e-10)


def test_learn_f32_selects_on_f64_scores():
    """On f32 batches, vbhmm.learn and batch.learn_bank select restarts
    / lanes / K on host-f64 rescored bounds; at benign scales those
    agree with the device values to ~1e-3 relative."""
    from vbhem_tpu.config import VBConfig
    from vbhem_tpu.containers import HMM, SeqBatch
    from vbhem_tpu.models import batch as batch_mod
    from vbhem_tpu.models import hmm_tools, vbhmm

    gt = HMM(prior=jnp.asarray([.5, .5]),
             trans=jnp.asarray([[.6, .4], [.4, .6]]),
             mean=jnp.asarray([[0., 0.], [3., 3.]]),
             cov=jnp.broadcast_to(jnp.eye(2), (2, 2, 2)))
    _, x = hmm_tools.sample(jax.random.key(9), gt, t=30, n=12)
    x32 = jnp.asarray(np.asarray(x), jnp.float32)
    b32 = SeqBatch(x=x32, lengths=jnp.full((12,), 30, jnp.int32))
    cfg = VBConfig(mu0=(1.5, 1.5), w0=1.0, numtrials=4)

    res, info = vbhmm.learn(jax.random.key(2), b32, [1, 2], cfg)
    assert info["model_best_k"] == 2
    k2_info = info["model_infos"][list(info["model_k"]).index(2)]
    assert "ll_f64" in k2_info
    np.testing.assert_allclose(k2_info["ll_f64"], float(res.ll),
                               rtol=1e-3)

    results, binfo = batch_mod.learn_bank(
        jax.random.key(3), [b32, b32], 2, cfg)
    assert len(results) == 2
    for r in results:
        np.testing.assert_allclose(
            np.sort(np.asarray(r.model.mean)[:, 0]), [0., 3.], atol=0.5)
