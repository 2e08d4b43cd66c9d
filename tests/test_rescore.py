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
