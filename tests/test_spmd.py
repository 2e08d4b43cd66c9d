"""Multi-device SPMD tests on the virtual 8-device CPU mesh
(SURVEY.md section 4: exercise multi-host logic without a pod)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbhem_tpu.config import VBHEMConfig
from vbhem_tpu.models import vbhem
from vbhem_tpu.parallel import spmd
from tests.test_vbhem import gt_hmm


@pytest.fixture(scope="module")
def base8():
    """A small synthetic base bank with Kb divisible by the mesh."""
    from vbhem_tpu.models import hmm_tools, vbhmm
    from vbhem_tpu.containers import SeqBatch
    from vbhem_tpu.config import VBConfig
    cfg = VBConfig(mu0=(1.5, 1.5), w0=1.0, numtrials=2)
    results = []
    for gi, h in enumerate([gt_hmm([[0.6, 0.4], [0.4, 0.6]]),
                            gt_hmm([[0.4, 0.6], [0.6, 0.4]])]):
        for si in range(4):
            key = jax.random.key(gi * 10 + si)
            _, x = hmm_tools.sample(key, h, t=30, n=8)
            batch = SeqBatch(x=x, lengths=jnp.full((8,), 30, jnp.int32))
            res, _ = vbhmm.learn(jax.random.fold_in(key, 1), batch, 2, cfg)
            results.append(res)
    return vbhem.h3m_from_results(results)


def test_sharded_step_matches_single_device(base8):
    assert len(jax.devices()) >= 8, "conftest should force 8 CPU devices"
    cfg = VBHEMConfig(alpha0=1e6, m0=(1.5, 1.5), w0=1.0, nv=10, tau=5)
    hyps = vbhem.VBHEMHyps.from_config(cfg, 2)
    n_trials = 4
    keys = jax.random.split(jax.random.key(0), n_trials)
    posts = jax.vmap(lambda k: vbhem.init_baseem(k, base8, 2, 2, hyps,
                                                 cfg.nv))(keys)

    # single-device reference: one EM iteration per trial
    def one_step(post):
        tilde_n = (cfg.nv * base8.num_hmms) * base8.omega
        exps = vbhem.reduced_expectations(post)
        pair = vbhem.e_step(base8, post, exps, cfg.tau)
        hat_z, z_ni, nj = vbhem.soft_assignments(tilde_n, exps.log_omega,
                                                 pair.ll_elbo)
        ll = vbhem.elbo(post, exps, pair, hat_z, z_ni, nj, hyps)
        stats = vbhem.aggregate_stats(base8, pair, z_ni, nj)
        return vbhem.m_step(stats, hyps), ll

    ref_posts, ref_ll = jax.vmap(one_step)(posts)

    mesh = spmd.make_mesh(n_trial=4, n_base=2)
    new_posts, ll = spmd.sharded_em_step(mesh, base8, posts, hyps,
                                         cfg.nv, cfg.tau)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ref_ll),
                               rtol=1e-12)
    for a, b in zip(jax.tree.leaves(new_posts), jax.tree.leaves(ref_posts)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


def test_sharded_full_em_matches_single_device(base8):
    """The FULL while_loop EM under base+trial sharding must converge to
    the same ELBO/posterior/iteration count as the single-device loop
    (VERDICT r1 item 3: not just one step)."""
    cfg = VBHEMConfig(alpha0=1e6, m0=(1.5, 1.5), w0=1.0, nv=10, tau=5,
                      max_iter=50)
    hyps = vbhem.VBHEMHyps.from_config(cfg, 2)
    n_trials = 4
    keys = jax.random.split(jax.random.key(7), n_trials)
    posts = jax.vmap(lambda k: vbhem.init_baseem(k, base8, 2, 2, hyps,
                                                 cfg.nv))(keys)

    ref = jax.vmap(lambda p: vbhem.vbhem_em(
        base8, p, hyps, nv=cfg.nv, tau=cfg.tau, max_iter=50))(posts)

    mesh = spmd.make_mesh(n_trial=2, n_base=4)
    st = spmd.sharded_vbhem_em(mesh, base8, posts, hyps, cfg.nv, cfg.tau,
                               max_iter=50)
    assert int(ref.it.min()) > 1, "EM should take several iterations"
    np.testing.assert_array_equal(np.asarray(st.it), np.asarray(ref.it))
    np.testing.assert_allclose(np.asarray(st.ll), np.asarray(ref.ll),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(st.hat_z), np.asarray(ref.hat_z),
                               rtol=1e-7, atol=1e-12)
    for a, b in zip(jax.tree.leaves(st.post), jax.tree.leaves(ref.post)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)


def test_sharded_trials_match_vmap(base8):
    """Trials sharded over the mesh must produce the same ELBOs as the
    single-device vmap (embarrassing parallelism, final argmax only)."""
    from jax.sharding import Mesh
    import numpy as np
    cfg = VBHEMConfig(alpha0=1e6, m0=(1.5, 1.5), w0=1.0, nv=10, tau=5,
                      trials=8, initmode="baseem", learn_hyps=False,
                      max_iter=20)
    hyps = vbhem.VBHEMHyps.from_config(cfg, 2)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1),
                axis_names=("trial", "base"))
    st_sharded = spmd.sharded_fit_trials(mesh, base8, 2, 2, cfg, hyps,
                                         jax.random.key(3))
    st_local = vbhem.fit_single_ks(jax.random.key(3), base8, 2, 2, cfg,
                                   hyps, initmode="baseem")
    np.testing.assert_allclose(np.asarray(st_sharded.ll),
                               np.asarray(st_local.ll), rtol=1e-10)


def test_sharded_grid_sweep_matches_local(base8):
    """The mesh-sharded padded sweep equals the single-device batched
    sweep (same keys -> same per-cell/trial ELBOs)."""
    from jax.sharding import Mesh
    import numpy as np
    cfg = VBHEMConfig(alpha0=1e6, m0=(1.5, 1.5), w0=1.0, nv=10, tau=5,
                      trials=8, initmode="baseem", learn_hyps=False,
                      max_iter=15)
    hyps = vbhem.VBHEMHyps.from_config(cfg, 2)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1),
                axis_names=("trial", "base"))
    st_sh, cells, _, _ = spmd.sharded_grid_sweep(
        mesh, base8, [1, 2], [2], cfg, hyps, jax.random.key(4))
    st_lo, cells2, _, _ = vbhem.fit_grid_batched(
        jax.random.key(4), base8, [1, 2], [2], cfg, hyps)
    assert cells == cells2
    np.testing.assert_allclose(np.asarray(st_sh.ll),
                               np.asarray(st_lo.ll), rtol=1e-10)
