"""Pallas pair-E-step kernel vs the XLA reference implementation
(interpret mode on CPU — the dual-path discipline the reference used
for its MEX kernels, `vbhem_h3m_c_step_fc.m:250-262`)."""
import jax.numpy as jnp
import numpy as np
import pytest

from vbhem_tpu.ops.pair_estep import pair_bwd_fwd
from vbhem_tpu.ops.pair_estep_pallas import pair_bwd_fwd_pallas
from tests.test_pair_estep import problem  # noqa: F401  (fixture)


@pytest.mark.parametrize("tau", [2, 6])
def test_pallas_matches_reference(problem, tau):  # noqa: F811
    prior_b, trans_b, log_pi_r, log_a_r, ell, _ = problem
    args = (jnp.asarray(prior_b, jnp.float32),
            jnp.asarray(trans_b, jnp.float32),
            jnp.asarray(log_pi_r, jnp.float32),
            jnp.asarray(log_a_r, jnp.float32),
            jnp.asarray(ell, jnp.float32), tau)
    ref = pair_bwd_fwd(*args)
    got = pair_bwd_fwd_pallas(*args, tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got.ll_elbo),
                               np.asarray(ref.ll_elbo), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got.nu_1),
                               np.asarray(ref.nu_1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(got.sum_xi),
                               np.asarray(ref.sum_xi), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.sum_t_nu),
                               np.asarray(ref.sum_t_nu), atol=1e-5)


def test_custom_vmap_folds_batch_into_kr(problem):  # noqa: F811
    """vmap over trial-batched reduced models must FOLD into the Kr grid
    axis (never vmap the pallas_call — it hangs the axon TPU platform)
    and agree with the vmapped XLA path."""
    import jax
    from vbhem_tpu.ops.pair_estep_pallas import _pallas_vmappable

    prior_b, trans_b, log_pi_r, log_a_r, ell, _ = problem
    tau, b = 4, 3
    f32 = jnp.float32
    prior_b, trans_b = jnp.asarray(prior_b, f32), jnp.asarray(trans_b, f32)
    rng = np.random.default_rng(5)
    log_pi_b = jnp.asarray(
        np.stack([log_pi_r + rng.normal(0, .1, log_pi_r.shape)
                  for _ in range(b)]), f32)
    log_a_b = jnp.asarray(
        np.stack([log_a_r + rng.normal(0, .1, log_a_r.shape)
                  for _ in range(b)]), f32)
    ell_b = jnp.asarray(
        np.stack([ell + rng.normal(0, .1, ell.shape) for _ in range(b)]),
        f32)

    fp = _pallas_vmappable(tau, interpret=True)
    got = jax.vmap(fp, in_axes=(None, None, 0, 0, 0))(
        prior_b, trans_b, log_pi_b, log_a_b, ell_b)
    want = jax.vmap(
        lambda p, a, e: pair_bwd_fwd(prior_b, trans_b, p, a, e, tau))(
            log_pi_b, log_a_b, ell_b)
    np.testing.assert_allclose(np.asarray(got.ll_elbo),
                               np.asarray(want.ll_elbo), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got.sum_xi),
                               np.asarray(want.sum_xi), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.sum_t_nu),
                               np.asarray(want.sum_t_nu), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.nu_1),
                               np.asarray(want.nu_1), atol=2e-6)
