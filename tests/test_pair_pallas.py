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
