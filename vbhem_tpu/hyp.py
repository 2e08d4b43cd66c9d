"""Empirical-Bayes hyperparameter optimization for both engines.

Parity map: `src/hmm/vbhmm_em_hyp.m` + `src/hmm/get_hypinfo.m` (VBEM),
`src/vbhem/vbhem_h3m_c_hyp.m` + `src/vbhem/vbhem_get_hypinfo.m` (VBHEM),
and the Rasmussen BFGS driver `src/util/minimize_new.m`.

Design deltas from the reference (SURVEY.md section 7.1):
  * gradients come from **autodiff of the ELBO at the EM fixed point**
    instead of the hand-derived formulas of `vbhmm_em_lb.m:261-396` /
    `vbhemh3m_lb.m:202-341`.  At convergence the ELBO is stationary in
    the variational factors, so the partial derivative w.r.t. the hyps
    with the posterior held fixed IS the total derivative — which is
    exactly what the reference's formulas compute.  (The analytic
    formulas are kept as a test oracle in tests/test_hyp.py.)
  * the box-constrained quasi-Newton outer loop is SciPy L-BFGS-B over
    the transformed parameters, with bounds mapped into transform space
    — replacing minimize_new + the clip-and-zero-gradient mechanism of
    `vbhmm_clip_hyps.m` (L-BFGS-B's projected gradient does the same
    zeroing at the box).
  * each objective eval is a full jitted EM run from the same initial
    posterior, like `vbhmm_em_hyp.m:166-200`.

Transforms (`get_hypinfo.m:18-80`): alpha0/epsilon0/eta0/beta0/lambda0
-> log;  v0 -> log(v0 - D + 1);  W0 -> log W0 (diag);  mu0/m0 ->
identity.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import HypBounds


class HypSpec(NamedTuple):
    name: str
    transform: Callable      # hyp -> opt space
    inverse: Callable        # opt space -> hyp
    size: int                # number of scalars
    lo: float                # bound in hyp space (lower)
    hi: float                # bound in hyp space (upper)


def _log_spec(name, lo, hi, size=1):
    return HypSpec(name, jnp.log, jnp.exp, size, lo, hi)


def _identity_spec(name, size):
    return HypSpec(name, lambda x: x, lambda x: x, size,
                   -np.inf, np.inf)


def vb_specs(dim: int, bounds: HypBounds, keys: Sequence[str]):
    """Learnable-hyp registry for the VBEM engine (get_hypinfo.m)."""
    d = dim
    table = {
        "alpha0": _log_spec("alpha0", bounds.alpha0_min, bounds.alpha0_max),
        "epsilon0": _log_spec("epsilon0", bounds.epsilon0_min,
                              bounds.epsilon0_max),
        "beta0": _log_spec("beta0", bounds.beta0_min, bounds.beta0_max),
        "v0": HypSpec("v0", lambda v: jnp.log(v - (d - 1.0)),
                      lambda t: jnp.exp(t) + (d - 1.0), 1,
                      bounds.v0_min + (d - 1.0), bounds.v0_max),
        "w0": _log_spec("w0", bounds.w0_min, bounds.w0_max, size=d),
        "mu0": _identity_spec("m0", d),  # config key mu0 -> VBHyps.m0
    }
    return [table[k] for k in keys]


def vbhem_specs(dim: int, bounds: HypBounds, keys: Sequence[str]):
    """Learnable-hyp registry for VBHEM (vbhem_get_hypinfo.m)."""
    d = dim
    table = {
        "alpha0": _log_spec("alpha0", bounds.alpha0_min, bounds.alpha0_max),
        "eta0": _log_spec("eta0", bounds.eta0_min, bounds.eta0_max),
        "epsilon0": _log_spec("epsilon0", bounds.epsilon0_min,
                              bounds.epsilon0_max),
        "lambda0": _log_spec("lambda0", bounds.beta0_min, bounds.beta0_max),
        "v0": HypSpec("v0", lambda v: jnp.log(v - (d - 1.0)),
                      lambda t: jnp.exp(t) + (d - 1.0), 1,
                      bounds.v0_min + (d - 1.0), bounds.v0_max),
        "w0": _log_spec("w0", bounds.w0_min, bounds.w0_max, size=d),
        "m0": _identity_spec("m0", d),
    }
    return [table[k] for k in keys]


def pack(hyps, specs) -> np.ndarray:
    """Hyps pytree -> flat optimization vector (transform space)."""
    parts = []
    for s in specs:
        val = jnp.atleast_1d(getattr(hyps, s.name))
        parts.append(np.asarray(s.transform(val), dtype=np.float64).ravel())
    return np.concatenate(parts)


def unpack(theta: jnp.ndarray, hyps_template, specs):
    """Flat vector -> hyps pytree (differentiable)."""
    out = hyps_template
    i = 0
    for s in specs:
        seg = theta[i: i + s.size]
        i += s.size
        val = s.inverse(seg)
        ref = getattr(hyps_template, s.name)
        if jnp.ndim(ref) == 0:
            val = val[0]
        out = out._replace(**{s.name: val.astype(ref.dtype)
                              if hasattr(val, "astype") else val})
    return out


def transform_bounds(specs) -> list:
    """Box bounds in transform space for L-BFGS-B."""
    bounds = []
    for s in specs:
        if np.isinf(s.lo) and np.isinf(s.hi):
            bounds.extend([(None, None)] * s.size)
        else:
            lo = float(s.transform(jnp.asarray(s.lo)))
            hi = float(s.transform(jnp.asarray(s.hi)))
            bounds.extend([(lo, hi)] * s.size)
    return bounds


def optimize_hyps(objective_and_grad, hyps0, specs,
                  max_evals: int = 100) -> Tuple[object, dict]:
    """Box-constrained quasi-Newton outer loop.

    ``objective_and_grad(hyps) -> (-elbo, grad_pytree)`` where the grad
    is w.r.t. the hyps pytree.  Returns (optimized hyps, info).
    """
    from scipy.optimize import minimize

    theta0 = pack(hyps0, specs)
    bounds = transform_bounds(specs)

    # differentiate the full composition theta -> -elbo (the transform
    # chain rule of `vbhmm_em_lb.m:387-396` falls out of autodiff)
    @jax.jit
    def val_and_grad(theta):
        def comp(th):
            hyps = unpack(th, hyps0, specs)
            return objective_and_grad(hyps)
        return jax.value_and_grad(comp)(theta)

    def scipy_fun(theta_np):
        v, g = val_and_grad(jnp.asarray(theta_np))
        v = float(v)
        g = np.asarray(g, dtype=np.float64)
        if not np.isfinite(v):
            # unstable model: L=-inf in the reference; tell the line
            # search to back off
            return 1e300, np.zeros_like(g)
        return v, g

    res = minimize(scipy_fun, theta0, jac=True, method="L-BFGS-B",
                   bounds=bounds, options={"maxfun": max_evals,
                                           "ftol": 1e-12, "gtol": 1e-8})
    hyps_opt = unpack(jnp.asarray(res.x), hyps0, specs)
    return hyps_opt, {"fun": float(res.fun), "nfev": int(res.nfev),
                      "converged": bool(res.success), "message": str(res.message)}


def unique_ll(lls: np.ndarray, min_diff: float = 1e-5) -> np.ndarray:
    """Indices of unique restart solutions by LL, gating which get
    expensive hyp optimization (`src/util/uniqueLL.m:41-80`): two LLs
    are duplicates when their relative difference is below
    2 * min_diff * 10."""
    lls = np.asarray(lls, dtype=np.float64)
    order = np.argsort(-lls)
    thresh = 2.0 * min_diff * 10.0
    kept: list = []
    for i in order:
        if not np.isfinite(lls[i]):
            continue
        dup = any(abs(lls[i] - lls[j])
                  / max(abs(lls[j]), 1e-300) < thresh for j in kept)
        if not dup:
            kept.append(int(i))
    return np.asarray(kept, dtype=np.int64)
