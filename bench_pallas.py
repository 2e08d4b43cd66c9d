"""Side-by-side timing of the XLA-scan vs Pallas pair-E-step kernels on
the real TPU (not the driver bench; diagnostic tool)."""
import time

import jax
import jax.numpy as jnp

from bench import make_problem
from vbhem_tpu.models import vbhem
from vbhem_tpu.ops.pair_estep import pair_bwd_fwd
from vbhem_tpu.ops.pair_estep_pallas import pair_bwd_fwd_pallas


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main(kb=512, kr=8, tau=10):
    base, post, hyps, cfg = make_problem(jax.random.key(0), kb=kb, kr=kr)
    exps = vbhem.reduced_expectations(post)
    from vbhem_tpu.ops.pair_estep import expected_pair_ll_variational
    ell = expected_pair_ll_variational(
        base.hmm.mean, base.hmm.cov, post.niw.m, post.niw.w,
        post.niw.v, post.niw.beta, exps.log_lam)

    args = (base.hmm.prior, base.hmm.trans, exps.log_pi, exps.log_a, ell)
    f_xla = jax.jit(lambda *a: pair_bwd_fwd(*a, tau=tau))
    f_pls = jax.jit(lambda *a: pair_bwd_fwd_pallas(*a, tau=tau))

    t_xla, out_x = timeit(f_xla, *args)
    t_pls, out_p = timeit(f_pls, *args)
    import numpy as np
    err = np.max(np.abs(np.asarray(out_x.ll_elbo) - np.asarray(out_p.ll_elbo)))
    print(f"Kb={kb} Kr={kr} tau={tau}  XLA: {t_xla*1e3:.3f}ms  "
          f"Pallas: {t_pls*1e3:.3f}ms  speedup: {t_xla/t_pls:.2f}x  "
          f"max|dll|={err:.3g}")


if __name__ == "__main__":
    for kb in (512, 2048, 8192):
        main(kb=kb)
