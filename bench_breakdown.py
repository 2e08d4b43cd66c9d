"""Per-stage timing breakdown of one VBHEM EM iteration on the TPU
(diagnostic; not the driver bench).  Each stage is jitted and timed
separately with a scan(10) to amortize dispatch."""
import time

import jax
import jax.numpy as jnp

from bench import make_problem
from vbhem_tpu.models import vbhem
from vbhem_tpu.ops.pair_estep import expected_pair_ll_variational


def timed(name, fn, *args, n=10, reps=5):
    run = jax.jit(lambda *a: jax.lax.scan(
        lambda c, _: (c, fn(*a)), 0, None, length=n))
    out = run(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(run(*args))
    dt = (time.perf_counter() - t0) / reps / n
    print(f"{name:28s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main(kb=512, kr=8, tau=10):
    base, post, hyps, cfg = make_problem(jax.random.key(0), kb=kb, kr=kr)
    tilde_n = (cfg.nv * kb) * base.omega
    exps = vbhem.reduced_expectations(post)
    ell = expected_pair_ll_variational(
        base.hmm.mean, base.hmm.cov, post.niw.m, post.niw.w,
        post.niw.v, post.niw.beta, exps.log_lam)
    pair = vbhem.e_step(base, post, exps, tau)
    hat_z, z_ni, nj = vbhem.soft_assignments(tilde_n, exps.log_omega,
                                             pair.ll_elbo)
    stats = vbhem.aggregate_stats(base, pair, z_ni, nj)

    print(f"Kb={kb} Kr={kr} tau={tau}", flush=True)
    timed("reduced_expectations", vbhem.reduced_expectations, post)
    timed("expected_pair_ll", lambda: expected_pair_ll_variational(
        base.hmm.mean, base.hmm.cov, post.niw.m, post.niw.w,
        post.niw.v, post.niw.beta, exps.log_lam))
    timed("pair_bwd_fwd (pallas)", lambda: vbhem.e_step(base, post, exps,
                                                        tau))
    timed("soft_assignments", lambda: vbhem.soft_assignments(
        tilde_n, exps.log_omega, pair.ll_elbo))
    timed("elbo", lambda: vbhem.elbo(post, exps, pair, hat_z, z_ni, nj,
                                     hyps))
    timed("aggregate_stats", lambda: vbhem.aggregate_stats(base, pair,
                                                           z_ni, nj))
    timed("m_step", lambda: vbhem.m_step(stats, hyps))


if __name__ == "__main__":
    main()
