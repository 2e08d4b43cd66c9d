"""Benchmark: VBHEM E-step/EM throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "vbhem_pair_updates_per_sec", "value": N, "unit": "pairs/s",
   "vs_baseline": R}

The metric is the driver-defined north star (BASELINE.md): (base i,
reduced j) pair updates per second through the full VBHEM EM iteration
(pair E-step backward+forward recursions over tau virtual steps, soft
assignments, conjugate M-step, ELBO).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so
the baseline is the target from BASELINE.json — 50x a single-core C-MEX
implementation.  The single-core number is MEASURED, not estimated:
`native/baseline_pair_estep.c` is a scalar C port of this repo's pair
E-step (E3logN + backward/forward recursions, the same math as
`ops/pair_estep.py`), compiled `gcc -O2` at the bench shape
(Kb=8192, Kr=8, Sb=Sr=3, D=2, tau=10).  The baseline is RE-MEASURED on
the current host at bench time (compile + run below); if that fails, or
if the host is loaded and the fresh number comes out LOWER than the
best idle-host measurement on record, the recorded idle number is used
instead — i.e. we always divide by the LARGER (more conservative)
baseline:

  {"pairs_per_sec": 176877, ...}   # idle host, 2026-08-20 (ADVICE r2)

vs_baseline = value / (50 x baseline_pairs_per_sec), so vs_baseline >= 1
means the >=50x single-core target is met; multiply by 50 for the raw
single-core speedup.

Scope note (ADVICE r2): the C baseline times the pair E-STEP only,
while the TPU metric includes the full EM iteration (E-step + soft
assignments + ELBO + conjugate M-step).  The direction is conservative
— the C number overestimates what a full single-core C EM loop would
do, so vs_baseline understates the true full-EM speedup.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

import jax
import jax.numpy as jnp

# Best idle-host single-core measurement on record (pairs/s); used as a
# floor for the fresh measurement so a loaded host can't inflate
# vs_baseline.
IDLE_HOST_PAIRS_PER_SEC = 176877.0


def measure_c_baseline(kb=8192, kr=8):
    """Compile and run native/baseline_pair_estep.c on this host; return
    pairs/s, or None if the toolchain/run fails."""
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "native", "baseline_pair_estep.c")
    try:
        with tempfile.TemporaryDirectory() as td:
            exe = os.path.join(td, "baseline_pair_estep")
            subprocess.run(["gcc", "-O2", "-o", exe, src, "-lm"],
                           check=True, capture_output=True, timeout=120)
            out = subprocess.run([exe, str(kb), str(kr)], check=True,
                                 capture_output=True, timeout=600)
            return float(json.loads(out.stdout)["pairs_per_sec"])
    except Exception as e:  # missing gcc, timeout, parse failure ...
        print(f"# C baseline remeasure failed ({e!r}); using recorded "
              f"idle-host number", file=sys.stderr)
        return None


def make_problem(key, kb=512, sb=3, kr=8, sr=3, d=2, dtype=jnp.float32):
    from vbhem_tpu.containers import H3M, HMM
    from vbhem_tpu.models import vbhem
    from vbhem_tpu.config import VBHEMConfig

    ks = jax.random.split(key, 6)
    mean = jax.random.normal(ks[0], (kb, sb, d), dtype) * 3.0
    a = jax.random.normal(ks[1], (kb, sb, d, d), dtype) * 0.3
    cov = jnp.einsum("ksde,ksfe->ksdf", a, a) + jnp.eye(d, dtype=dtype)
    prior = jax.random.dirichlet(ks[2], jnp.ones((sb,)), (kb,)).astype(dtype)
    trans = jax.random.dirichlet(ks[3], jnp.ones((sb,)), (kb, sb)).astype(dtype)
    base = H3M(omega=jnp.full((kb,), 1.0 / kb, dtype),
               hmm=HMM(prior=prior, trans=trans, mean=mean, cov=cov),
               state_mask=jnp.ones((kb, sb), bool))
    cfg = VBHEMConfig(m0=(0.0,) * d, w0=1.0, nv=100, tau=10)
    hyps = vbhem.VBHEMHyps.from_config(cfg, d, dtype)
    post = vbhem.init_baseem(ks[4], base, kr, sr, hyps, cfg.nv)
    return base, post, hyps, cfg


def run_parity_gate():
    """On-hardware Pallas-vs-XLA parity check (f32, tiny shapes).

    The pytest suite exercises the Pallas kernels only in interpret
    mode on the CPU mesh; this gate compiles the REAL Mosaic lowerings
    on whatever device bench runs on (the TPU chip) and asserts both
    kernels agree with the XLA-scan oracles — the reference's
    dual-path discipline (`vbhem_h3m_c_step_fc.m:250-262`,
    `vbhmm_fb.m:179-192`) executed on hardware.  Returns (ok, detail).
    """
    import numpy as np
    from vbhem_tpu.models import vbhem
    from vbhem_tpu.ops.fb import forward_backward
    from vbhem_tpu.ops.fb_pallas import forward_backward_pallas
    from vbhem_tpu.ops.pair_estep import (expected_pair_ll_variational,
                                          pair_bwd_fwd)
    from vbhem_tpu.ops.pair_estep_pallas import pair_bwd_fwd_pallas

    details = []
    ok = True

    def check(name, got, want, tol):
        nonlocal ok
        g, w = np.asarray(got, np.float64), np.asarray(want, np.float64)
        err = float(np.max(np.abs(g - w) / (np.abs(w) + 1.0)))
        details.append(f"{name}={err:.2e}")
        if not np.isfinite(err) or err > tol:
            ok = False

    # ---- pair kernel (vbhem_hmm_bwd_fwd_mex.c) ----
    kb, kr, tau = 256, 4, 10
    base, post, hyps, cfg = make_problem(jax.random.key(7), kb=kb, kr=kr)
    exps = vbhem.reduced_expectations(post)
    ell = expected_pair_ll_variational(
        base.hmm.mean, base.hmm.cov, post.niw.m, post.niw.w,
        post.niw.v, post.niw.beta, exps.log_lam)
    args = (base.hmm.prior, base.hmm.trans, exps.log_pi, exps.log_a, ell)
    want = jax.jit(lambda *a: pair_bwd_fwd(*a, tau=tau))(*args)
    got = jax.jit(lambda *a: pair_bwd_fwd_pallas(*a, tau=tau))(*args)
    for f in want._fields:
        check(f"pair.{f}", getattr(got, f), getattr(want, f), 5e-5)

    # fully-fused flavor (E3logN computed in-kernel) — the path the EM
    # iteration actually uses on TPU
    from vbhem_tpu.ops.pair_estep_pallas import pair_bwd_fwd_fused_pallas
    got_f = jax.jit(lambda: pair_bwd_fwd_fused_pallas(
        base.hmm.prior, base.hmm.trans, base.hmm.mean, base.hmm.cov,
        exps.log_pi, exps.log_a, post.niw.m, post.niw.w, post.niw.v,
        post.niw.beta, exps.log_lam, tau))()
    for f in want._fields:
        check(f"fused.{f}", getattr(got_f, f), getattr(want, f), 5e-5)

    # ---- FB kernel (vbhmm_fb_mex.c) ----
    rng = np.random.default_rng(5)
    n, t_max, k = 192, 12, 3
    lengths = rng.integers(2, t_max + 1, size=n)
    lengths[0] = t_max
    mask = jnp.asarray(np.arange(t_max)[None, :] < lengths[:, None])
    log_rho = jnp.asarray(rng.normal(size=(n, t_max, k)) * 2, jnp.float32)
    log_pz1 = jnp.asarray(np.log(rng.dirichlet(np.ones(k))) - 0.1,
                          jnp.float32)
    log_trans = jnp.asarray(np.log(rng.dirichlet(np.ones(k), size=k)) - 0.1,
                            jnp.float32)
    fb_args = (log_pz1, log_trans, log_rho, mask)
    want = jax.jit(forward_backward)(*fb_args)
    got = jax.jit(forward_backward_pallas)(*fb_args)
    for f in ("gamma", "xi_sum", "phi_norm"):
        check(f"fb.{f}", getattr(got, f), getattr(want, f), 5e-5)
    return ok, " ".join(details)


def main():
    # Kb=8192: a pod-scale per-chip shard of the north-star config
    # (BASELINE.json: "10k+ input HMMs").  n_iters=500 EM iterations per
    # dispatch: the axon tunnel costs ~29ms per executable launch, so
    # short scans measure the tunnel, not the chip (true per-iteration
    # cost at this size is ~0.65ms).
    kb, kr, tau, n_iters = 8192, 8, 10, 500
    from vbhem_tpu.models import vbhem

    parity_ok, parity_detail = run_parity_gate()
    print(f"# pallas-on-hw parity: {'PASS' if parity_ok else 'FAIL'} "
          f"(max rel err: {parity_detail})", file=sys.stderr)

    base, post, hyps, cfg = make_problem(jax.random.key(0), kb=kb, kr=kr)
    tilde_n = (cfg.nv * kb) * base.omega

    def em_iter(post, _):
        exps = vbhem.reduced_expectations(post)
        pair = vbhem.e_step(base, post, exps, tau)
        hat_z, z_ni, nj = vbhem.soft_assignments(tilde_n, exps.log_omega,
                                                 pair.ll_elbo)
        ll = vbhem.elbo(post, exps, pair, hat_z, z_ni, nj, hyps)
        stats = vbhem.aggregate_stats(base, pair, z_ni, nj)
        return vbhem.m_step(stats, hyps), ll

    @jax.jit
    def run(post):
        post, lls = jax.lax.scan(em_iter, post, None, length=n_iters)
        return post, lls

    # compile + warmup
    out = run(post)
    jax.block_until_ready(out)
    # timed
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = run(post)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    pairs_per_sec = kb * kr * n_iters / dt

    fresh = measure_c_baseline(kb=kb, kr=kr)
    single_core = max(fresh or 0.0, IDLE_HOST_PAIRS_PER_SEC)
    baseline = 50.0 * single_core

    print(json.dumps({
        "metric": "vbhem_pair_updates_per_sec",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / baseline, 3),
    }))
    # diagnostics to stderr (driver reads only stdout JSON)
    print(f"# device={jax.devices()[0].platform} Kb={kb} Kr={kr} tau={tau} "
          f"iters={n_iters} dt/iter={dt / n_iters * 1e3:.2f}ms "
          f"final_elbo={float(out[1][-1]):.4g} "
          f"c_baseline={single_core:.1f} pairs/s"
          f" ({'fresh' if fresh and fresh >= IDLE_HOST_PAIRS_PER_SEC else 'recorded idle-host'})",
          file=sys.stderr)


if __name__ == "__main__":
    main()
