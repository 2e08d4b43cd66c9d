"""Controlled experiment: why does the VBHEM grid prefer S=3 over the
ground-truth S=2 on a clean f64 bank (repeat 5 selected (2,[3,3]) by
~84 nats at trials=25, VERDICT r4 item 2)?

Re-runs the decisive cells (K,S) in {2,3} x {2,3} on the SAME bank at
the reference restart budget (trials=100, `vbhem_h3m_cluster.m:159`)
with the engineering caps lifted (max_hyp_solutions=None, doubled
hyp_max_steps), then decomposes the winning cells' f64 ELBOs into the
ten `vbhemh3m_lb.m:88-186` terms so a (2,2)-vs-(2,3) gap can be
attributed: restart-budget artifact, genuine higher-ELBO basin, or an
S-dependent term bug.

Usage:
  python examples/s_selection_experiment.py --bank syn_r3/r005_vbem.pkl \
      --out s_select_r5.json [--trials 100] [--hyp-steps 100]
"""
import argparse
import dataclasses
import json
import os
import pickle
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bank", default="syn_r3/r005_vbem.pkl")
    ap.add_argument("--out", default="s_select_r5.json")
    ap.add_argument("--trials", type=int, default=100)
    ap.add_argument("--hyp-steps", type=int, default=100)
    ap.add_argument("--no-cap-lift", action="store_true",
                    help="keep max_hyp_solutions=5 (the capped default) "
                         "for the cap-effect comparison")
    ap.add_argument("--no-hyp", action="store_true",
                    help="disable hyp optimization entirely: isolates "
                         "whether the bound alone (fixed default hyps) "
                         "prefers the S=3 basin")
    ap.add_argument("--ks", default="2,3")
    ap.add_argument("--ss", default="2,3")
    ap.add_argument("--seed", type=int, default=5)
    args = ap.parse_args()

    import numpy as np

    from vbhem_tpu.experiments import runner as runner_mod
    from vbhem_tpu.experiments import synthetic as syn
    from vbhem_tpu.models import rescore, vbhem

    with open(args.bank, "rb") as f:
        banks = pickle.load(f)
    if isinstance(banks, dict) and "banks" in banks:
        banks = banks["banks"]
    results = banks[runner_mod.GT_S] if isinstance(banks, dict) else banks
    print(f"bank: {len(results)} subject HMMs "
          f"(dtype {results[0].model.mean.dtype})", flush=True)

    cfg = dataclasses.replace(
        syn.default_vbhem_config(trials=args.trials),
        hyp_max_steps=args.hyp_steps,
        max_hyp_solutions=None if not args.no_cap_lift else 5,
        learn_hyps=not args.no_hyp,
        verbose=2)
    base = vbhem.h3m_from_results(results, use_post=cfg.use_post,
                                  covar_type=cfg.covar_type)
    ks = [int(v) for v in args.ks.split(",")]
    ss = [int(v) for v in args.ss.split(",")]
    # same experiment key structure as the repeat's own run
    # (runner.run_repeat: fold_in(key(repeat), 1))
    key = jax.random.fold_in(jax.random.key(args.seed), 1)
    res, info = vbhem.cluster_batched(key, base, ks, ss, cfg)

    out = {"bank": args.bank, "trials": args.trials,
           "hyp_steps": args.hyp_steps,
           "max_hyp_solutions": cfg.max_hyp_solutions,
           "ks": ks, "ss": ss,
           "selected": [int(info["model_best_k"]),
                        int(info["model_best_s"])],
           "cells": {}}
    for (kk, sv), cell_res in info["model_all"].items():
        hyps_c = info["model_hyps"][(kk, sv)]
        total, terms = rescore.elbo_f64(base, cell_res.post, hyps_c,
                                        cfg.nv, cfg.tau,
                                        return_terms=True)
        corr = float(jax.scipy.special.gammaln(kk + 1)
                     + jax.scipy.special.gammaln(sv + 1))
        out["cells"][f"{kk},{sv}"] = {
            "elbo_f64": total, "score": total + corr,
            "device_ll": float(cell_res.ll), "terms": terms}
        print(f"cell ({kk},{sv}): f64 ELBO {total:.3f} "
              f"score {total + corr:.3f}", flush=True)

    # pruned selection semantics (evaluate_vbhem_jounarl.m:92-105)
    pruned, hmm_list = vbhem.vbh3m_remove_empty(res)
    out["selected_pruned_k"] = len(hmm_list)
    out["selected_pruned_s"] = [int(h.model.prior.shape[0])
                                for h in hmm_list]

    # term-by-term gap for every same-K S-pair, most useful: (2,2)-(2,3)
    def gap(a, b):
        ca, cb = out["cells"].get(a), out["cells"].get(b)
        if not (ca and cb):
            return None
        return {"total": ca["elbo_f64"] - cb["elbo_f64"],
                "per_term": {t: ca["terms"][t] - cb["terms"][t]
                             for t in ca["terms"]}}

    out["gap_22_minus_23"] = gap("2,2", "2,3")
    out["gap_33_minus_32"] = gap("3,3", "3,2")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "cells"},
                     indent=2))


if __name__ == "__main__":
    main()
