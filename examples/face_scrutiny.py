"""Scrutiny run for the face demo result (VERDICT r4 item 5).

Round 4 ran `demo/vbdemo_face.m`'s exact configuration on the real
`demo/demodata.xls` and got grid cell (K=3,S=2) with pruning collapsing
to ONE group of all 10 subjects.  This script asks whether that outcome
is a stable property of the data + demo priors or an artifact of one
(seed, trials) draw:

  * caches the per-subject VBEM bank (the demo's S=1:3 selection),
  * re-runs the VBHEM grid at trials in {50, 200} x 3 seeds,
  * records, per run: the full f64 ELBO grid, the selected cell,
    per-cell cluster masses (nj), the pruned K / per-cluster S, and the
    subject partition,
  * writes one JSON for RESULTS.md.

Usage:
  python examples/face_scrutiny.py --xls /root/reference/demo/demodata.xls \
      --out demo_face_out/scrutiny.json
"""
import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from vbhem_tpu.config import VBConfig, VBHEMConfig
from vbhem_tpu.models import vbhem, vbhmm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xls", default="/root/reference/demo/demodata.xls")
    ap.add_argument("--out", default="demo_face_out/scrutiny.json")
    ap.add_argument("--bank-cache", default="demo_face_out/bank_r5.pkl")
    ap.add_argument("--seed", type=int, default=100)
    ap.add_argument("--trials", default="50,200")
    ap.add_argument("--vbhem-seeds", default="1001,2002,3003")
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    # ---- per-subject VBEM bank (vbdemo_face.m:21-40 exact config) ----
    if os.path.exists(args.bank_cache):
        with open(args.bank_cache, "rb") as f:
            names, results = pickle.load(f)
        print(f"bank cache: {len(results)} subjects", flush=True)
    else:
        from vbhem_tpu.utils.native_io import read_fixations_auto
        subjects = read_fixations_auto(args.xls)
        names = list(subjects)
        cfg = VBConfig(alpha0=1.0, epsilon0=1.0, beta0=1.0, v0=10.0,
                       w0=0.001, mu0=(160.0, 210.0), learn_hyps=True)
        results = []
        for i, n in enumerate(names):
            res, info = vbhmm.learn(jax.random.key(args.seed + i),
                                    subjects[n], [1, 2, 3], cfg)
            print(f"{n}: best S={info['model_best_k']} "
                  f"LL={float(res.ll):.1f}", flush=True)
            results.append(res)
        with open(args.bank_cache, "wb") as f:
            pickle.dump((names, results), f)

    base = vbhem.h3m_from_results(results)
    k_grid, s_grid = [1, 2, 3, 4, 5], [1, 2, 3]

    runs = []
    for trials in [int(v) for v in args.trials.split(",")]:
        for seed in [int(v) for v in args.vbhem_seeds.split(",")]:
            vb_cfg = VBHEMConfig(alpha0=1.0, eta0=1.0, epsilon0=1.0,
                                 lambda0=1.0, v0=10.0, w0=0.001,
                                 m0=(160.0, 210.0), trials=trials, nv=10,
                                 tau=5, initmode="wtkmeans", verbose=1)
            res, info = vbhem.cluster_batched(jax.random.key(seed), base,
                                              k_grid, s_grid, vb_cfg)
            pruned, hmms = vbhem.vbh3m_remove_empty(res)
            cell_masses = {}
            for (kk, sv), r in info["model_all"].items():
                cell_masses[f"{kk},{sv}"] = [
                    round(float(v), 3) for v in np.asarray(r.nj)]
            run = {"trials": trials, "seed": seed,
                   "model_ll": np.asarray(info["model_ll"]).tolist(),
                   "selected": [int(info["model_best_k"]),
                                int(info["model_best_s"])],
                   "pruned_k": len(hmms),
                   "pruned_s": [int(h.model.prior.shape[0])
                                for h in hmms],
                   "groups": [[names[i] for i in g]
                              for g in pruned.groups],
                   "cell_masses": cell_masses}
            runs.append(run)
            print(f"trials={trials} seed={seed}: cell "
                  f"{run['selected']} -> pruned K={run['pruned_k']} "
                  f"S={run['pruned_s']}", flush=True)

    out = {"xls": args.xls, "k_grid": k_grid, "s_grid": s_grid,
           "runs": runs,
           "stable_one_group": all(r["pruned_k"] == 1 for r in runs)}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "runs"},
                     indent=2))


if __name__ == "__main__":
    main()
