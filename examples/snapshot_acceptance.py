"""Snapshot the SMALL method-stage checkpoints of an acceptance run
into the tracked `acceptance/<name>/` directory so completed repeats
survive across build rounds (run directories themselves are gitignored;
datasets/VBEM banks are seed-deterministic and recomputable, so only
the completed method results are worth tracking — each is a few KB).

`examples/aggregate_run.py acceptance/<name>` then aggregates the union
of every round's completed repeats.

Usage:  python examples/snapshot_acceptance.py syn10
"""
import argparse
import filecmp
import glob
import os
import shutil
import sys

STAGES = ("vbhem", "vhem", "ccfd", "ppk", "dist")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--dest", default=None,
                    help="default acceptance/<basename of outdir>")
    ap.add_argument("--force", action="store_true",
                    help="allow overwriting an existing snapshot file "
                         "whose content differs")
    args = ap.parse_args()
    dest = args.dest or os.path.join(
        "acceptance", os.path.basename(os.path.normpath(args.outdir)))
    os.makedirs(dest, exist_ok=True)
    n = 0
    # meta sidecars first (run config: scale/grids/dtype), so the
    # aggregate can segregate repeats run at different scales
    patterns = ["r*_meta.json"] + [f"r*_{s}.pkl" for s in STAGES]
    for pat in patterns:
        for p in sorted(glob.glob(os.path.join(args.outdir, pat))):
            q = os.path.join(dest, os.path.basename(p))
            if os.path.exists(q) and not filecmp.cmp(p, q, shallow=False):
                if not args.force:
                    sys.exit(f"refusing to overwrite {q} with differing "
                             f"content (use --force)")
                print(f"overwriting {q} (--force)")
            shutil.copy2(p, q)
            n += 1
    print(f"copied {n} checkpoint/meta files -> {dest}")


if __name__ == "__main__":
    main()
