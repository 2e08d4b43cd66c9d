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
import glob
import os
import shutil

STAGES = ("vbhem", "vhem", "ccfd", "ppk", "dist")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--dest", default=None,
                    help="default acceptance/<basename of outdir>")
    args = ap.parse_args()
    dest = args.dest or os.path.join(
        "acceptance", os.path.basename(os.path.normpath(args.outdir)))
    os.makedirs(dest, exist_ok=True)
    n = 0
    for stage in STAGES:
        for p in sorted(glob.glob(os.path.join(args.outdir,
                                               f"r*_{stage}.pkl"))):
            shutil.copy2(p, os.path.join(dest, os.path.basename(p)))
            n += 1
    print(f"copied {n} stage checkpoints -> {dest}")


if __name__ == "__main__":
    main()
