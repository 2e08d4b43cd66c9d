"""Round-trip load check for the TRACKED acceptance snapshots
(`acceptance/<run>/r*_<stage>.pkl`).

The snapshots are pickles whose payloads reference vbhem_tpu classes
(e.g. `experiments.synthetic.RecoveryScore`); a rename/move of those
classes would silently orphan every tracked result.  This test fails
fast on such a refactor, and validates the fields the aggregator
consumes (ADVICE r3)."""
import glob
import os
import pickle

import numpy as np
import pytest

ACCEPT_DIR = os.path.join(os.path.dirname(__file__), "..", "acceptance")

SNAPSHOTS = sorted(glob.glob(os.path.join(ACCEPT_DIR, "*", "r*_*.pkl")))


@pytest.mark.skipif(not SNAPSHOTS, reason="no tracked snapshots")
def test_tracked_snapshots_load_and_validate():
    from vbhem_tpu.experiments.synthetic import RecoveryScore

    n_scores = 0
    for p in SNAPSHOTS:
        with open(p, "rb") as f:
            obj = pickle.load(f)
        stage = os.path.basename(p).split("_", 1)[1].rsplit(".", 1)[0]
        if stage == "dist":
            d = np.asarray(obj)
            assert d.ndim == 2 and d.shape[0] == d.shape[1], p
            assert np.isfinite(d).all(), p
            continue
        assert isinstance(obj, dict), p
        for key, val in obj.items():
            if key.endswith("score"):
                assert isinstance(val, RecoveryScore), (p, key)
                assert np.isfinite(val.rand_index), (p, key)
                assert 0 <= val.purity <= 1 + 1e-9, (p, key)
                n_scores += 1
    assert n_scores > 0


@pytest.mark.skipif(not SNAPSHOTS, reason="no tracked snapshots")
def test_aggregate_from_tracked_snapshots():
    """`aggregate_from_checkpoints` must summarize the tracked union
    dir without recomputation (and segregate mixed scales if meta
    sidecars ever disagree)."""
    from vbhem_tpu.experiments import runner

    for run_dir in sorted(glob.glob(os.path.join(ACCEPT_DIR, "*"))):
        summary = runner.aggregate_from_checkpoints(run_dir, 10)
        assert summary, run_dir
        if "mixed_configs" in summary:
            for g in summary["groups"].values():
                assert g["summary"], run_dir
        else:
            # reserved sidecar keys live alongside the method entries
            # in the flat summary (see aggregate_from_checkpoints)
            methods = {m: st for m, st in summary.items()
                       if m not in ("provenance", "excluded")}
            assert methods, run_dir
            for m, st in methods.items():
                assert st["n_repeats"] >= 1, (run_dir, m)
