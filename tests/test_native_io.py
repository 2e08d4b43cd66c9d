"""Native C++ CSV loader vs the pandas reader (dual-path parity, the
discipline the reference used for MEX vs MATLAB)."""
import os
import numpy as np
import pytest

from vbhem_tpu.utils import io as pyio
from vbhem_tpu.utils import native_io


@pytest.fixture(scope="module")
def csv_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("io") / "fix.csv"
    rows = ["SubjectID,TrialID,FixX,FixY,FixD"]
    rng = np.random.default_rng(0)
    for subj in ("s1", "s2"):
        for trial in range(3):
            t_len = int(rng.integers(2, 6))
            for _ in range(t_len):
                x, y, d = rng.normal(200, 40, 3)
                rows.append(f"{subj},t{trial},{x:.4f},{y:.4f},{abs(d):.4f}")
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_native_builds_and_matches_pandas(csv_file):
    if not native_io.native_available():
        pytest.skip("no g++/make in environment")
    got = native_io.read_fixations_native(csv_file)
    want = pyio.read_fixations(csv_file)
    assert set(got) == set(want)
    for name in want:
        np.testing.assert_array_equal(np.asarray(got[name].lengths),
                                      np.asarray(want[name].lengths))
        np.testing.assert_allclose(np.asarray(got[name].x),
                                   np.asarray(want[name].x), atol=1e-12)


def test_auto_reader_roundtrip(csv_file):
    out = native_io.read_fixations_auto(csv_file)
    assert len(out) == 2
    assert out["s1"].x.shape[-1] == 3  # FixD -> 3rd dim


def test_demo_xls_integration(tmp_path):
    """End-to-end --xls path of the face demo: generated fixation CSV ->
    native loader -> per-subject VBEM -> VBHEM clustering (the
    `vbdemo_face.m` pipeline on `read_xls_fixations.m`-format input)."""
    import subprocess
    import sys
    import numpy as np
    rng = np.random.default_rng(0)
    rows = ["SubjectID,TrialID,FixX,FixY"]
    for si in range(4):
        c = np.array([180.0, 150.0]) if si < 2 else np.array([300.0, 230.0])
        for tr in range(6):
            for _ in range(8):
                x, y = c + rng.normal(0, 25, 2)
                rows.append(f"s{si:02d},{tr + 1},{x:.1f},{y:.1f}")
    csv = tmp_path / "fix.csv"
    csv.write_text("\n".join(rows) + "\n")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "demo_out"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "examples",
                                      "demo_fixations.py"),
         "--xls", str(csv), "--out", str(out), "--cpu", "--quick"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "VBHEM_TPU_NO_COMPILE_CACHE": "1",
             "MPLBACKEND": "Agg", "PYTHONPATH": repo})
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "selected K" in proc.stdout, proc.stdout
    assert (out / "s00.png").exists() or list(out.glob("*.png")), \
        proc.stdout
