"""End-to-end synthetic-benchmark runner: stage checkpointing, resume,
and aggregation (`exprmt1_demo.m` save/load discipline +
`syn_evluate.m` scoring)."""
import os
import time

import jax
import pytest

from vbhem_tpu.config import HEMConfig, VBConfig, VBHEMConfig
from vbhem_tpu.experiments import runner


@pytest.fixture(scope="module")
def outdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("syn"))


def _kwargs():
    return dict(
        n_per_cluster=3, n_seqs=6, t=20, k_grid=[1, 2], s_grid=[2],
        vb_config=VBConfig(mu0=(1.5, 1.5), w0=1.0, numtrials=2),
        vbhem_config=VBHEMConfig(alpha0=1e6, m0=(1.5, 1.5), w0=1.0,
                                 nv=100, tau=20, trials=3,
                                 initmode="baseem", learn_hyps=False),
        hem_config=HEMConfig(trials=3, nv=100, tau=10),
        methods=("vbhem", "vhem"), verbose=False)


def test_runner_stages_and_resume(outdir):
    out1 = runner.run_repeat(0, outdir, **_kwargs())
    assert set(out1["scores"]) == {"vbhem", "vbhem_dic", "vhem_aic",
                                   "vhem_bic"}
    for stage in ("data", "vbem", "vbhem", "vhem"):
        assert os.path.exists(runner._ckpt_path(outdir, 0, stage)), stage
    # resume: second run must come entirely from checkpoints (fast)
    t0 = time.time()
    out2 = runner.run_repeat(0, outdir, **_kwargs())
    assert time.time() - t0 < 5.0
    def core(sc):  # labels is an ndarray -> compare scalar fields
        return (sc.rand_index, sc.purity, sc.best_k, sc.best_s)
    assert core(out2["scores"]["vbhem"]) == core(out1["scores"]["vbhem"])

    summary = runner.aggregate([out1])
    assert summary["vbhem"]["n_repeats"] == 1
    assert 0.0 <= summary["vbhem"]["rand_index_mean"] <= 1.0
