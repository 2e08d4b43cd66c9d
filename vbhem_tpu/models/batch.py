"""Batch VBEM over subjects, with optional batch hyperparameter
learning (one shared hyp vector optimized over the summed objective).

Parity map: `src/hmm/vbhmm_learn_batch.m` — per-subject learning
(`:56-78`, a `parfor` there, a loop of jitted fits here), and batch hyp
learning (`:107-457`): per-subject init solutions are kept, a shared
transformed hyp vector is optimized with BFGS where each function eval
re-runs EM for every (subject, kept-init) pair, scores each subject by
its best solution, and sums over subjects.

TPU-first delta: the (subject x kept-init) EM runs are one vmapped
batch (the reference flattens them into one `parfor`, `:347-457`);
requires homogeneous sequence counts per subject (pad sequences to a
common T; heterogeneous N falls back to the slower per-subject path).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VBConfig
from ..containers import SeqBatch
from . import vbhmm


def learn_batch(key: jax.Array, batches: Sequence[SeqBatch], k: int,
                config: VBConfig = VBConfig(),
                learn_hyps_batch: bool = False,
                keep_inits: int = 3):
    """Learn one HMM per subject.

    With ``learn_hyps_batch`` (reference `vbopt.learn_hyps_batch`), a
    single hyp vector shared by all subjects is optimized over the
    summed best-solution ELBOs; returns (results, info) where info
    carries the learned hyps.
    """
    if not learn_hyps_batch:
        results = []
        for i, b in enumerate(batches):
            res, _ = vbhmm.learn(jax.random.fold_in(key, i), b, k, config)
            results.append(res)
        return results, {}

    dim = batches[0].x.shape[-1]
    dtype = batches[0].x.dtype
    hyps0 = vbhmm.VBHyps.from_config(config, dim, dtype)

    # 1) per-subject trials with base hyps; keep top unique solutions
    #    (`vbhmm_learn_batch.m:107-117`, keep_suboptimal_hmms=1)
    from .. import hyp as hypmod
    kept_posts = []   # list over subjects of posteriors stacked [M, ...]
    for i, b in enumerate(batches):
        states = vbhmm.fit_single_k(jax.random.fold_in(key, i), b, k,
                                    config, hyps0)
        uniq = hypmod.unique_ll(np.asarray(states.ll),
                                config.min_diff)[:keep_inits]
        idx = list(uniq) + [int(uniq[0])] * (keep_inits - len(uniq))
        kept_posts.append(jax.tree.map(
            lambda a: a[jnp.asarray(idx)], states.post))

    same_shapes = len({(int(b.x.shape[0]), int(b.x.shape[1]))
                       for b in batches}) == 1
    if not same_shapes:
        # heterogeneous subjects: per-subject independent hyp-opt
        # fallback (still empirical Bayes, just not tied)
        results = []
        for i, b in enumerate(batches):
            cfgi = config
            res, _ = vbhmm.learn(jax.random.fold_in(key, i), b, k, cfgi)
            results.append(res)
        return results, {"note": "heterogeneous shapes: untied hyps"}

    xs = jnp.stack([b.x for b in batches])            # [S, N, T, D]
    lens = jnp.stack([b.lengths for b in batches])    # [S, N]
    posts = jax.tree.map(lambda *a: jnp.stack(a), *kept_posts)  # [S, M,...]

    specs = hypmod.vb_specs(dim, config.bounds, config.learn_hyps_keys)

    def subject_best_ll(hyps, x, lengths, posts_s):
        b = SeqBatch(x=x, lengths=lengths)

        def one(init_post):
            st = vbhmm.vbem_em(b, init_post, jax.lax.stop_gradient(hyps),
                               max_iter=config.max_iter,
                               min_diff=config.min_diff)
            post = jax.lax.stop_gradient(st.post)
            fb = vbhmm.e_step(b, post)
            stats = vbhmm.suff_stats(b, fb)
            return vbhmm.elbo(b, post, fb, stats, hyps)

        lls = jax.vmap(one)(posts_s)                   # [M]
        return jnp.max(lls)

    def neg_total(hyps):
        lls = jax.vmap(subject_best_ll, in_axes=(None, 0, 0, 0))(
            hyps, xs, lens, posts)
        # normalized by batch size (`vbhmm_learn_batch.m:455-457`)
        return -jnp.sum(lls) / len(batches)

    hyps_opt, info = hypmod.optimize_hyps(neg_total, hyps0, specs)

    # 3) final per-subject refits with the shared optimal hyps
    results = []
    for i, b in enumerate(batches):
        posts_s = jax.tree.map(lambda a: a[i], posts)
        sts = jax.vmap(lambda p: vbhmm.vbem_em(
            b, p, hyps_opt, max_iter=config.max_iter,
            min_diff=config.min_diff))(posts_s)
        best = int(jnp.argmax(sts.ll))
        st = jax.tree.map(lambda a: a[best], sts)
        res = vbhmm.finalize(b, st)
        if config.sortclusters:
            res = vbhmm.standardize(res, config.sortclusters)
        results.append(res)
    return results, {"learned_hyps": hyps_opt, **info}
