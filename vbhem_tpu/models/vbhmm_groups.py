"""Grouped VBEM: per-group priors/transitions with SHARED Gaussian
emissions (the reference's `usegroups` mode, `vbhmm_em.m:62-91,
159-183, 355-363` and the per-group FB dispatch `vbhmm_fb.m:81-93`).

Used for conditions like different stimuli per subject where dynamics
differ but ROIs are shared.  ``group_map`` assigns each sequence to a
group 0..G-1; G is static.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..containers import NIW, SeqBatch
from ..ops.fb import FBStats, expected_log_gauss
from ..ops.fb_pallas import forward_backward_auto
from ..utils.numeric import (e_log_det_lambda, e_log_dirichlet,
                             log_dirichlet_const, log_wishart_b, logdet_psd,
                             tiny)
from .vbhmm import SuffStats, VBHyps, m_step as _shared_m_step, suff_stats


class GroupedPosterior(NamedTuple):
    alpha: jnp.ndarray    # [G, K]
    epsilon: jnp.ndarray  # [G, K, K]
    niw: NIW              # shared across groups

    @property
    def num_groups(self) -> int:
        return self.alpha.shape[0]

    @property
    def num_states(self) -> int:
        return self.alpha.shape[-1]


class GroupedStats(NamedTuple):
    shared: SuffStats          # pooled stats for the shared NIW
    nk1_g: jnp.ndarray         # [G, K] per-group initial counts
    m_g: jnp.ndarray           # [G, K, K] per-group transition counts


def e_step(batch: SeqBatch, post: GroupedPosterior,
           group_map: jnp.ndarray) -> FBStats:
    log_rho = expected_log_gauss(batch.x, post.niw)
    log_pz1 = e_log_dirichlet(post.alpha)[group_map]          # [N, K]
    log_trans = e_log_dirichlet(post.epsilon)[group_map]      # [N, K, K]
    return forward_backward_auto(log_pz1, log_trans, log_rho, batch.mask)


def grouped_stats(batch: SeqBatch, fb: FBStats, group_map: jnp.ndarray,
                  n_groups: int) -> GroupedStats:
    shared = suff_stats(batch, fb)
    one_hot = jax.nn.one_hot(group_map, n_groups, dtype=batch.x.dtype)
    nk1_g = jnp.einsum("ng,nk->gk", one_hot, fb.gamma[:, 0, :])
    m_g = jnp.einsum("ng,nkl->gkl", one_hot, fb.xi_sum)
    return GroupedStats(shared=shared, nk1_g=nk1_g, m_g=m_g)


def m_step(stats: GroupedStats, hyps: VBHyps,
           covar_type: str = "full") -> GroupedPosterior:
    """Per-group Dirichlet updates + shared NIW update
    (`vbhmm_em.m:355-363` + `:365-408`)."""
    shared_post = _shared_m_step(stats.shared, hyps, covar_type)
    alpha = hyps.alpha0 + stats.nk1_g + tiny(stats.nk1_g.dtype)
    epsilon = hyps.epsilon0 + stats.m_g
    return GroupedPosterior(alpha=alpha, epsilon=epsilon,
                            niw=shared_post.niw)


def elbo(batch: SeqBatch, post: GroupedPosterior, fb: FBStats,
         stats: GroupedStats, hyps: VBHyps) -> jnp.ndarray:
    """Grouped ELBO: Dirichlet terms summed per group, NIW terms shared
    (`vbhmm_em_lb.m` usegroups branches)."""
    dtype = batch.x.dtype
    g, k = post.alpha.shape
    d = batch.x.shape[-1]
    niw = post.niw
    two_pi = jnp.asarray(2.0 * jnp.pi, dtype)

    log_lam = e_log_det_lambda(niw.v, niw.w)
    log_pi = e_log_dirichlet(post.alpha)                      # [G, K]
    log_a = e_log_dirichlet(post.epsilon)                     # [G, K, K]
    sh = stats.shared

    logdet_w0inv = jnp.sum(jnp.log(hyps.w0inv_diag))
    log_c_alpha0 = gammaln(k * hyps.alpha0) - k * gammaln(hyps.alpha0)
    log_c_eps0 = gammaln(k * hyps.epsilon0) - k * gammaln(hyps.epsilon0)
    log_b0 = log_wishart_b(logdet_w0inv, hyps.v0, d)

    tr_sw = jnp.einsum("kde,ked->k", sh.s, niw.w)
    dxb = sh.xbar - niw.m
    xbar_w_xbar = jnp.einsum("kd,kde,ke->k", dxb, niw.w, dxb)
    dm = niw.m - hyps.m0[None, :]
    m_w_m = jnp.einsum("kd,kde,ke->k", dm, niw.w, dm)
    tr_w0inv_w = jnp.einsum("d,kdd->k", hyps.w0inv_diag.astype(dtype), niw.w)

    lt1 = 0.5 * jnp.sum(sh.nk * (log_lam - d / niw.beta - niw.v * tr_sw
                                 - niw.v * xbar_w_xbar - d * jnp.log(two_pi)))
    lt2a = jnp.sum(stats.nk1_g * log_pi)
    lt2b = jnp.sum(stats.m_g * log_a)
    lt3 = g * log_c_alpha0 + (hyps.alpha0 - 1.0) * jnp.sum(log_pi)
    lt4 = g * k * log_c_eps0 + (hyps.epsilon0 - 1.0) * jnp.sum(log_a)
    lt51 = 0.5 * jnp.sum(d * jnp.log(hyps.beta0 / two_pi) + log_lam
                         - d * hyps.beta0 / niw.beta
                         - hyps.beta0 * niw.v * m_w_m)
    lt52 = (k * log_b0 + 0.5 * (hyps.v0 - d - 1.0) * jnp.sum(log_lam)
            - 0.5 * jnp.sum(niw.v * tr_w0inv_w))
    lt63 = jnp.sum(fb.gamma * fb.log_rho)
    lt64 = jnp.sum(fb.phi_norm)
    lt6 = lt2a + lt2b + lt63 - lt64
    lt7 = jnp.sum((post.alpha - 1.0) * log_pi) \
        + jnp.sum(log_dirichlet_const(post.alpha)) \
        + jnp.sum((post.epsilon - 1.0) * log_a) \
        + jnp.sum(log_dirichlet_const(post.epsilon))
    log_bk = log_wishart_b(-logdet_psd(niw.w), niw.v, d)
    h_ent = jnp.sum(-log_bk - 0.5 * (niw.v - d - 1.0) * log_lam
                    + 0.5 * niw.v * d)
    lt8 = 0.5 * jnp.sum(log_lam + d * jnp.log(niw.beta / two_pi)) \
        - 0.5 * d * k - h_ent
    return lt1 + lt2a + lt2b + lt3 + lt4 + lt51 + lt52 - lt6 - lt7 - lt8


class GroupedEMState(NamedTuple):
    post: GroupedPosterior
    ll: jnp.ndarray
    it: jnp.ndarray
    gamma: jnp.ndarray
    stats: GroupedStats
    done: jnp.ndarray


def vbem_em(batch: SeqBatch, init_post: GroupedPosterior, hyps: VBHyps,
            group_map: jnp.ndarray, max_iter: int = 100,
            min_diff: float = 1e-5,
            covar_type: str = "full") -> GroupedEMState:
    """Grouped EM loop with the same control flow as the ungrouped one."""
    dtype = batch.x.dtype
    n_groups = init_post.num_groups
    big_neg = jnp.asarray(-jnp.finfo(dtype).max, dtype)

    def body(st: GroupedEMState) -> GroupedEMState:
        fb = e_step(batch, st.post, group_map)
        stats = grouped_stats(batch, fb, group_map, n_groups)
        ll = elbo(batch, st.post, fb, stats, hyps)
        unstable = jnp.isnan(ll)
        ll = jnp.where(unstable, -jnp.inf, ll)
        converged = jnp.logical_and(st.it > 0,
                                    jnp.abs((ll - st.ll) / st.ll) <= min_diff)
        done = converged | unstable | (st.it + 1 >= max_iter)
        new_post = m_step(stats, hyps, covar_type)
        new_post = jax.tree.map(
            lambda a, b: jnp.where(unstable, b, a), new_post, st.post)
        return GroupedEMState(post=new_post, ll=ll, it=st.it + 1,
                              gamma=fb.gamma, stats=stats, done=done)

    fb0 = e_step(batch, init_post, group_map)
    st0 = GroupedEMState(post=init_post, ll=big_neg, it=jnp.asarray(0),
                         gamma=fb0.gamma,
                         stats=grouped_stats(batch, fb0, group_map,
                                             n_groups),
                         done=jnp.asarray(False))
    return jax.lax.while_loop(lambda st: ~st.done, body, st0)


def from_ungrouped(post, n_groups: int) -> GroupedPosterior:
    """Tile an ungrouped posterior into G groups (`vbhmm_em.m:76-87`)."""
    return GroupedPosterior(
        alpha=jnp.broadcast_to(post.alpha[None], (n_groups,) + post.alpha.shape),
        epsilon=jnp.broadcast_to(post.epsilon[None],
                                 (n_groups,) + post.epsilon.shape),
        niw=post.niw)


def split_groups(post: GroupedPosterior):
    """Split into per-group ungrouped posteriors (`vbhmm_group2ind.m`)."""
    from ..containers import HMMPosterior
    return [HMMPosterior(alpha=post.alpha[g], epsilon=post.epsilon[g],
                         niw=post.niw)
            for g in range(post.num_groups)]


# ---------------------------------------------------------------------------
# Front-end: restarts + model selection + hyp learning for grouped data
# (the reference flows usegroups through the full vbhmm_learn path,
#  `vbhmm_learn.m:232-654` + `vbhmm_em.m:62-91`)
# ---------------------------------------------------------------------------

class GroupedResult(NamedTuple):
    """Learned grouped model: shared emissions, per-group dynamics."""
    post: GroupedPosterior
    ll: jnp.ndarray
    counts: jnp.ndarray          # [K] pooled state counts
    group_posts: list            # per-group HMMPosterior (vbhmm_group2ind)
    group_models: list           # per-group point-estimate HMM


def permute(post: GroupedPosterior, perm: jnp.ndarray) -> GroupedPosterior:
    """Apply one state permutation to every group + the shared emissions
    (`vbhmm_permute.m` applied group-wise, `vbhmm_standardize.m:31-38`)."""
    return GroupedPosterior(
        alpha=post.alpha[:, perm],
        epsilon=post.epsilon[:, perm][:, :, perm],
        niw=NIW(beta=post.niw.beta[perm], v=post.niw.v[perm],
                m=post.niw.m[perm], w=post.niw.w[perm]))


def _finalize(st: GroupedEMState) -> GroupedResult:
    from ..containers import HMM
    posts = split_groups(st.post)
    models = [p.to_point() for p in posts]
    return GroupedResult(post=st.post, ll=st.ll, counts=st.stats.shared.nk,
                         group_posts=posts, group_models=models)


def learn_grouped(key, batch: SeqBatch, k, group_map, n_groups: int,
                  config=None, hyps: VBHyps = None):
    """Grouped-VBEM front-end: random restarts, model selection over K
    with the gammaln(K+1) correction, optional empirical-Bayes hyp
    learning, and emission-count standardization — the full
    `vbhmm_learn` pipeline for `usegroups` data (`vbhmm_em.m:62-91`).

    Returns (GroupedResult, info dict).
    """
    import numpy as np
    from ..config import VBConfig
    from .vbhmm import random_init
    from .. import hyp as hypmod

    config = config or VBConfig()
    group_map = jnp.asarray(group_map)

    if isinstance(k, (list, tuple, range)):
        ks = list(k)
        results, infos, lls = [], [], []
        for ki, kk in enumerate(ks):
            res, inf = learn_grouped(jax.random.fold_in(key, ki), batch,
                                     int(kk), group_map, n_groups, config,
                                     hyps)
            results.append(res)
            infos.append(inf)
            lls.append(float(res.ll))
        corrected = np.asarray(lls) + np.asarray(
            [float(gammaln(kk + 1)) for kk in ks])
        best = int(np.argmax(corrected))
        info = {"model_ll": corrected, "model_k": ks,
                "model_best_k": ks[best], "model_all": results,
                "model_infos": infos}
        return results[best], info

    kk = int(k)
    dtype = batch.x.dtype
    hyps0 = hyps if hyps is not None else VBHyps.from_config(
        config, batch.x.shape[-1], dtype)
    numtrials = 1 if kk == 1 else config.numtrials

    def one_trial(tk):
        p0 = random_init(tk, batch, kk, hyps0, config.covar_type)
        return vbem_em(batch, from_ungrouped(p0, n_groups), hyps0,
                       group_map, max_iter=config.max_iter,
                       min_diff=config.min_diff,
                       covar_type=config.covar_type)

    states = jax.vmap(one_trial)(jax.random.split(key, numtrials))
    info = {"model_best_k": kk, "vbopt": config}

    if config.learn_hyps:
        dim = batch.x.shape[-1]
        specs = hypmod.vb_specs(dim, config.bounds, config.learn_hyps_keys)
        uniq = hypmod.unique_ll(np.asarray(states.ll), config.min_diff)
        if config.max_hyp_solutions is not None:
            uniq = uniq[:config.max_hyp_solutions]
        if len(uniq) == 0:
            uniq = np.asarray([int(np.argmax(np.asarray(states.ll)))])
        uniq = hypmod.pad_lanes(uniq, bucket=4)
        idx = jnp.asarray(uniq)
        init_posts = jax.tree.map(lambda a: a[idx], states.post)

        def neg_elbo(h, init_post):
            st = vbem_em(batch, init_post, jax.lax.stop_gradient(h),
                         group_map, max_iter=config.max_iter,
                         min_diff=config.min_diff,
                         covar_type=config.covar_type)
            post = jax.lax.stop_gradient(st.post)
            fb = e_step(batch, post, group_map)
            stats = grouped_stats(batch, fb, group_map, n_groups)
            return -elbo(batch, post, fb, stats, h)

        hyps_b, _, _ = hypmod.optimize_hyps_batched(
            neg_elbo, hyps0, specs, (init_posts,),
            max_steps=config.hyp_max_steps)

        def rerun(h, p):
            return vbem_em(batch, p, h, group_map,
                           max_iter=config.max_iter,
                           min_diff=config.min_diff,
                           covar_type=config.covar_type)

        sts = jax.jit(jax.vmap(rerun))(hyps_b, init_posts)
        best = int(jnp.argmax(sts.ll))
        st = jax.tree.map(lambda a: a[best], sts)
        info["learned_hyps"] = jax.tree.map(lambda a: a[best], hyps_b)
    else:
        best = int(jnp.argmax(states.ll))
        st = jax.tree.map(lambda a: a[best], states)

    if config.sortclusters:
        # shared emissions -> one permutation for every group, by pooled
        # emission counts (mode 'e'; the reference recurses the chosen
        # mode into each group HMM, `vbhmm_standardize.m:31-38`)
        perm = jnp.argsort(-st.stats.shared.nk)
        new_post = permute(st.post, perm)
        fb = e_step(batch, new_post, group_map)
        st = st._replace(post=new_post,
                         stats=grouped_stats(batch, fb, group_map,
                                             n_groups), gamma=fb.gamma)
    return _finalize(st), info
