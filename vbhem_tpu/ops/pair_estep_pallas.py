"""Fused Pallas TPU kernel for the VBHEM/VHEM pair E-step.

This is the Pallas replacement for the reference C kernels
(`vbhem_hmm_bwd_fwd_mex.c` / `hem_hmm_bwd_fwd_mex.c`), fusing the whole
backward + forward recursion over the virtual length tau into one
kernel so the intermediate Theta tensors never leave VMEM.

Layout strategy: state counts (Sb, Sr) are tiny (2-8) while the base
bank Kb is large, so every tensor is transposed to put **Kb on the TPU
minor axes** — and not just the 128-wide lane axis: each block carries
Kb as a trailing ``(tile/128, 8x128-ready)`` pair reshaped host-side to
``[..., tile//128, 128]``, so Mosaic's (8, 128) vector registers are
FULLY occupied (sublanes carry Kb too).  With the old ``[.., 128]``
blocks the second-minor axis was a state dim of size 2-3 and every
vreg ran 5/8 empty — measured 5x kernel-throughput difference at the
bench shape.  Recursion arithmetic vectorizes across base HMMs on the
VPU, the per-pair [Sb x Sb] / [Sr x Sr] contractions unroll into a
handful of register-wide multiply-adds, and the log-sum-exp reduces
over a small leading axis.  The grid tiles (Kr, Kb/tile); per grid
cell the tau Theta slices live in a VMEM scratch of
[tau-1, Sr, Sb, Sr, tile//128, 128].

Semantics are identical to :func:`..pair_estep.pair_bwd_fwd` (oracle
parity enforced in tests/test_pair_pallas.py); inputs/outputs use the
same [Kb, ...] layout and are transposed at the boundary (cheap
relative to the recursion).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pair_estep import PairStats

LANE = 128
# Kb elements per grid cell: 8 sublanes x 128 lanes fills the (8, 128)
# vector registers end to end
TILE = 8 * LANE


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _recursion(ell, prior, trans, log_pi, log_a,
               ll_ref, nu1_ref, sxi_ref, stn_ref, theta_scr,
               tau: int, sb: int, sr: int):
    """Shared backward+forward recursion body over one (j, i_tile)
    block.  ell/prior/trans carry trailing (S, L) Kb axes; log_pi/log_a
    are per-j scalars/vectors."""

    def lse_rc(logtheta):
        # logsumexp over the state axis rc:
        # [sr, sb, sr, S, L] -> [sr, sb, S, L]
        m = jnp.max(logtheta, axis=2)
        return m + jnp.log(jnp.sum(jnp.exp(logtheta - m[:, :, None]),
                                   axis=2))

    # ---- backward (unrolled: tau is static and small; static scratch
    # indices avoid Mosaic's unsupported >2D dynamic gathers) ----
    ll_old = jnp.zeros_like(ell)                       # [sb, sr, S, L]
    for t in range(tau - 1):
        # logtheta[rp, b, rc, S, L]
        logtheta = (log_a[:, None, :, None, None]
                    + (ell + ll_old)[None, :, :, :, :])
        lse = lse_rc(logtheta)                         # [sr, sb, S, L]
        theta_scr[t] = jnp.exp(logtheta - lse[:, :, None])
        # ll_new[b, r, S, L] = sum_c trans[b, c, S, L] * lse[r, c, S, L]
        # (unrolled over the tiny Sb axis: Mosaic does not lower
        # lane-batched matmuls, and these are VPU-sized anyway)
        ll_old = jnp.stack(
            [jnp.sum(trans[b][None, :] * lse, axis=1)
             for b in range(sb)])                      # [sb, sr, S, L]

    # ---- terminate (t = 1) ----
    logtheta1 = log_pi[None, :, None, None] + ell + ll_old  # [sb,sr,S,L]
    m1 = jnp.max(logtheta1, axis=1)                    # [sb, S, L]
    lse1 = m1 + jnp.log(jnp.sum(jnp.exp(logtheta1 - m1[:, None]), axis=1))
    theta1 = jnp.exp(logtheta1 - lse1[:, None])        # [sb, sr, S, L]
    ll_ref[0, 0] = jnp.sum(prior * lse1, axis=0)       # [S, L]

    # ---- forward ----
    nu = prior[:, None] * theta1                       # [sb(b), sr(r), S, L]
    nu = jnp.swapaxes(nu, 0, 1)                        # [sr, sb, S, L]
    nu1_ref[0] = jnp.sum(nu, axis=1)
    sum_xi = jnp.zeros((sr, sr) + ell.shape[-2:], dtype=ell.dtype)
    sum_t_nu = nu

    # theta slices were stored t = tau..2; forward needs t = 2..tau,
    # i.e. scratch indices tau-2 down to 0 (unrolled, static).
    for step in range(tau - 1):
        theta_t = theta_scr[tau - 2 - step]            # [rp, b, rc, S, L]
        # foo[rp, c, S, L] = sum_b nu[rp, b, S, L] trans[b, c, S, L]
        foo = jnp.stack(
            [jnp.sum(nu * trans[:, c][None], axis=1)
             for c in range(sb)], axis=1)              # [sr, sb, S, L]
        xi = foo[:, :, None] * theta_t                 # [rp, b, rc, S, L]
        sum_xi = sum_xi + jnp.sum(xi, axis=1)          # [rp, rc, S, L]
        nu = jnp.swapaxes(jnp.sum(xi, axis=0), 0, 1)   # [rc, b, S, L]
        sum_t_nu = sum_t_nu + nu
    sxi_ref[0] = sum_xi
    stn_ref[0] = sum_t_nu


def _kernel(ell_ref, prior_ref, trans_ref, log_pi_ref, log_a_ref,
            ll_ref, nu1_ref, sxi_ref, stn_ref, theta_scr, *, tau: int,
            sb: int, sr: int):
    """Grid cell = (j, i_tile).  Block shapes (leading Kr axis == 1;
    trailing (S, L) = (tile//128, 128) is the Kb tile):
      ell:    [1, sb, sr, S, L]      prior: [sb, S, L]
      trans:  [sb, sb, S, L]         log_pi: [1, sr, 1, 1]
      log_a:  [1, sr, sr, 1, 1]
      outputs: ll [1, 1, S, L], nu1 [1, sr, S, L], sxi [1, sr, sr, S, L],
               stn [1, sr, sb, S, L]
      scratch: theta [tau-1, sr, sb, sr, S, L]
    """
    _recursion(ell_ref[0], prior_ref[...], trans_ref[...],
               log_pi_ref[0, :, 0, 0], log_a_ref[0, :, :, 0, 0],
               ll_ref, nu1_ref, sxi_ref, stn_ref, theta_scr,
               tau, sb, sr)


def _kernel_fused(mean_ref, cov_ref, prior_ref, trans_ref, log_pi_ref,
                  log_a_ref, mr_ref, wr_ref, scal_ref,
                  ll_ref, nu1_ref, sxi_ref, stn_ref, theta_scr, *,
                  tau: int, sb: int, sr: int, d: int):
    """Like :func:`_kernel` but computes the expected-emission matrix
    E3logN IN the kernel from the base moments and the reduced NIW
    posterior (`vbhem_hmm_bwd_fwd_fast.m:102-135`), so the [Kb,Kr,Sb,Sr]
    ell tensor never exists in HBM.  Extra blocks:
      mean: [sb, d, S, L]     cov: [sb, d, d, S, L]
      mr:   [1, sr, d, 1, 1]  wr:  [1, sr, d, d, 1, 1]
      scal: [1, 3, sr, 1, 1]  rows = (log_lam_tilde, v, lambda)
    """
    mean = mean_ref[...]                    # [sb, d, S, L]
    cov = cov_ref[...]                      # [sb, d, d, S, L]
    mr = mr_ref[0, :, :, 0, 0]              # [sr, d]
    wr = wr_ref[0, :, :, :, 0, 0]           # [sr, d, d]
    log_lam = scal_ref[0, 0, :, 0, 0]       # [sr]
    v = scal_ref[0, 1, :, 0, 0]             # [sr]
    lam = scal_ref[0, 2, :, 0, 0]           # [sr]
    c2pi = d * jnp.log(jnp.asarray(2.0 * jnp.pi, mean.dtype))

    rows = []
    for b in range(sb):
        cols = []
        for r in range(sr):
            tr = None
            quad = None
            for di in range(d):
                diff_d = mean[b, di] - mr[r, di]       # [S, L]
                for ei in range(d):
                    t = wr[r, di, ei] * cov[b, ei, di]
                    tr = t if tr is None else tr + t
                    q = diff_d * wr[r, di, ei] * (mean[b, ei] - mr[r, ei])
                    quad = q if quad is None else quad + q
            cols.append(-0.5 * (c2pi - log_lam[r] + d / lam[r]
                                + v[r] * (tr + quad)))
        rows.append(jnp.stack(cols))
    ell = jnp.stack(rows)                   # [sb, sr, S, L]

    _recursion(ell, prior_ref[...], trans_ref[...],
               log_pi_ref[0, :, 0, 0], log_a_ref[0, :, :, 0, 0],
               ll_ref, nu1_ref, sxi_ref, stn_ref, theta_scr,
               tau, sb, sr)


def pair_bwd_fwd_pallas(prior_b: jnp.ndarray, trans_b: jnp.ndarray,
                        log_pi_r: jnp.ndarray, log_a_r: jnp.ndarray,
                        ell: jnp.ndarray, tau: int,
                        tile: int = TILE,
                        interpret: bool = False) -> PairStats:
    """Drop-in replacement for :func:`..pair_estep.pair_bwd_fwd`.

    Same argument/result layout ([Kb, ...] leading); internally
    transposes to minor-axes-major [.., Kb//128, 128] and pads Kb to
    the tile size (``tile`` must be a multiple of 128; 1024 = full
    (8, 128) vreg occupancy).
    """
    kb, kr, sb, sr = ell.shape
    dtype = ell.dtype
    assert tile % LANE == 0, tile
    sub = tile // LANE
    kb_p = _round_up(max(kb, tile), tile)

    # transpose to Kb-minor, pad the Kb axis, split into (S, L)
    def padk(a):
        pad = [(0, 0)] * a.ndim
        pad[-1] = (0, kb_p - kb)
        a = jnp.pad(a, pad)
        return a.reshape(a.shape[:-1] + (kb_p // LANE, LANE))

    ell_t = padk(jnp.transpose(ell, (1, 2, 3, 0)))      # [Kr,Sb,Sr,S*,L]
    prior_t = padk(jnp.transpose(prior_b, (1, 0)))      # [Sb,S*,L]
    trans_t = padk(jnp.transpose(trans_b, (1, 2, 0)))   # [Sb,Sb,S*,L]
    log_pi_t = log_pi_r[:, :, None, None]               # [Kr,Sr,1,1]
    log_a_t = log_a_r[:, :, :, None, None]              # [Kr,Sr,Sr,1,1]

    n_tiles = kb_p // tile
    grid = (kr, n_tiles)

    out_shapes = (
        jax.ShapeDtypeStruct((kr, 1, kb_p // LANE, LANE), dtype),      # ll
        jax.ShapeDtypeStruct((kr, sr, kb_p // LANE, LANE), dtype),     # nu1
        jax.ShapeDtypeStruct((kr, sr, sr, kb_p // LANE, LANE), dtype),  # sum_xi
        jax.ShapeDtypeStruct((kr, sr, sb, kb_p // LANE, LANE), dtype),  # sum_t_nu
    )
    kernel = functools.partial(_kernel, tau=tau, sb=sb, sr=sr)
    ll_t, nu1_t, sxi_t, stn_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, sb, sr, sub, LANE),
                         lambda j, i: (j, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sb, sub, LANE), lambda j, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sb, sb, sub, LANE), lambda j, i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr, 1, 1), lambda j, i: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr, sr, 1, 1), lambda j, i: (j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, sub, LANE), lambda j, i: (j, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr, sub, LANE), lambda j, i: (j, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr, sr, sub, LANE),
                         lambda j, i: (j, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr, sb, sub, LANE),
                         lambda j, i: (j, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((max(tau - 1, 1), sr, sb, sr, sub, LANE), dtype),
        ],
        interpret=interpret,
    )(ell_t, prior_t, trans_t, log_pi_t, log_a_t)

    # collapse (S, L) back to Kb, transpose back and strip padding
    def unsplit(a):
        return a.reshape(a.shape[:-2] + (kb_p,))

    return PairStats(
        ll_elbo=jnp.transpose(unsplit(ll_t)[:, 0, :], (1, 0))[:kb],
        nu_1=jnp.transpose(unsplit(nu1_t), (2, 0, 1))[:kb],
        sum_xi=jnp.transpose(unsplit(sxi_t), (3, 0, 1, 2))[:kb],
        sum_t_nu=jnp.transpose(unsplit(stn_t), (3, 0, 1, 2))[:kb],
    )


def pair_bwd_fwd_fused_pallas(prior_b, trans_b, mean_b, cov_b,
                              log_pi_r, log_a_r, m_r, w_r, v_r, lam_r,
                              log_lam_r, tau: int, tile: int = TILE,
                              interpret: bool = False) -> PairStats:
    """Fully-fused pair E-step: expected-emission matrix (E3logN,
    variational flavor) + backward/forward recursions in ONE kernel.
    The [Kb, Kr, Sb, Sr] ell tensor never touches HBM — at the bench
    shape the separate ell einsums + kernel boundary cost more than the
    whole recursion."""
    kb, sb, d = mean_b.shape
    kr, sr = log_pi_r.shape
    dtype = mean_b.dtype
    assert tile % LANE == 0, tile
    sub = tile // LANE
    kb_p = _round_up(max(kb, tile), tile)

    def padk(a):
        pad = [(0, 0)] * a.ndim
        pad[-1] = (0, kb_p - kb)
        a = jnp.pad(a, pad)
        return a.reshape(a.shape[:-1] + (kb_p // LANE, LANE))

    mean_t = padk(jnp.transpose(mean_b, (1, 2, 0)))     # [Sb,D,S*,L]
    cov_t = padk(jnp.transpose(cov_b, (1, 2, 3, 0)))    # [Sb,D,D,S*,L]
    prior_t = padk(jnp.transpose(prior_b, (1, 0)))      # [Sb,S*,L]
    trans_t = padk(jnp.transpose(trans_b, (1, 2, 0)))   # [Sb,Sb,S*,L]
    log_pi_t = log_pi_r[:, :, None, None]               # [Kr,Sr,1,1]
    log_a_t = log_a_r[:, :, :, None, None]              # [Kr,Sr,Sr,1,1]
    mr_t = m_r[:, :, :, None, None]                     # [Kr,Sr,D,1,1]
    wr_t = w_r[:, :, :, :, None, None]                  # [Kr,Sr,D,D,1,1]
    scal_t = jnp.stack([log_lam_r, v_r, lam_r],
                       axis=1)[:, :, :, None, None]     # [Kr,3,Sr,1,1]

    n_tiles = kb_p // tile
    grid = (kr, n_tiles)
    out_shapes = (
        jax.ShapeDtypeStruct((kr, 1, kb_p // LANE, LANE), dtype),
        jax.ShapeDtypeStruct((kr, sr, kb_p // LANE, LANE), dtype),
        jax.ShapeDtypeStruct((kr, sr, sr, kb_p // LANE, LANE), dtype),
        jax.ShapeDtypeStruct((kr, sr, sb, kb_p // LANE, LANE), dtype),
    )
    kernel = functools.partial(_kernel_fused, tau=tau, sb=sb, sr=sr, d=d)
    ll_t, nu1_t, sxi_t, stn_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((sb, d, sub, LANE), lambda j, i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sb, d, d, sub, LANE),
                         lambda j, i: (0, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sb, sub, LANE), lambda j, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sb, sb, sub, LANE), lambda j, i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr, 1, 1), lambda j, i: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr, sr, 1, 1), lambda j, i: (j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr, d, 1, 1), lambda j, i: (j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr, d, d, 1, 1),
                         lambda j, i: (j, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, sr, 1, 1), lambda j, i: (j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, sub, LANE), lambda j, i: (j, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr, sub, LANE), lambda j, i: (j, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr, sr, sub, LANE),
                         lambda j, i: (j, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr, sb, sub, LANE),
                         lambda j, i: (j, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((max(tau - 1, 1), sr, sb, sr, sub, LANE), dtype),
        ],
        interpret=interpret,
    )(mean_t, cov_t, prior_t, trans_t, log_pi_t, log_a_t, mr_t, wr_t,
      scal_t)

    def unsplit(a):
        return a.reshape(a.shape[:-2] + (kb_p,))

    return PairStats(
        ll_elbo=jnp.transpose(unsplit(ll_t)[:, 0, :], (1, 0))[:kb],
        nu_1=jnp.transpose(unsplit(nu1_t), (2, 0, 1))[:kb],
        sum_xi=jnp.transpose(unsplit(sxi_t), (3, 0, 1, 2))[:kb],
        sum_t_nu=jnp.transpose(unsplit(stn_t), (3, 0, 1, 2))[:kb],
    )


# VMEM budget for the Theta scratch (bytes); past this the fused kernel
# would spill, so the XLA scan path (which streams Theta through HBM) wins.
_SCRATCH_BUDGET = 8 * 1024 * 1024


@functools.lru_cache(maxsize=None)
def _pallas_vmappable(tau: int, interpret: bool = False):
    """Wrap the Pallas call in a `custom_vmap` whose batching rule FOLDS
    the batch axis into the reduced-model axis Kr instead of vmapping the
    `pallas_call`.

    This matters twice: (a) the folded call is one big kernel launch with
    grid (B*Kr, Kb/TILE) — exactly how restart trials should ride the
    hardware; (b) vmap of a raw pallas_call hangs the remote-TPU (axon)
    platform outright, so it must never be emitted.
    """
    from .pair_estep import pair_bwd_fwd

    @jax.custom_batching.custom_vmap
    def f(prior_b, trans_b, log_pi_r, log_a_r, ell):
        return pair_bwd_fwd_pallas(prior_b, trans_b, log_pi_r, log_a_r,
                                   ell, tau, interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, prior_b, trans_b, log_pi_r, log_a_r,
              ell):
        batched_out = PairStats(ll_elbo=True, nu_1=True, sum_xi=True,
                                sum_t_nu=True)
        pb, tb, pib, lab, eb = in_batched
        if pb or tb:
            # Base bank batched per trial (doesn't happen in the engines;
            # trials share the base): use the XLA path, where vmap is free.
            res = jax.vmap(
                lambda *a: pair_bwd_fwd(*a, tau=tau),
                in_axes=tuple(0 if x else None for x in in_batched))(
                    prior_b, trans_b, log_pi_r, log_a_r, ell)
            return res, batched_out

        b = axis_size
        kr, sr = log_pi_r.shape[-2], log_pi_r.shape[-1]
        kb, sb = prior_b.shape

        def bc(a, batched):
            return a if batched else jnp.broadcast_to(a[None],
                                                      (b,) + a.shape)

        log_pi = bc(log_pi_r, pib).reshape(b * kr, sr)
        log_a = bc(log_a_r, lab).reshape(b * kr, sr, sr)
        ell2 = jnp.transpose(bc(ell, eb), (1, 0, 2, 3, 4)).reshape(
            kb, b * kr, sb, sr)
        # Recurse through f (not the raw pallas call) so a further vmap
        # level folds again instead of batching the kernel.
        st = f(prior_b, trans_b, log_pi, log_a, ell2)

        def unfold(a):   # [kb, b*kr, ...] -> [b, kb, kr, ...]
            return jnp.moveaxis(
                a.reshape((kb, b, kr) + a.shape[2:]), 1, 0)

        res = PairStats(ll_elbo=unfold(st.ll_elbo), nu_1=unfold(st.nu_1),
                        sum_xi=unfold(st.sum_xi),
                        sum_t_nu=unfold(st.sum_t_nu))
        return res, batched_out

    return f


@functools.lru_cache(maxsize=None)
def _pallas_fused_vmappable(tau: int, interpret: bool = False):
    """custom_vmap wrapper for the fully-fused pair E-step: a vmapped
    trials axis FOLDS into the reduced-model axis Kr (see
    :func:`_pallas_vmappable` for why vmapping the raw pallas_call is
    not an option)."""
    from .pair_estep import expected_pair_ll_variational, pair_bwd_fwd

    @jax.custom_batching.custom_vmap
    def f(prior_b, trans_b, mean_b, cov_b, log_pi_r, log_a_r, m_r, w_r,
          v_r, lam_r, log_lam_r):
        return pair_bwd_fwd_fused_pallas(
            prior_b, trans_b, mean_b, cov_b, log_pi_r, log_a_r, m_r,
            w_r, v_r, lam_r, log_lam_r, tau, interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, prior_b, trans_b, mean_b, cov_b,
              log_pi_r, log_a_r, m_r, w_r, v_r, lam_r, log_lam_r):
        batched_out = PairStats(ll_elbo=True, nu_1=True, sum_xi=True,
                                sum_t_nu=True)
        base_batched = any(in_batched[:4])
        if base_batched:
            # base bank batched per trial: XLA path, where vmap is free
            def one(pb, tb, mb, cb, lp, la, m, w, v, lam, ll):
                ell = expected_pair_ll_variational(mb, cb, m, w, v, lam,
                                                   ll)
                return pair_bwd_fwd(pb, tb, lp, la, ell, tau)

            res = jax.vmap(one, in_axes=tuple(
                0 if x else None for x in in_batched))(
                prior_b, trans_b, mean_b, cov_b, log_pi_r, log_a_r,
                m_r, w_r, v_r, lam_r, log_lam_r)
            return res, batched_out

        b = axis_size
        kr, sr = log_pi_r.shape[-2], log_pi_r.shape[-1]
        kb = prior_b.shape[0]

        def bc(a, batched):
            return a if batched else jnp.broadcast_to(a[None],
                                                      (b,) + a.shape)

        args = [log_pi_r, log_a_r, m_r, w_r, v_r, lam_r, log_lam_r]
        folded = [bc(a, x).reshape((b * kr,) + a.shape[(2 if x else 1):])
                  for a, x in zip(args, in_batched[4:])]
        # Recurse through f so a further vmap level folds again.
        st = f(prior_b, trans_b, mean_b, cov_b, *folded)

        def unfold(a):   # [kb, b*kr, ...] -> [b, kb, kr, ...]
            return jnp.moveaxis(
                a.reshape((kb, b, kr) + a.shape[2:]), 1, 0)

        res = PairStats(ll_elbo=unfold(st.ll_elbo), nu_1=unfold(st.nu_1),
                        sum_xi=unfold(st.sum_xi),
                        sum_t_nu=unfold(st.sum_t_nu))
        return res, batched_out

    return f


def pair_estep_fused_auto(prior_b, trans_b, mean_b, cov_b, log_pi_r,
                          log_a_r, m_r, w_r, v_r, lam_r, log_lam_r,
                          tau: int) -> PairStats:
    """Backend dispatch for the FUSED pair E-step (E3logN + recursions
    in one kernel) — the variational flavor's fast path.  Falls back to
    explicit ell + the XLA scan on non-TPU/f64 (CPU tests, virtual-mesh
    dry runs), mirroring the reference's useMEX discipline."""
    from .pair_estep import expected_pair_ll_variational, pair_bwd_fwd

    sb = mean_b.shape[-2]
    sr = log_pi_r.shape[-1]
    scratch = max(tau - 1, 1) * sr * sb * sr * TILE * mean_b.dtype.itemsize
    use_pallas = (jax.default_backend() == "tpu"
                  and mean_b.dtype == jnp.float32
                  and scratch <= _SCRATCH_BUDGET
                  and not os.environ.get("VBHEM_TPU_DISABLE_PALLAS"))
    if use_pallas:
        return _pallas_fused_vmappable(tau)(
            prior_b, trans_b, mean_b, cov_b, log_pi_r, log_a_r, m_r,
            w_r, v_r, lam_r, log_lam_r)
    ell = expected_pair_ll_variational(mean_b, cov_b, m_r, w_r, v_r,
                                       lam_r, log_lam_r)
    return pair_bwd_fwd(prior_b, trans_b, log_pi_r, log_a_r, ell, tau)


def pair_bwd_fwd_auto(prior_b: jnp.ndarray, trans_b: jnp.ndarray,
                      log_pi_r: jnp.ndarray, log_a_r: jnp.ndarray,
                      ell: jnp.ndarray, tau: int) -> PairStats:
    """Backend dispatch for the pair E-step: fused Pallas kernel on TPU
    (f32, tau small enough for the VMEM Theta scratch), XLA `lax.scan`
    path otherwise (CPU tests run in f64; the virtual-CPU mesh dry run
    has no Mosaic).

    Mirrors the reference's `useMEX`/`canuseMEX` dual-path dispatch
    (`vbhmm_fb.m:96-199`, `vbhem_h3m_c_step_fc.m:168-268`).
    """
    from .pair_estep import pair_bwd_fwd

    sb, sr = ell.shape[-2], ell.shape[-1]
    scratch = max(tau - 1, 1) * sr * sb * sr * TILE * ell.dtype.itemsize
    use_pallas = (jax.default_backend() == "tpu"
                  and ell.dtype == jnp.float32
                  and scratch <= _SCRATCH_BUDGET
                  and not os.environ.get("VBHEM_TPU_DISABLE_PALLAS"))
    if use_pallas:
        return _pallas_vmappable(tau)(prior_b, trans_b, log_pi_r,
                                      log_a_r, ell)
    return pair_bwd_fwd(prior_b, trans_b, log_pi_r, log_a_r, ell, tau)
