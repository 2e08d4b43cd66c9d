"""Fused Pallas TPU kernel for the VBEM forward-backward E-step.

Pallas replacement for the reference C kernel `src/hmm/vbhmm_fb_mex.c`
(I/O contract at :6-25; scaled recursions mirrored from
`src/hmm/vbhmm_fb.m:201-379`), completing the three-native-kernel set
(SURVEY.md section 2.1) together with the pair-E-step kernel.

Layout strategy mirrors :mod:`.pair_estep_pallas`: the state count K is
tiny (1-8) while the sequence batch N is large (sequences x restart
trials), so **N rides the TPU lane axis** — every tensor is transposed
to [T, K, N] / [T, N] and the whole forward + backward recursion over T
runs inside one kernel, with the alpha/c intermediates held in VMEM
scratch so nothing round-trips HBM between the two passes.  The prior
and transition scores are lane-resident ([K, N] / [K, K, N]), which
makes per-sequence parameters (the reference's `usegroups` mode,
`vbhmm_fb.m:81-93`) the same cost as shared ones.  The T and K loops
are fully unrolled (both small and static; unrolling also sidesteps
Mosaic's unsupported dynamic multi-dim scratch gathers).

Restart trials arrive via `vmap`; the `custom_vmap` rule FOLDS the
batch axis into N (one big kernel) instead of batching the
`pallas_call` — vmap of a raw pallas_call hangs the remote-TPU (axon)
platform and must never be emitted.

Semantics are identical to :func:`.fb.forward_backward` (parity
enforced in tests/test_fb.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fb import FBStats

LANE = 128

# VMEM budget for the alpha/c scratch; past this the fused kernel would
# spill and the XLA scan path (streaming through HBM) wins.
_SCRATCH_BUDGET = 8 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(rho_ref, mask_ref, pz1_ref, trans_ref,
            gamma_ref, xi_ref, phi_ref, alpha_scr, c_scr,
            *, t_max: int, k: int):
    """Grid cell = one tile of N sequences.  Block shapes:
      rho:   [T, K, TILE]   mask: [T, TILE] (float 0/1)
      pz1:   [K, TILE]      trans: [K, K, TILE]  (per-sequence scores)
      outputs: gamma [T, K, TILE], xi [K, K, TILE], phi [1, TILE]
      scratch: alpha [T, K, TILE], c [T, TILE]
    """
    trans = trans_ref[...]                              # [K, K, TILE]
    pz1 = pz1_ref[...]                                  # [K, TILE]
    dtype = pz1.dtype

    def px_at(t):
        rho_t = rho_ref[t]                              # [K, TILE]
        m_t = jnp.max(rho_t, axis=0)                    # [TILE]
        return jnp.exp(rho_t - m_t[None, :]), m_t

    # ---- forward (vbhmm_fb.m:299-323): alpha_hat, c, phi accumulation ----
    px0, m0 = px_at(0)
    maskf0 = mask_ref[0]
    delta = pz1 * px0
    c0 = jnp.sum(delta, axis=0)                         # [TILE] (>0: t=0 valid)
    alpha = delta / c0[None, :]
    alpha_scr[0] = alpha
    c_scr[0] = c0
    phi = (jnp.log(c0) + m0) * maskf0

    for t in range(1, t_max):
        px_t, m_t = px_at(t)
        valid = mask_ref[t]                             # [TILE] float
        # pred[l] = sum_k alpha[k] * trans[k, l]   (K unrolled, VPU-sized)
        pred = jnp.stack([
            sum(alpha[kk] * trans[kk, ll] for kk in range(k))
            for ll in range(k)])                        # [K, TILE]
        delta = pred * px_t
        c = jnp.sum(delta, axis=0)
        c_safe = jnp.where(c > 0, c, jnp.ones_like(c))
        alpha_new = delta / c_safe[None, :]
        alpha = valid[None, :] * alpha_new + (1.0 - valid[None, :]) * alpha
        c_out = valid * c_safe + (1.0 - valid)
        alpha_scr[t] = alpha
        c_scr[t] = c_out
        phi = phi + jnp.log(c_out) + m_t * valid

    phi_ref[0] = phi

    # ---- backward (vbhmm_fb.m:325-362): beta, gamma, xi_sum ----
    beta = jnp.ones((k, pz1.shape[-1]), dtype=dtype)    # beta_{T-1}
    xi_acc = jnp.zeros((k, k, pz1.shape[-1]), dtype=dtype)
    for t in range(t_max - 2, -1, -1):
        # beta == beta_{t+1}; emit gamma_{t+1}, xi_{t -> t+1}, beta_t
        valid_n = mask_ref[t + 1]                       # [TILE]
        gamma_ref[t + 1] = alpha_scr[t + 1] * beta * valid_n[None, :]
        px_n, _ = px_at(t + 1)
        bp = beta * px_n                                # [K, TILE]
        c_n = c_scr[t + 1]
        inv_c = 1.0 / c_n
        alpha_t = alpha_scr[t]                          # [K, TILE]
        # xi[kk, ll] = trans[kk, ll] * alpha_t[kk] * bp[ll] / c_{t+1}
        xi_t = (trans * alpha_t[:, None, :] * bp[None, :, :]
                * inv_c[None, None, :])
        xi_acc = xi_acc + xi_t * valid_n[None, None, :]
        # eta[kk] = sum_l trans[kk, ll] * bp[ll]
        eta = jnp.stack([
            sum(trans[kk, ll] * bp[ll] for ll in range(k))
            for kk in range(k)])                        # [K, TILE]
        beta_t = eta * inv_c[None, :]
        beta = (valid_n[None, :] * beta_t
                + (1.0 - valid_n[None, :]) * jnp.ones_like(beta_t))
    gamma_ref[0] = alpha_scr[0] * beta * mask_ref[0][None, :]
    xi_ref[...] = xi_acc


def forward_backward_pallas(log_pz1: jnp.ndarray, log_trans: jnp.ndarray,
                            log_rho: jnp.ndarray, mask: jnp.ndarray,
                            tile: int = LANE,
                            interpret: bool = False) -> FBStats:
    """Drop-in replacement for :func:`.fb.forward_backward`; accepts
    shared ([K] / [K, K]) or per-sequence ([N, K] / [N, K, K]) scores.
    Transposes to lane-major [T, K, N] and pads N."""
    n, t_max, k = log_rho.shape
    dtype = log_rho.dtype
    n_p = _round_up(max(n, tile), tile)

    def padn(a, axis=-1):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, n_p - a.shape[axis])
        return jnp.pad(a, pad)

    rho_t = padn(jnp.transpose(log_rho, (1, 2, 0)))         # [T, K, N]
    # Padded lanes get mask 0 everywhere; t=0 stays finite by
    # construction (padded rho is 0 -> px=1, c0 = sum pz1 > 0).
    mask_t = padn(jnp.transpose(mask.astype(dtype), (1, 0)))  # [T, N]
    pz1 = jnp.exp(log_pz1).astype(dtype)
    if pz1.ndim == 1:
        pz1 = jnp.broadcast_to(pz1[:, None], (k, n))
    else:
        pz1 = jnp.transpose(pz1, (1, 0))                     # [K, N]
    trans = jnp.exp(log_trans).astype(dtype)
    if trans.ndim == 2:
        trans = jnp.broadcast_to(trans[:, :, None], (k, k, n))
    else:
        trans = jnp.transpose(trans, (1, 2, 0))              # [K, K, N]
    pz1, trans = padn(pz1), padn(trans)

    grid = (n_p // tile,)
    out_shapes = (
        jax.ShapeDtypeStruct((t_max, k, n_p), dtype),        # gamma
        jax.ShapeDtypeStruct((k, k, n_p), dtype),            # xi_sum
        jax.ShapeDtypeStruct((1, n_p), dtype),               # phi_norm
    )
    kernel = functools.partial(_kernel, t_max=t_max, k=k)
    gamma_t, xi_t, phi_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_max, k, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_max, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t_max, k, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((t_max, k, tile), dtype),             # alpha
            pltpu.VMEM((t_max, tile), dtype),                # c
        ],
        interpret=interpret,
    )(rho_t, mask_t, pz1, trans)

    maskf = mask.astype(dtype)
    gamma = jnp.transpose(gamma_t, (2, 0, 1))[:n]            # [N, T, K]
    xi_sum = jnp.transpose(xi_t, (2, 0, 1))[:n]              # [N, K, K]
    phi_norm = phi_t[0, :n]
    return FBStats(log_rho=log_rho * maskf[..., None], gamma=gamma,
                   xi_sum=xi_sum, phi_norm=phi_norm)


@functools.lru_cache(maxsize=None)
def _pallas_vmappable(interpret: bool = False):
    """`custom_vmap` wrapper whose batching rule folds the (restart
    trial) batch axis into the sequence axis N — one big kernel launch,
    and never a vmapped pallas_call (which hangs the axon platform)."""

    @jax.custom_batching.custom_vmap
    def f(log_pz1, log_trans, log_rho, mask):
        return forward_backward_pallas(log_pz1, log_trans, log_rho, mask,
                                       interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, log_pz1, log_trans, log_rho, mask):
        batched_out = FBStats(log_rho=True, gamma=True, xi_sum=True,
                              phi_norm=True)
        zb, tb, rb, mb = in_batched
        b = axis_size
        n = log_rho.shape[1] if rb else log_rho.shape[0]

        def bc(a, batched):
            return a if batched else jnp.broadcast_to(a[None],
                                                      (b,) + a.shape)

        # Fold per-trial parameters to per-sequence rows of the folded
        # batch: [B, ...] -> [B, N, ...] -> [B*N, ...].
        pz1 = bc(log_pz1, zb)
        if pz1.ndim == 2:                                # [B, K]
            pz1 = jnp.broadcast_to(pz1[:, None, :],
                                   (b, n) + pz1.shape[1:])
        trans = bc(log_trans, tb)
        if trans.ndim == 3:                              # [B, K, K]
            trans = jnp.broadcast_to(trans[:, None, :, :],
                                     (b, n) + trans.shape[1:])
        rho = bc(log_rho, rb)
        msk = bc(mask, mb)
        out = f(pz1.reshape((b * n,) + pz1.shape[2:]),
                trans.reshape((b * n,) + trans.shape[2:]),
                rho.reshape((b * n,) + rho.shape[2:]),
                msk.reshape((b * n,) + msk.shape[2:]))
        res = FBStats(*[a.reshape((b, n) + a.shape[1:]) for a in out])
        return res, batched_out

    return f


def forward_backward_auto(log_pz1: jnp.ndarray, log_trans: jnp.ndarray,
                          log_rho: jnp.ndarray, mask: jnp.ndarray) -> FBStats:
    """Backend dispatch mirroring the reference's `useMEX` dual path
    (`vbhmm_fb.m:96-199`): fused Pallas kernel on TPU for f32, XLA
    `lax.scan` otherwise (CPU f64 tests, virtual-mesh dry runs)."""
    from .fb import forward_backward

    t_max, k = log_rho.shape[1], log_rho.shape[2]
    scratch = t_max * (k + 1) * LANE * log_rho.dtype.itemsize
    use_pallas = (jax.default_backend() == "tpu"
                  and log_rho.dtype == jnp.float32
                  and scratch <= _SCRATCH_BUDGET
                  and not os.environ.get("VBHEM_TPU_DISABLE_PALLAS"))
    if use_pallas:
        return _pallas_vmappable()(log_pz1, log_trans, log_rho, mask)
    # Long T beyond the kernel's VMEM scratch budget: measured on the
    # real chip (bench_podscale.py, RESULTS.md round-4), the XLA
    # sequential scan stays sub-ms up to T=4096 while the log-depth
    # associative-scan FB is 25-150x SLOWER on a single chip (it
    # materializes [T, K, K] matrix products and is bandwidth-bound),
    # so the scan is always the single-chip fallback.
    # `forward_backward_assoc` remains available explicitly: its value
    # is sequence-PARALLELISM (splitting one sequence's scan across
    # devices/segments), not single-chip speed.
    return forward_backward(log_pz1, log_trans, log_rho, mask)
