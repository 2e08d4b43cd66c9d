"""Key-driven (weighted) k-means, used by the VBHEM/VHEM initializers.

Replaces MATLAB `kmeans(...,'Replicates',1)` (plain Lloyd with kmeans++
seeding, weight-able centroid updates) and implements the weighted
variant `src/vbhem/my_weighted_kmeans.m` used by the 'wtkmeans'
initializer (`vbhemhmm_init.m:294-425`) faithfully in
:func:`weighted_kmeans_energy`, including its Hartigan-style per-point
energy adjustment (`my_weighted_kmeans.m:87-100`).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _sq_dist(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """[M, D], [K, D] -> [M, K] squared distances."""
    return (jnp.sum(x * x, -1)[:, None] - 2.0 * x @ c.T
            + jnp.sum(c * c, -1)[None, :])


def kmeans_pp_init(key: jax.Array, x: jnp.ndarray, k: int,
                   weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """kmeans++ seeding (weighted)."""
    m = x.shape[0]
    w = jnp.ones((m,), x.dtype) if weights is None else weights

    def pick(carry, key_t):
        centers, d2min, first = carry
        p = jnp.where(first, w, w * d2min)
        idx = jax.random.categorical(key_t, jnp.log(p + 1e-30))
        c_new = x[idx]
        d2 = jnp.sum((x - c_new[None]) ** 2, -1)
        return (centers, jnp.minimum(d2min, d2), jnp.zeros_like(first)), c_new

    keys = jax.random.split(key, k)
    init = (jnp.zeros((k, x.shape[1]), x.dtype),
            jnp.full((m,), jnp.inf, x.dtype), jnp.ones((), bool))
    _, centers = jax.lax.scan(pick, init, keys)
    return centers


def kmeans(key: jax.Array, x: jnp.ndarray, k: int,
           weights: jnp.ndarray | None = None,
           init_centers: jnp.ndarray | None = None,
           max_iter: int = 100) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted Lloyd k-means.  Returns (assignment [M], centers [K, D]).
    Empty clusters keep their previous center."""
    m = x.shape[0]
    w = jnp.ones((m,), x.dtype) if weights is None else weights.astype(x.dtype)
    c0 = kmeans_pp_init(key, x, k, w) if init_centers is None else init_centers

    def body(_, centers):
        assign = jnp.argmin(_sq_dist(x, centers), axis=-1)
        one_hot = jax.nn.one_hot(assign, k, dtype=x.dtype) * w[:, None]
        mass = jnp.sum(one_hot, 0)                           # [K]
        new_c = (one_hot.T @ x) / jnp.maximum(mass, 1e-30)[:, None]
        return jnp.where(mass[:, None] > 0, new_c, centers)

    centers = jax.lax.fori_loop(0, max_iter, body, c0)
    assign = jnp.argmin(_sq_dist(x, centers), axis=-1)
    return assign, centers


def weighted_kmeans_energy(x: jnp.ndarray, weights: jnp.ndarray,
                           init_centers: jnp.ndarray,
                           max_iter: int = 100,
                           tol: float = 1e-6
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Energy-adjusted weighted k-means (`my_weighted_kmeans.m`).

    Hartigan-style reassignment: a member of cluster j keeps energy
    ``d2 * w_c / (w_c - w_i)`` (the exact increase removing it would
    undo, `:95-100`), a non-member is scored ``d2 * w_c / (w_c + w_i)``
    (the exact cost of joining, `:42-44`); points move to the minimum-
    energy cluster until the total energy changes < tol.  This is the
    adjustment round-3 dropped in favor of plain weighted Lloyd — it
    changes init trajectories, so it is now implemented faithfully.

    Returns (assignment [M], centers [K, D]).  Degenerate member
    factors (w_c == w_i, a cluster owning all its weight through one
    point) produce +inf member energy, which reassigns the point —
    MATLAB's Inf/NaN propagation resolves the same way through min().
    """
    m, d = x.shape
    k = init_centers.shape[0]
    dtype = x.dtype
    w = weights.astype(dtype)
    inf = jnp.asarray(jnp.inf, dtype)

    def centroids(assign):
        one_hot = jax.nn.one_hot(assign, k, dtype=dtype) * w[:, None]
        w_c = jnp.sum(one_hot, 0)                            # [K]
        cen = (one_hot.T @ x) / jnp.maximum(w_c, 1e-30)[:, None]
        return cen, w_c

    def energies(assign, cen, w_c):
        d2 = _sq_dist(x, cen)                                # [M, K]
        member = jax.nn.one_hot(assign, k, dtype=bool)
        denom_in = w_c[None, :] - w[:, None]
        f_in = jnp.where(denom_in > 0, d2 * w_c[None] / denom_in, inf)
        f_out = d2 * w_c[None] / (w_c[None, :] + w[:, None])
        fmat = jnp.where(member, f_in, f_out)                # [M, K]
        own = jnp.take_along_axis(fmat, assign[:, None], 1)[:, 0]
        total = jnp.sum(jnp.where(jnp.isfinite(own), w * own, 0.0))
        return fmat, total

    assign0 = jnp.argmin(_sq_dist(x, init_centers), axis=-1)
    cen0, wc0 = centroids(assign0)
    _, e0 = energies(assign0, cen0, wc0)

    def cond(carry):
        _, _, _, old_e, new_e, it = carry
        return jnp.logical_and(it < max_iter,
                               jnp.abs(new_e - old_e) >= tol)

    def body(carry):
        assign, cen, w_c, _, old_e, it = carry
        fmat, _ = energies(assign, cen, w_c)
        assign = jnp.argmin(fmat, axis=-1)
        cen, w_c = centroids(assign)
        _, new_e = energies(assign, cen, w_c)
        return assign, cen, w_c, old_e, new_e, it + 1

    init = (assign0, cen0, wc0, e0 + 2 * tol + 1.0, e0, jnp.asarray(0))
    assign, cen, _, _, _, _ = jax.lax.while_loop(cond, body, init)
    return assign, cen
