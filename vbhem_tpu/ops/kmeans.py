"""Key-driven (weighted) k-means, used by the VBHEM/VHEM initializers.

Replaces MATLAB `kmeans(...,'Replicates',1)` + the weighted variant
`src/vbhem/my_weighted_kmeans.m` used by the 'wtkmeans' initializer
(`vbhemhmm_init.m:294-425`).  Plain Lloyd iterations with a kmeans++
seeding; the weighted variant weights the centroid update (the
reference's per-point energy adjustment is an implementation detail of
its convergence heuristic, not of the resulting initialization quality).
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
