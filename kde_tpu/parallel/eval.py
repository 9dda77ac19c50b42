"""Sharded density evaluation and LOOCV reductions.

Two-axis SPMD over a ``chains x kernels`` mesh:
  * query points are sharded over ``chains`` (embarrassingly parallel);
  * mixture components are sharded over ``kernels``; the weighted
    log-sum-exp over components becomes a two-pass collective
    (``pmax`` of the local maxima, then ``psum`` of the shifted sums);
  * LOOCV entropy adds a final ``psum`` of the per-query weighted
    log-likelihoods over ``chains``.

These are the reduction points SURVEY §5 calls out as the only places the
framework needs cross-device communication (the reference has none --
everything is one thread).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.kernels import LOG_2PI
from .mesh import CHAINS, KERNELS


def _local_quad(q, means, var):
    inv = 1.0 / var
    a = jnp.dot(q * q, inv.T, preferred_element_type=q.dtype)
    b = jnp.dot(q, (means * inv).T, preferred_element_type=q.dtype)
    c = jnp.sum(means * means * inv, axis=1) + jnp.sum(jnp.log(var), axis=1)
    return a - 2.0 * b + c[None, :]


def sharded_log_eval(mesh: Mesh,
                     query: jnp.ndarray,
                     means: jnp.ndarray,
                     var: jnp.ndarray,
                     weights: jnp.ndarray) -> jnp.ndarray:
    """``log p`` at each query row, with queries sharded over ``chains`` and
    components sharded over ``kernels``.  Shapes must divide the mesh axes
    (pad with zero-weight components / repeat queries if needed).
    """
    d = query.shape[1]

    def kernel(q, m, v, w):
        logits = jnp.log(w)[None, :] - 0.5 * _local_quad(q, m, v)  # [mq, nk_loc]
        lmax = jnp.max(logits, axis=1)
        lmax = jax.lax.pmax(lmax, KERNELS)
        s = jnp.sum(jnp.exp(logits - lmax[:, None]), axis=1)
        s = jax.lax.psum(s, KERNELS)
        return jnp.log(s) + lmax - 0.5 * d * LOG_2PI

    f = shard_map(
        kernel, mesh=mesh,
        in_specs=(P(CHAINS, None), P(KERNELS, None), P(KERNELS, None),
                  P(KERNELS)),
        out_specs=P(CHAINS))
    return f(query, means, var, weights)


def sharded_loo_entropy(mesh: Mesh,
                        points: jnp.ndarray,
                        var: jnp.ndarray,
                        weights: jnp.ndarray) -> jnp.ndarray:
    """Leave-one-out entropy with the N x N pairwise computation sharded over
    both mesh axes and the final weighted sum ``psum``-reduced to a scalar
    (the LOOCV reduction point of SURVEY §5)."""
    n, d = points.shape

    def kernel(q, qw, m, v, w):
        # global indices for the LOO diagonal mask
        ci = jax.lax.axis_index(CHAINS)
        ki = jax.lax.axis_index(KERNELS)
        mq, nk = q.shape[0], m.shape[0]
        rows = ci * mq + jnp.arange(mq)
        cols = ki * nk + jnp.arange(nk)
        logits = jnp.log(w)[None, :] - 0.5 * _local_quad(q, m, v)
        logits = jnp.where(rows[:, None] == cols[None, :], -jnp.inf, logits)
        lmax = jnp.maximum(jax.lax.pmax(jnp.max(logits, axis=1), KERNELS),
                           -1e30)  # keep finite if a row is fully masked
        s = jax.lax.psum(jnp.sum(jnp.exp(logits - lmax[:, None]), axis=1),
                         KERNELS)
        logp = jnp.log(s) + lmax - 0.5 * d * LOG_2PI - jnp.log1p(-qw)
        h_local = -jnp.sum(qw * logp)
        return jax.lax.psum(h_local, CHAINS)[None]

    f = shard_map(
        kernel, mesh=mesh,
        in_specs=(P(CHAINS, None), P(CHAINS), P(KERNELS, None),
                  P(KERNELS, None), P(KERNELS)),
        out_specs=P())
    return f(points, weights, points, var, weights)[0]
