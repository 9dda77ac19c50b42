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

from ..ops.kernels import LOG_2PI, pairwise_quad
from .mesh import CHAINS, KERNELS

# the per-shard quadratic form is ops/kernels.py::pairwise_quad itself
# (single authority for the 3-matmul decomposition and its
# precision="highest" MXU fix); the collectives around it are the only
# sharded-specific code
_local_quad = pairwise_quad


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
        # zero-likelihood guard matching eval_avg_logl_from_logp
        # (ops/kernels.py): a positive-weight query whose LOO likelihood
        # underflows to zero makes the entropy +inf instead of NaN-poisoning
        # the weighted sum (reference src/DualTree01.jl:461-468)
        h_local = -jnp.sum(jnp.where(qw > 0, qw * jnp.where(qw > 0, logp, 0.0),
                                     0.0))
        bad_local = jnp.sum(jnp.where(jnp.isneginf(logp) & (qw > 0), 1.0, 0.0))
        h = jax.lax.psum(h_local, CHAINS)
        bad = jax.lax.psum(bad_local, CHAINS)
        return jnp.where(bad > 0, jnp.inf, h)[None]

    f = shard_map(
        kernel, mesh=mesh,
        in_specs=(P(CHAINS, None), P(CHAINS), P(KERNELS, None),
                  P(KERNELS, None), P(KERNELS)),
        out_specs=P())
    return f(points, weights, points, var, weights)[0]


def ksize_bandwidths_sharded(mesh: Mesh,
                             points,
                             weights=None,
                             tol: float = 1e-2,
                             dtype=None):
    """Multi-chip LOOCV bandwidth selection: the golden search's per-probe
    [N, N]-per-dimension LOO entropies are sharded over the full
    ``chains x kernels`` mesh, with the same pmax/psum two-pass log-sum-exp
    as :func:`sharded_loo_entropy` -- the whole search (brackets, probes,
    bracket updates) runs as ONE shard_mapped program with replicated scalar
    state, so an N too large for one chip's [chunk, N] working set fits by
    splitting the component axis.

    Selection is identical to :func:`kde_tpu.ops.loocv.ksize_bandwidths`
    (same bracket math and golden trajectory; only the reduction order of
    the entropy sums differs).  ``N`` is padded up to the mesh shape with
    zero-weight components / zero-weight query rows (which contribute
    nothing to either side of the reduction).

    Returns ``[d]`` std-dev bandwidths (device array, replicated).
    """
    from ..ops.loocv import _golden_core, _internal_slices, bracket_rows

    points = jnp.asarray(points, dtype=dtype)
    n, d = points.shape
    if weights is None:
        w = jnp.full((n,), 1.0 / n, dtype=points.dtype)
    else:
        w = jnp.asarray(weights, dtype=points.dtype)
        w = w / jnp.sum(w)

    # brackets from the (unpadded) sorted slices, replicated -- shared
    # bracket math (incl. degenerate guard), ops/loocv.py::bracket_rows
    lo, hi = _internal_slices(n)
    base, ax, bx, cx = bracket_rows(points.T, jnp.asarray(lo),
                                    jnp.asarray(hi))

    nc = mesh.shape[CHAINS] if CHAINS in mesh.axis_names else 1
    nk = mesh.shape[KERNELS]
    pad = (-n) % (nc * nk)
    pts_p = jnp.pad(points, ((0, pad), (0, 0)))
    w_p = jnp.pad(w, (0, pad))                       # zero-weight padding

    tol = float(tol)

    def kernel(q, qw, m, mw, base, ax, bx, cx):
        mq, nk_loc = q.shape[0], m.shape[0]
        ci = jax.lax.axis_index(CHAINS) if nc > 1 else 0
        ki = jax.lax.axis_index(KERNELS)
        rows = ci * mq + jnp.arange(mq)
        cols = ki * nk_loc + jnp.arange(nk_loc)
        diag_mask = rows[:, None] == cols[None, :]
        logw = jnp.log(jnp.maximum(mw, jnp.finfo(mw.dtype).tiny))
        logw = jnp.where(mw > 0, logw, -jnp.inf)

        def nloo(x):
            scale = (jnp.asarray(x) ** 2).astype(q.dtype)
            outs = []
            for k in range(d):
                c = scale[k] * base[k] ** 2
                delta = q[:, k][:, None] - m[None, :, k]
                logits = logw[None, :] - 0.5 * (delta * delta / c
                                                + jnp.log(c))
                logits = jnp.where(diag_mask, -jnp.inf, logits)
                lmax = jnp.maximum(
                    jax.lax.pmax(jnp.max(logits, axis=1), KERNELS), -1e30)
                ssum = jax.lax.psum(
                    jnp.sum(jnp.exp(logits - lmax[:, None]), axis=1),
                    KERNELS)
                logp = (jnp.log(ssum) + lmax - 0.5 * LOG_2PI
                        - jnp.log1p(-qw))
                # zero-likelihood guard matching eval_avg_logl_from_logp
                # (ops/kernels.py), which every single-device LOO-entropy
                # path applies: an underflowed-to-zero LOO likelihood at a
                # positive-weight query yields an infinite objective (the
                # golden search then moves away from it) instead of a NaN
                # that would diverge from the single-device selection
                h = -jnp.sum(jnp.where(qw > 0,
                                       qw * jnp.where(qw > 0, logp, 0.0),
                                       0.0))
                bad = jnp.sum(jnp.where(jnp.isneginf(logp) & (qw > 0),
                                        1.0, 0.0))
                if nc > 1:
                    h = jax.lax.psum(h, CHAINS)
                    bad = jax.lax.psum(bad, CHAINS)
                outs.append(jnp.where(bad > 0, jnp.inf, h))
            return jnp.stack(outs)

        xmin, _ = _golden_core(nloo, ax, bx, cx, tol)
        return xmin * base

    chain_spec = P(CHAINS, None) if nc > 1 else P(None, None)
    chain_vec = P(CHAINS) if nc > 1 else P(None)
    f = shard_map(
        kernel, mesh=mesh,
        in_specs=(chain_spec, chain_vec, P(KERNELS, None), P(KERNELS),
                  P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False)
    return jax.jit(f)(pts_p, w_p, pts_p, w_p, base, ax, bx, cx)
