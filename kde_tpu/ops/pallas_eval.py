"""Pallas TPU kernel: tiled weighted log-sum-exp Gaussian-mixture evaluation.

The dense evaluator (ops/kernels.py) materializes the [M, N] logit matrix in
HBM.  For large M*N (big densities evaluated at many queries -- the LOOCV
inner loop at scale, or grid quadrature) this kernel streams component tiles
through VMEM with a flash-attention-style running (max, sum) accumulator, so
the working set stays on-chip and HBM traffic is O(M*d + N*d + M) instead of
O(M*N).

Layout: queries are tiled along the grid's first axis, components along the
second (minor, fastest-varying) axis; the running accumulators live in VMEM
scratch and persist across the component loop of each query tile.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_2PI = math.log(2.0 * math.pi)

_TM = 256    # query tile
_TN = 512    # component tile


def _eval_kernel(q_ref, mu_ref, var_ref, logw_ref, out_ref, m_scr, s_scr, *,
                 d: int, loo: bool):
    jn = pl.program_id(1)
    n_n = pl.num_programs(1)

    q = q_ref[:]                    # [TM, d]
    mu = mu_ref[:]                  # [TN, d]
    var = var_ref[:]                # [TN, d]
    logw = logw_ref[:]              # [1, TN]

    # quadratic form per (query, component): sum over the (small, static)
    # dim axis of (q - mu)^2 / var + log var
    acc = jnp.zeros((q.shape[0], mu.shape[0]), dtype=jnp.float32)
    for k in range(d):
        delta = q[:, k:k + 1] - mu[:, k][None, :]
        acc = acc + delta * delta / var[:, k][None, :] + \
            jnp.log(var[:, k])[None, :]
    logits = logw - 0.5 * acc       # [TM, TN]

    if loo:
        i = pl.program_id(0)
        rows = i * q.shape[0] + jax.lax.broadcasted_iota(
            jnp.int32, logits.shape, 0)
        cols = jn * mu.shape[0] + jax.lax.broadcasted_iota(
            jnp.int32, logits.shape, 1)
        logits = jnp.where(rows == cols, -jnp.inf, logits)

    @pl.when(jn == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        s_scr[:] = jnp.zeros_like(s_scr)

    m_old = m_scr[:]                                    # [TM, 1]
    m_tile = jnp.max(logits, axis=1, keepdims=True)
    m_new = jnp.maximum(m_old, m_tile)
    # guard fully-masked rows: keep the accumulator finite
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    s_scr[:] = (s_scr[:] * jnp.exp(jnp.where(jnp.isfinite(m_old),
                                             m_old - m_safe, -jnp.inf))
                + jnp.sum(jnp.exp(logits - m_safe), axis=1, keepdims=True))
    m_scr[:] = m_new

    @pl.when(jn == n_n - 1)
    def _():
        out_ref[:] = (jnp.log(s_scr[:]) + jnp.where(jnp.isfinite(m_scr[:]),
                                                    m_scr[:], 0.0)
                      - 0.5 * d * LOG_2PI)


def pallas_log_eval(query: jnp.ndarray,
                    means: jnp.ndarray,
                    var: jnp.ndarray,
                    weights: jnp.ndarray,
                    loo: bool = False,
                    interpret: bool = False) -> jnp.ndarray:
    """``log p`` of the mixture at each query row (``[M, d]`` queries,
    ``[N, d]`` components).  With ``loo``, component ``j`` is excluded from
    query ``j`` and the ``1/(1-w_j)`` rescale is applied by the caller.
    """
    m, d = query.shape
    n = means.shape[0]
    f32 = jnp.float32
    mp = ((m + _TM - 1) // _TM) * _TM
    np_ = ((n + _TN - 1) // _TN) * _TN

    q = jnp.zeros((mp, d), f32).at[:m].set(query.astype(f32))
    mu = jnp.zeros((np_, d), f32).at[:n].set(means.astype(f32))
    v = jnp.ones((np_, d), f32).at[:n].set(var.astype(f32))
    lw = jnp.full((1, np_), -jnp.inf, f32).at[0, :n].set(
        jnp.log(weights).astype(f32))

    grid = (mp // _TM, np_ // _TN)
    out = pl.pallas_call(
        functools.partial(_eval_kernel, d=d, loo=loo),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TM, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TM, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, 1), f32),
        scratch_shapes=[
            pltpu.VMEM((_TM, 1), f32),
            pltpu.VMEM((_TM, 1), f32),
        ],
        interpret=interpret,
    )(q, mu, v, lw)
    return out[:m, 0]
