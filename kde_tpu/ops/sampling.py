"""Sampling and resampling from a KDE.

Reference semantics (src/KDE01.jl:155-198, src/BallTreeDensity01.jl:312-334):
draw kernel indices from the weight CDF using sorted uniforms, then jitter by
the per-kernel bandwidth.  The sorted-uniform merge scan of the reference is
distributionally identical to ``searchsorted(cdf, u)`` with iid uniforms
(order statistics), which vectorizes cleanly on TPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..density import KDE, kde
from ..utils.random import ensure_key, host_rng, is_host_key


import functools


def _host_sample_ok(p: KDE, n: int, key) -> bool:
    """Route this draw through the f64 NumPy fast path?  Host-backed
    density, host-drivable key (None or int seed), small workload
    (config.HOST_SAMPLE_LIMIT) -- see ops/host_small.py."""
    from .. import config
    return (p._host_points is not None and p._host_bw is not None
            and p._host_weights is not None and is_host_key(key)
            and n * (p.npts + n) * p.ndim <= config.HOST_SAMPLE_LIMIT)


@functools.partial(jax.jit, static_argnames=("n",))
def _sample_core(points, bw, weights, key, *, n):
    """Weight-CDF draw + bandwidth jitter as ONE program (each eager op is a
    dispatch round trip on the axon runtime; fusing the ~8-op chain matters
    for pipelined serving flows)."""
    ku, kn = jax.random.split(key)
    cdf = jnp.cumsum(weights)
    cdf = cdf / cdf[-1]
    u = jnp.sort(jax.random.uniform(ku, (n,), dtype=points.dtype))
    ind = jnp.searchsorted(cdf, u, side="right")
    ind = jnp.clip(ind, 0, points.shape[0] - 1)
    noise = jax.random.normal(kn, (n, points.shape[1]), dtype=points.dtype)
    pts = points[ind] + jnp.sqrt(bw[ind]) * noise
    return pts.T, ind


def sample(p: KDE, n: int, key=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Draw ``n`` points; returns ``(points [d, n], kernel_indices [n])``
    (reference src/KDE01.jl:164-183; indices are 0-based here).

    Small host-backed densities with a host-drivable key (``None`` or an
    int seed) draw on the host in f64 and return NumPy arrays -- same
    CDF-draw + jitter scheme, no device dispatch (ops/host_small.py)."""
    if _host_sample_ok(p, n, key):
        from .host_small import sample_np
        return sample_np(p._host_points, p._host_bw, p._host_weights,
                         n, host_rng(key))
    return _sample_core(p.points, p.bw, p.weights, ensure_key(key), n=n)


def sample_at(p: KDE, ind, key=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample with fixed kernel labels (reference src/KDE01.jl:185-189)."""
    key = ensure_key(key)
    ind = jnp.asarray(ind)
    noise = jax.random.normal(key, (ind.shape[0], p.ndim), dtype=p.points.dtype)
    pts = p.points[ind] + jnp.sqrt(p.bw[ind]) * noise
    return pts.T, ind


def rand_kde(p: KDE, n: int = 1, key=None) -> jnp.ndarray:
    """Points only (reference `rand`, src/KDE01.jl:196-198)."""
    return sample(p, n, key)[0]


def resample(p: KDE, n: Optional[int] = None, ks_type: str = "lcv",
             key=None) -> KDE:
    """Construct a new KDE from ``n`` fresh samples
    (reference src/BallTreeDensity01.jl:312-334).

    ``lcv``: refit bandwidths by LOOCV.  ``discrete``: resample points by
    weight *without* jitter and keep the original kernel size.
    """
    if n is None:
        n = p.npts
    if ks_type not in ("lcv", "discrete"):
        raise ValueError(
            f"unknown ks_type {ks_type!r}: expected 'lcv' or 'discrete' "
            "(reference resample, src/BallTreeDensity01.jl:312-334)")
    # the resampled density keeps the source's manifold hooks (as
    # product()/marginal() do); the jitter itself is Euclidean, exactly as
    # the reference's randKernel (src/KDE01.jl:155-157, no addop)
    hooks = dict(addop=p.addop, diffop=p.diffop,
                 get_mu=p.get_mu, get_lambda=p.get_lambda)
    if ks_type == "discrete" and _host_sample_ok(p, n, key):
        rng = host_rng(key)
        cdf = np.cumsum(p._host_weights)
        cdf = cdf / cdf[-1]
        u = np.sort(rng.uniform(size=n))
        ind = np.clip(np.searchsorted(cdf, u, side="right"), 0, p.npts - 1)
        pts = p._host_points[ind].T
        ks = (np.sqrt(p._host_bw[ind]).T if p.multibandwidth
              else np.sqrt(p._host_bw[0]))
        return kde(pts, ks, **hooks)
    if ks_type == "lcv":
        # sample() takes the host fast path itself when eligible (NumPy
        # out); kde() then routes the refit through the host LOOCV gate
        pts, _ = sample(p, n, key)
        return kde(pts, **hooks)
    key = ensure_key(key)
    cdf = jnp.cumsum(p.weights)
    cdf = cdf / cdf[-1]
    u = jnp.sort(jax.random.uniform(key, (n,), dtype=p.points.dtype))
    ind = jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, p.npts - 1)
    pts = p.points[ind].T
    if p.multibandwidth:
        ks = jnp.sqrt(p.bw[ind]).T
    else:
        ks = jnp.sqrt(p.bw[0])
    return kde(pts, ks, **hooks)
