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

from ..density import KDE, kde
from ..utils.random import ensure_key


import functools


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
    (reference src/KDE01.jl:164-183; indices are 0-based here)."""
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
    key = ensure_key(key)
    if ks_type == "discrete":
        cdf = jnp.cumsum(p.weights)
        cdf = cdf / cdf[-1]
        u = jnp.sort(jax.random.uniform(key, (n,), dtype=p.points.dtype))
        ind = jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, p.npts - 1)
        pts = p.points[ind].T
        if p.multibandwidth:
            ks = jnp.sqrt(p.bw[ind]).T
        else:
            ks = jnp.sqrt(p.bw[0])
        return kde(pts, ks)
    pts, _ = sample(p, n, key)
    return kde(pts)
