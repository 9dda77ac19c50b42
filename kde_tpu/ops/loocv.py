"""Leave-one-out cross-validated bandwidth selection.

Reference pipeline (src/CrossValidation.jl): for each dimension independently,
build the 1-D marginal, derive a search bracket from the ball-tree geometry
(``neighborMinMax``, :110-108), then golden-section search (:44-98, tol 1e-2)
minimizing ``nLOO_LL(alpha) = entropy(bw * alpha^2)`` (:15-24), where entropy
is the negative average leave-one-out log-likelihood.

TPU-first redesign: the reference runs a *serial* loop over dimensions
(src/KDE01.jl:16-23, with a TODO to thread it) and a serial golden search per
dimension, each probe a full O(N^2) evaluation.  Here the golden searches for
all ``d`` dimensions run *simultaneously* as one masked, vectorized iteration:
every step evaluates a batched ``[d, N, N]`` LOO entropy kernel on device
(ops/kernels.py:batched_loo_entropy).  The bracketing math is identical per
dimension (masked updates), so results match the reference exactly while the
chip sees one big fused kernel per probe instead of d*~25 tiny ones.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .balltree import build_balltree, neighbor_min_max
from .kernels import batched_loo_entropy

_C = (3.0 - np.sqrt(5.0)) / 2.0   # golden-section constants
_R = 1.0 - _C                     # (reference src/CrossValidation.jl:51-52)


def golden_batched(f, ax, bx, cx, tol):
    """Vectorized golden-section minimization over a batch of independent 1-D
    problems.  ``f`` maps a batch vector ``x -> f(x)`` elementwise; ``ax < bx
    < cx`` bracket each minimum.  Mirrors the reference's scalar ``golden``
    (src/CrossValidation.jl:44-98) with per-element masked updates, so each
    element follows exactly the trajectory the scalar algorithm would.
    """
    ax, bx, cx = (np.asarray(v, dtype=np.float64) for v in (ax, bx, cx))
    x0, x3 = ax.copy(), cx.copy()
    wide_right = np.abs(cx - bx) > np.abs(bx - ax)
    x1 = np.where(wide_right, bx, bx - _C * (bx - ax))
    x2 = np.where(wide_right, bx + _C * (cx - bx), bx)
    f1 = np.asarray(f(x1), dtype=np.float64)
    f2 = np.asarray(f(x2), dtype=np.float64)

    while True:
        active = np.abs(x3 - x0) > tol * (np.abs(x1) + np.abs(x2))
        if not active.any():
            break
        take2 = (f2 < f1) & active
        take1 = (~take2) & active
        # branch A (f2 < f1): slide bracket right
        nx0 = np.where(take2, x1, x0)
        nx1 = np.where(take2, x2, x1)
        nx2 = np.where(take2, _R * x2 + _C * x3, x2)
        nx3 = x3.copy()
        # branch B: slide bracket left
        nx3 = np.where(take1, x2, nx3)
        nx2 = np.where(take1, x1, nx2)
        nx1 = np.where(take1, _R * x1 + _C * x0, nx1)
        probe = np.where(take2, nx2, nx1)            # the single new point per element
        fp = np.asarray(f(probe), dtype=np.float64)
        nf1 = np.where(take2, f2, np.where(take1, fp, f1))
        nf2 = np.where(take2, fp, np.where(take1, f1, f2))
        x0, x1, x2, x3, f1, f2 = nx0, nx1, nx2, nx3, nf1, nf2

    xmin = np.where(f1 < f2, x1, x2)
    fmin = np.minimum(f1, f2)
    return xmin, fmin


def ksize_bandwidths(points: np.ndarray,
                     weights: np.ndarray,
                     tol: float = 1e-2,
                     dtype=jnp.float64) -> np.ndarray:
    """Per-dimension LOOCV bandwidths (standard deviations) for ``points``.

    Equivalent to the reference's per-dim ``ksize(marginal(p, [i]))`` loop
    (src/KDE01.jl:17-23 + src/CrossValidation.jl:110-120), with all dims
    searched in parallel.  Returns ``[d]`` std-dev bandwidths.
    """
    pts = np.asarray(points, dtype=np.float64)
    n, d = pts.shape
    w = np.asarray(weights, dtype=np.float64).reshape(n)
    w = w / w.sum()

    # bracket per dim from the 1-D marginal tree geometry
    minm = np.empty(d)
    maxm = np.empty(d)
    for i in range(d):
        tree = build_balltree(pts[:, i:i + 1], w)
        minm[i], maxm[i] = neighbor_min_max(tree)
    base = (minm + maxm) / 2.0                       # starting std bandwidth
    ax = 2.0 * minm / (minm + maxm)
    bx = np.ones(d)
    cx = 2.0 * maxm / (minm + maxm)

    pts_t = jnp.asarray(pts.T, dtype=dtype)          # [d, N]
    base_var = jnp.asarray(base ** 2, dtype=dtype)
    w_j = jnp.asarray(w, dtype=dtype)

    def nloo(x):
        # nLOO_LL scales the *variance* by alpha^2 where alpha = x^2 is in
        # std units (reference src/CrossValidation.jl:15-24): var = base^2 x^2
        scale = jnp.asarray(np.asarray(x) ** 2, dtype=dtype)
        return batched_loo_entropy(pts_t, scale, base_var, w_j)

    xmin, _ = golden_batched(nloo, ax, bx, cx, tol)
    return xmin * base                               # std-dev bandwidths


def nloo_ll(alpha: float, p, dtype=jnp.float64) -> float:
    """Negative average LOO log-likelihood of ``p`` with its variance scaled
    by ``alpha^2`` in std units (reference nLOO_LL,
    src/CrossValidation.jl:15-24).  Uniform-bandwidth densities only, as in
    the reference (:10)."""
    if p.multibandwidth:
        raise ValueError("nLOO_LL requires a uniform bandwidth "
                         "(reference src/CrossValidation.jl:10)")
    from .kernels import entropy_kernel
    scale = float(alpha) ** 2
    return float(entropy_kernel(
        jnp.asarray(np.asarray(p.points), dtype=dtype),
        jnp.asarray(np.asarray(p.bw) * scale, dtype=dtype),
        jnp.asarray(np.asarray(p.weights), dtype=dtype)))


def ksize(p, dtype=jnp.float64):
    """LOOCV-refit of a density: select a fresh per-dim bandwidth for ``p``'s
    points/weights and return the refit KDE (reference ksize,
    src/CrossValidation.jl:110-120)."""
    from ..density import kde
    pts = np.asarray(p.get_points(), dtype=np.float64)
    w = np.asarray(p.get_weights(), dtype=np.float64)
    bwds = ksize_bandwidths(pts.T, w, dtype=dtype)
    return kde(pts, bwds, w)
