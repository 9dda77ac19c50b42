"""Size-gated f64 NumPy fast paths for small problems.

The reference's own README flows run at N <= ~300 (README.md:36-97), where
the entire fit + evaluate + resample pipeline is ~1 ms of f64 arithmetic.
On the axon remote-TPU runtime those flows are pure *latency*: each dispatch
is a network round trip (~1 ms degraded / ~30 ms blocking fetch,
BASELINE.md "Timing honesty"), so the device path loses to a serial CPU by
an order of magnitude (VERDICT r2 weak #1).  The right framework answer is
the same one large serving systems use for tiny requests: a host fast path.

Every function here is the f64 NumPy twin of a device program and computes
the SAME selection / values:

  * :func:`ksize_host_np`    <-> the golden search stage of
    ops/loocv.py::ksize_bandwidths (reference src/CrossValidation.jl:44-120);
    its scalar golden search follows the identical per-element trajectory
    as the device's masked batch search (_golden_core), and its shifted
    LOO objective equals ops/kernels.py::batched_loo_entropy at f64
    (verified against the f64 device search, tests/test_host_small.py)
  * :func:`log_eval_np` / :func:`log_eval_loo_np` <->
    ops/kernels.py::log_eval / log_eval_loo (reference evalDirect,
    src/DualTree01.jl:130-162, with the LOO 1/(1-w_j) rescale :333-336)
  * :func:`sample_np`        <-> ops/sampling.py::_sample_core (weight-CDF
    draw + bandwidth jitter, reference src/KDE01.jl:164-183)

Routing lives with the device authorities (ops/loocv.py::ksize_bandwidths,
density.KDE.log_eval/evaluate, ops/sampling.py) gated by
config.HOST_LOOCV_LIMIT / HOST_EVAL_LIMIT / HOST_SAMPLE_LIMIT.
"""

from __future__ import annotations

import ctypes

import numpy as np

_C = (3.0 - np.sqrt(5.0)) / 2.0   # golden-section constants
_R = 1.0 - _C                     # (reference src/CrossValidation.jl:51-52)

LOG_2PI = float(np.log(2.0 * np.pi))

_dp = ctypes.POINTER(ctypes.c_double)


def _get_hostops():
    """The native fused-probe library, or None (NumPy fallback).  Looked up
    lazily so importing the package never triggers a compile."""
    from ..native import get_hostops
    return get_hostops()


def bracket_rows_np(rows: np.ndarray, lo: np.ndarray, hi: np.ndarray):
    """NumPy twin of ops/loocv.py::bracket_rows (sort-based neighborMinMax,
    reference src/CrossValidation.jl:100-120, incl. the n<2 guard and the
    1e-6 floor).  ``rows [d, N]``; returns ``(base, ax, bx, cx)``."""
    r, n = rows.shape
    if n < 2 or lo.shape[0] == 0:
        minm = maxm = np.full(r, 1e-6)
    else:
        s = np.sort(rows, axis=1)
        diag = s[:, hi] - s[:, lo]
        maxm = diag[:, 0]                             # root slice: extent
        minm = np.maximum(np.min(diag, axis=1), 1e-6)
    base = (minm + maxm) / 2.0
    ax = 2.0 * minm / (minm + maxm)
    bx = np.ones_like(base)
    cx = 2.0 * maxm / (minm + maxm)
    return base, ax, bx, cx


def _golden_scalar(f, ax, bx, cx, tol):
    """Scalar golden-section search, same per-element trajectory as
    ops/loocv.py::_golden_core (the masked batch updates evolve each
    element exactly as this scalar algorithm would)."""
    max_iters = int(np.ceil(np.log(max(tol, 1e-18)) / np.log(_R))) + 60
    x0, x3 = ax, cx
    if abs(cx - bx) > abs(bx - ax):
        x1, x2 = bx, bx + _C * (cx - bx)
    else:
        x1, x2 = bx - _C * (bx - ax), bx
    f1, f2 = f(x1), f(x2)
    it = 0
    while abs(x3 - x0) > tol * (abs(x1) + abs(x2)) and it < max_iters:
        if f2 < f1:
            x0, x1, x2 = x1, x2, _R * x2 + _C * x3
            f1, f2 = f2, f(x2)
        else:
            x3, x2, x1 = x2, x1, _R * x1 + _C * x0
            f2, f1 = f1, f(x1)
        it += 1
    return (x1, f1) if f1 < f2 else (x2, f2)


def ksize_host_np(pts_nd: np.ndarray, w: np.ndarray,
                  base: np.ndarray, ax, bx, cx, tol: float) -> np.ndarray:
    """Golden-search stage of LOOCV bandwidth selection on the host
    (brackets come from the caller's host ball trees; see
    ops/loocv.py::ksize_bandwidths).  Returns ``[d]`` std-dev bandwidths.

    Computes the same entropies as the device program
    (ops/kernels.py::batched_loo_entropy) but restructured for the regime
    that matters here -- NumPy op-count, not FLOPs, dominates an [N, N]
    probe:

      * per dim, the LOO pairwise squared distances ``d2`` (diag = +inf)
        and the per-query nearest *positive-weight* neighbor shift
        ``dmin = min_{j: w_j>0} d2`` are precomputed ONCE
        (probe-independent);
      * each probe is then 3 array ops -- ``P = exp(a*(d2 - dmin))``,
        ``pq = P @ w`` -- because shifting every query's logits by
        ``a*dmin_q`` (its row maximum among contributing kernels, up to
        the weight term) is exactly the stable logsumexp shift:
        ``logp = log(pq) + a*dmin + const``.  The shifted live
        nearest-neighbor term is ``w*exp(0)``, so ``pq`` can't underflow
        to 0 while any live kernel exists (same no--inf outcome as the
        device's max-shifted logsumexp); zero-weight columns are forced to
        ``exp -> 0`` so they can't overflow into ``inf*0``.

    Dims are searched by an independent scalar golden (identical per-dim
    trajectory to the masked batch search -- converged dims freeze there)."""
    rows = np.ascontiguousarray(pts_nd.T, dtype=np.float64)  # [d, N]
    base_sd = np.asarray(base, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    d, n = rows.shape
    ii = np.arange(n)
    log1p_negw = np.log1p(-w)
    w_pos = w > 0
    all_pos = bool(w_pos.all())
    w_mask = np.where(w_pos, w, 0.0)
    const = -0.5 * LOG_2PI - log1p_negw
    # probe-independent scalars for the fused all-positive objective below
    w_const = float(np.dot(w, const))
    hostops = _get_hostops() if all_pos else None
    out = np.empty(d)
    if hostops is not None and n > 1:
        # whole per-dim searches in one native call each (incl. the
        # shifted-LOO-matrix build; kde_tpu/native/hostops.cpp): same
        # bracket arithmetic, probe values within exp/log-ULP summation
        # noise of the NumPy branch below (tests/test_host_small.py)
        wc = np.ascontiguousarray(w)
        for k in range(d):
            xk = np.ascontiguousarray(rows[k])
            out[k] = base_sd[k] * hostops.kde_loo_golden_1d(
                xk.ctypes.data_as(_dp), wc.ctypes.data_as(_dp), n,
                base_sd[k] ** 2, w_const,
                float(ax[k]), float(bx[k]), float(cx[k]), float(tol))
        return out
    buf = np.empty((n, n))
    with np.errstate(divide="ignore"):          # n==1 / far queries -> -inf
        for k in range(d):
            x = rows[k]
            d2 = (x[:, None] - x[None, :]) ** 2
            d2[ii, ii] = np.inf                              # LOO mask
            # nearest POSITIVE-WEIGHT neighbor: the shift must come from a
            # kernel that actually contributes to pq, else a zero-weight
            # nearest neighbor leaves pq free to underflow to 0 (-inf logp)
            # where the device's weighted max-shift stays finite
            dmin = np.min(np.where(w_pos[None, :], d2, np.inf), axis=1)
            dmin[~np.isfinite(dmin)] = 0.0      # n==1 / no-live-nbr guard
            D = d2 - dmin[:, None]              # 0 at the live argmin
            # dead kernels: exp -> 0 exactly (a closer zero-weight kernel
            # would otherwise overflow exp and poison `buf @ w` with inf*0)
            D[:, ~w_pos] = np.inf
            base_var = base_sd[k] ** 2
            w_dmin = float(np.dot(w, dmin))

            if all_pos:
                # fused objective: -sum_i w_i logp_i with the probe-
                # independent pieces folded to scalars --
                #   logp = log(pq) + a*dmin + const - 0.5*log(var)
                # => nll = -w.log(pq) - a*(w.dmin) - w.const + 0.5 log(var)
                # (sum w == 1).  Same math as the general branch; only the
                # summation grouping differs (f64 noise ~1e-16, far below
                # the golden search's decision margins).
                def nloo(alpha):
                    var = base_var * alpha * alpha
                    a = -0.5 / var
                    np.multiply(D, a, out=buf)
                    np.exp(buf, out=buf)
                    pq = buf @ w                             # sum_j w_j e^..
                    np.log(pq, out=pq)
                    return (-np.dot(w, pq) - a * w_dmin - w_const
                            + 0.5 * np.log(var))
            else:
                def nloo(alpha):
                    var = base_var * alpha * alpha
                    a = -0.5 / var
                    np.multiply(D, a, out=buf)
                    np.exp(buf, out=buf)
                    pq = buf @ w                             # sum_j w_j e^..
                    logp = np.log(pq) + a * dmin \
                        + (const - 0.5 * np.log(var))
                    return -np.dot(w_mask, np.where(w_pos, logp, 0.0))
            xmin, _ = _golden_scalar(nloo, float(ax[k]), float(bx[k]),
                                     float(cx[k]), tol)
            out[k] = xmin * base_sd[k]
    return out


def log_eval_np(query: np.ndarray, means: np.ndarray, var: np.ndarray,
                weights: np.ndarray) -> np.ndarray:
    """``log p`` of a diagonal-Gaussian mixture at ``query [M, d]`` rows --
    the f64 twin of ops/kernels.py::log_eval (Euclidean only), using the
    same 3-matmul quadratic-form decomposition as the device kernel
    (q^2 @ (1/s)^T - 2 q @ (mu/s)^T + [sum mu^2/s + log s])."""
    d = query.shape[1]
    if d == 1 and var.shape[0] > 0:
        v0 = var[0, 0]
        lib = _get_hostops()
        if (np.all(weights > 0) and np.all(var == v0) and lib is not None):
            # native fused path (kde_tpu/native/hostops.cpp): one pass per
            # query row with the same nearest-component logsumexp shift;
            # values within exp/log-ULP noise of the NumPy branch below
            q = np.ascontiguousarray(query[:, 0], dtype=np.float64)
            mu = np.ascontiguousarray(means[:, 0], dtype=np.float64)
            wc = np.ascontiguousarray(weights, dtype=np.float64)
            out = np.empty(q.shape[0])
            lib.kde_log_eval_1d(q.ctypes.data_as(_dp), q.shape[0],
                                mu.ctypes.data_as(_dp),
                                wc.ctypes.data_as(_dp), mu.shape[0],
                                float(v0), out.ctypes.data_as(_dp))
            return out
    inv = 1.0 / var                                          # [N, d]
    quad = ((query * query) @ inv.T
            - 2.0 * (query @ (means * inv).T)
            + (np.sum(means * means * inv, axis=1)
               + np.sum(np.log(var), axis=1))[None, :])      # [M, N]
    with np.errstate(divide="ignore"):                       # w==0 -> -inf
        logits = np.log(weights)[None, :] - 0.5 * quad
        lmax = np.max(logits, axis=1)
        if np.isfinite(lmax).all():                          # common case
            np.subtract(logits, lmax[:, None], out=logits)
            np.exp(logits, out=logits)
            lse = lmax + np.log(logits @ np.ones(logits.shape[1]))
        else:
            lmax_s = np.where(np.isfinite(lmax), lmax, 0.0)
            lse = lmax + np.log(
                np.sum(np.exp(logits - lmax_s[:, None]), axis=1))
    return lse - 0.5 * d * LOG_2PI


def log_eval_loo_np(points: np.ndarray, var: np.ndarray,
                    weights: np.ndarray) -> np.ndarray:
    """Leave-one-out ``log p_-j(x_j)`` -- the f64 twin of
    ops/kernels.py::log_eval_loo (reference src/DualTree01.jl:333-336)."""
    n, d = points.shape
    diff = points[:, None, :] - points[None, :, :]
    quad = np.sum(diff * diff / var[None, :, :], axis=2) \
        + np.sum(np.log(var), axis=1)[None, :]
    with np.errstate(divide="ignore"):                       # w==0 -> -inf
        logits = np.log(weights)[None, :] - 0.5 * quad
    ii = np.arange(n)
    logits[ii, ii] = -np.inf
    lmax = np.max(logits, axis=1)
    lmax_s = np.where(np.isfinite(lmax), lmax, 0.0)
    with np.errstate(divide="ignore"):
        lse = lmax + np.log(np.sum(np.exp(logits - lmax_s[:, None]), axis=1))
    return lse - 0.5 * d * LOG_2PI - np.log1p(-weights)


def sample_np(points: np.ndarray, var: np.ndarray, weights: np.ndarray,
              n: int, rng: np.random.Generator):
    """Weight-CDF draw + bandwidth jitter -- the f64 twin of
    ops/sampling.py::_sample_core (reference src/KDE01.jl:164-183;
    sorted uniforms, ``searchsorted`` right, 0-based indices).
    Returns ``(points [d, n], ind [n])`` as NumPy."""
    cdf = np.cumsum(weights)
    cdf = cdf / cdf[-1]
    u = np.sort(rng.uniform(size=n))
    ind = np.clip(np.searchsorted(cdf, u, side="right"), 0,
                  points.shape[0] - 1)
    noise = rng.standard_normal(size=(n, points.shape[1]))
    pts = points[ind] + np.sqrt(var[ind]) * noise
    return pts.T, ind
