"""Approximate products of KDEs via multiscale Gibbs sampling -- the
TPU-native re-design of the reference's crown jewel, ``prodAppxMSGibbsS``
(reference src/MSGibbs01.jl; algorithm: Ihler, Sudderth, Freeman & Willsky,
"Efficient multiscale sampling from products of Gaussian mixtures", NIPS 2003).

What the reference does (src/MSGibbs01.jl:527-629): for each output sample it
walks all densities' ball trees coarse-to-fine; at each level it (1) draws a
point X from the Gaussian product of the currently-selected kernels
(``samplePoint!`` :440-463), (2) descends one tree level (``levelDown!``
:500-523), (3) re-selects a kernel label per density conditioned on X
(``sampleIndices!`` :364-385), then (4) runs ``Niter`` sweeps of sequential
leave-one-out Gibbs over densities (``sampleIndex`` :404-429), each sweep
evaluating every candidate kernel at the current level against the Gaussian
product of the *other* densities' selections (``makeFasterSampleIndex!``
:250-328, flagged "one of the bottlenecks" :247).  The reference generates
its Np samples **serially** (:581) despite their statistical independence.

TPU-first re-design:
  * every output sample is an independent **chain**; all chains run the same
    level schedule, so the engine is one ``vmap`` over chains;
  * the tree walk is replaced by a **level-synchronous dense schedule**: the
    per-level node sets (which are data-independent -- they depend only on
    tree topology) are precomputed on host into dense padded arrays of
    cluster (mean, variance, weight) per level, and every per-level operation
    becomes a masked batched Gaussian evaluation + categorical draw;
  * the data-dependent label remap of ``levelDown!`` (:512-513) is dropped:
    the conditioning re-selection overwrites it before any read (dead in the
    reference too, and it consumes no randomness);
  * all randomness is pre-generated per chain (uniform and normal streams,
    mirroring the reference's ``randU``/``randN`` buffers :661-662 and their
    cursor discipline), so externally injected streams reproduce a serial
    reference trace exactly ("replay mode", the reference's own
    cross-implementation validation hook :691-695).

Numerical guards reproduced from the reference: per-dimension NaN suppression
(:302-304), degenerate fallback to a weight draw when every candidate has
zero likelihood (:311-315), and partial-dimension information zeroing
(:189-209).
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import manifolds
from ..density import KDE, kde
from ..utils.random import ensure_key

# ---------------------------------------------------------------------------
# host-side precompute
# ---------------------------------------------------------------------------

class _ProductPlan:
    """Dense, padded per-level arrays for a set of densities (host precompute)."""

    def __init__(self, densities: Sequence[KDE], n_out: int, dtype):
        self.ndens = len(densities)
        dims = {d.ndim for d in densities}
        if len(dims) != 1:
            raise ValueError("kdes must have same dimension "
                             "(reference src/MSGibbs01.jl:721)")
        self.ndim = dims.pop()
        npts = [d.npts for d in densities]
        max_np = max([n_out] + npts)
        # Nlevels = floor(log(maxNp)/log 2) + 1 (reference src/MSGibbs01.jl:660)
        self.n_levels = int(math.floor(math.log(float(max_np)) / math.log(2.0)) + 1.0)

        trees = [d.tree for d in densities]
        two_n = 2 * max(npts)
        dn, d = self.ndens, self.ndim
        t_mean = np.zeros((dn, two_n, d))
        t_bw = np.ones((dn, two_n, d))
        t_wt = np.zeros((dn, two_n))
        t_perm = np.zeros((dn, two_n), dtype=np.int64)
        for j, t in enumerate(trees):
            s = 2 * t.num_points
            t_mean[j, :s] = t.means
            t_bw[j, :s] = t.bandwidth
            t_wt[j, :s] = t.weights
            t_perm[j, :s] = t.permutation

        # Per-level node lists (levels 1..n_levels; level 0 is just the root),
        # padded across densities and *packed along one concatenated node
        # axis* so the whole plan ships to the device in a handful of
        # transfers; per-level views are static slices taken inside the
        # jitted program (free after fusion).
        per_tree_lists = [t.level_lists(self.n_levels) for t in trees]
        widths = [max(len(per_tree_lists[j][l]) for j in range(dn))
                  for l in range(self.n_levels + 1)]
        self.offsets: List[Tuple[int, int]] = []
        total = 0
        for l in range(1, self.n_levels + 1):
            self.offsets.append((total, widths[l]))
            total += widths[l]
        nodes_cat = np.zeros((dn, total), dtype=np.int64)
        valid_cat = np.zeros((dn, total), dtype=bool)
        for l in range(1, self.n_levels + 1):
            o, w = self.offsets[l - 1]
            for j in range(dn):
                lst = per_tree_lists[j][l]
                nodes_cat[j, o:o + len(lst)] = lst
                valid_cat[j, o:o + len(lst)] = True
                # padded slots replicate the last valid node (still -inf
                # log-weight): if a floating-point CDF tail ever overflows
                # into the padding, the selected stats are the last valid
                # node's -- exactly the reference's fall-to-last-entry rule
                # (selectLabelOnLevel, src/MSGibbs01.jl:330-351)
                nodes_cat[j, o + len(lst):o + w] = lst[-1]
        idx_j = np.arange(dn)[:, None]
        lvl_mean = t_mean[idx_j, nodes_cat]               # [dn, T, d]
        lvl_bw = t_bw[idx_j, nodes_cat]
        lvl_logw = (np.log(np.maximum(t_wt[idx_j, nodes_cat], 1e-300))
                    + np.where(valid_cat, 0.0, -np.inf))  # [dn, T]
        lvl_perm_np = t_perm[idx_j, nodes_cat]            # [dn, T]

        as_dev = lambda x, dt=dtype: jnp.asarray(x, dtype=dt)
        self.t_mean = as_dev(t_mean)
        self.t_bw = as_dev(t_bw)
        self.lvl_nodes = jnp.asarray(nodes_cat.astype(np.int32))
        self.lvl_mean = as_dev(lvl_mean)
        self.lvl_bw = as_dev(lvl_bw)
        self.lvl_logw = as_dev(lvl_logw)
        # stacked (mean ++ bw) stats and per-level permutation ids: the chain
        # kernel reads selected-node stats/labels by one-hot reduction against
        # these, eliminating all per-chain index gathers (XLA gathers cost a
        # full kernel launch each -- the latency-bound regime's dominant tax)
        self.lvl_ms = jnp.concatenate([self.lvl_mean, self.lvl_bw], axis=-1)
        self.lvl_perm = jnp.asarray(lvl_perm_np.astype(np.int32))

    @property
    def lvl_arrays(self):
        return (self.lvl_nodes, self.lvl_mean, self.lvl_bw, self.lvl_logw,
                self.lvl_ms, self.lvl_perm)


# Plan cache: keyed by the identity of the participating densities and the
# level/dtype configuration; entries are evicted when any density is GC'd.
# Repeated products over the same densities (e.g. nonparametric belief
# propagation iterations, or LOOCV probes) skip the host precompute entirely.
_plan_cache: dict = {}


def _resolve_plan_impl(densities: Sequence[KDE], plan: str,
                       replay: bool) -> str:
    """``auto``: build the level hierarchy ON DEVICE when any density is
    device-resident (no retained host arrays -- e.g. the output of a
    previous product), since the host builder would force the documented
    dispatch-degrading readback; otherwise the host builder is free and
    stays bit-parity with the golden fixtures.  Replay mode always uses the
    host plan (the device hierarchy is statistically equivalent, not
    trace-identical in d>1; ops/device_plan.py parity contract)."""
    if plan == "auto":
        if replay:
            return "host"
        dev = any(p._host_points is None and p._tree is None
                  for p in densities)
        return "device" if dev else "host"
    if plan not in ("host", "device"):
        raise ValueError(f"plan must be auto|host|device, got {plan!r}")
    if replay and plan == "device":
        raise ValueError(
            "replay mode (rand_u=) requires the host plan: the device-built "
            "hierarchy is statistically equivalent but not trace-identical "
            "in d>1, so replayed labels would silently diverge from the "
            "injected reference trace (ops/device_plan.py parity contract)")
    return plan


@functools.lru_cache(maxsize=64)
def _full_mask_dev(dn: int, d: int):
    """Device copy of the all-true partial-dim mask (uploaded once per
    shape; the default full-dimension case is every non-partial product)."""
    return jnp.asarray(np.ones((dn, d), dtype=bool))


def _get_plan(densities: Sequence[KDE], n_out: int, dtype,
              impl: str = "host") -> _ProductPlan:
    import weakref
    ids = tuple(id(p) for p in densities)
    npts = tuple(p.npts for p in densities)
    max_np = max((n_out,) + npts)
    n_levels = int(math.floor(math.log(float(max_np)) / math.log(2.0)) + 1.0)
    key = (ids, npts, n_levels, str(dtype), impl)
    hit = _plan_cache.get(key)
    if hit is not None:
        return hit
    if impl == "device":
        from .device_plan import DeviceProductPlan
        plan = DeviceProductPlan(densities, n_out, dtype)
    else:
        plan = _ProductPlan(densities, n_out, dtype)
    _plan_cache[key] = plan

    def _evict(key=key):
        _plan_cache.pop(key, None)
    for p in densities:
        weakref.finalize(p, _evict)
    return plan


def normalize_hooks(addop, diffop, get_mu, get_lambda, d):
    """Broadcast the manifold hook tuples to ``d`` dims and canonicalize:
    all-Euclidean tuples collapse to ``None`` (enabling the fast paths),
    and a custom ``get_lambda`` with a default ``get_mu`` (or vice versa)
    fills the default explicitly so the generic information-form path runs
    -- the (None, tuple) mix would either crash at ``get_mu[k]`` or take
    the Euclidean fast path and silently ignore the custom hook.  Shared
    by the plain and kernel-sharded engines."""
    addop_t = manifolds.broadcast_ops(addop, d)
    diffop_t = manifolds.broadcast_ops(diffop, d)
    get_mu_t = manifolds.broadcast_ops(get_mu, d)
    get_lambda_t = manifolds.broadcast_ops(get_lambda, d)
    if manifolds.is_euclidean(addop_t, manifolds.euclid_add):
        addop_t = None
    if manifolds.is_euclidean(diffop_t, manifolds.euclid_diff):
        diffop_t = None
    if manifolds.is_euclidean(get_lambda_t, manifolds.euclid_lambda) and \
       manifolds.is_euclidean(get_mu_t, manifolds.euclid_mu):
        get_mu_t = get_lambda_t = None
    elif get_mu_t is None:
        get_mu_t = (manifolds.euclid_mu,) * d
    elif get_lambda_t is None:
        get_lambda_t = (manifolds.euclid_lambda,) * d
    return addop_t, diffop_t, get_mu_t, get_lambda_t


# ---------------------------------------------------------------------------
# in-jit primitives
# ---------------------------------------------------------------------------

def _gauss_product(mu_sel, var_sel, mask, skip, get_mu, get_lambda):
    """Information-form product of the selected kernels over densities
    (reference gaussianProductMeanCov!, src/MSGibbs01.jl:176-216).

    mu_sel/var_sel: [dn, d] selected kernel stats (zeroed at inactive dims);
    mask: [dn, d] partial-dim mask; skip: density index to leave out (or -1).
    Returns (mu [d], cov [d]) with zeros where no density contributes.
    """
    dn = mu_sel.shape[0]
    contrib = mask & (jnp.arange(dn)[:, None] != skip)          # [dn, d]
    lam = jnp.where(contrib & (var_sel > 0), 1.0 / jnp.where(var_sel > 0, var_sel, 1.0), 0.0)
    has = jnp.any(contrib, axis=0)                              # [d]
    if get_lambda is None:                                      # Euclidean fast path
        lam_tot = jnp.sum(lam, axis=0)                          # [d]
        cov = jnp.where(has, 1.0 / jnp.where(has, lam_tot, 1.0), 0.0)
        mu = cov * jnp.sum(lam * mu_sel, axis=0)
    else:
        covs, mus = [], []
        for k in range(mu_sel.shape[1]):
            lt = get_lambda[k](lam[:, k], axis=0)
            c = jnp.where(has[k], 1.0 / jnp.where(has[k], lt, 1.0), 0.0)
            covs.append(c)
            mus.append(jnp.where(has[k],
                                 get_mu[k](mu_sel[:, k], lam[:, k], c, axis=0),
                                 0.0))
        cov = jnp.stack(covs)
        mu = jnp.stack(mus)
    return mu, cov


def _kernel_logits_raw(lvl_mean_j, lvl_bw_j, lvl_logw_j, mu, cov, active_dim,
                       diffop, with_cov: bool):
    """Local candidate log-likelihoods WITHOUT the degenerate fallback (which
    is a global property of the full candidate set; the kernel-sharded engine
    reduces it across shards).  See :func:`_kernel_logits`."""
    c = lvl_bw_j + (cov[None, :] if with_cov else 0.0)          # [n_l, d]
    if diffop is None:
        delta = lvl_mean_j - mu[None, :]
    else:
        delta = jnp.stack([diffop[k](lvl_mean_j[:, k], mu[k])
                           for k in range(lvl_mean_j.shape[1])], axis=1)
    per_dim = delta * delta / c + jnp.log(c)                    # [n_l, d]
    # NaN suppression per dim (reference :302-304) + partial-dim skip (:281-285)
    per_dim = jnp.where(jnp.isnan(per_dim) | ~active_dim[None, :], 0.0, per_dim)
    logits = lvl_logw_j - 0.5 * jnp.sum(per_dim, axis=1)        # [n_l]
    return jnp.where(jnp.isnan(logits), -jnp.inf, logits)


# log(1e-99): the reference's degenerate-likelihood threshold
# (src/MSGibbs01.jl:311, `cmo.pT < 1e-99`)
_LOG_DEAD = float(np.log(1e-99))


def _dead_predicate(logits):
    """True iff ``sum(exp(logits)) < 1e-99`` -- the log-space equivalent of
    the reference's linear-f64 degenerate test (src/MSGibbs01.jl:311).

    The reference sums the candidate likelihoods in linear f64, where
    individual terms can underflow at ~exp(-745); since that underflow only
    occurs far below the 1e-99 (~exp(-228)) threshold, the linear test and
    this log-sum-exp test agree everywhere except rounding exactly AT the
    boundary.  Computed with the safe shift so an all--inf row (every
    candidate NaN-suppressed or padded) yields lse = -inf -> dead, matching
    the previous all--inf predicate as a special case.  The predicate fires
    for *finite but tiny* totals too -- e.g. two far-apart densities, where
    the reference falls back to a uniform draw while a max-shifted softmax
    would near-deterministically pick the closest kernel (replay-parity
    corner, tests/test_replay_parity.py)."""
    m = jnp.max(logits)
    ms = jnp.where(jnp.isneginf(m), 0.0, m)
    lse = ms + jnp.log(jnp.sum(jnp.exp(logits - ms)))
    return lse < _LOG_DEAD


def _apply_dead_fallback(logits, lvl_logw_j, dead):
    """Degenerate fallback: when the candidate likelihood total is below the
    reference threshold, draw uniformly over the real candidate nodes
    (reference src/MSGibbs01.jl:311-315 sets every candidate's p to the
    same constant; zero-weight nodes participate -- their lvl_logw is the
    1e-300-clamped finite value -- while -inf marks lane PADDING only).
    ``dead`` is :func:`_dead_predicate` of the raw logits."""
    return jnp.where(dead, jnp.where(jnp.isneginf(lvl_logw_j), -jnp.inf, 0.0),
                     logits)


def _kernel_logits(lvl_mean_j, lvl_bw_j, lvl_logw_j, mu, cov, active_dim,
                   diffop, with_cov: bool):
    """Log-likelihood of each candidate kernel at the current level against a
    Gaussian with mean ``mu`` and (optionally) covariance ``cov``
    (reference makeFasterSampleIndex!, src/MSGibbs01.jl:250-328).

    lvl_*_j: [n_l, d] / [n_l]; mu/cov: [d]; active_dim: [d].
    """
    logits = _kernel_logits_raw(lvl_mean_j, lvl_bw_j, lvl_logw_j, mu, cov,
                                active_dim, diffop, with_cov)
    return _apply_dead_fallback(logits, lvl_logw_j, _dead_predicate(logits))


def _select_label(u, logits):
    """Inverse-CDF draw matching the reference's scan (selectLabelOnLevel,
    src/MSGibbs01.jl:330-351): first index whose CDF reaches ``u``.  The
    index is computed as a count of CDF entries below ``u`` (one vectorized
    compare+sum) rather than a binary search -- identical result, far
    cheaper on the VPU.

    The probabilities are *normalized before* the cumulative sum, exactly as
    the reference (:318-326) and the serial oracle (reference_impl.py) do --
    NOT the algebraically-equal ``cumsum(e) < u * total`` form.  Keeping the
    same arithmetic shape across engines minimizes the ulp-wide window where
    a replayed label could flip at a CDF boundary (the trace-exact replay
    invariant; the normalization pass itself measures within noise,
    BASELINE.md).  The tie rule is the reference's ``u <= cdf[z]`` accept:
    counting strictly-smaller entries returns the first index whose CDF
    reaches u."""
    e = jnp.exp(logits - jnp.max(logits))
    cdf = jnp.cumsum(e / jnp.sum(e))
    z = jnp.sum((cdf < u).astype(jnp.int32))
    return jnp.clip(z, 0, logits.shape[0] - 1)


def _blocked_block_size(w: int) -> int:
    """Static block size for :func:`_select_label_blocked`: ~sqrt(width),
    power of two, clamped to [32, 512] (the full-width passes dominate, so
    the exact split point only has to keep both factor widths small)."""
    return 1 << max(5, min(9, int(round(math.log2(max(1.0,
                                                      math.sqrt(w)))))))


def _select_label_blocked(u, logits, block: int):
    """Two-level (blocked) inverse-CDF draw for the KEYED path: the same
    single-uniform draw as :func:`_select_label`, restructured so no
    full-width prefix sum is ever computed.

    XLA lowers ``cumsum`` over the candidate axis to a log-depth prefix
    network -- O(log w) full passes over the [chains, w] tensor once the
    chain kernel is vmapped -- which round-5 memory analysis shows is what
    actually grows the compiled program's temp footprint superlinearly in
    the batch (25->158 MB from B=4 to B=8, the round-4 "B=8 spill").  Here
    the width is split as ``w = nb x block``: one full pass builds the
    block sums, a cheap [nb] scan picks the block, and a [block]-wide scan
    of the dynamically-sliced block resolves the index -- in exact
    arithmetic the identical index to the flat scan for the same ``u``
    (the flat CDF decomposes as block prefix + in-block prefix), differing
    only on ulp-wide CDF-boundary ties, which is why replay mode (the
    trace-exact contract, PARITY.md) always keeps :func:`_select_label`.
    The degenerate fallback composes unchanged (0/-inf logits -> equal
    block masses -> the same uniform draw).  Consumes exactly one uniform
    from the same stream slot as the flat form."""
    w = logits.shape[0]
    nb = -(-w // block)
    e = jnp.exp(logits - jnp.max(logits))
    e2 = jnp.pad(e, (0, nb * block - w)).reshape(nb, block)
    s = jnp.sum(e2, axis=1)                                   # [nb]
    c = jnp.cumsum(s)
    t = u * c[-1]
    b = jnp.clip(jnp.sum((c < t).astype(jnp.int32)), 0, nb - 1)
    r = t - (c[b] - s[b])                  # mass entering block b
    eb = jax.lax.dynamic_slice_in_dim(e2, b, 1, axis=0)[0]    # [block]
    zin = jnp.sum((jnp.cumsum(eb) < r).astype(jnp.int32))
    zin = jnp.clip(zin, 0, block - 1)
    return jnp.clip(b * block + zin, 0, w - 1).astype(jnp.int32)


def _select_label_gumbel(key, logits):
    """Gumbel-max categorical draw for the KEYED path: ``argmax(logits + G)``
    with iid Gumbel noise samples the same softmax(logits) distribution as
    the inverse-CDF scan, in one fused noise-add plus one argmax -- the CDF
    chain's exp/normalize/cumsum/compare/count stages (each materializing a
    [chains, n_l] tensor in the vmapped program) collapse to ~2 passes over
    the logits.  Only legal where no trace contract exists: the keyed path
    (PARITY.md "keyed reproducibility"); replay mode keeps
    :func:`_select_label`.  The degenerate fallback composes transparently:
    after :func:`_apply_dead_fallback` the dead-row logits are 0 for real
    candidates / -inf for padding, and argmax over (0 + G) is exactly the
    uniform draw the reference's fallback specifies
    (src/MSGibbs01.jl:311-315)."""
    g = jax.random.gumbel(key, logits.shape, logits.dtype)
    return jnp.argmax(logits + g, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# the chain kernel
# ---------------------------------------------------------------------------

def _grouped_vmap(chain, args, n_out: int):
    """``vmap(chain)`` over the leading chain axis, using the grouped
    [G, 1024, ...] layout for large draws (XLA tiles the doubly-vmapped
    level stages markedly better than flat [G*1024, ...]; measured 2x,
    BASELINE.md).  Chains are iid given their stream rows, so grouping is
    layout only -- same per-chain outputs either way."""
    group = 1024
    if n_out < 2 * group:
        return jax.vmap(chain)(*args)
    g, rem = divmod(n_out, group)
    head = jax.vmap(jax.vmap(chain))(
        *(a[:g * group].reshape((g, group) + a.shape[1:]) for a in args))
    head = jax.tree.map(lambda o: o.reshape((g * group,) + o.shape[2:]),
                        head)
    if rem:
        tail = jax.vmap(chain)(*(a[g * group:] for a in args))
        head = jax.tree.map(lambda a, b: jnp.concatenate([a, b]),
                            head, tail)
    return head


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "n_iter", "ndens", "ndim", "n_levels",
                     "addop", "diffop", "get_mu", "get_lambda", "add_entropy"))
def _gibbs_all_chains(u, n_, lvl_arrays, t_mean, t_bw, mask, *,
                      offsets, n_iter, ndens, ndim, n_levels,
                      addop, diffop, get_mu, get_lambda, add_entropy):
    """All chains at once: vmap of the single-chain kernel.  Jitted with the
    plan arrays as traced inputs so repeated products with the same shape
    configuration reuse the compiled executable."""
    def chain(u_row, n_row):
        return _run_chain(u_row, n_row, lvl_arrays, offsets, t_mean, t_bw,
                          mask, n_iter, ndens, ndim, n_levels,
                          addop, diffop, get_mu, get_lambda, add_entropy)
    return jax.vmap(chain)(u, n_)


@functools.partial(
    jax.jit,
    static_argnames=("n_out", "bu", "bn", "offsets", "n_iter", "ndens",
                     "ndim", "n_levels", "addop", "diffop", "get_mu",
                     "get_lambda", "add_entropy", "dtype", "select"))
def _gibbs_from_key(key, lvl_arrays, t_mean, t_bw, mask, *,
                    n_out, bu, bn, offsets, n_iter, ndens, ndim, n_levels,
                    addop, diffop, get_mu, get_lambda, add_entropy, dtype,
                    select="cdf"):
    """Single-dispatch product: RNG stream generation + all chains + output
    transposes fused into ONE executable.  On the axon remote runtime each
    eager dispatch costs a ~1 ms round trip once any result has been
    fetched, so the keyed (non-replay) path folds everything into one
    program (measured: ~25% per-product latency reduction)."""
    ku, kn = jax.random.split(key)

    # One flat stream draw for every layout: chain i always consumes row i
    # of the key's [n_out, b] stream (or, in gumbel mode, key i of the
    # per-chain key split), so same-key outputs are invariant to the
    # grouped-compute choice below (and no padded chains are ever drawn
    # or computed).  NOTE (PARITY.md "keyed reproducibility"): same-key
    # sample *identity* is still only guaranteed within one build AND one
    # `select` mode -- the contracts across versions/engines are
    # distributional equality and replay mode.
    if select == "gumbel":
        u = jax.random.split(ku, n_out)          # [n_out, 2] chain keys
    else:                                        # cdf/blocked: same stream
        u = jax.random.uniform(ku, (n_out, bu), dtype=dtype)
    n_ = jax.random.normal(kn, (n_out, bn), dtype=dtype)

    def chain(u_row, n_row):
        return _run_chain(u_row, n_row, lvl_arrays, offsets, t_mean, t_bw,
                          mask, n_iter, ndens, ndim, n_levels,
                          addop, diffop, get_mu, get_lambda, add_entropy,
                          select=select)
    pts, idx, labels = _grouped_vmap(chain, (u, n_), n_out)
    return pts.T, idx.T, jnp.transpose(labels, (0, 2, 1))


def _run_chain(u_row, n_row, lvl_arrays, offsets, t_mean, t_bw,
               mask, n_iter, ndens, ndim, n_levels,
               addop, diffop, get_mu, get_lambda, add_entropy,
               select="cdf"):
    """One Gibbs chain (vmapped over chains).  ``u_row``/``n_row`` are this
    chain's pre-generated uniform/normal streams, laid out in the reference's
    consumption order (see module docstring).  With ``select="gumbel"``
    (keyed path only) ``u_row`` is instead this chain's PRNG key: each
    selection folds a unique static stage id into it and draws Gumbel noise
    in-program (:func:`_select_label_gumbel`), replacing the CDF chain.

    Op-count discipline: on the axon runtime this program is bound by the
    latency of sequential kernel launches (~6.5 us each), so the level loop
    avoids every per-chain index gather -- selected-node stats come from a
    one-hot masked reduction against the stacked level stats ``lvl_ms``
    (exact: one nonzero term), labels from the precomputed per-level
    permutation ids ``lvl_perm``, and the reference's ``levelDown!`` label
    remap (src/MSGibbs01.jl:512-513) is dropped entirely because the
    conditioning re-selection immediately overwrites it (it consumes no
    randomness; dead in the reference too)."""
    f = t_mean.dtype

    # [dn, d]: OR of the *other* densities' masks (the LOO dimmask of
    # makeFasterSampleIndex!, reference src/MSGibbs01.jl:270-275)
    union_other = jnp.stack([jnp.any(mask.at[j].set(False), axis=0)
                             for j in range(ndens)])
    act_all = mask & union_other

    def sample_point(mu_sel, var_sel, normals, jitter):
        mu, cov = _gauss_product(mu_sel, var_sel, mask, -1, get_mu, get_lambda)
        step = jnp.sqrt(cov) * normals
        if addop is None:
            x = mu + step
        else:
            x = jnp.stack([addop[k](mu[k], step[k]) for k in range(ndim)])
        return jnp.where(jitter, x, mu)

    # stream cursors (static layout)
    #   uniforms: [ndens init] ++ per level ([ndens cond] ++ [n_iter*ndens gibbs])
    #   normals:  [(n_levels+1) * ndim]
    if select == "gumbel":      # gumbel: u_row IS this chain's PRNG key
        chain_key = u_row
    else:                        # cdf/blocked: the uniform stream
        u_cond = u_row[ndens:].reshape(n_levels,
                                       (1 + n_iter) * ndens)[:, :ndens]
        u_gibbs = (u_row[ndens:].reshape(n_levels, (1 + n_iter) * ndens)
                   [:, ndens:].reshape(n_levels, n_iter, ndens))
    normals = n_row.reshape(n_levels + 1, ndim)

    # initial selection: every tree's root (node 0); its stats are static
    # slices (updateGlbParticlesVariance!, reference src/MSGibbs01.jl:89-107)
    mu_sel = jnp.where(mask, t_mean[:, 0, :], 0.0)              # [dn, d]
    var_sel = jnp.where(mask, t_bw[:, 0, :], 0.0)
    perms = jnp.zeros(ndens, dtype=jnp.int32)
    labels_rec = []

    _, lvl_mean_cat, lvl_bw_cat, lvl_logw_cat, lvl_ms_cat, lvl_perm_cat = \
        lvl_arrays

    def select_stats(onehot, lvl_ms_j, lvl_perm_j, mask_j):
        """Selected node's (mean, var) and permutation id by one-hot masked
        reduction -- exact (single nonzero term), no gather kernels."""
        sel = jnp.sum(jnp.where(onehot[:, None], lvl_ms_j, 0.0), axis=0)
        nm = jnp.where(mask_j, sel[:ndim], 0.0)
        nv = jnp.where(mask_j, sel[ndim:], 0.0)
        perm = jnp.sum(jnp.where(onehot, lvl_perm_j, 0))
        return nm, nv, perm

    for l in range(1, n_levels + 1):
        o, w = offsets[l - 1]
        lvl_mean = lvl_mean_cat[:, o:o + w]
        lvl_bw = lvl_bw_cat[:, o:o + w]
        lvl_logw = lvl_logw_cat[:, o:o + w]
        lvl_ms = lvl_ms_cat[:, o:o + w]
        lvl_perm = lvl_perm_cat[:, o:o + w]
        iota_w = jnp.arange(w)
        # blocked engages only where the full-width prefix sum is material;
        # narrow levels keep the flat scan (static per-level choice)
        blk = _blocked_block_size(w)
        blocked_l = select == "blocked" and w > 128
        # (1) draw X from the product of current selections (:594)
        x = sample_point(mu_sel, var_sel, normals[l - 1], True)
        # (2) levelDown! remap is dead (see docstring); (3) re-select labels
        # conditioned on X, batched over densities (sampleIndices!, :600;
        # no LOO, no product covariance)
        logits = jax.vmap(
            lambda m, b, lw, a: _kernel_logits(m, b, lw, x, None, a,
                                               diffop, with_cov=False)
        )(lvl_mean, lvl_bw, lvl_logw, act_all)                  # [dn, w]
        if select == "gumbel":
            zs = _select_label_gumbel(
                jax.random.fold_in(chain_key, l), logits)        # [dn]
        elif blocked_l:
            zs = jax.vmap(lambda uu, lg: _select_label_blocked(uu, lg, blk)
                          )(u_cond[l - 1], logits)               # [dn]
        else:
            zs = jax.vmap(_select_label)(u_cond[l - 1], logits)  # [dn]
        onehot = iota_w[None, :] == zs[:, None]                 # [dn, w]
        sel = jnp.sum(jnp.where(onehot[:, :, None], lvl_ms, 0.0), axis=1)
        mu_sel = jnp.where(mask, sel[:, :ndim], 0.0)
        var_sel = jnp.where(mask, sel[:, ndim:], 0.0)
        perms = jnp.sum(jnp.where(onehot, lvl_perm, 0), axis=1)

        # (4) Niter sweeps of sequential LOO Gibbs over densities (:604-608)
        def sweep(t, carry, lvl_mean=lvl_mean, lvl_bw=lvl_bw,
                  lvl_logw=lvl_logw, lvl_ms=lvl_ms, lvl_perm=lvl_perm,
                  iota_w=iota_w, l=l, blk=blk, blocked_l=blocked_l):
            mu_sel, var_sel, perms = carry
            for j in range(ndens):
                mu, cov = _gauss_product(mu_sel, var_sel, mask, j,
                                         get_mu, get_lambda)
                logits = _kernel_logits(lvl_mean[j], lvl_bw[j],
                                        lvl_logw[j], mu, cov, act_all[j],
                                        diffop, with_cov=True)
                if select == "gumbel":
                    # unique static stage id per (level, sweep, density):
                    # levels own ids 1..n_levels for the conditioning
                    # selections, sweeps continue above them
                    sid = (n_levels + 1
                           + ((l - 1) * n_iter + t) * ndens + j)
                    z = _select_label_gumbel(
                        jax.random.fold_in(chain_key, sid), logits)
                elif blocked_l:
                    z = _select_label_blocked(u_gibbs[l - 1, t, j],
                                              logits, blk)
                else:
                    z = _select_label(u_gibbs[l - 1, t, j], logits)
                nm, nv, perm = select_stats(iota_w == z, lvl_ms[j],
                                            lvl_perm[j], mask[j])
                mu_sel = mu_sel.at[j].set(nm)
                var_sel = var_sel.at[j].set(nv)
                perms = perms.at[j].set(perm)
            return mu_sel, var_sel, perms
        # On accelerators the sweeps are unrolled (n_iter is static): every
        # stream index becomes a static slice and XLA sees straight-line
        # code -- worth ~1 op per stage in the latency-bound regime.  On CPU
        # (the hermetic test mesh) the 5x-larger unrolled program only slows
        # compilation, so keep lax.fori_loop there; the traced math is
        # identical either way (same ops, same order).
        if jax.default_backend() == "cpu":
            if n_iter > 0:
                mu_sel, var_sel, perms = jax.lax.fori_loop(
                    0, n_iter, sweep, (mu_sel, var_sel, perms))
        else:
            for t in range(n_iter):
                mu_sel, var_sel, perms = sweep(t, (mu_sel, var_sel, perms))
        labels_rec.append(perms)

    # final labels + final draw (:612-625)
    final_idx = labels_rec[-1] if labels_rec else perms
    x = sample_point(mu_sel, var_sel, normals[n_levels], add_entropy)
    labels = (jnp.stack(labels_rec) if labels_rec
              else jnp.zeros((0, ndens), jnp.int32))
    return x, final_idx, labels                                 # [d],[dn],[L,dn]


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def resolve_select(select: str, n_out: Optional[int] = None,
                   width: Optional[int] = None, batch: int = 1) -> str:
    """Resolve the keyed-path selection mode (jit static arg -- distinct
    modes compile distinct executables and coexist in the cache).

    ``auto`` reads ``config.GIBBS_SELECT`` at call time; its default
    ``"size"`` routes by problem size per the measured winner grid
    (tools/ab_select_grid.py, real chip 2026-08-20; thresholds in
    config.SELECT_*): ``blocked`` for very wide leaves with few chains,
    ``gumbel`` for wide leaves / large chain*width work / batched B >= 8
    (where the flat cumsum's temp buffers spill), flat ``cdf`` otherwise
    (it wins the headline regime).  ``n_out``/``width``/``batch`` are the
    chains, padded leaf width, and batched-set count; with unknown sizes
    ``size`` falls back to ``cdf``."""
    from .. import config
    if select == "auto":
        select = config.GIBBS_SELECT
    if select == "size":
        if n_out is None or width is None:
            return "cdf"
        if (width >= config.SELECT_BLOCKED_WIDTH
                and n_out <= config.SELECT_BLOCKED_MAX_CHAINS
                and batch == 1):
            return "blocked"
        if (width >= config.SELECT_GUMBEL_WIDTH
                or batch >= config.SELECT_GUMBEL_BATCH
                or n_out * width >= config.SELECT_GUMBEL_WORK):
            return "gumbel"
        return "cdf"
    if select not in ("cdf", "blocked", "gumbel"):
        raise ValueError(
            f"select must be auto|size|cdf|blocked|gumbel, got {select!r}")
    return select

def prod_appx_ms_gibbs(npd0,
                       densities: Sequence[KDE],
                       an_fcns=None,
                       an_params=None,
                       n_iter: int = 3,
                       addop=None,
                       diffop=None,
                       get_mu=None,
                       get_lambda=None,
                       add_entropy: bool = True,
                       partial_dim_mask: Optional[Sequence] = None,
                       rand_u: Optional[np.ndarray] = None,
                       rand_n: Optional[np.ndarray] = None,
                       record_labels: bool = False,
                       key=None,
                       dtype=None,
                       plan: str = "auto",
                       select: str = "auto"):
    """Draw samples from (an approximation of) the product of ``densities``.

    Mirrors the reference ``prodAppxMSGibbsS`` (src/MSGibbs01.jl:645-703):

    Args:
      npd0: output sizing -- a KDE whose ``npts`` is the number of samples
        (reference convention), or an int sample count directly.
      densities: the KDEs to multiply.
      an_fcns/an_params: accepted for API compatibility (the reference also
        ignores them, src/MSGibbs01.jl:678).
      n_iter: Gibbs sweeps per level (reference Niter).
      addop/diffop/get_mu/get_lambda: per-dim manifold hooks.
      add_entropy: if False, each output is the product-Gaussian *mean* of
        the selected kernels (deterministic given labels, :455-459).
      partial_dim_mask: ``[ndens][d]`` booleans -- dims each density carries
        information on (:663).
      rand_u/rand_n: optional injected random streams in the reference's
        consumption order ("replay mode", see :691-695); otherwise ``key``.
      record_labels: also return per-level label choices
        (``labelsChoosen``, :109-112).
      plan: ``auto`` (device-built level hierarchy for device-resident
        densities, host ball tree otherwise), ``host``, or ``device``
        (ops/device_plan.py).
      select: keyed-path label-selection arithmetic -- ``auto`` (reads
        ``config.GIBBS_SELECT``; its default ``"size"`` routes to the
        measured per-regime winner, see :func:`resolve_select`), ``cdf``
        (the reference-shaped flat inverse-CDF chain), ``blocked`` (the
        same single-uniform inverse-CDF draw computed
        block-hierarchically -- no full-width prefix sum;
        exact-arithmetic-identical index, ulp ties may differ), or
        ``gumbel`` (argmax(logits+G); distributionally identical
        categorical).  Replay mode always uses the flat ``cdf`` form
        (trace contract).

    Returns ``(points [d, Np], indices [ndens, Np])`` -- 0-based kernel
    labels -- plus ``labels [Np, ndens, n_levels]`` if ``record_labels``.
    """
    n_out = npd0 if isinstance(npd0, int) else npd0.npts
    densities = list(densities)
    if dtype is None:
        dtype = densities[0].dtype      # property: no lazy device upload
    impl = _resolve_plan_impl(densities, plan, replay=rand_u is not None)
    plan = _get_plan(densities, n_out, dtype, impl)
    dn, d, n_levels = plan.ndens, plan.ndim, plan.n_levels

    if partial_dim_mask is None:
        # cached device constant: re-uploading the all-true mask per call
        # is a ~1 ms dispatch round trip in the degraded axon regime
        mask = _full_mask_dev(dn, d)
    else:
        mask = jnp.asarray(
            np.asarray(partial_dim_mask, dtype=bool).reshape(dn, d))

    addop_t, diffop_t, get_mu_t, get_lambda_t = normalize_hooks(
        addop, diffop, get_mu, get_lambda, d)

    # Two Pallas alternatives were built and A/B-measured against this jnp
    # program (completion-forced, interleaved; BASELINE.md "Engine
    # comparison"): a per-level kernel engine (lost 7x at 1000 chains, 1.9x
    # at 4096, VMEM-OOM at width-2048 levels; removed in round 2) and a
    # fused upper-level engine holding chain state in VMEM across the
    # narrow levels (labels agreed 1.0000 but lost in every regime on real
    # TPU: 0.92x single product, 0.97x at 16k chains, 0.80x batched;
    # removed in round 4, tools/ab_fused_r4_output.txt).  The single fused
    # XLA program is the engine.

    if (rand_u is None) != (rand_n is None):
        raise ValueError(
            "replay mode needs BOTH streams: pass rand_u (uniforms) and "
            "rand_n (normals) together (reference src/MSGibbs01.jl:661-662)")
    bu = dn * (1 + n_levels * (1 + n_iter))
    bn = d * (n_levels + 1)
    if rand_u is None:
        # keyed fast path: stream generation + chains + transposes fused
        # into ONE dispatch (each eager op costs a round trip on the axon
        # runtime once any result has been fetched)
        key = ensure_key(key)
        pts_t, idx_t, labels_t = _gibbs_from_key(
            key, plan.lvl_arrays, plan.t_mean, plan.t_bw, mask,
            n_out=n_out, bu=bu, bn=bn, offsets=tuple(plan.offsets),
            n_iter=n_iter, ndens=dn, ndim=d, n_levels=n_levels,
            addop=addop_t, diffop=diffop_t, get_mu=get_mu_t,
            get_lambda=get_lambda_t, add_entropy=add_entropy,
            dtype=jnp.dtype(dtype).name,
            select=resolve_select(select, n_out, plan.offsets[-1][1]))
        out = (pts_t, idx_t)
        if record_labels:
            out = out + (labels_t,)
        return out

    # replay mode: streams may be over-allocated (the reference sizes
    # randU at Np*Ndens*(Niter+2)*Nlevels, src/MSGibbs01.jl:661); only the
    # first n_out*bu / n_out*bn draws are consumed, contiguously.
    u = jnp.asarray(np.asarray(rand_u, dtype=np.float64)
                    .ravel()[:n_out * bu].reshape(n_out, bu), dtype=dtype)
    n_ = jnp.asarray(np.asarray(rand_n, dtype=np.float64)
                     .ravel()[:n_out * bn].reshape(n_out, bn), dtype=dtype)

    pts, idx, labels = _gibbs_all_chains(
        u, n_, plan.lvl_arrays, plan.t_mean, plan.t_bw, mask,
        offsets=tuple(plan.offsets),
        n_iter=n_iter, ndens=dn, ndim=d, n_levels=n_levels,
        addop=addop_t, diffop=diffop_t, get_mu=get_mu_t,
        get_lambda=get_lambda_t, add_entropy=add_entropy)

    out = (pts.T, idx.T)                                        # [d,Np], [dn,Np]
    if record_labels:
        out = out + (jnp.transpose(labels, (0, 2, 1)),)         # [Np, dn, L]
    return out


def _density_hooks(densities: Sequence[KDE]):
    """Collect the densities' attached manifold hooks for the product
    engine (addop/diffop/get_mu/get_lambda, reference
    src/MSGibbs01.jl:672-675).

    The hooks are properties of the *product space* (the reference threads
    ONE per-dimension tuple through the whole engine), so if any density
    carries a non-Euclidean hook, every density must carry the identical
    tuple -- mixing hooked and hook-free densities in one product is
    ambiguous and raises instead of silently sampling Euclidean
    (VERDICT r2 weak #5).  Returns (addop, diffop, get_mu, get_lambda)
    with ``None`` for all-Euclidean."""
    specs = (("addop", manifolds.euclid_add),
             ("diffop", manifolds.euclid_diff),
             ("get_mu", manifolds.euclid_mu),
             ("get_lambda", manifolds.euclid_lambda))
    out = []
    for attr, default in specs:
        carried = [(i, getattr(p, attr, None)) for i, p in
                   enumerate(densities)]
        non_euclid = [(i, ops) for i, ops in carried
                      if not manifolds.is_euclidean(ops, default)]
        if not non_euclid:
            out.append(None)
            continue
        first = non_euclid[0][1]
        for i, ops in carried:
            if ops is None or tuple(ops) != tuple(first):
                raise ValueError(
                    f"density {non_euclid[0][0]} carries a non-Euclidean "
                    f"{attr} but density {i} does not match; products "
                    "require every density to carry identical manifold "
                    "hooks (the hooks describe the shared product space, "
                    "reference src/MSGibbs01.jl:672-675)")
        out.append(first)

    # per-dimension cross-hook consistency: a wrapped addop/diffop with a
    # Euclidean get_mu/get_lambda (or vice versa) would draw samples on the
    # manifold but combine kernels with the EUCLIDEAN information-form mean
    # -- e.g. circular kernels at +3.1 and -3.1 averaging to ~0, the wrong
    # side of the wrap -- with no error.  The quadruple must agree per dim
    # (attach all four, as examples/circular_fusion.py does, or call
    # prod_appx_ms_gibbs with explicit hooks to override).
    d = densities[0].ndim
    bcast = [manifolds.broadcast_ops(h, d) if h is not None else
             (default,) * d for h, (_, default) in zip(out, specs)]
    for k in range(d):
        wrapped = {attr: ops[k] is not default
                   for ops, (attr, default) in zip(bcast, specs)}
        if any(wrapped.values()) and not all(wrapped.values()):
            have = [a for a, w in wrapped.items() if w]
            missing = [a for a, w in wrapped.items() if not w]
            raise ValueError(
                f"dimension {k} carries non-Euclidean {have} but Euclidean "
                f"{missing}: the product engine needs the full "
                "addop/diffop/get_mu/get_lambda quadruple per manifold "
                "dimension (a Euclidean product mean on a wrapped "
                "dimension places mass on the wrong chart); attach all "
                "four, or call prod_appx_ms_gibbs with explicit hooks")
    return tuple(out)


def product(densities: Sequence[KDE],
            add_entropy: bool = True,
            key=None) -> KDE:
    """The ``*`` operator: Gibbs product with Niter=5 sized at the mean
    component count, followed by an LOOCV refit of the samples
    (reference src/MSGibbs01.jl:707-736).

    Densities carrying manifold hooks (``addop``/``diffop``/``get_mu``/
    ``get_lambda``) flow them into the Gibbs engine -- samples wrap
    correctly on e.g. circular dimensions -- and the output density carries
    the same hooks.  The LOOCV refit bandwidth itself stays Euclidean,
    exactly like the reference's ``kde!(pGM)`` (src/MSGibbs01.jl:725)."""
    densities = list(densities)
    addop, diffop, get_mu, get_lambda = _density_hooks(densities)
    if len(densities) == 1 and not add_entropy:
        # reference's #70 short-circuit (src/MSGibbs01.jl:712-716)
        return kde(densities[0].get_points(), addop=addop, diffop=diffop,
                   get_mu=get_mu, get_lambda=get_lambda)
    n_out = int(round(float(np.mean([p.npts for p in densities]))))
    pts, _ = prod_appx_ms_gibbs(n_out, densities, n_iter=5,
                                add_entropy=add_entropy, key=key,
                                addop=addop, diffop=diffop,
                                get_mu=get_mu, get_lambda=get_lambda)
    # pts is a device array, so kde() takes its device-resident path: the
    # LOOCV refit's bracket comes from jnp.sort (no host tree build) and the
    # samples never cross to the host -- the reference's
    # product-then-kde! chain (src/MSGibbs01.jl:724-725) without the
    # device->host cliff (BASELINE.md "end-to-end `*`").
    return kde(pts, addop=addop, diffop=diffop,
               get_mu=get_mu, get_lambda=get_lambda)


def product_batched(density_sets,
                    n_iter: int = 5,
                    add_entropy: bool = True,
                    key=None,
                    mesh=None):
    """Batched ``*``: one Gibbs dispatch + one fused LOOCV refit for ``B``
    same-shaped density sets; returns ``B`` product KDEs.

    The serving-path form of :func:`product` (no reference counterpart --
    the reference computes each ``*`` serially, src/MSGibbs01.jl:707-736):
    the sampler batches the B products into a single program
    (:class:`BatchedProductSampler`) and the refit folds the ``B x d``
    independent 1-D golden searches into ONE device program (uniform-weight
    products share one search batch), so the whole pipeline is two
    dispatches regardless of B and fully device-resident.
    """
    from .loocv import (_internal_slices_dev, golden_lookahead,
                        golden_unroll, ksize_rows, select_loo_impl)
    from .. import config

    sets = [list(ds) for ds in density_sets]
    if not sets:
        return []
    npts0 = [p.npts for p in sets[0]]
    n_out = int(round(float(np.mean(npts0))))
    sampler = BatchedProductSampler(sets, n_out=n_out, n_iter=n_iter,
                                    add_entropy=add_entropy, mesh=mesh)
    addop, diffop, get_mu, get_lambda = sampler.hooks
    key = ensure_key(key)
    pts, _ = sampler.sample(key)                     # [B, d, n_out]
    B, d, n = pts.shape
    lo, hi = _internal_slices_dev(n)
    # the B x d golden searches fold into ONE ksize_rows batch (product
    # outputs are uniform-weight, so all rows share one weight vector)
    impl = select_loo_impl(n, pts.dtype)
    bwds = ksize_rows(pts.reshape(B * d, n),
                      jnp.full((n,), 1.0 / n, dtype=pts.dtype),
                      lo, hi,
                      impl=impl, chunk=int(config.LOOCV_CHUNK),
                      unroll=golden_unroll(impl),
                      lookahead=golden_lookahead(impl, B * d, n))  # [B*d]
    var = bwds.reshape(B, d) ** 2                    # [B, d]
    # output densities carry the batch's manifold hooks, as product() does
    # (the refit bandwidth itself stays Euclidean, like the reference's
    # kde!(pGM), src/MSGibbs01.jl:725)
    return [KDE(pts[b].T, jnp.tile(var[b][None, :], (n, 1)),
                jnp.full((n,), 1.0 / n, dtype=pts.dtype),
                addop=addop, diffop=diffop,
                get_mu=get_mu, get_lambda=get_lambda)
            for b in range(B)]


@functools.partial(
    jax.jit,
    static_argnames=("n_out", "bu", "bn", "offsets", "n_iter", "ndens",
                     "ndim", "n_levels", "addop", "diffop", "get_mu",
                     "get_lambda", "add_entropy", "dtype", "select"))
def _gibbs_batched_sets(key, lvl_arrays, t_mean, t_bw,
                        mask, *, n_out, bu, bn, offsets, n_iter, ndens,
                        ndim, n_levels, addop, diffop, get_mu, get_lambda,
                        add_entropy, dtype, select="cdf"):
    """B independent products over B density sets in ONE dispatch: the plan
    arrays carry a leading set axis and the whole keyed product is vmapped
    over it.  ``key`` is split into one key per set, so set ``i``'s output
    equals a standalone ``prod_appx_ms_gibbs`` call with ``split(key)[i]``.
    Manifold hooks (static per-dim callables, shared by every set -- the
    NBP serving pattern fuses the same variable type across messages,
    reference src/MSGibbs01.jl:672-675) trace into the vmapped chain kernel
    exactly as in the single-product program."""
    B = t_mean.shape[0]
    keys = jax.random.split(key, B)

    def one(k, lvl, tm, tb, m):
        return _gibbs_from_key(
            k, lvl, tm, tb, m, n_out=n_out, bu=bu, bn=bn,
            offsets=offsets, n_iter=n_iter, ndens=ndens, ndim=ndim,
            n_levels=n_levels, addop=addop, diffop=diffop, get_mu=get_mu,
            get_lambda=get_lambda, add_entropy=add_entropy, dtype=dtype,
            select=select)
    return jax.vmap(one)(keys, lvl_arrays, t_mean, t_bw, mask)


class BatchedProductSampler:
    """Products of ``B`` same-shaped density sets in one dispatch.

    The serving-path API for nonparametric belief propagation: every BP
    iteration multiplies many message sets of identical shape (same number
    of densities, dimensions, and components); batching them into a single
    program amortizes the sampler's sequential level schedule, which is
    latency-bound below ~4000 chains (BASELINE.md).  No reference
    counterpart -- the reference generates each product serially.

    All sets must share ``(ndens, ndim, per-position npts)``.  Use
    :meth:`refresh` to swap in updated message densities (same shapes)
    without recompilation.

    >>> sampler = BatchedProductSampler([[p1, q1], [p2, q2]], n_out=1000)
    >>> pts, labels = sampler.sample(jax.random.PRNGKey(0))
    >>> pts.shape                    # [B, d, n_out]
    """

    def __init__(self, density_sets, n_out: int, n_iter: int = 5,
                 add_entropy: bool = True, partial_dim_masks=None,
                 dtype=None, mesh=None, plan: str = "auto"):
        """``mesh``: optional 1-axis ``jax.sharding.Mesh``; the set axis is
        sharded over it (each chip runs its sets' products -- the
        graph-parallel axis of belief propagation).  The mesh size must
        divide ``B``.  ``plan``: auto|host|device level-hierarchy builder
        (auto picks the device builder for device-resident message
        densities -- the refresh() path of a BP loop never reads back)."""
        self.n_out = n_out
        self.n_iter = n_iter
        self.add_entropy = add_entropy
        self.dtype = dtype
        self.mesh = mesh
        self.plan_impl = plan
        self._build(density_sets, partial_dim_masks)

    def _build(self, density_sets, partial_dim_masks):
        self._masks_arg = partial_dim_masks     # refresh() default: keep
        sets = [list(ds) for ds in density_sets]
        if not sets:
            raise ValueError("need at least one density set")
        shapes = {(len(ds), ds[0].ndim, tuple(p.npts for p in ds))
                  for ds in sets}
        if len(shapes) != 1:
            raise ValueError("all density sets must share "
                             "(ndens, ndim, per-position npts); "
                             f"got {sorted(shapes)}")
        # density-attached manifold hooks flow into the batched engine
        # exactly as in ProductSampler (same per-set consistency rule);
        # the hooks are static callables shared by the whole batch, so
        # every set must carry the identical quadruple (the NBP serving
        # pattern multiplies messages of ONE variable type per batch,
        # reference src/MSGibbs01.jl:672-675)
        set_hooks = [_density_hooks(ds) for ds in sets]
        self.hooks = set_hooks[0]

        def _key(hooks):
            return tuple(tuple(h) if isinstance(h, tuple) else h
                         for h in hooks)
        if any(_key(h) != _key(self.hooks) for h in set_hooks[1:]):
            raise ValueError(
                "all density sets in one batch must carry identical "
                "manifold hooks (the hooks describe the shared product "
                "space of the batch; build separate samplers per variable "
                "type)")
        dtype = self.dtype or sets[0][0].dtype    # no lazy device upload
        impls = [_resolve_plan_impl(ds, self.plan_impl, False) for ds in sets]
        if len(set(impls)) > 1:
            # Mixed auto-resolution (some sets device-resident, some
            # host-backed -- e.g. the first BP iteration): force ONE builder
            # for the whole batch.  For d > 1 the host and device builders
            # produce deliberately different (statistically equivalent)
            # hierarchies, and mixing them within a batch would anneal sets
            # through different schedules; the device builder works for
            # host-backed densities too (their .points live on device).
            impls = ["device"] * len(impls)
        self.B = len(sets)
        self.ndens = len(sets[0])
        self.ndim = sets[0][0].ndim
        if all(i == "device" for i in impls):
            # all-device-resident sets (the BP refresh pattern): build every
            # set's plan in ONE vmapped dispatch
            from .device_plan import batched_device_plans
            (self.lvl_arrays, self.t_mean, self.t_bw, offsets,
             self.n_levels) = batched_device_plans(sets, self.n_out, dtype)
            self.offsets = tuple(offsets)
        else:
            plans = [_get_plan(ds, self.n_out, dtype, impl)
                     for ds, impl in zip(sets, impls)]
            p0 = plans[0]
            self.n_levels, self.offsets = p0.n_levels, tuple(p0.offsets)
            self.lvl_arrays = tuple(
                jnp.stack(a) for a in zip(*(p.lvl_arrays for p in plans)))
            self.t_mean = jnp.stack([p.t_mean for p in plans])
            self.t_bw = jnp.stack([p.t_bw for p in plans])
        if partial_dim_masks is None:
            self.mask = jnp.ones((self.B, self.ndens, self.ndim), bool)
        else:
            self.mask = jnp.asarray(np.asarray(partial_dim_masks, bool)
                                    .reshape(self.B, self.ndens, self.ndim))
        self.bu = self.ndens * (1 + self.n_levels * (1 + self.n_iter))
        self.bn = self.ndim * (self.n_levels + 1)
        self._dtype_name = jnp.dtype(dtype).name
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            axis = self.mesh.axis_names[0]
            sh = NamedSharding(self.mesh, PartitionSpec(axis))
            put = lambda x: jax.device_put(x, sh)
            self.lvl_arrays = tuple(put(a) for a in self.lvl_arrays)
            self.t_mean = put(self.t_mean)
            self.t_bw = put(self.t_bw)
            self.mask = put(self.mask)

    _KEEP = object()

    def refresh(self, density_sets, partial_dim_masks=_KEEP):
        """Swap in updated densities (same shapes -> no recompilation).
        ``partial_dim_masks`` defaults to KEEPING the masks the sampler was
        built with (the BP-loop pattern refreshes densities only); pass
        explicit masks (or ``None`` for all-dims) to change them."""
        if partial_dim_masks is BatchedProductSampler._KEEP:
            partial_dim_masks = self._masks_arg
        self._build(density_sets, partial_dim_masks)

    def sample(self, key, select: str = "auto"):
        """Returns (points [B, d, n_out], labels [B, ndens, n_out])."""
        key = ensure_key(key)
        addop, diffop, get_mu, get_lambda = self.hooks
        pts, idx, _ = _gibbs_batched_sets(
            key, self.lvl_arrays, self.t_mean, self.t_bw,
            self.mask, n_out=self.n_out, bu=self.bu,
            bn=self.bn, offsets=self.offsets, n_iter=self.n_iter,
            ndens=self.ndens, ndim=self.ndim, n_levels=self.n_levels,
            addop=addop, diffop=diffop, get_mu=get_mu,
            get_lambda=get_lambda, add_entropy=self.add_entropy,
            dtype=self._dtype_name,
            select=resolve_select(select, self.n_out, self.offsets[-1][1],
                                  batch=self.B))
        return pts, idx


class ProductSampler:
    """Reusable sampler for repeated products over the same densities.

    Holds the device-resident plan and the compiled chain program, so each
    ``sample(key)`` is a single dispatch -- the serving-path API for
    nonparametric belief propagation, where the same message densities are
    multiplied every iteration.

    >>> sampler = ProductSampler([p, q], n_out=1000, n_iter=5)
    >>> pts, labels = sampler.sample(jax.random.PRNGKey(0))
    """

    def __init__(self, densities: Sequence[KDE], n_out: int,
                 n_iter: int = 5, add_entropy: bool = True,
                 partial_dim_mask=None, dtype=None, plan: str = "auto"):
        self.densities = list(densities)
        if dtype is None:
            dtype = self.densities[0].dtype     # no lazy device upload
        self.dtype = dtype
        # density-attached manifold hooks flow into the engine exactly as
        # product() does (same consistency rule; no silent-Euclidean path)
        self.hooks = _density_hooks(self.densities)
        self.n_out = n_out
        self.n_iter = n_iter
        self.add_entropy = add_entropy
        self.plan = _get_plan(self.densities, n_out, dtype,
                              _resolve_plan_impl(self.densities, plan, False))
        dn, d = self.plan.ndens, self.plan.ndim
        if partial_dim_mask is None:
            self.mask_np = np.ones((dn, d), dtype=bool)
        else:
            self.mask_np = np.asarray(partial_dim_mask, bool).reshape(dn, d)
        self.mask = jnp.asarray(self.mask_np)
        self.bu = dn * (1 + self.plan.n_levels * (1 + n_iter))
        self.bn = d * (self.plan.n_levels + 1)

    def sample(self, key, select: str = "auto") \
            -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (points [d, n_out], labels [ndens, n_out])."""
        key = ensure_key(key)
        p = self.plan
        addop, diffop, get_mu, get_lambda = self.hooks
        pts_t, idx_t, _ = _gibbs_from_key(
            key, p.lvl_arrays, p.t_mean, p.t_bw,
            self.mask, n_out=self.n_out, bu=self.bu, bn=self.bn,
            offsets=tuple(p.offsets), n_iter=self.n_iter, ndens=p.ndens,
            ndim=p.ndim, n_levels=p.n_levels, addop=addop, diffop=diffop,
            get_mu=get_mu, get_lambda=get_lambda,
            add_entropy=self.add_entropy,
            dtype=jnp.dtype(self.dtype).name,
            select=resolve_select(select, self.n_out, p.offsets[-1][1]))
        return pts_t, idx_t
