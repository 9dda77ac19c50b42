"""Device-side product-plan construction (no host tree build).

The Gibbs engine consumes a *level hierarchy*: per level, the moment-matched
(mean, variance, weight) of every cluster of a balanced median-split tree
(reference calcStatsDensity!, src/BallTreeDensity01.jl:141-187, walked by
levelDown!, src/MSGibbs01.jl:500-523).  Round 1 built that hierarchy on the
host (ops/balltree.py) -- which forces a device->host readback whenever a
*device-resident* density (e.g. the output of a previous product) enters a
new product.  On the axon runtime that readback permanently degrades
dispatch (BASELINE.md), and in a belief-propagation serving loop every
message refresh pays it.

TPU-first redesign: for a fixed N the tree's *structure* is data-independent
-- slot numbering, node slices over leaf positions, level lists and the
bottom-up merge schedule all follow the static recursion
``split = (lo + hi) // 2`` (reference src/BallTree01.jl:342-411).  Only the
leaf *permutation* and the node *stats* depend on the data.  The permutation
is computable on device as log2(N) rounds of segmented sort:

  depth k:  for every node slice, pick the most-spread coordinate (segment
            variance + argmax), then stable-sort positions by
            (slice_id, coordinate) -- ``lax.sort`` with two keys.  A full
            sort subsumes the reference's quickselect partition (identical
            slices for distinct keys).

and the stats are a bottom-up sweep of static gathers/scatters.  Everything
is one jitted program per (N-tuple, d, dtype).

Parity contract: in 1-D with distinct point values the hierarchy equals the
host tree's exactly (both reduce to sorted slices; tests/test_device_plan.py).
Two deliberate divergences:
  * **duplicate values** may bind to leaf slots in a different order than
    the host quickselect's internal tie order (stable sort vs Lomuto).
    This is distributionally invisible -- tied points have identical
    coordinates and each leaf carries its bound point's weight, so
    P(label = i) = w_i and the sampled mixture are unchanged; only which
    *equivalent* label id is reported can differ;
  * **d > 1** is a statistically equivalent median-split hierarchy, not
    bit-identical: the host's most-spread-coordinate scan inherits the
    reference's exclude-last-leaf quirk whose outcome depends on
    quickselect's internal element order, which a sort-based builder
    deliberately does not reproduce (SURVEY §7 "what NOT to copy").
Replay-mode products (``rand_u=`` injection) therefore always use the host
plan; keyed sampling uses whichever hierarchy it was built with -- both are
valid annealing schedules for the sampler.
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NO_CHILD = -1
_EPS = np.finfo(np.float64).eps


@functools.lru_cache(maxsize=128)
def _topology(n: int):
    """Static tree structure for an ``n``-point density (host, cached).

    Derived by running the reference-layout builder on already-sorted 1-D
    data (``arange``): slot allocation, node slices, depths and level lists
    depend only on ``n``, so any input yields the universal structure.
    Returns a dict of NumPy arrays.
    """
    from .balltree import build_balltree
    t = build_balltree(np.arange(max(n, 1), dtype=np.float64)[:, None],
                       np.full(max(n, 1), 1.0 / max(n, 1)),
                       backend="python")
    # sanity: sorted input => identity leaf permutation, so slices are
    # position ranges directly
    assert np.array_equal(t.permutation[n:], np.arange(n))
    internal = np.where((t.depth >= 0)
                        & (np.arange(2 * n) < max(n - 1, 1)))[0]
    max_depth = int(t.depth[internal].max()) if internal.size else 0

    per_depth = []
    for k in range(max_depth + 1):
        g = internal[t.depth[internal] == k]
        # only slices of >= 2 points need a split at this depth
        g = g[(t.highest_leaf[g] - t.lowest_leaf[g]) >= 1]
        if g.size == 0:
            per_depth.append(None)
            continue
        lo = (t.lowest_leaf[g] - n).astype(np.int32)
        hi = (t.highest_leaf[g] - n).astype(np.int32)
        # Two segment labelings over positions:
        #   sid_sort -- POSITION-MONOTONE (slice start for covered positions,
        #     own position for free ones), so the global two-key sort
        #     permutes within slices but never moves slices or free
        #     positions relative to each other;
        #   sid_sum -- dense ordinals for segment_sum.
        sid_sort = np.arange(n, dtype=np.int32)
        sid_sum = np.full(n, -1, dtype=np.int32)
        for s, (a, b) in enumerate(zip(lo, hi)):
            sid_sort[a:b + 1] = a
            sid_sum[a:b + 1] = s
        n_seg = g.size
        free = sid_sum < 0
        sid_sum[free] = n_seg + np.arange(int(free.sum()), dtype=np.int32)
        counts = np.zeros(n_seg + int(free.sum()), dtype=np.float64)
        np.add.at(counts, sid_sum, 1.0)
        per_depth.append(dict(sid_sort=sid_sort, sid_sum=sid_sum,
                              n_seg=n_seg,
                              n_total=n_seg + int(free.sum()),
                              counts=counts))

    # bottom-up merge schedule (deepest first), with right==NO_CHILD mapped
    # to the left child (single-point root case)
    merges = []
    for k in range(max_depth, -1, -1):
        g = internal[t.depth[internal] == k]
        if g.size == 0:
            continue
        li = t.left[g].astype(np.int32)
        ri = np.where(t.right[g] == NO_CHILD, t.left[g],
                      t.right[g]).astype(np.int32)
        merges.append((g.astype(np.int32), li, ri,
                       (t.left[g] == np.where(t.right[g] == NO_CHILD,
                                              t.left[g], t.right[g]))))
    return dict(n=n, max_depth=max_depth, per_depth=per_depth, merges=merges,
                tree=t)


@functools.lru_cache(maxsize=128)
def _level_nodes(n: int, n_levels: int) -> List[np.ndarray]:
    """Static per-level slot lists (levelDown! semantics incl. leaf
    self-replication): delegated to the universal topology tree's own
    ``level_lists`` so there is exactly one implementation of the
    expansion rule (ops/balltree.py:97-113)."""
    return _topology(n)["tree"].level_lists(n_levels)


@functools.lru_cache(maxsize=64)
def _stats_program(n: int, d: int, dtype_name: str):
    """Jitted device builder: (points [N,d], var [N,d], w [N]) ->
    (means [2N,d], bw [2N,d], wts [2N], perm [2N] int32)."""
    topo = _topology(n)
    max_depth = topo["max_depth"]
    per_depth = topo["per_depth"]
    merges = topo["merges"]

    def build(points, var, w):
        order = jnp.arange(n, dtype=jnp.int32)
        for k in range(max_depth + 1):
            pd = per_depth[k]
            if pd is None:
                continue
            sid_sum = jnp.asarray(pd["sid_sum"])
            sid_sort = jnp.asarray(pd["sid_sort"])
            x = points[order]                                   # [N, d]
            # segment variance per dim (unweighted, full slice)
            cnt = jnp.asarray(pd["counts"], dtype=points.dtype)[:, None]
            ssum = jax.ops.segment_sum(x, sid_sum, pd["n_total"])
            smean = ssum / cnt
            svar = jax.ops.segment_sum((x - smean[sid_sum]) ** 2, sid_sum,
                                       pd["n_total"])
            dim = jnp.argmax(svar, axis=1).astype(jnp.int32)    # [S]
            keys = jnp.take_along_axis(x, dim[sid_sum][:, None],
                                       axis=1)[:, 0]            # [N]
            # stable two-key sort: positions permute within slices only,
            # ordered by the slice's chosen coordinate (sid_sort is
            # position-monotone, so slices and free positions stay put)
            _, _, order = jax.lax.sort((sid_sort, keys, order), num_keys=2,
                                       is_stable=True)
        two_n = 2 * n
        means = jnp.zeros((two_n, d), dtype=points.dtype)
        bw = jnp.ones((two_n, d), dtype=points.dtype)
        wts = jnp.zeros((two_n,), dtype=points.dtype)
        leaf = jnp.arange(n, two_n)
        means = means.at[leaf].set(points[order])
        bw = bw.at[leaf].set(var[order])
        wts = wts.at[leaf].set(w[order])
        perm = jnp.zeros((two_n,), dtype=jnp.int32).at[leaf].set(order)
        # bottom-up moment matching (reference calcStatsDensity!,
        # src/BallTreeDensity01.jl:141-187), vectorized per depth with
        # static child index arrays
        for g, li, ri, same in merges:
            wl, wr = wts[li], wts[ri]
            tot = wl + wr + _EPS
            fl = (wl / tot)[:, None]
            fr = (wr / tot)[:, None]
            m = fl * means[li] + fr * means[ri]
            v = (fl * (bw[li] + means[li] ** 2)
                 + fr * (bw[ri] + means[ri] ** 2) - m ** 2)
            wg = jnp.where(jnp.asarray(same), wl, wl + wr)
            means = means.at[g].set(m)
            bw = bw.at[g].set(v)
            wts = wts.at[g].set(wg)
        return means, bw, wts, perm

    return jax.jit(build)


def device_tree_stats(points_nd, var, w):
    """Device-built flat tree stats for one density.

    Args: ``points_nd [N, d]``, ``var [N, d]``, ``w [N]`` (device arrays).
    Returns ``(means [2N, d], bw [2N, d], wts [2N], perm [2N])`` in the
    reference slot layout (root = 0, leaves = N..2N-1).
    """
    n, d = points_nd.shape
    prog = _stats_program(n, d, str(points_nd.dtype))
    return prog(points_nd, var, w)


@functools.lru_cache(maxsize=64)
def _plan_program(npts: Tuple[int, ...], d: int, n_levels: int,
                  dtype_name: str):
    """One fused jitted program assembling the full plan's device arrays for
    a density-count/size signature: per-density sort-based tree build +
    padding + static level gathers, all inside one dispatch."""
    dn = len(npts)
    max_n = max(npts)
    per_lists = [_level_nodes(n, n_levels) for n in npts]
    widths = [max(len(per_lists[j][l]) for j in range(dn))
              for l in range(n_levels + 1)]
    offsets: List[Tuple[int, int]] = []
    total = 0
    for l in range(1, n_levels + 1):
        offsets.append((total, widths[l]))
        total += widths[l]
    nodes_cat = np.zeros((dn, total), dtype=np.int64)
    valid_cat = np.zeros((dn, total), dtype=bool)
    for l in range(1, n_levels + 1):
        o, wdt = offsets[l - 1]
        for j in range(dn):
            lst = per_lists[j][l]
            nodes_cat[j, o:o + len(lst)] = lst
            valid_cat[j, o:o + len(lst)] = True
            # padded slots replicate the last valid node (-inf log-weight):
            # CDF-tail overflow falls to the reference's last-entry rule
            nodes_cat[j, o + len(lst):o + wdt] = lst[-1]

    stat_progs = [_stats_program(n, d, dtype_name) for n in npts]

    def assemble(*flat):
        pts_l, var_l, w_l = flat[:dn], flat[dn:2 * dn], flat[2 * dn:]
        t_mean, t_bw, t_logw, t_perm = [], [], [], []
        for j in range(dn):
            m, b, wt, pm = stat_progs[j](pts_l[j], var_l[j], w_l[j])
            pad = 2 * max_n - m.shape[0]
            t_mean.append(jnp.pad(m, ((0, pad), (0, 0))))
            t_bw.append(jnp.pad(b, ((0, pad), (0, 0)), constant_values=1.0))
            # floor at the dtype's tiny, NOT a fixed 1e-300: at float32 that
            # literal underflows to 0 and a zero-weight kernel would get
            # logw=-inf -- flipping the degenerate-fallback predicate vs the
            # host plan (which computes the log at f64, keeping it finite)
            tiny = jnp.finfo(wt.dtype).tiny
            t_logw.append(jnp.pad(jnp.log(jnp.maximum(wt, tiny)),
                                  (0, pad), constant_values=-np.inf))
            t_perm.append(jnp.pad(pm, (0, pad)))
        t_mean = jnp.stack(t_mean)                        # [dn, 2maxN, d]
        t_bw = jnp.stack(t_bw)
        t_logw = jnp.stack(t_logw)
        t_perm = jnp.stack(t_perm)
        idx_j = jnp.arange(dn)[:, None]
        nodes = jnp.asarray(nodes_cat)
        lvl_mean = t_mean[idx_j, nodes]                   # [dn, T, d]
        lvl_bw = t_bw[idx_j, nodes]
        lvl_logw = (t_logw[idx_j, nodes]
                    + jnp.where(jnp.asarray(valid_cat), 0.0, -jnp.inf))
        lvl_ms = jnp.concatenate([lvl_mean, lvl_bw], axis=-1)
        lvl_perm = t_perm[idx_j, nodes].astype(jnp.int32)
        return (t_mean, t_bw, lvl_mean, lvl_bw, lvl_logw, lvl_ms, lvl_perm)

    return jax.jit(assemble), offsets, nodes_cat.astype(np.int32)


@functools.lru_cache(maxsize=32)
def _batched_plan_program(npts: Tuple[int, ...], d: int, n_levels: int,
                          dtype_name: str):
    prog, offsets, nodes_cat = _plan_program(npts, d, n_levels, dtype_name)
    return jax.jit(jax.vmap(prog)), offsets, nodes_cat


def batched_device_plans(density_sets, n_out: int, dtype):
    """Device plan arrays for ``B`` same-shaped density sets in ONE dispatch
    (the BatchedProductSampler build/refresh path: every BP iteration swaps
    in fresh message densities, so the plan build is per-iteration work).

    Returns ``(lvl_arrays, t_mean, t_bw, offsets, n_levels)`` with a leading
    set axis on every array, matching what BatchedProductSampler stacks from
    per-set plans.
    """
    sets = [list(ds) for ds in density_sets]
    B = len(sets)
    dn = len(sets[0])
    d = sets[0][0].ndim
    npts = tuple(p.npts for p in sets[0])
    max_np = max((n_out,) + npts)
    n_levels = int(math.floor(math.log(float(max_np)) / math.log(2.0)) + 1.0)
    prog, offsets, nodes_cat = _batched_plan_program(
        npts, d, n_levels, jnp.dtype(dtype).name)
    flat = ([jnp.stack([jnp.asarray(sets[b][j].points, dtype=dtype)
                        for b in range(B)]) for j in range(dn)]
            + [jnp.stack([jnp.asarray(sets[b][j].bw, dtype=dtype)
                          for b in range(B)]) for j in range(dn)]
            + [jnp.stack([jnp.asarray(sets[b][j].weights, dtype=dtype)
                          for b in range(B)]) for j in range(dn)])
    t_mean, t_bw, lvl_mean, lvl_bw, lvl_logw, lvl_ms, lvl_perm = prog(*flat)
    lvl_nodes = jnp.broadcast_to(jnp.asarray(nodes_cat),
                                 (B,) + nodes_cat.shape)
    lvl_arrays = (lvl_nodes, lvl_mean, lvl_bw, lvl_logw, lvl_ms, lvl_perm)
    return lvl_arrays, t_mean, t_bw, list(offsets), n_levels


class DeviceProductPlan:
    """Drop-in replacement for ops.gibbs._ProductPlan whose level arrays are
    computed ON DEVICE from the densities' (points, bw, weights) -- no host
    tree, no readback, ONE dispatch per plan build.  Shares the consuming
    interface: ``lvl_arrays``, ``t_mean``/``t_bw`` (root stats),
    ``offsets``, ``n_levels``.
    """

    def __init__(self, densities: Sequence, n_out: int, dtype):
        self.ndens = len(densities)
        dims = {p.ndim for p in densities}
        if len(dims) != 1:
            raise ValueError("kdes must have same dimension "
                             "(reference src/MSGibbs01.jl:721)")
        self.ndim = dims.pop()
        npts = tuple(p.npts for p in densities)
        max_np = max((n_out,) + npts)
        self.n_levels = int(math.floor(math.log(float(max_np))
                                       / math.log(2.0)) + 1.0)
        d = self.ndim

        program, offsets, nodes_cat = _plan_program(
            npts, d, self.n_levels, jnp.dtype(dtype).name)
        self.offsets = list(offsets)
        self.lvl_nodes = jnp.asarray(nodes_cat)
        flat = ([jnp.asarray(p.points, dtype=dtype) for p in densities]
                + [jnp.asarray(p.bw, dtype=dtype) for p in densities]
                + [jnp.asarray(p.weights, dtype=dtype) for p in densities])
        (self.t_mean, self.t_bw, self.lvl_mean, self.lvl_bw, self.lvl_logw,
         self.lvl_ms, self.lvl_perm) = program(*flat)

    @property
    def lvl_arrays(self):
        return (self.lvl_nodes, self.lvl_mean, self.lvl_bw, self.lvl_logw,
                self.lvl_ms, self.lvl_perm)
