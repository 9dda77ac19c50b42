"""Flat ball-tree construction (host-side preprocessing for the TPU engine).

This module builds the same *data layout* as the reference's BallTree /
BallTreeDensity (reference: src/BallTree01.jl:10-28, src/BallTreeDensity01.jl:11-24):
a balanced binary tree over ``N`` points stored as flat arrays of length ``2N``.
Slots are **0-based** here: internal nodes occupy slots ``0..N-2`` (root = 0,
slot ``N-1`` unused for ``N >= 2``), leaves occupy slots ``N..2N-1``.  This is
exactly the layout of the original C++ toolbox that the golden fixture files in
``tests/testdata`` were dumped from, so fixture arrays compare element-for-element.

Design note (TPU-first): the tree is *not* used for pruned dual-tree recursion
on TPU -- density evaluation is a dense batched kernel (see ops/kernels.py).
The tree survives only as
  1. the multiscale level hierarchy driving the Gibbs product sampler
     (per-level cluster means/variances/weights; reference src/MSGibbs01.jl:500-523),
  2. the geometric bracket for LOOCV bandwidth search
     (``neighbor_min_max``; reference src/CrossValidation.jl:100-108), and
  3. golden-file parity with the reference's construction
     (reference test/runtests.jl:90-165).
Construction is cheap host-side preprocessing (O(N log N), done once per
density), so it runs in NumPy float64; all hot paths consume the resulting
dense per-level arrays on device.

Algorithms (re-implemented from their textbook descriptions, matching the
reference's observable behavior):
  * split dimension = coordinate of max variance over the leaf slice
    (reference src/BallTree01.jl:142-173; note the reference computes the
    mean/variance over the slice *excluding the final leaf*, with weight
    1/(high-low) -- we reproduce that quirk for bit-parity),
  * median split via quickselect (Lomuto partition, middle-element pivot;
    reference src/BallTree01.jl:223-242),
  * bottom-up node statistics: bounding-box center/half-range, summed weight
    (reference src/BallTree01.jl:282-336) and moment-matched Gaussian
    mean/variance per node (reference src/BallTreeDensity01.jl:141-187).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

NO_CHILD = -1

# Machine epsilon used in the reference's weight normalization
# (reference src/BallTreeDensity01.jl:161: `wtT = wtL + wtR + eps(Float64)`).
_EPS = np.finfo(np.float64).eps


@dataclasses.dataclass
class FlatBallTree:
    """Flat-array ball tree with Gaussian sufficient statistics per node.

    All arrays are NumPy float64 / int64 with ``2N`` slots (see module
    docstring for the slot convention).  ``centers``/``ranges`` describe the
    bounding box; ``means``/``bandwidth`` are the moment-matched Gaussian
    statistics (bandwidth = *variance*); ``bw_min``/``bw_max`` bound the
    per-kernel bandwidths below/above each node (only distinct from
    ``bandwidth`` leaves in the multi-bandwidth case).
    """

    dims: int
    num_points: int
    centers: np.ndarray      # [2N, d]
    ranges: np.ndarray       # [2N, d]
    weights: np.ndarray      # [2N]
    left: np.ndarray         # [2N] int
    right: np.ndarray        # [2N] int
    lowest_leaf: np.ndarray  # [2N] int
    highest_leaf: np.ndarray # [2N] int
    permutation: np.ndarray  # [2N] int; for leaf slot s: original index of its point
    means: np.ndarray        # [2N, d]
    bandwidth: np.ndarray    # [2N, d] (variance)
    bw_min: np.ndarray       # [2N, d] if multibandwidth else [d]
    bw_max: np.ndarray       # [2N, d] if multibandwidth else [d]
    multibandwidth: bool
    depth: np.ndarray        # [2N] int; node depth from root (root=0); -1 for unused slots

    # ---- accessors mirroring the reference API (reference src/BallTree01.jl:64-94)

    @property
    def root(self) -> int:
        return 0

    def is_leaf(self, i: int) -> bool:
        # reference src/BallTree01.jl:81 (1-based `ind >= num_points` ==
        # 0-based `ind >= num_points - 1`... the reference's test is in terms
        # of 1-based slots where leaves are N+1..2N; 0-based leaves are N..2N-1)
        return i >= self.num_points

    def n_leaves(self, i: int) -> int:
        return int(self.highest_leaf[i] - self.lowest_leaf[i] + 1)

    # ---- multiscale level schedule (consumed by the Gibbs product engine)

    def level_lists(self, n_levels: int) -> List[np.ndarray]:
        """Node sets per level, exactly as the reference's `levelDown!` produces.

        Level 0 = [root]; each descent replaces every node by its valid
        children (a leaf's left child is itself, so leaves persist;
        reference src/MSGibbs01.jl:500-523).  Returns ``n_levels + 1`` arrays
        (levels 0..n_levels).
        """
        two_n = 2 * self.num_points
        out = [np.array([self.root], dtype=np.int64)]
        cur = out[0]
        for _ in range(n_levels):
            # vectorized expansion preserving (left, right) order per node
            pairs = np.stack([self.left[cur], self.right[cur]], axis=1).ravel()
            cur = pairs[(pairs >= 0) & (pairs < two_n)]
            out.append(cur)
        return out

    def down_map(self) -> np.ndarray:
        """For each node: the child that a current label is remapped to when
        the level list descends (the *last* child appended during expansion:
        right child if valid, else left; reference src/MSGibbs01.jl:512-513).
        """
        dm = np.arange(2 * self.num_points, dtype=np.int64)
        valid_r = (self.right >= 0) & (self.right < 2 * self.num_points)
        valid_l = (self.left >= 0) & (self.left < 2 * self.num_points)
        dm = np.where(valid_l, self.left, dm)
        dm = np.where(valid_r, self.right, dm)
        return dm

    def leaf_bw_max(self) -> np.ndarray:
        """Per-dim upper bandwidth bound used in the evaluation normalizer
        (reference src/DualTree01.jl:325-330)."""
        if self.multibandwidth:
            return self.bw_max[self.num_points:].max(axis=0)
        return self.bw_max


def _most_spread_dim(pts: np.ndarray, order: np.ndarray, low: int, high: int) -> int:
    """Dimension of maximum variance over leaf positions ``low..high`` (incl).

    Reproduces the reference's indexing quirk (src/BallTree01.jl:142-173): the
    mean and sum-of-squares run over leaves ``low..high-1`` (the last leaf is
    excluded by the stride arithmetic) with weight ``1/(high-low)``.
    Ties keep the lowest dimension (strict ``>`` update from a zero max).
    """
    idx = order[low:high]  # excludes `high`, matching the reference
    if idx.size == 0:
        return 0
    w = 1.0 / (high - low)
    x = pts[idx]                       # [n-1, d]
    mean = (w * x).sum(axis=0)
    var = ((x - mean) ** 2).sum(axis=0)
    return int(np.argmax(var))         # first max == strict-> update from 0


def _select(pts: np.ndarray, order: np.ndarray, dim: int, position: int,
            low: int, high: int) -> None:
    """Partition ``order[low..high]`` so that ``order[position]`` holds the
    element of rank ``position`` along ``pts[:, dim]``, smaller elements left,
    larger right.  Classic quickselect with Lomuto partition and
    middle-element pivot -- the same textbook algorithm ("straight from CLR")
    the reference uses (src/BallTree01.jl:223-242), reproduced so that the
    exact leaf arrangement (and hence golden fixtures) match.
    """
    col = pts[:, dim]
    while low < high:
        r = (low + high) // 2
        order[r], order[low] = order[low], order[r]
        pivot = col[order[low]]
        m = low
        for i in range(low, high + 1):
            if col[order[i]] < pivot:
                m += 1
                order[m], order[i] = order[i], order[m]
        order[low], order[m] = order[m], order[low]
        if m <= position:
            low = m + 1
        if m >= position:
            high = m - 1


def build_balltree(points: np.ndarray,
                   weights: np.ndarray,
                   bandwidth: Optional[np.ndarray] = None,
                   backend: str = "auto") -> FlatBallTree:
    """Build the flat ball tree + Gaussian stats for ``points``.

    Args:
      points: ``[N, d]`` kernel centers (note: row-per-point; the user-facing
        API accepts the reference's ``[d, N]`` convention and transposes).
      weights: ``[N]`` kernel weights (normalized by the caller, as in the
        reference's kde! at src/KDE01.jl:46).
      bandwidth: kernel *variances*: ``[d]`` for a uniform bandwidth or
        ``[N, d]`` per-kernel (multi-bandwidth).  ``None`` -> zeros (plain
        ball tree without density stats).
      backend: ``auto`` (native C++ when available, else Python), ``native``
        or ``python``.  Both produce bit-identical trees
        (tests/test_native_balltree.py).

    Returns a :class:`FlatBallTree`.
    """
    pts = np.ascontiguousarray(np.asarray(points, dtype=np.float64))
    if pts.ndim != 2:
        raise ValueError("points must be [N, d]")
    N, d = pts.shape
    w = np.ascontiguousarray(np.asarray(weights, dtype=np.float64).reshape(N))

    if bandwidth is None:
        bw_leaf = np.zeros((N, d))
        multibw = False
        bw1d = np.zeros(d)
    else:
        bwa = np.asarray(bandwidth, dtype=np.float64)
        if bwa.ndim == 1:
            multibw = False
            bw1d = bwa.reshape(d).copy()
            bw_leaf = np.tile(bw1d, (N, 1))
        else:
            multibw = True
            bw1d = None
            bw_leaf = np.ascontiguousarray(bwa.reshape(N, d))

    if backend in ("auto", "native") and N > 1:
        from .. import native as _native_mod
        lib = _native_mod.get_lib()
        if lib is not None:
            return _build_native(lib, pts, w, bw_leaf, multibw, bw1d)
        if backend == "native":
            raise RuntimeError("native ball-tree library unavailable")

    two_n = 2 * N
    centers = np.zeros((two_n, d))
    ranges = np.zeros((two_n, d))
    wts = np.zeros(two_n)
    left = np.zeros(two_n, dtype=np.int64)
    right = np.zeros(two_n, dtype=np.int64)
    lowest = np.zeros(two_n, dtype=np.int64)
    highest = np.zeros(two_n, dtype=np.int64)
    perm = np.zeros(two_n, dtype=np.int64)
    means = np.zeros((two_n, d))
    bw_arr = np.zeros((two_n, d))
    depth = np.full(two_n, -1, dtype=np.int64)

    order = np.arange(N)

    # Topology via iterative DFS mirroring the reference's recursion
    # (reference src/BallTree01.jl:342-411): children slots are allocated
    # before recursing (left first), `next` starts at slot 1 (0-based).
    next_slot = 1
    # stack of (low, high, slot, depth) over leaf *positions* 0..N-1
    stack: List[Tuple[int, int, int, int]] = [(0, N - 1, 0, 0)]
    internal_nodes: List[int] = []
    while stack:
        lo, hi, slot, dep = stack.pop()
        depth[slot] = dep
        if lo == hi:
            # single-point tree (only reachable for N == 1 at the root;
            # reference src/BallTree01.jl:350-361)
            lowest[slot] = N + lo
            highest[slot] = N + hi
            left[slot] = N + lo
            right[slot] = NO_CHILD
            internal_nodes.append(slot)
            continue
        dim = _most_spread_dim(pts, order, lo, hi)
        split = (lo + hi) // 2
        _select(pts, order, dim, split, lo, hi)
        if split <= lo:
            lslot = N + lo
        else:
            lslot = next_slot
            next_slot += 1
        if split + 1 >= hi:
            rslot = N + hi
        else:
            rslot = next_slot
            next_slot += 1
        lowest[slot] = N + lo
        highest[slot] = N + hi
        left[slot] = lslot
        right[slot] = rslot
        internal_nodes.append(slot)
        # push right first so left is processed first (DFS order is irrelevant
        # to the result; slots were already allocated)
        if rslot < N:
            stack.append((split + 1, hi, rslot, dep + 1))
        else:
            depth[rslot] = dep + 1
        if lslot < N:
            stack.append((lo, split, lslot, dep + 1))
        else:
            depth[lslot] = dep + 1

    # ---- leaves (reference src/BallTree01.jl:415-429 + density overlay)
    leaf_slots = np.arange(N, two_n)
    centers[leaf_slots] = pts[order]
    means[leaf_slots] = pts[order]
    wts[leaf_slots] = w[order]
    bw_arr[leaf_slots] = bw_leaf[order]
    perm[leaf_slots] = order
    lowest[leaf_slots] = leaf_slots
    highest[leaf_slots] = leaf_slots
    left[leaf_slots] = leaf_slots
    right[leaf_slots] = NO_CHILD

    if multibw:
        bw_min = np.zeros((two_n, d))
        bw_max = np.zeros((two_n, d))
        bw_min[leaf_slots] = bw_leaf[order]
        bw_max[leaf_slots] = bw_leaf[order]
    else:
        bw_min = bw1d
        bw_max = bw1d

    # ---- bottom-up statistics, vectorized per depth level
    # (reference src/BallTree01.jl:282-336 and src/BallTreeDensity01.jl:141-187)
    internal = np.asarray(internal_nodes, dtype=np.int64)
    for dep in (range(int(depth[internal].max()), -1, -1) if internal.size else []):
        g = internal[depth[internal] == dep]
        if g.size == 0:
            continue
        li = left[g]
        ri = right[g]
        ri_eff = np.where(ri == NO_CHILD, li, ri)  # N==1 root: stats from the single child
        cl, rl = centers[li], ranges[li]
        cr, rr = centers[ri_eff], ranges[ri_eff]
        maxi = np.maximum(cl + rl, cr + rr)
        mini = np.minimum(cl - rl, cr - rr)
        half = (maxi - mini) / 2.0
        ranges[g] = half
        centers[g] = mini + half
        wl = wts[li]
        wr = wts[ri_eff]
        wts[g] = np.where(li == ri_eff, wl, wl + wr)
        wt_t = wl + wr + _EPS
        fl = (wl / wt_t)[:, None]
        fr = (wr / wt_t)[:, None]
        m = fl * means[li] + fr * means[ri_eff]
        means[g] = m
        bw_arr[g] = (fl * (bw_arr[li] + means[li] ** 2)
                     + fr * (bw_arr[ri_eff] + means[ri_eff] ** 2)
                     - m ** 2)
        if multibw:
            bw_max[g] = np.maximum(bw_max[li], bw_max[ri_eff])
            bw_min[g] = np.minimum(bw_min[li], bw_min[ri_eff])

    return FlatBallTree(
        dims=d, num_points=N,
        centers=centers, ranges=ranges, weights=wts,
        left=left, right=right, lowest_leaf=lowest, highest_leaf=highest,
        permutation=perm, means=means, bandwidth=bw_arr,
        bw_min=bw_min, bw_max=bw_max, multibandwidth=multibw, depth=depth,
    )


def _build_native(lib, pts: np.ndarray, w: np.ndarray, bw_leaf: np.ndarray,
                  multibw: bool, bw1d: Optional[np.ndarray]) -> FlatBallTree:
    """C++ builder (kde_tpu/native/balltree.cpp) -- bit-identical to the
    Python path above; ~50x faster at N=1e5."""
    import ctypes
    N, d = pts.shape
    two_n = 2 * N
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int64)
    centers = np.zeros((two_n, d))
    ranges = np.zeros((two_n, d))
    wts = np.zeros(two_n)
    left = np.zeros(two_n, dtype=np.int64)
    right = np.zeros(two_n, dtype=np.int64)
    lowest = np.zeros(two_n, dtype=np.int64)
    highest = np.zeros(two_n, dtype=np.int64)
    perm = np.zeros(two_n, dtype=np.int64)
    means = np.zeros((two_n, d))
    bw_arr = np.zeros((two_n, d))
    depth = np.zeros(two_n, dtype=np.int64)
    if multibw:
        bw_min = np.zeros((two_n, d))
        bw_max = np.zeros((two_n, d))
    else:
        bw_min = bw_max = np.zeros((1, d))   # unused by the C++ when !multibw

    c = lambda a: a.ctypes.data_as(dp)
    i = lambda a: a.ctypes.data_as(ip)
    lib.kde_build_balltree(
        c(pts), c(w), c(np.ascontiguousarray(bw_leaf)),
        ctypes.c_int64(N), ctypes.c_int64(d), ctypes.c_int(int(multibw)),
        c(centers), c(ranges), c(wts), i(left), i(right), i(lowest),
        i(highest), i(perm), c(means), c(bw_arr), c(bw_min), c(bw_max),
        i(depth))

    return FlatBallTree(
        dims=d, num_points=N,
        centers=centers, ranges=ranges, weights=wts,
        left=left, right=right, lowest_leaf=lowest, highest_leaf=highest,
        permutation=perm, means=means, bandwidth=bw_arr,
        bw_min=bw_min if multibw else bw1d,
        bw_max=bw_max if multibw else bw1d,
        multibandwidth=multibw, depth=depth)


def neighbor_min_max(tree: FlatBallTree) -> Tuple[float, float]:
    """Bracket [minm, maxm] for the LOOCV bandwidth search, derived from the
    tree geometry (reference src/CrossValidation.jl:100-108): ``maxm`` is the
    root box diagonal, ``minm`` the smallest internal-node box diagonal (a
    nearest-neighbor-distance proxy), floored at 1e-6.
    """
    N = tree.num_points
    if N < 2:
        return 1e-6, 1e-6
    # internal slots 0..N-2 (the reference's 1-based columns 1..N-1)
    rang = tree.ranges[0:N - 1]                     # [N-1, d]
    diag = np.sqrt(((2.0 * rang) ** 2).sum(axis=1))  # [N-1]
    maxm = float(diag[0])
    minm = float(max(diag.min(), 1e-6))
    return minm, maxm
