"""Serial CPU implementation of the multiscale Gibbs product sampler.

This is a direct, *serial* NumPy realization of the algorithm the reference
implements (Ihler/Sudderth/Freeman/Willsky NIPS-2003; reference
src/MSGibbs01.jl:527-629), written in linear probability space with the same
random-stream cursor discipline (one uniform per label selection, one normal
per sampled dimension, consumed in the reference's order).

It exists for two reasons:
  1. **Baseline measurement** (BASELINE.md): the reference publishes no
     numbers and Julia is not available in this image, so the serial
     samples/s of this implementation -- one chain at a time, just like the
     reference's `for s in 1:Np` loop (src/MSGibbs01.jl:581) -- is the
     honest CPU baseline the TPU engine is compared against.
  2. **Trace-parity testing**: fed the same injected randU/randN streams, the
     vectorized TPU engine (ops/gibbs.py) must reproduce this implementation
     label-for-label and point-for-point (tests/test_replay_parity.py),
     which pins the TPU engine's semantics to the serial algorithm far more
     tightly than moment tests can.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .ops.balltree import FlatBallTree


def _select_from_cdf(p: np.ndarray, u: float) -> int:
    """First index whose running CDF reaches ``u`` (reference
    selectLabelOnLevel, src/MSGibbs01.jl:330-351)."""
    c = 0.0
    for z in range(len(p) - 1):
        c += p[z]
        if u <= c:
            return z
    return len(p) - 1


def serial_gibbs_product(trees: Sequence[FlatBallTree],
                         n_out: int,
                         n_iter: int,
                         rand_u: np.ndarray,
                         rand_n: np.ndarray,
                         add_entropy: bool = True,
                         partial_dim_mask: Optional[np.ndarray] = None,
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Serial multiscale Gibbs sampling from the product of ``trees``.

    Returns (points [d, n_out], indices [ndens, n_out] 0-based original
    labels, labels [n_out, ndens, n_levels]).
    """
    dn = len(trees)
    d = trees[0].dims
    max_np = max([n_out] + [t.num_points for t in trees])
    n_levels = int(math.floor(math.log(float(max_np)) / math.log(2.0) + 1.0))
    mask = (np.ones((dn, d), dtype=bool) if partial_dim_mask is None
            else np.asarray(partial_dim_mask, dtype=bool).reshape(dn, d))
    union_other = np.stack([
        np.any(np.delete(mask, j, axis=0), axis=0) for j in range(dn)])

    ru = np.asarray(rand_u, dtype=np.float64).ravel()
    rn = np.asarray(rand_n, dtype=np.float64).ravel()
    ruptr = 0
    rnptr = 0

    pts = np.zeros((d, n_out))
    out_idx = np.zeros((dn, n_out), dtype=np.int64)
    labels = np.zeros((n_out, dn, n_levels), dtype=np.int64)

    def node_stats(j, node):
        mu = np.where(mask[j], trees[j].means[node], 0.0)
        var = np.where(mask[j], trees[j].bandwidth[node], 0.0)
        return mu, var

    def gauss_product(mu_sel, var_sel, skip):
        mu = np.zeros(d)
        cov = np.zeros(d)
        for k in range(d):
            lam_tot = 0.0
            lam_mu = 0.0
            has = False
            for j in range(dn):
                if j == skip or not mask[j, k]:
                    continue
                has = True
                lam = 1.0 / var_sel[j, k] if var_sel[j, k] > 0 else 0.0
                lam_tot += lam
                lam_mu += lam * mu_sel[j, k]
            if has and lam_tot > 0:
                cov[k] = 1.0 / lam_tot
                mu[k] = cov[k] * lam_mu
        return mu, cov

    def kernel_probs(j, nodes, mu, cov, with_cov):
        """reference makeFasterSampleIndex! (src/MSGibbs01.jl:250-328),
        linear space with NaN suppression and degenerate fallback."""
        p = np.zeros(len(nodes))
        for z, node in enumerate(nodes):
            acc = 0.0
            for k in range(d):
                if not (mask[j, k] and union_other[j, k]):
                    continue
                c = trees[j].bandwidth[node, k]
                if with_cov:
                    c = c + cov[k]
                dm = trees[j].means[node, k] - mu[k]
                v = dm * dm / c
                if not np.isnan(v):
                    acc += v + np.log(c)
            val = np.exp(-0.5 * acc) * trees[j].weights[node]
            p[z] = 0.0 if np.isnan(val) else val
        tot = p.sum()
        if tot < 1e-99:
            # reference :311-315 assigns every candidate the LAST node's
            # weight -- a constant, i.e. the uniform distribution after
            # normalization (1.0 here).  (When that last weight is 0 the
            # reference's CDF degenerates to all-zeros -- a quirk not
            # replicated; the engines treat the fallback as uniform over
            # real candidates always.)
            p[:] = 1.0
            tot = p.sum()
        return p / tot

    for s in range(n_out):
        level_list: List[List[int]] = [[t.root] for t in trees]
        ind = np.zeros(dn, dtype=np.int64)  # noqa: E306 (chain-local state)
        # initIndices: draw from node weights at level 0 (root only)
        for j in range(dn):
            w = np.array([trees[j].weights[n] for n in level_list[j]])
            ind[j] = level_list[j][_select_from_cdf(w / w.sum(), ru[ruptr])]
            ruptr += 1
        mu_sel = np.zeros((dn, d))
        var_sel = np.zeros((dn, d))
        for j in range(dn):
            mu_sel[j], var_sel[j] = node_stats(j, ind[j])

        def sample_point(jitter):
            nonlocal rnptr
            mu, cov = gauss_product(mu_sel, var_sel, -1)
            x = np.zeros(d)
            for k in range(d):
                x[k] = mu[k] + (np.sqrt(cov[k]) * rn[rnptr] if jitter else 0.0)
                rnptr += 1
            return x

        for l in range(1, n_levels + 1):
            x = sample_point(True)
            # levelDown! (reference src/MSGibbs01.jl:500-523)
            for j in range(dn):
                new_list: List[int] = []
                t = trees[j]
                for node in level_list[j]:
                    for ch in (t.left[node], t.right[node]):
                        if 0 <= ch < 2 * t.num_points:
                            new_list.append(int(ch))
                    if ind[j] == node:
                        ind[j] = new_list[-1]
                level_list[j] = new_list
            # sampleIndices!: condition on x, no product covariance
            for j in range(dn):
                p = kernel_probs(j, level_list[j], x, None, False)
                ind[j] = level_list[j][_select_from_cdf(p, ru[ruptr])]
                ruptr += 1
            for j in range(dn):
                mu_sel[j], var_sel[j] = node_stats(j, ind[j])
            # Niter sweeps of sequential LOO Gibbs
            for _ in range(n_iter):
                for j in range(dn):
                    mu, cov = gauss_product(mu_sel, var_sel, j)
                    p = kernel_probs(j, level_list[j], mu, cov, True)
                    ind[j] = level_list[j][_select_from_cdf(p, ru[ruptr])]
                    ruptr += 1
                    mu_sel[j], var_sel[j] = node_stats(j, ind[j])
            for j in range(dn):
                labels[s, j, l - 1] = trees[j].permutation[ind[j]]

        for j in range(dn):
            out_idx[j, s] = trees[j].permutation[ind[j]]
        pts[:, s] = sample_point(add_entropy)

    return pts, out_idx, labels


def serial_gibbs_product_fast(trees: Sequence[FlatBallTree],
                              n_out: int,
                              n_iter: int,
                              rng: np.random.Generator,
                              add_entropy: bool = True,
                              partial_dim_mask: Optional[np.ndarray] = None,
                              ) -> Tuple[np.ndarray, np.ndarray]:
    """Chain-serial baseline with NumPy-vectorized per-level inner loops.

    Same algorithm and chain-at-a-time schedule as
    :func:`serial_gibbs_product` (one output sample after another, like the
    reference's ``for s in 1:Np``, src/MSGibbs01.jl:581), but the per-level
    kernel-likelihood and CDF operations are NumPy-vectorized over the level's
    nodes -- approximating what the compiled serial Julia loops achieve on
    CPU.  This is the measured baseline recorded in BASELINE.md (Julia is not
    available in this environment).
    """
    dn = len(trees)
    d = trees[0].dims
    max_np = max([n_out] + [t.num_points for t in trees])
    n_levels = int(math.floor(math.log(float(max_np)) / math.log(2.0) + 1.0))
    mask = (np.ones((dn, d), dtype=bool) if partial_dim_mask is None
            else np.asarray(partial_dim_mask, dtype=bool).reshape(dn, d))
    union_other = np.stack([
        np.any(np.delete(mask, j, axis=0), axis=0) for j in range(dn)])
    act = mask & union_other                          # [dn, d] logit dims

    # precompute per-level node stats (host, once -- the reference's trees
    # play the same role)
    lvl_nodes = []
    for j, t in enumerate(trees):
        lvl_nodes.append(t.level_lists(n_levels))
    downs = [t.down_map() for t in trees]

    pts = np.zeros((d, n_out))
    out_idx = np.zeros((dn, n_out), dtype=np.int64)

    for s in range(n_out):
        ind = np.array([t.root for t in trees])
        mu_sel = np.stack([trees[j].means[ind[j]] for j in range(dn)])
        var_sel = np.stack([trees[j].bandwidth[ind[j]] for j in range(dn)])
        if partial_dim_mask is not None:
            mu_sel = np.where(mask, mu_sel, 0.0)
            var_sel = np.where(mask, var_sel, 0.0)

        full = partial_dim_mask is None     # fast path: no masking arithmetic

        def gauss_product(skip):
            if full:
                lam = 1.0 / var_sel                   # [dn, d]
            else:
                lam = np.where(mask & (var_sel > 0), 1.0 / np.where(
                    var_sel > 0, var_sel, 1.0), 0.0)
            mus = mu_sel
            if skip >= 0:
                lam = np.delete(lam, skip, axis=0)
                mus = np.delete(mus, skip, axis=0)
            lam_tot = lam.sum(axis=0)
            if full:
                cov = 1.0 / lam_tot
            else:
                cov = np.where(lam_tot > 0, 1.0 / np.where(
                    lam_tot > 0, lam_tot, 1.0), 0.0)
            return cov * (lam * mus).sum(axis=0), cov

        def select(j, center, extra_cov, u):
            nodes = lvl_nodes[j][l]
            m = trees[j].means[nodes]                 # [n_l, d]
            b = trees[j].bandwidth[nodes]
            if extra_cov is not None:
                b = b + extra_cov[None, :]
            w = trees[j].weights[nodes]
            dlt = m - center[None, :]
            per = (dlt * dlt / b) + np.log(b)
            if not full:
                per = np.where(act[j][None, :], per, 0.0)
            p = np.exp(-0.5 * per.sum(axis=1)) * w
            tot = p.sum()
            if tot < 1e-99:
                p[:] = 1.0
                tot = p.size
            cdf = np.cumsum(p / tot)
            z = min(np.searchsorted(cdf, u), p.size - 1)
            ind[j] = nodes[z]
            if full:
                mu_sel[j] = trees[j].means[ind[j]]
                var_sel[j] = trees[j].bandwidth[ind[j]]
            else:
                mu_sel[j] = np.where(mask[j], trees[j].means[ind[j]], 0.0)
                var_sel[j] = np.where(mask[j], trees[j].bandwidth[ind[j]], 0.0)

        for l in range(1, n_levels + 1):
            mu, cov = gauss_product(-1)
            x = mu + np.sqrt(cov) * rng.standard_normal(d)
            ind = np.array([downs[j][ind[j]] for j in range(dn)])
            for j in range(dn):
                select(j, x, None, rng.uniform())
            for _ in range(n_iter):
                for j in range(dn):
                    mu, cov = gauss_product(j)
                    select(j, mu, cov, rng.uniform())

        for j in range(dn):
            out_idx[j, s] = trees[j].permutation[ind[j]]
        mu, cov = gauss_product(-1)
        pts[:, s] = mu + (np.sqrt(cov) * rng.standard_normal(d)
                          if add_entropy else 0.0)

    return pts, out_idx
