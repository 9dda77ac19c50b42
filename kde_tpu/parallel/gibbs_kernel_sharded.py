"""Kernel/component-axis sharded Gibbs products.

The Gibbs product engine's inner loop scores every candidate kernel of the
current tree level against the chain's Gaussian product and draws a label
from the resulting CDF (reference ``makeFasterSampleIndex!`` +
``selectLabelOnLevel``, src/MSGibbs01.jl:250-351).  The per-level candidate
count doubles down the tree, reaching the full component count N at the leaf
level -- so for very large densities (N ~ 10^5..10^6 components) the per-level
work and the level-stat arrays themselves outgrow one chip.  SURVEY §5 names
the TPU-native answer: shard the *kernel axis* of every density across the
mesh and reduce the label-selection CDFs with collectives.

Design (SPMD over a ``chains x kernels`` mesh, chains optional):
  * every device holds a contiguous shard of each density's per-level
    candidate stats (padded so each level's width divides the shard count;
    padded slots replicate the last valid node with -inf log-weight);
  * chain state (selected-kernel means/variances, the sampled point X) is
    replicated along ``kernels`` -- it is [ndens, d], tiny;
  * per selection, each shard computes its candidates' logits locally, then
      - global max  = ``pmax``        (exact: fp max is associative),
      - shard totals = ``all_gather`` of the local exp-sums ([S] scalars),
      - the global inverse-CDF index  = ``psum`` of local counts of
        CDF entries below the uniform draw (integer, exact),
      - the winning node's stats/label = ``psum`` of a one-hot masked
        local reduction (one nonzero term, exact);
  * the degenerate all-zero-likelihood fallback (reference :311-315) is the
    one global predicate: an integer ``psum`` of per-shard all-dead flags.

Agreement with the single-device engine: every step is arithmetically
identical except the CDF accumulation, which associates per-shard partial
sums (local cumsum + gathered shard offsets) instead of one flat cumsum.
Labels can therefore differ from the single-device engine only when a
uniform draw lands within ~1 ulp of a CDF boundary (measured: zero
disagreements across the randomized replay grid; tests/test_kernel_sharded.py
pins exact label equality, and the engineered exact-tie cases of the replay
suite are exact under any summation order).

Chains may additionally be sharded over a ``chains`` axis (the two axes
compose; chain streams are split, candidate shards are shared column-wise).
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..density import KDE
from ..ops import gibbs as _g
from ..utils.random import ensure_key
from .mesh import CHAINS, KERNELS, pad_to_multiple


class _KShardPlan:
    """Host precompute of the per-level candidate arrays in shard-major
    layout ``[ndens, S, T_loc(, d)]``: sharding axis 1 over ``kernels``
    gives every device its contiguous per-level slices at identical local
    offsets.  Mirrors ops/gibbs.py::_ProductPlan."""

    def __init__(self, densities: Sequence[KDE], n_out: int, dtype,
                 n_shards: int):
        self.n_shards = n_shards
        self.ndens = len(densities)
        dims = {d.ndim for d in densities}
        if len(dims) != 1:
            raise ValueError("kdes must have same dimension "
                             "(reference src/MSGibbs01.jl:721)")
        self.ndim = dims.pop()
        npts = [d.npts for d in densities]
        max_np = max([n_out] + npts)
        self.n_levels = int(math.floor(math.log(float(max_np))
                                       / math.log(2.0)) + 1.0)
        trees = [d.tree for d in densities]
        dn, d, S = self.ndens, self.ndim, n_shards

        per_tree_lists = [t.level_lists(self.n_levels) for t in trees]
        widths = [max(len(per_tree_lists[j][l]) for j in range(dn))
                  for l in range(self.n_levels + 1)]
        # per-level local widths (global width padded to a multiple of S)
        self.loc_offsets: List[Tuple[int, int]] = []
        t_loc = 0
        for l in range(1, self.n_levels + 1):
            w_loc = pad_to_multiple(max(widths[l], 1), S) // S
            self.loc_offsets.append((t_loc, w_loc))
            t_loc += w_loc

        mean = np.zeros((dn, S, t_loc, d))
        bw = np.ones((dn, S, t_loc, d))
        logw = np.full((dn, S, t_loc), -np.inf)
        perm = np.zeros((dn, S, t_loc), dtype=np.int32)
        for l in range(1, self.n_levels + 1):
            o, w_loc = self.loc_offsets[l - 1]
            for j in range(dn):
                t = trees[j]
                lst = list(per_tree_lists[j][l])
                nv = len(lst)
                # padded slots replicate the last valid node (-inf logw):
                # a CDF tail overflow selects the reference's fall-to-last
                full = lst + [lst[-1]] * (S * w_loc - nv)
                nodes = np.asarray(full).reshape(S, w_loc)
                mean[j, :, o:o + w_loc] = t.means[nodes]
                bw[j, :, o:o + w_loc] = t.bandwidth[nodes]
                lw = np.full(S * w_loc, -np.inf)
                lw[:nv] = np.log(np.maximum(t.weights[lst], 1e-300))
                logw[j, :, o:o + w_loc] = lw.reshape(S, w_loc)
                perm[j, :, o:o + w_loc] = t.permutation[nodes]

        as_dev = lambda x: jnp.asarray(x, dtype=dtype)
        self.lvl_mean = as_dev(mean)
        self.lvl_bw = as_dev(bw)
        self.lvl_logw = as_dev(logw)
        self.lvl_ms = jnp.concatenate([self.lvl_mean, self.lvl_bw], axis=-1)
        self.lvl_perm = jnp.asarray(perm)
        # root (node 0) stats: the chains' initial selection, replicated
        self.root_mean = as_dev(np.stack([t.means[0] for t in trees]))
        self.root_bw = as_dev(np.stack([t.bandwidth[0] for t in trees]))

    @property
    def arrays(self):
        return (self.lvl_mean, self.lvl_bw, self.lvl_logw, self.lvl_ms,
                self.lvl_perm, self.root_mean, self.root_bw)


_ks_plan_cache: dict = {}


def _get_ks_plan(densities: Sequence[KDE], n_out: int, dtype,
                 n_shards: int) -> _KShardPlan:
    import weakref
    ids = tuple(id(p) for p in densities)
    npts = tuple(p.npts for p in densities)
    max_np = max((n_out,) + npts)
    n_levels = int(math.floor(math.log(float(max_np)) / math.log(2.0)) + 1.0)
    key = (ids, npts, n_levels, str(dtype), n_shards)
    hit = _ks_plan_cache.get(key)
    if hit is not None:
        return hit
    plan = _KShardPlan(densities, n_out, dtype, n_shards)
    _ks_plan_cache[key] = plan

    def _evict(key=key):
        _ks_plan_cache.pop(key, None)
    for p in densities:
        weakref.finalize(p, _evict)
    return plan


# ---------------------------------------------------------------------------
# in-shard primitives (run under shard_map, vmapped over local chains)
# ---------------------------------------------------------------------------

def _select_sharded(u, logits, lvl_logw_j, n_shards):
    """Sharded inverse-CDF draw + degenerate fallback.  ``logits``/``lvl_logw_j``
    are this shard's [w_loc] candidates; returns the local one-hot of the
    globally selected candidate (all-False on non-owning shards).

    Mirrors ops/gibbs.py::_select_label with the cumulative sum decomposed
    into (gathered shard offsets + local cumsum); the final index is an
    integer ``psum`` of strictly-below counts (exact)."""
    w_loc = logits.shape[0]
    # global degenerate predicate: sum(exp(logits)) < 1e-99 across ALL
    # shards -- _g._dead_predicate decomposed as (pmax global max) +
    # (psum of shard exp-sums), exact up to fp summation order
    # (reference src/MSGibbs01.jl:311-315)
    m0 = lax.pmax(jnp.max(logits), KERNELS)
    ms0 = jnp.where(jnp.isneginf(m0), 0.0, m0)
    lse = ms0 + jnp.log(lax.psum(jnp.sum(jnp.exp(logits - ms0)), KERNELS))
    dead = lse < _g._LOG_DEAD
    logits = _g._apply_dead_fallback(logits, lvl_logw_j, dead)

    gmax = lax.pmax(jnp.max(logits), KERNELS)
    e = jnp.exp(logits - gmax)
    tots = lax.all_gather(jnp.sum(e), KERNELS)              # [S]
    total = jnp.sum(tots)
    sid = lax.axis_index(KERNELS)
    offset = jnp.sum(jnp.where(jnp.arange(n_shards) < sid, tots, 0.0))
    cdf = (offset + jnp.cumsum(e)) / total
    z = lax.psum(jnp.sum((cdf < u).astype(jnp.int32)), KERNELS)
    z = jnp.clip(z, 0, n_shards * w_loc - 1)
    z_loc = z - sid * w_loc
    return jnp.arange(w_loc) == z_loc                       # [w_loc] one-hot


def _run_chain_ks(u_row, n_row, lvl_arrays, loc_offsets, mask,
                  n_iter, ndens, ndim, n_levels, n_shards, add_entropy,
                  addop=None, diffop=None, get_mu=None, get_lambda=None):
    """One Gibbs chain with candidate arrays sharded over ``kernels``.
    Level/stream schedule identical to ops/gibbs.py::_run_chain (same
    consumption order -> replayable against the same injected streams).

    Manifold hooks thread through exactly as in the plain engine: they
    touch only the LOCAL per-shard arithmetic (candidate logits, the
    information-form product, the sample draw); every collective -- the
    CDF partial sums, the integer index psum, the one-hot stat reduction,
    the degenerate-predicate psum -- reduces hook-independent quantities,
    so the sharded formulation needs no manifold-aware communication
    (reference hook threading: src/MSGibbs01.jl:141-161,672-675)."""
    lvl_mean_c, lvl_bw_c, lvl_logw_c, lvl_ms_c, lvl_perm_c, \
        root_mean, root_bw = lvl_arrays

    union_other = jnp.stack([jnp.any(mask.at[j].set(False), axis=0)
                             for j in range(ndens)])
    act_all = mask & union_other

    def sample_point(mu_sel, var_sel, normals, jitter):
        mu, cov = _g._gauss_product(mu_sel, var_sel, mask, -1,
                                    get_mu, get_lambda)
        step = jnp.sqrt(cov) * normals
        if addop is None:
            x = mu + step
        else:
            x = jnp.stack([addop[k](mu[k], step[k]) for k in range(ndim)])
        return jnp.where(jitter, x, mu)

    u_cond = u_row[ndens:].reshape(n_levels, (1 + n_iter) * ndens)[:, :ndens]
    u_gibbs = (u_row[ndens:].reshape(n_levels, (1 + n_iter) * ndens)
               [:, ndens:].reshape(n_levels, n_iter, ndens))
    normals = n_row.reshape(n_levels + 1, ndim)

    mu_sel = jnp.where(mask, root_mean, 0.0)                # [dn, d]
    var_sel = jnp.where(mask, root_bw, 0.0)
    labels_rec = []

    for l in range(1, n_levels + 1):
        o, w = loc_offsets[l - 1]
        lvl_mean = lvl_mean_c[:, o:o + w]
        lvl_bw = lvl_bw_c[:, o:o + w]
        lvl_logw = lvl_logw_c[:, o:o + w]
        lvl_ms = lvl_ms_c[:, o:o + w]
        lvl_perm = lvl_perm_c[:, o:o + w]
        # (1) draw X from the product of current selections
        x = sample_point(mu_sel, var_sel, normals[l - 1], True)
        # (2,3) conditioning re-selection, batched over densities
        logits = jax.vmap(
            lambda m, b, lw, a: _g._kernel_logits_raw(m, b, lw, x, None, a,
                                                      diffop, with_cov=False)
        )(lvl_mean, lvl_bw, lvl_logw, act_all)              # [dn, w_loc]
        onehot = jax.vmap(lambda uu, lg, lw: _select_sharded(
            uu, lg, lw, n_shards))(u_cond[l - 1], logits, lvl_logw)
        sel = lax.psum(jnp.sum(jnp.where(onehot[:, :, None], lvl_ms, 0.0),
                               axis=1), KERNELS)            # [dn, 2d]
        mu_sel = jnp.where(mask, sel[:, :ndim], 0.0)
        var_sel = jnp.where(mask, sel[:, ndim:], 0.0)
        perms = lax.psum(jnp.sum(jnp.where(onehot, lvl_perm, 0), axis=1),
                         KERNELS)

        # (4) Niter sweeps of sequential LOO Gibbs over densities
        def sweep(t, carry, lvl_mean=lvl_mean, lvl_bw=lvl_bw,
                  lvl_logw=lvl_logw, lvl_ms=lvl_ms, lvl_perm=lvl_perm, l=l):
            mu_sel, var_sel, perms = carry
            for j in range(ndens):
                mu, cov = _g._gauss_product(mu_sel, var_sel, mask, j,
                                            get_mu, get_lambda)
                lg = _g._kernel_logits_raw(lvl_mean[j], lvl_bw[j],
                                           lvl_logw[j], mu, cov, act_all[j],
                                           diffop, with_cov=True)
                oh = _select_sharded(u_gibbs[l - 1, t, j], lg, lvl_logw[j],
                                     n_shards)
                sel = lax.psum(jnp.sum(jnp.where(oh[:, None], lvl_ms[j], 0.0),
                                       axis=0), KERNELS)
                mu_sel = mu_sel.at[j].set(jnp.where(mask[j], sel[:ndim], 0.0))
                var_sel = var_sel.at[j].set(
                    jnp.where(mask[j], sel[ndim:], 0.0))
                perms = perms.at[j].set(
                    lax.psum(jnp.sum(jnp.where(oh, lvl_perm[j], 0)), KERNELS))
            return mu_sel, var_sel, perms
        # unrolled (n_iter static): collectives inside lax.fori_loop would
        # pin the loop carry through cross-device dependencies anyway, and
        # the straight-line form matches ops/gibbs.py's accelerator path
        for t in range(n_iter):
            mu_sel, var_sel, perms = sweep(t, (mu_sel, var_sel, perms))
        labels_rec.append(perms)

    final_idx = labels_rec[-1]
    x = sample_point(mu_sel, var_sel, normals[n_levels], add_entropy)
    return x, final_idx, jnp.stack(labels_rec)              # [d],[dn],[L,dn]


@functools.lru_cache(maxsize=64)
def _build_ks_program(mesh: Mesh, has_chains: bool, loc_offsets, n_iter: int,
                      ndens: int, ndim: int, n_levels: int, n_shards: int,
                      add_entropy: bool, addop=None, diffop=None,
                      get_mu=None, get_lambda=None):
    chain2 = P(CHAINS, None) if has_chains else P(None, None)
    chain_l = P(CHAINS, None, None) if has_chains else P(None, None, None)

    def body(u, n_, lvl_mean, lvl_bw, lvl_logw, lvl_ms, lvl_perm,
             root_mean, root_bw, mask):
        lvl = (lvl_mean[:, 0], lvl_bw[:, 0], lvl_logw[:, 0],
               lvl_ms[:, 0], lvl_perm[:, 0], root_mean, root_bw)

        def one(u_row, n_row):
            return _run_chain_ks(u_row, n_row, lvl, loc_offsets, mask,
                                 n_iter, ndens, ndim, n_levels, n_shards,
                                 add_entropy, addop=addop, diffop=diffop,
                                 get_mu=get_mu, get_lambda=get_lambda)
        return jax.vmap(one)(u, n_)

    f = shard_map(
        body, mesh=mesh,
        in_specs=(chain2, chain2,
                  P(None, KERNELS, None, None),   # lvl_mean [dn,S,T,d]
                  P(None, KERNELS, None, None),   # lvl_bw
                  P(None, KERNELS, None),         # lvl_logw
                  P(None, KERNELS, None, None),   # lvl_ms
                  P(None, KERNELS, None),         # lvl_perm
                  P(None, None), P(None, None),   # root stats (replicated)
                  P(None, None)),                 # mask (replicated)
        out_specs=(chain2, chain2, chain_l),
        check_vma=False)
    return jax.jit(f)


def prod_appx_ms_gibbs_kernel_sharded(mesh: Mesh,
                                      n_out: int,
                                      densities: Sequence[KDE],
                                      n_iter: int = 3,
                                      add_entropy: bool = True,
                                      partial_dim_mask=None,
                                      key=None,
                                      rand_u: Optional[np.ndarray] = None,
                                      rand_n: Optional[np.ndarray] = None,
                                      record_labels: bool = False,
                                      dtype=None,
                                      addop=None,
                                      diffop=None,
                                      get_mu=None,
                                      get_lambda=None):
    """Gibbs product with every density's component axis sharded over
    ``mesh``'s ``kernels`` axis (and chains over a ``chains`` axis when the
    mesh has one).  Arguments and returns match
    :func:`kde_tpu.prod_appx_ms_gibbs`; given the same injected
    ``rand_u``/``rand_n`` streams the output replays the serial reference
    trace (tests/test_kernel_sharded.py).

    Manifold hooks: pass ``addop``/``diffop``/``get_mu``/``get_lambda``
    explicitly (mirroring :func:`prod_appx_ms_gibbs`); when none are
    given, hooks attached to the densities are collected with the same
    consistency rule as ``product()`` (identical quadruple across
    densities, no silent-Euclidean fallback).  The hooks only enter the
    local per-shard arithmetic -- the collectives reduce hook-independent
    scalars/one-hots -- so on-manifold products shard exactly like
    Euclidean ones (tests/test_kernel_sharded.py circular rows).

    Use when per-density component counts outgrow one chip's HBM -- the
    per-level candidate arrays AND the per-chain level work are both split
    ``n_shards`` ways (SURVEY §5's "sharding the kernel axis of each density
    with psum-reduced likelihood CDFs").
    """
    if KERNELS not in mesh.axis_names:
        raise ValueError(f"mesh must have a '{KERNELS}' axis; "
                         f"got {mesh.axis_names}")
    n_shards = mesh.shape[KERNELS]
    has_chains = CHAINS in mesh.axis_names
    densities = list(densities)
    if dtype is None:
        dtype = densities[0].dtype      # property: no lazy device upload
    if all(h is None for h in (addop, diffop, get_mu, get_lambda)):
        addop, diffop, get_mu, get_lambda = _g._density_hooks(densities)
    d_hooks = _g.normalize_hooks(addop, diffop, get_mu, get_lambda,
                                 densities[0].ndim)
    addop, diffop, get_mu, get_lambda = d_hooks
    plan = _get_ks_plan(densities, n_out, dtype, n_shards)
    dn, d, n_levels = plan.ndens, plan.ndim, plan.n_levels

    if partial_dim_mask is None:
        mask = jnp.ones((dn, d), dtype=bool)
    else:
        mask = jnp.asarray(np.asarray(partial_dim_mask, bool).reshape(dn, d))

    n_pad = (pad_to_multiple(n_out, mesh.shape[CHAINS]) if has_chains
             else n_out)
    bu = dn * (1 + n_levels * (1 + n_iter))
    bn = d * (n_levels + 1)
    if rand_u is not None:
        u = np.full((n_pad, bu), 0.5)
        n_np = np.zeros((n_pad, bn))
        u[:n_out] = (np.asarray(rand_u, dtype=np.float64)
                     .ravel()[:n_out * bu].reshape(n_out, bu))
        n_np[:n_out] = (np.asarray(rand_n, dtype=np.float64)
                        .ravel()[:n_out * bn].reshape(n_out, bn))
        u = jnp.asarray(u, dtype=dtype)
        n_ = jnp.asarray(n_np, dtype=dtype)
    else:
        key = ensure_key(key)
        ku, kn = jax.random.split(key)
        u = jax.random.uniform(ku, (n_pad, bu), dtype=dtype)
        n_ = jax.random.normal(kn, (n_pad, bn), dtype=dtype)

    chain_sh = NamedSharding(mesh, P(CHAINS) if has_chains else P())
    kern4 = NamedSharding(mesh, P(None, KERNELS, None, None))
    kern3 = NamedSharding(mesh, P(None, KERNELS, None))
    repl = NamedSharding(mesh, P())
    u = jax.device_put(u, chain_sh)
    n_ = jax.device_put(n_, chain_sh)
    lvl_mean, lvl_bw, lvl_logw, lvl_ms, lvl_perm, root_mean, root_bw = \
        plan.arrays
    args = (jax.device_put(lvl_mean, kern4), jax.device_put(lvl_bw, kern4),
            jax.device_put(lvl_logw, kern3), jax.device_put(lvl_ms, kern4),
            jax.device_put(lvl_perm, kern3), jax.device_put(root_mean, repl),
            jax.device_put(root_bw, repl), jax.device_put(mask, repl))

    program = _build_ks_program(mesh, has_chains, tuple(plan.loc_offsets),
                                n_iter, dn, d, n_levels, n_shards,
                                add_entropy, addop=addop, diffop=diffop,
                                get_mu=get_mu, get_lambda=get_lambda)
    pts, idx, labels = program(u, n_, *args)
    out = (pts[:n_out].T, idx[:n_out].T)
    if record_labels:
        out = out + (jnp.transpose(labels[:n_out], (0, 2, 1)),)
    return out
