"""Fused Pallas TPU kernels for the multiscale Gibbs product engine.

The jnp engine (ops/gibbs.py) expresses one chain step per XLA op chain: at
the bench config (2x1000 components, Niter=5) that is ~120 sequential stages
of [chains, n_l] work, and each stage pays several kernel launches, HBM
round-trips for its intermediates, and -- worst -- XLA gathers for the
selected kernels' stats.  Here every *stage* (the reference's
``makeFasterSampleIndex!`` + ``selectLabelOnLevel`` + stat gather,
src/MSGibbs01.jl:250-351) is ONE Pallas kernel:

  * candidate likelihood tensors [width, block] live and die in VMEM
    (chains ride the 128-wide lane axis; candidates ride sublanes);
  * the label CDF draw is a log-depth sublane prefix-sum (``pltpu.roll``
    doubling -- Pallas TPU has no cumsum lowering) + compare-count,
    semantically identical to the jnp path's ``_select_label``;
  * stat "gathers" are one-hot masked sublane reductions -- no XLA gather
    ops anywhere;
  * the Gaussian LOO product (``gaussianProductMeanCov!``, :176-216) is
    computed in-kernel from the [ndens*ndim, block] chain state.

Two kernel flavors per level-width bucket:
  * **cond kernel** -- draws X from the product of the current selections
    (``samplePoint!``, :440-463) and re-selects every density's label
    conditioned on X (``sampleIndices!``, :364-385); dispatched once per
    level;
  * **sweep kernel** -- one sequential-Gibbs update of a single density
    (``sampleIndex``, :404-429); dispatched ``n_iter*ndens`` times per
    level through ``lax.fori_loop``, with the density index and
    uniform-stream cursor delivered via scalar prefetch, so ONE compiled
    kernel serves every sweep of the level and Mosaic compile cost stays
    ~2 kernels per width bucket.

Level widths are padded to power-of-two buckets (padded slots replicate the
last valid node with -inf log-weight), so identically-bucketed levels and
repeated products reuse compiled kernels.

The uniform/normal streams are consumed in exactly the jnp path's (and the
serial reference's, src/MSGibbs01.jl:661-662) cursor order, so given the
same pre-generated streams this path reproduces the jnp engine's chains up
to floating-point summation order (validated in tests/test_pallas_gibbs.py).

Used automatically by ``prod_appx_ms_gibbs`` when the workload qualifies
(TPU backend, float32, Euclidean ops, widths that fit VMEM); replay mode
(injected rand streams) and manifold-hooked products stay on the jnp path,
which remains the semantic reference.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")

# Work tensors are [width, BLOCK] fp32 in VMEM (~16 MB/core); BLOCK=256
# lanes and width<=2048 keep the handful of live ones resident (width 4096
# was measured to exceed the 16M scoped-vmem limit by ~5M).
MAX_WIDTH = 2048
BLOCK = 256
MIN_WIDTH = 8


def _prefix_sum_rows(x, width: int):
    """Inclusive prefix sum along the sublane (first) axis via
    shift-doubling (no cumsum lowering in Pallas TPU)."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < width:
        x = x + jnp.where(row >= s, pltpu.roll(x, s, axis=0), 0.0)
        s *= 2
    return x


def _row_of(ref, r, w: int, ncols: int):
    """Column ``r`` (a traced scalar) of a [w, ncols] VMEM ref as a [w, 1]
    tensor.  Dynamic *lane* slicing is unsupported, so select by a masked
    lane reduction (ncols is tiny: ndens*ndim)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (w, ncols), 1)
    return jnp.sum(jnp.where(lane == r, ref[:], 0.0), axis=1, keepdims=True)


def _row_of_i(ref, r, w: int, ncols: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (w, ncols), 1)
    return jnp.sum(jnp.where(lane == r, ref[:], 0), axis=1, keepdims=True)


def _logits_for(mean_col, bw_col, logw_col, mu, cov, active, ndim, w, block):
    """Candidate log-likelihoods (reference makeFasterSampleIndex!,
    src/MSGibbs01.jl:250-328).  mean_col/bw_col: per-dim [w, 1] stat
    columns; logw_col: [w, 1]; mu/cov: per-dim [1, block] chain rows
    (``cov`` None for the conditioning variant); active: per-dim scalar
    0/1 conditions."""
    acc = jnp.zeros((w, block), jnp.float32)
    for k in range(ndim):
        c = bw_col[k] + cov[k] if cov is not None else bw_col[k]
        pd = (mean_col[k] - mu[k]) ** 2 / c + jnp.log(c)
        pd = jnp.where(jnp.isnan(pd), 0.0, pd)              # NaN suppress
        acc = acc + jnp.where(active[k], pd, 0.0)           # dim skip
    return logw_col - 0.5 * acc


def _select_and_gather(logits, logw_col, u_row, mean_col, bw_col, perm_col,
                       gather_mask, w):
    """Degenerate fallback + inverse-CDF draw (identical semantics to
    ops/gibbs.py::_select_label) + one-hot stat gather.  Returns per-dim
    [1, block] selected stats and the [1, block] permutation ids."""
    logits = jnp.where(jnp.isnan(logits), _NEG_INF, logits)
    # degenerate fallback (reference src/MSGibbs01.jl:311-315)
    neg = (logits == _NEG_INF) | (logw_col == _NEG_INF)
    dead = jnp.sum(jnp.where(neg, 0, 1), axis=0, keepdims=True) == 0
    logits = jnp.where(dead, jnp.where(logw_col == _NEG_INF, _NEG_INF, 0.0),
                       logits)
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=0, keepdims=True)
    cdf = _prefix_sum_rows(p, w)
    z = jnp.sum(jnp.where(cdf < u_row, 1, 0), axis=0, keepdims=True)
    z = jnp.clip(z, 0, w - 1)                               # [1, block]
    row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    onehot = row == z                                       # [w, block]
    zero = jnp.zeros_like(u_row)
    new_mu = [jnp.where(
        gm, jnp.sum(jnp.where(onehot, mc, 0.0), axis=0, keepdims=True), zero)
        for gm, mc in zip(gather_mask, mean_col)]
    new_var = [jnp.where(
        gm, jnp.sum(jnp.where(onehot, bc, 0.0), axis=0, keepdims=True), zero)
        for gm, bc in zip(gather_mask, bw_col)]
    perm = jnp.sum(jnp.where(onehot, perm_col, 0), axis=0, keepdims=True)
    return new_mu, new_var, perm


def _gauss_product(mu_rows, var_rows, contrib, ndens, ndim):
    """Information-form product over densities (reference
    gaussianProductMeanCov!, src/MSGibbs01.jl:176-216).

    mu_rows/var_rows: [1, block] per (j, k); contrib[j][k]: scalar 0/1
    conditions (False for LOO-skipped / partial-dim-inactive rows).
    Returns per-dim (mu, cov) [1, block] lists, zero where nothing
    contributes."""
    mu, cov = [], []
    for k in range(ndim):
        zero = jnp.zeros_like(mu_rows[0][0])
        lam_tot = zero
        lam_mu = zero
        has = False
        for j in range(ndens):
            c = contrib[j][k]
            v = var_rows[j][k]
            lam = jnp.where((v > 0.0) & c,
                            1.0 / jnp.where(v > 0.0, v, 1.0), 0.0)
            lam_tot = lam_tot + lam
            lam_mu = lam_mu + lam * mu_rows[j][k]
            has = jnp.logical_or(has, c)
        cv = jnp.where(has, 1.0 / lam_tot, 0.0)
        cov.append(cv)
        mu.append(cv * lam_mu)
    return mu, cov


def _state_rows(state_ref, ndens, ndim):
    """[dn*d, block] state ref -> per-(j,k) [1, block] rows."""
    return [[state_ref[j * ndim + k:j * ndim + k + 1, :]
             for k in range(ndim)] for j in range(ndens)]


def _cond_kernel(meta_ref, mean_ref, bw_ref, logw_ref, perm_ref,
                 mu_ref, var_ref, u_ref, n_ref,
                 mu_out, var_out, perm_out, *, ndens, ndim, w):
    """Per-level conditioning: samplePoint! + sampleIndices! for every
    density (reference src/MSGibbs01.jl:440-463,:364-385).

    meta: [u_base, n_base, mask(dn*d), union(dn*d)] int32 (SMEM).
    mean/bw: [w, dn*d]; logw/perm: [w, dn]; mu/var state: [dn*d, block];
    u: [bu, block]; n: [bn, block]."""
    dn, d = ndens, ndim
    block = mu_ref.shape[1]
    mask = [[meta_ref[2 + j * d + k] > 0 for k in range(d)]
            for j in range(dn)]
    union = [[meta_ref[2 + dn * d + j * d + k] > 0 for k in range(d)]
             for j in range(dn)]
    mu_sel = _state_rows(mu_ref, dn, d)
    var_sel = _state_rows(var_ref, dn, d)

    # X ~ product of current selections, jittered (samplePoint!)
    mu, cov = _gauss_product(mu_sel, var_sel, mask, dn, d)
    n_base = meta_ref[1]
    x = [mu[k] + jnp.sqrt(cov[k]) * n_ref[pl.ds(n_base + k, 1), :]
         for k in range(d)]

    u_base = meta_ref[0]
    for j in range(dn):
        mean_col = [mean_ref[:, j * d + k:j * d + k + 1] for k in range(d)]
        bw_col = [bw_ref[:, j * d + k:j * d + k + 1] for k in range(d)]
        logw_col = logw_ref[:, j:j + 1]
        perm_col = perm_ref[:, j:j + 1]
        active = [mask[j][k] & union[j][k] for k in range(d)]
        logits = _logits_for(mean_col, bw_col, logw_col, x, None, active,
                             d, w, block)
        new_mu, new_var, perm = _select_and_gather(
            logits, logw_col, u_ref[pl.ds(u_base + j, 1), :],
            mean_col, bw_col, perm_col, mask[j], w)
        for k in range(d):
            mu_out[j * d + k:j * d + k + 1, :] = new_mu[k]
            var_out[j * d + k:j * d + k + 1, :] = new_var[k]
        perm_out[j:j + 1, :] = perm


def _sweep_kernel(meta_ref, mean_ref, bw_ref, logw_ref, perm_ref,
                  mu_ref, var_ref, u_ref,
                  mu_out, var_out, perm_out, *, ndens, ndim, w):
    """One sequential-Gibbs update of density ``j = meta[0]`` (reference
    sampleIndex, src/MSGibbs01.jl:404-429): LOO Gaussian product of the
    other densities' selections, candidate logits with product covariance,
    CDF draw, state update.

    meta: [j, u_col, mask(dn*d), union(dn*d)] int32 (SMEM); u: [bu, block].
    The density index is runtime so one compiled kernel serves every sweep
    at this width."""
    dn, d = ndens, ndim
    block = mu_ref.shape[1]
    j = meta_ref[0]
    mask = [[meta_ref[2 + jj * d + k] > 0 for k in range(d)]
            for jj in range(dn)]
    mu_sel = _state_rows(mu_ref, dn, d)
    var_sel = _state_rows(var_ref, dn, d)

    # LOO product over the *other* densities
    contrib = [[jnp.logical_and(mask[jj][k], jj != j) for k in range(d)]
               for jj in range(dn)]
    mu, cov = _gauss_product(mu_sel, var_sel, contrib, dn, d)

    def sel_scalar(base, k):
        return sum(jnp.where(jj == j, meta_ref[base + jj * d + k], 0)
                   for jj in range(dn)) > 0
    mask_j = [sel_scalar(2, k) for k in range(d)]
    union_j = [sel_scalar(2 + dn * d, k) for k in range(d)]
    active = [mask_j[k] & union_j[k] for k in range(d)]

    mean_col = [_row_of(mean_ref, j * d + k, w, dn * d) for k in range(d)]
    bw_col = [_row_of(bw_ref, j * d + k, w, dn * d) for k in range(d)]
    logw_col = _row_of(logw_ref, j, w, dn)
    perm_col = _row_of_i(perm_ref, j, w, dn)

    logits = _logits_for(mean_col, bw_col, logw_col, mu, cov, active,
                         d, w, block)
    u_col = meta_ref[1]
    new_mu, new_var, perm = _select_and_gather(
        logits, logw_col, u_ref[pl.ds(u_col, 1), :],
        mean_col, bw_col, perm_col, mask_j, w)

    # write back: copy state, then overwrite density j's rows
    mu_out[:] = mu_ref[:]
    var_out[:] = var_ref[:]
    for k in range(d):
        mu_out[pl.ds(j * d + k, 1), :] = new_mu[k]
        var_out[pl.ds(j * d + k, 1), :] = new_var[k]
    perm_out[0:1, :] = perm


def _vm(shape, imap):
    return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)


def _common_specs(w, dnd, dn, bu):
    return [
        _vm((w, dnd), lambda i, m: (0, 0)),        # mean_l
        _vm((w, dnd), lambda i, m: (0, 0)),        # bw_l
        _vm((w, dn), lambda i, m: (0, 0)),         # logw_l
        _vm((w, dn), lambda i, m: (0, 0)),         # perm_l
        _vm((dnd, BLOCK), lambda i, m: (0, i)),    # mu state
        _vm((dnd, BLOCK), lambda i, m: (0, i)),    # var state
        _vm((bu, BLOCK), lambda i, m: (0, i)),     # uniforms
    ]


def _cond_call(meta, mean_l, bw_l, logw_l, perm_l, mu_st, var_st, u, n_,
               *, ndens, ndim, w, n_pad):
    dnd = ndens * ndim
    bu, bn = u.shape[0], n_.shape[0]
    kern = functools.partial(_cond_kernel, ndens=ndens, ndim=ndim, w=w)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // BLOCK,),
        in_specs=_common_specs(w, dnd, ndens, bu)
        + [_vm((bn, BLOCK), lambda i, m: (0, i))],
        out_specs=(
            _vm((dnd, BLOCK), lambda i, m: (0, i)),
            _vm((dnd, BLOCK), lambda i, m: (0, i)),
            _vm((ndens, BLOCK), lambda i, m: (0, i)),
        ),
    )
    return pl.pallas_call(
        kern, grid_spec=gs,
        out_shape=(jax.ShapeDtypeStruct((dnd, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((dnd, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((ndens, n_pad), jnp.int32)),
    )(meta, mean_l, bw_l, logw_l, perm_l, mu_st, var_st, u, n_)


def _sweep_call(meta, mean_l, bw_l, logw_l, perm_l, mu_st, var_st, u,
                *, ndens, ndim, w, n_pad):
    dnd = ndens * ndim
    bu = u.shape[0]
    kern = functools.partial(_sweep_kernel, ndens=ndens, ndim=ndim, w=w)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // BLOCK,),
        in_specs=_common_specs(w, dnd, ndens, bu),
        out_specs=(
            _vm((dnd, BLOCK), lambda i, m: (0, i)),
            _vm((dnd, BLOCK), lambda i, m: (0, i)),
            _vm((1, BLOCK), lambda i, m: (0, i)),
        ),
    )
    return pl.pallas_call(
        kern, grid_spec=gs,
        out_shape=(jax.ShapeDtypeStruct((dnd, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((dnd, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.int32)),
    )(meta, mean_l, bw_l, logw_l, perm_l, mu_st, var_st, u)


def pallas_supported(plan, dtype, addop, diffop, get_mu, get_lambda,
                     rand_u) -> bool:
    """The fused kernels cover the default product configuration: TPU
    backend, float32, Euclidean ops, no injected replay streams, and level
    widths whose [width, BLOCK] work tensors fit VMEM."""
    if rand_u is not None:
        return False                       # replay mode -> jnp path (exact)
    if any(op is not None for op in (addop, diffop, get_mu, get_lambda)):
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    try:
        if jax.default_backend() in ("cpu",):
            return False
    except Exception:
        return False
    return max(w for _, w in plan.pk_offsets) <= MAX_WIDTH


@functools.partial(
    jax.jit,
    static_argnames=("pk_offsets", "ndens", "ndim", "n_iter", "n_levels",
                     "add_entropy", "n_out"))
def _run_pallas(mean, bw, logw, perm, mu0, var0, u, n_, mask_i, union_i, *,
                pk_offsets, ndens, ndim, n_iter, n_levels, add_entropy,
                n_out):
    dn, d = ndens, ndim
    dnd = dn * d
    n_pad = u.shape[1]
    mask_meta = jnp.concatenate([mask_i.reshape(-1), union_i.reshape(-1)])

    mu_st, var_st = mu0, var0
    level_perms = []
    for l in range(1, n_levels + 1):
        o, w = pk_offsets[l - 1]
        mean_l = jax.lax.slice(mean, (o, 0), (o + w, dnd))
        bw_l = jax.lax.slice(bw, (o, 0), (o + w, dnd))
        logw_l = jax.lax.slice(logw, (o, 0), (o + w, dn))
        perm_l = jax.lax.slice(perm, (o, 0), (o + w, dn))
        # uniform-stream cursors (identical consumption order to the jnp
        # path and the serial reference, src/MSGibbs01.jl:661,:10-11)
        u_base = dn + (l - 1) * (1 + n_iter) * dn
        meta = jnp.concatenate([
            jnp.array([u_base, (l - 1) * d], jnp.int32), mask_meta])
        mu_st, var_st, perms = _cond_call(
            meta, mean_l, bw_l, logw_l, perm_l, mu_st, var_st, u, n_,
            ndens=dn, ndim=d, w=w, n_pad=n_pad)

        if n_iter > 0:
            gbase = u_base + dn

            def body(s, carry, gbase=gbase,
                     args=(mean_l, bw_l, logw_l, perm_l), w=w):
                mu_st, var_st, perms = carry
                j = jnp.mod(s, dn).astype(jnp.int32)
                meta = jnp.concatenate([
                    jnp.stack([j, (gbase + s).astype(jnp.int32)]),
                    mask_meta])
                mu_st, var_st, pj = _sweep_call(
                    meta, *args, mu_st, var_st, u,
                    ndens=dn, ndim=d, w=w, n_pad=n_pad)
                perms = jax.lax.dynamic_update_slice(perms, pj, (j, 0))
                return mu_st, var_st, perms

            mu_st, var_st, perms = jax.lax.fori_loop(
                0, n_iter * dn, body, (mu_st, var_st, perms))
        level_perms.append(perms)

    # final draw (reference :612-625): product of the final selections
    mu_sel = mu_st.reshape(dn, d, n_pad)
    var_sel = var_st.reshape(dn, d, n_pad)
    maskb = (mask_i > 0).reshape(dn, d, 1)
    lam = jnp.where(maskb & (var_sel > 0),
                    1.0 / jnp.where(var_sel > 0, var_sel, 1.0), 0.0)
    has = jnp.any(maskb, axis=0)
    cov = jnp.where(has, 1.0 / jnp.sum(lam, axis=0), 0.0)
    mu = cov * jnp.sum(lam * mu_sel, axis=0)                # [d, n_pad]
    if add_entropy:
        nf = jax.lax.slice(n_, (n_levels * d, 0),
                           ((n_levels + 1) * d, n_pad))
        pts = mu + jnp.sqrt(cov) * nf
    else:
        pts = mu
    labels = jnp.stack(level_perms)                         # [L, dn, n_pad]
    final_idx = level_perms[-1]                             # [dn, n_pad]
    return (pts[:, :n_out].T, final_idx[:, :n_out].T,
            jnp.transpose(labels, (2, 0, 1))[:n_out])


def run_product(plan, mask_np: np.ndarray, u, n_, *, n_iter: int,
                add_entropy: bool, n_out: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Entry point: pad + transpose the streams to the chains-on-lanes
    layout and launch the per-level fused kernels.  Returns (pts [n_out, d],
    idx [n_out, dn], labels [n_out, n_levels, dn]), matching
    ``_gibbs_all_chains``'s convention."""
    dn, d = plan.ndens, plan.ndim
    mask_i = jnp.asarray(mask_np.astype(np.int32))
    union = np.stack([np.any(np.delete(mask_np, j, axis=0), axis=0)
                      for j in range(dn)]).astype(np.int32)
    union_i = jnp.asarray(union)

    n_pad = max(BLOCK, ((n_out + BLOCK - 1) // BLOCK) * BLOCK)
    u = u.astype(jnp.float32).T
    n_ = n_.astype(jnp.float32).T
    if n_pad != u.shape[1]:
        u = jnp.pad(u, ((0, 0), (0, n_pad - u.shape[1])))
        n_ = jnp.pad(n_, ((0, 0), (0, n_pad - n_.shape[1])))

    # initial state: every chain selects the root (node 0) of every tree
    mu0 = jnp.where(mask_i.reshape(-1) > 0, plan.pk_root_mean, 0.0)
    var0 = jnp.where(mask_i.reshape(-1) > 0, plan.pk_root_bw, 0.0)
    mu0 = jnp.broadcast_to(mu0[:, None], (dn * d, n_pad)).astype(jnp.float32)
    var0 = jnp.broadcast_to(var0[:, None],
                            (dn * d, n_pad)).astype(jnp.float32)

    return _run_pallas(
        plan.pk_mean, plan.pk_bw, plan.pk_logw, plan.pk_perm,
        mu0, var0, u, n_, mask_i, union_i,
        pk_offsets=tuple(plan.pk_offsets), ndens=dn, ndim=d,
        n_iter=n_iter, n_levels=plan.n_levels, add_entropy=add_entropy,
        n_out=n_out)
