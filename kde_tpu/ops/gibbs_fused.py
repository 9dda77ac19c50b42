"""Fused upper-level Gibbs stages: ONE Pallas kernel for the narrow levels.

Why this exists (BASELINE.md "Roofline"): the level-synchronous Gibbs
program (ops/gibbs.py) is a sequential chain of ~120 small stages; the upper
tree levels are only 2..128 candidates wide ([chains, <=128] -- tens of KB),
so each of their ~77 label selections is pure launch/fusion latency, not
bandwidth.  The measured result is ~12% of the HBM-attainable single-product
time.  This kernel runs ALL upper-level selections (every level whose padded
candidate width fits ``W``) inside one Pallas program, holding the chain
state -- selected kernel means/variances and labels -- in VMEM/registers
across levels, then hands the state to the unchanged XLA program for the
wide leaf levels (which are genuinely bandwidth-bound and where a VMEM
engine measurably loses, BASELINE.md "Engine comparison").

This is NOT the round-2 per-level Pallas engine (deleted): that one paid a
kernel launch per stage (~110/call) and lost 7x.  Here the whole upper
schedule is a single launch with a ``fori_loop`` over levels (compile cost
stays level-count-independent, per the superlinear-unroll pitfall).

Algorithm parity: the arithmetic mirrors ops/gibbs.py step for step --
``sample_point`` (reference src/MSGibbs01.jl:440-463), conditional
re-selection (:364-385), Niter LOO Gibbs sweeps (:404-429) with the
information-form Gaussian product (:176-216), NaN suppression (:302-304),
degenerate fallback (:311-315), partial-dim zeroing (:189-209), and the
normalize-then-cumsum CDF draw (:318-351).  Streams are consumed in the
same per-chain order, so the fused engine is distribution-identical and
(up to float associativity) sample-identical to the jnp engine.  Replay
mode never routes here (trace-exactness stays pinned to the jnp engine).

Euclidean-only by design: manifold-hook products keep the jnp path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# log(1e-99): the reference's degenerate-likelihood threshold -- the SAME
# expression as ops/gibbs.py::_LOG_DEAD (bit-identity invariant)
LOG_DEAD = float(np.log(1e-99))

# Padded candidate width of the fused region.  128 = one VPU lane row; the
# levels it covers (width 2..128) are exactly the latency-bound ones.  Wider
# levels lose in VMEM (measured round 2) and stay in the XLA program.
FUSED_WIDTH = 128

# Chain-block size (grid steps over blocks of chains).
CHAIN_BLOCK = 256


def fused_level_count(offsets, n_levels: int, width: int = FUSED_WIDTH) -> int:
    """Number of leading levels whose candidate width fits ``width``."""
    k = 0
    for (_, w) in offsets:
        if w <= width:
            k += 1
        else:
            break
    return min(k, n_levels)


# Set by ops/gibbs.py::_run_with_fused_fallback when a real product program
# fails to lower/compile with the fused region but succeeds without it:
# the ``auto`` gate then keeps every later call on the pure-XLA engine.
# (Fallback-at-the-call-site, not a probe program: it covers the exact
# (K, W, dn, d, n_iter, chain-block, vmapped-or-not) specialization being
# compiled, runs nothing extra on the device, and never fetches -- a probe
# would either miss real specializations or pay a device->host readback,
# the documented D2H dispatch cliff.)
_FUSED_BROKEN: bool = False


def _lane_prefix_sum(p, *, interpret: bool):
    """Row-wise prefix sum over the lane axis of ``p [C, W]``.

    Mosaic (Pallas TPU) has no lowering for the ``cumsum`` primitive
    (NotImplementedError observed 2026-08-18 on jaxlib 0.5-era Mosaic), so
    the TPU path runs a log2(W) Hillis-Steele scan of shifted adds --
    static-shape concatenate + add, both lowerable.  Interpret mode keeps
    ``jnp.cumsum`` so the CPU bit-identity suite (tests/test_gibbs_fused.py)
    compares the fused engine against the chain program's exact arithmetic
    (ops/gibbs.py::_select_label); on real TPU the two engines differ only
    in scan associativity, the same order-of-summation freedom XLA's own
    cumsum lowering exercises (both remain exact inverse-CDF draws of the
    same normalized distribution -- reference src/MSGibbs01.jl:318-326).
    The scan is validated against cumsum directly in
    tests/test_gibbs_fused.py::test_lane_prefix_sum."""
    if interpret:
        return jnp.cumsum(p, axis=1)
    C, W = p.shape
    acc = p
    s = 1
    while s < W:
        acc = acc + jnp.concatenate(
            [jnp.zeros((C, s), p.dtype), acc[:, :W - s]], axis=1)
        s *= 2
    return acc


def _kernel(act_ref, has_ref, maskv_ref,            # SMEM scalars
            contrib_ref, init_ref,                  # VMEM small
            ms_ref, logw_ref, perm_ref,             # VMEM [K, ...]
            u_ref, nrm_ref,                         # VMEM streams [K, C, .]
            mu_out, var_out, lbl_out,               # outputs
            *, K, W, dn, d, n_iter, interpret):
    f = init_ref.dtype
    C = mu_out.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, f)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (C, dn), 1)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)

    def gauss(mu_sel, var_sel, skip):
        """Information-form product of selected kernels, leaving out density
        ``skip`` (``skip == dn`` means none).  Returns per-dim ([C,1], [C,1])
        lists.  Mirrors ops/gibbs.py::_gauss_product (Euclidean path)."""
        mus, covs = [], []
        for k in range(d):
            crow = contrib_ref[skip:skip + 1, k * dn:(k + 1) * dn]    # [1,dn]
            lam = jnp.where(var_sel[k] > 0, crow / var_sel[k], 0.0)  # [C,dn]
            lam_tot = jnp.sum(lam, axis=1, keepdims=True)            # [C,1]
            hask = has_ref[skip, k] > 0                              # scalar
            cov_k = jnp.where(hask,
                              1.0 / jnp.where(hask, lam_tot, 1.0), 0.0)
            mu_k = cov_k * jnp.sum(lam * mu_sel[k], axis=1, keepdims=True)
            mus.append(mu_k)
            covs.append(cov_k)
        return mus, covs

    def select(ms_l, logw_l, perm_l, j, u_col, xs, covs):
        """One label selection for density ``j``: candidate logits + CDF draw
        + one-hot stat/label gather.  ``covs`` None = conditional stage."""
        logw_row = logw_l[j:j + 1, :]                                # [1,W]
        acc = jnp.zeros((C, W), f)
        for k in range(d):
            r = j * 2 * d + k
            mean_row = ms_l[r:r + 1, :]                              # [1,W]
            bw_row = ms_l[r + d:r + d + 1, :]
            c = bw_row + covs[k] if covs is not None else bw_row
            delta = mean_row - xs[k]                                 # [C,W]
            pd = delta * delta / c + jnp.log(c)
            a_ok = act_ref[j, k] > 0
            pd = jnp.where(jnp.isnan(pd) | (~a_ok), 0.0, pd)
            acc = acc + pd
        logits = logw_row - 0.5 * acc
        logits = jnp.where(jnp.isnan(logits), neg_inf, logits)
        # degenerate predicate: sum(exp(logits)) < 1e-99, computed as a
        # safe-shifted row logsumexp -- EXACTLY the chain program's
        # _dead_predicate (ops/gibbs.py; reference src/MSGibbs01.jl:311)
        m0 = jnp.max(logits, axis=1, keepdims=True)                  # [C,1]
        ms0 = jnp.where(m0 == neg_inf, 0.0, m0)
        lse = ms0 + jnp.log(jnp.sum(jnp.exp(logits - ms0), axis=1,
                                    keepdims=True))
        dead = lse < jnp.asarray(LOG_DEAD, f)
        dead_w = logw_row == neg_inf                # lane PADDING only [1,W]
        logits = jnp.where(dead, jnp.where(dead_w, neg_inf, 0.0), logits)
        # normalize-then-cumsum, count-below draw (gibbs.py::_select_label)
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        cdf = _lane_prefix_sum(e / jnp.sum(e, axis=1, keepdims=True),
                               interpret=interpret)
        z = jnp.sum((cdf < u_col).astype(jnp.int32), axis=1, keepdims=True,
                    dtype=jnp.int32)
        z = jnp.clip(z, 0, W - 1)
        onehot = lane_w == z                                         # [C,W]
        new_mu, new_var = [], []
        for k in range(d):
            m_ok = maskv_ref[j, k] > 0
            r = j * 2 * d + k
            sm = jnp.sum(jnp.where(onehot, ms_l[r:r + 1, :], 0.0),
                         axis=1, keepdims=True)
            sv = jnp.sum(jnp.where(onehot, ms_l[r + d:r + d + 1, :], 0.0),
                         axis=1, keepdims=True)
            new_mu.append(jnp.where(m_ok, sm, 0.0))
            new_var.append(jnp.where(m_ok, sv, 0.0))
        new_perm = jnp.sum(jnp.where(onehot, perm_l[j:j + 1, :], 0),
                           axis=1, keepdims=True, dtype=jnp.int32)   # [C,1] i32
        return new_mu, new_var, new_perm

    def update(state, j, new_mu, new_var, new_perm):
        mu_sel, var_sel, lbl = state
        upd = col_iota == j                                          # [C,dn]
        mu_sel = tuple(jnp.where(upd, new_mu[k], mu_sel[k])
                       for k in range(d))
        var_sel = tuple(jnp.where(upd, new_var[k], var_sel[k])
                        for k in range(d))
        lbl = jnp.where(upd, new_perm, lbl)
        return mu_sel, var_sel, lbl

    def level_body(li, carry):
        mu_sel, var_sel, lbl = carry
        ms_l = ms_ref[li]                                            # [R,W]
        logw_l = logw_ref[li]                                        # [dn,W]
        perm_l = perm_ref[li]                                        # [dn,W]
        u_l = u_ref[li]                                              # [C,S]
        nrm_l = nrm_ref[li]                                          # [C,d]

        # (1) draw X from the product of current selections (jitter on)
        mus, covs = gauss(mu_sel, var_sel, dn)
        xs = [mus[k] + jnp.sqrt(covs[k]) * nrm_l[:, k:k + 1]
              for k in range(d)]
        # (2) conditional re-selection per density (no LOO, no cov)
        for j in range(dn):
            nm, nv, npm = select(ms_l, logw_l, perm_l, j,
                                 u_l[:, j:j + 1], xs, None)
            mu_sel, var_sel, lbl = update((mu_sel, var_sel, lbl),
                                          j, nm, nv, npm)
        # (3) Niter sweeps of sequential LOO Gibbs
        for t in range(n_iter):
            for j in range(dn):
                mus, covs = gauss(mu_sel, var_sel, j)
                u_col = u_l[:, dn + t * dn + j:dn + t * dn + j + 1]
                nm, nv, npm = select(ms_l, logw_l, perm_l, j,
                                     u_col, mus, covs)
                mu_sel, var_sel, lbl = update((mu_sel, var_sel, lbl),
                                              j, nm, nv, npm)
        lbl_out[li] = lbl
        return mu_sel, var_sel, lbl

    zero = jnp.zeros((C, dn), f)
    mu0 = tuple(zero + init_ref[0:1, k * dn:(k + 1) * dn] for k in range(d))
    var0 = tuple(zero + init_ref[1:2, k * dn:(k + 1) * dn] for k in range(d))
    lbl0 = jnp.zeros((C, dn), jnp.int32)
    mu_sel, var_sel, _ = jax.lax.fori_loop(0, K, level_body,
                                           (mu0, var0, lbl0))
    for k in range(d):
        mu_out[:, k * dn:(k + 1) * dn] = mu_sel[k]
        var_out[:, k * dn:(k + 1) * dn] = var_sel[k]


def build_fused_inputs(lvl_ms, lvl_logw, lvl_perm, offsets, K: int, dn: int,
                       d: int, W: int = FUSED_WIDTH):
    """Repack the plan's concatenated level arrays into the kernel layout
    (in-trace; ~100 KB of copies, fused by XLA into the surrounding program).

    Returns (ms [K, dn*2d, W], logw [K, dn, W], perm [K, dn, W]).  Padding:
    log-weight -inf (a padded candidate's CDF mass is zero, and the dead
    fallback sees it as invalid); ms/perm replicate the last valid column so
    a floating-point CDF tail that overflows into the padding still selects
    the last valid node's stats -- the same fall-to-last-entry rule as the
    in-level padding (ops/gibbs.py::_ProductPlan) and the reference's
    selectLabelOnLevel (src/MSGibbs01.jl:330-351).
    """
    f = lvl_ms.dtype
    ms_levels, logw_levels, perm_levels = [], [], []
    for l in range(K):
        o, w = offsets[l]
        ms = lvl_ms[:, o:o + w]                      # [dn, w, 2d]
        ms = jnp.transpose(ms, (0, 2, 1)).reshape(dn * 2 * d, w)
        ms_levels.append(jnp.pad(ms, ((0, 0), (0, W - w)), mode="edge"))
        lw = lvl_logw[:, o:o + w]                    # [dn, w]
        logw_levels.append(jnp.pad(lw, ((0, 0), (0, W - w)),
                                   constant_values=-jnp.inf))
        pm = lvl_perm[:, o:o + w]
        perm_levels.append(jnp.pad(pm, ((0, 0), (0, W - w)), mode="edge"))
    return (jnp.stack(ms_levels).astype(f), jnp.stack(logw_levels).astype(f),
            jnp.stack(perm_levels))


def fused_upper_levels(u_k, nrm_k, ms, logw, perm, mask, t_mean, t_bw,
                       *, K: int, dn: int, d: int, n_iter: int,
                       W: int = FUSED_WIDTH, interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run levels 1..K for every chain in one Pallas launch.

    Args:
      u_k:   [n, K*S] uniforms, S = (1+n_iter)*dn, per-level blocks of
             [dn conditional] ++ [n_iter*dn gibbs] (the chain-stream layout
             of ops/gibbs.py minus the unused init block).
      nrm_k: [n, K*d] normals (level draws 1..K).
      ms/logw/perm: from :func:`build_fused_inputs`.
      mask:  [dn, d] bool partial-dim mask.
      t_mean/t_bw: [dn, 2N, d] root-stat arrays (slot 0 = root).

    Returns (mu_sel [n, dn, d], var_sel [n, dn, d], labels [n, K, dn]).
    """
    f = ms.dtype
    n = u_k.shape[0]
    S = (1 + n_iter) * dn
    C = min(CHAIN_BLOCK, max(8, n))
    n_pad = -(-n // C) * C
    if n_pad != n:
        u_k = jnp.pad(u_k, ((0, n_pad - n), (0, 0)))
        nrm_k = jnp.pad(nrm_k, ((0, n_pad - n), (0, 0)))

    # streams in level-major layout so per-level reads are leading-dim slices
    u3 = jnp.transpose(u_k.reshape(n_pad, K, S), (1, 0, 2))     # [K, n, S]
    nrm3 = jnp.transpose(nrm_k.reshape(n_pad, K, d), (1, 0, 2))  # [K, n, d]

    maskf = mask.astype(f)                                       # [dn, d]
    act = maskf * jnp.stack(
        [jnp.any(mask.at[j].set(False), axis=0) for j in range(dn)]
    ).astype(f)                                                  # [dn, d]
    # contrib[s, k*dn+j] = mask[j,k] * (j != s); row dn = no skip
    skip_ok = (jnp.arange(dn)[None, :] != jnp.arange(dn + 1)[:, None]
               ).astype(f)                                       # [dn+1, dn]
    contrib = (skip_ok[:, None, :] * maskf.T[None, :, :]
               ).reshape(dn + 1, d * dn)                         # [dn+1, d*dn]
    has = jnp.max(contrib.reshape(dn + 1, d, dn), axis=2)        # [dn+1, d]
    # initial selection: every tree's root (slot 0), dim-major columns
    mu0 = jnp.where(mask, t_mean[:, 0, :], 0.0).T.reshape(1, d * dn)
    var0 = jnp.where(mask, t_bw[:, 0, :], 0.0).T.reshape(1, d * dn)
    init = jnp.concatenate([mu0, var0], axis=0).astype(f)        # [2, d*dn]

    grid = (n_pad // C,)
    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    chainb = lambda *shape: pl.BlockSpec((shape[0], C) + shape[2:],
                                         lambda i: (0, i) + (0,) * (len(shape) - 2),
                                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    kern = functools.partial(_kernel, K=K, W=W, dn=dn, d=d, n_iter=n_iter,
                             interpret=interpret)
    mu_s, var_s, lbl = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[smem, smem, smem,
                  const(dn + 1, d * dn), const(2, d * dn),
                  const(K, dn * 2 * d, W), const(K, dn, W), const(K, dn, W),
                  chainb(K, n_pad, S), chainb(K, n_pad, d)],
        out_specs=[pl.BlockSpec((C, d * dn), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((C, d * dn), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((K, C, dn), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, d * dn), f),
                   jax.ShapeDtypeStruct((n_pad, d * dn), f),
                   jax.ShapeDtypeStruct((K, n_pad, dn), jnp.int32)],
        interpret=interpret,
    )(act, has, maskf, contrib, init, ms, logw, perm, u3, nrm3)

    # dim-major columns [n, d*dn] -> [n, dn, d]
    mu_sel = jnp.transpose(mu_s[:n].reshape(n, d, dn), (0, 2, 1))
    var_sel = jnp.transpose(var_s[:n].reshape(n, d, dn), (0, 2, 1))
    labels = jnp.transpose(lbl[:, :n], (1, 0, 2))                # [n, K, dn]
    return mu_sel, var_sel, labels
