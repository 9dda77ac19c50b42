"""Product memory sizing and engine routing (SURVEY §5 kernel-axis
call-out; VERDICT r4 #7: "encode/document the size rule for when a
product should take the collective engine").

The plain single-program Gibbs engine holds every density's full
candidate arrays plus the [chains, leaf-width] selection stages in one
chip's HBM; the kernel-sharded engine (gibbs_kernel_sharded.py) splits
the component axis S ways at a measured S=1 overhead of ~1.3x, so it
only pays when a product genuinely exceeds one chip's memory.  The rule:

    S = ceil(peak_product_bytes / hbm_budget);  S == 1 -> plain engine.

``peak_product_bytes`` comes from XLA's own compile-time accounting
(:func:`estimate_product_memory`: AOT-lower the exact keyed executable
and read ``memory_analysis`` -- argument + output + temp bytes).  Nothing
is executed and nothing is allocated on device, so the estimate is safe
to take for products far beyond the chip's HBM.  Compile cost: seconds on
CPU at test sizes, ~20-40 s for a new shape on the remote TPU runtime
(cached per shape afterwards).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def estimate_product_memory(densities: Sequence, n_out: int,
                            n_iter: int = 5, dtype=jnp.float32,
                            select: str = "auto") -> dict:
    """Compile-time memory accounting of the keyed product executable for
    ``densities`` at ``n_out`` chains -- the exact program
    ``prod_appx_ms_gibbs`` would dispatch (same plan arrays, same
    statics), via AOT lowering; nothing runs on device.

    Returns ``{"args", "temp", "out", "total", "select"}`` in bytes.
    """
    from ..ops import gibbs as G
    plan = G._get_plan(list(densities), n_out, dtype,
                       G._resolve_plan_impl(list(densities), "auto",
                                            replay=False))
    dn, d, n_levels = plan.ndens, plan.ndim, plan.n_levels
    bu = dn * (1 + n_levels * (1 + n_iter))
    bn = d * (n_levels + 1)
    sel = G.resolve_select(select, n_out, plan.offsets[-1][1])
    lowered = G._gibbs_from_key.lower(
        jax.random.PRNGKey(0), plan.lvl_arrays, plan.t_mean, plan.t_bw,
        G._full_mask_dev(dn, d), n_out=n_out, bu=bu, bn=bn,
        offsets=tuple(plan.offsets), n_iter=n_iter, ndens=dn, ndim=d,
        n_levels=n_levels, addop=None, diffop=None, get_mu=None,
        get_lambda=None, add_entropy=True, dtype=jnp.dtype(dtype).name,
        select=sel)
    m = lowered.compile().memory_analysis()
    args = int(m.argument_size_in_bytes)
    temp = int(m.temp_size_in_bytes)
    out = int(m.output_size_in_bytes)
    return {"args": args, "temp": temp, "out": out,
            "total": args + temp + out, "select": sel}


# v5e: 16 GB HBM; leave headroom for the runtime, other resident arrays
# (the densities themselves outside the product call), and allocator slack.
DEFAULT_HBM_BUDGET = 12 << 30


def recommend_shards(densities: Sequence, n_out: int, n_iter: int = 5,
                     dtype=jnp.float32,
                     hbm_budget: int = DEFAULT_HBM_BUDGET,
                     mem: Optional[dict] = None) -> dict:
    """The routing rule: how many component-axis shards a product needs.

    Returns ``{"shards", "engine", "bytes", "budget"}`` where ``engine``
    is ``"plain"`` (fits one chip -- the single fused program; the
    kernel-sharded form costs a measured ~1.3x at S=1, BASELINE.md
    "Kernel/component-axis sharded product") or ``"kernel-sharded"`` with
    ``shards >= 2`` (ceil(bytes/budget); per-shard candidate arrays AND
    selection stages shrink ~1/S while the collectives move only
    [S]-scalar partials + one integer per selection, so the sharded
    footprint tracks bytes/S).  Pass a precomputed ``mem`` dict (from
    :func:`estimate_product_memory`) to skip the AOT compile.
    """
    if mem is None:
        mem = estimate_product_memory(densities, n_out, n_iter=n_iter,
                                      dtype=dtype)
    shards = max(1, math.ceil(mem["total"] / hbm_budget))
    return {"shards": shards,
            "engine": "plain" if shards == 1 else "kernel-sharded",
            "bytes": mem["total"], "budget": int(hbm_budget),
            "select": mem["select"]}
