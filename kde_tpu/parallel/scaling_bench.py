"""Scaling-efficiency harness (BASELINE.json: >=80% efficiency 1 -> N hosts).

Measures Gibbs-product samples/s on 1..N-device submeshes with a fixed
per-device chain load (weak scaling) or fixed total chains (strong scaling).
On a single-chip environment this only validates the harness; run on a real
slice/pod to record the efficiency table.

Usage: python -m kde_tpu.parallel.scaling_bench [total_chains]
"""

from __future__ import annotations

import sys
import time
from typing import List

import numpy as np


def run(total_chains: int = 4096, n_comp: int = 1000, n_iter: int = 5):
    import jax
    import jax.numpy as jnp
    from ..density import kde
    from .mesh import make_mesh
    from .product import prod_appx_ms_gibbs_sharded

    rng = np.random.default_rng(0)
    dens = [kde(rng.normal(size=(2, n_comp)), [0.1], dtype=jnp.float32)
            for _ in range(2)]
    _ = [p.tree for p in dens]

    n_dev = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    results = []
    for s in sizes:
        mesh = make_mesh(s)
        out = prod_appx_ms_gibbs_sharded(mesh, total_chains, dens,
                                         n_iter=n_iter,
                                         key=jax.random.PRNGKey(0))
        float(np.asarray(out[0][0, 0]))         # completion fence (compile)
        reps = 5
        t0 = time.perf_counter()
        outs = [prod_appx_ms_gibbs_sharded(mesh, total_chains, dens,
                                           n_iter=n_iter,
                                           key=jax.random.PRNGKey(r))
                for r in range(reps)]
        # completion fence: block_until_ready does NOT wait for device
        # completion on the axon runtime (BASELINE.md "timing honesty")
        fence = jnp.sum(jnp.stack([o[0].sum() for o in outs]))
        float(np.asarray(fence))
        rate = total_chains * reps / (time.perf_counter() - t0)
        results.append((s, rate))
        base = results[0][1]
        eff = rate / (base * s)
        print(f"devices={s}: {rate:,.0f} samples/s "
              f"(strong-scaling efficiency {eff:.0%})")
    return results


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
