"""Timing harness for products (reference examples/ProfileProducts.jl),
plus the large-scale config from BASELINE.md."""
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from kde_tpu import kde, prod_appx_ms_gibbs


def profile(n_comp, n_out, n_iter=5, d=1, reps=5):
    rng = np.random.default_rng(0)
    dens = [kde(rng.normal(size=(d, n_comp)), [0.2]) for _ in range(2)]
    _ = [p.tree for p in dens]
    import jax.numpy as jnp
    out = prod_appx_ms_gibbs(n_out, dens, n_iter=n_iter)   # warmup/compile
    float(np.asarray(out[0].sum()))
    t0 = time.perf_counter()
    outs = [prod_appx_ms_gibbs(n_out, dens, n_iter=n_iter,
                               key=jax.random.PRNGKey(r)) for r in range(reps)]
    # completion fence: on the axon runtime block_until_ready returns at
    # dispatch-journal acceptance, NOT device completion (BASELINE.md
    # "timing honesty") -- only a dependent scalar fetch is an honest fence
    float(np.asarray(jnp.sum(jnp.stack([o[0].sum() for o in outs]))))
    dt = (time.perf_counter() - t0) / reps
    print(f"{2}x{n_comp}-comp {d}D product, {n_out} samples: "
          f"{dt * 1e3:.1f} ms -> {n_out / dt:,.0f} samples/s")


if __name__ == "__main__":
    profile(100, 100, d=1)          # the reference's ProfileProducts config
    profile(1000, 1000, d=2)        # the BASELINE.md headline config
