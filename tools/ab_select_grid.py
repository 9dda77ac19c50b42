"""Real-TPU (width x chains) grid of the keyed label-selection arithmetics.

tools/ab_gumbel.py showed the three modes win in DIFFERENT regimes:
cdf at the headline size (2x1000 comps, 1000 chains), gumbel at many
chains (1.45x at 16k), blocked at wide leaves (2.08x at 2x50k comps).
This maps the crossover boundaries that ``select="auto"``'s size routing
encodes (config.GIBBS_SELECT_* thresholds): for each (components-per-
density, chains) cell, the three arms run interleaved (congestion hits
all equally), best-of-``rounds``, completion-forced, queue depth sized
per cell from a warm probe so the fence RTT share stays small.

Run: python tools/ab_select_grid.py   (TPU host; ~20 min, 27 compiles)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax                                            # noqa: E402
import jax.numpy as jnp                               # noqa: E402

from kde_tpu import ProductSampler, kde               # noqa: E402

N_ITER = 5
SELECTS = ("cdf", "blocked", "gumbel")
# (components per density, chains): the routing-relevant corners
CELLS = [(1000, 1024), (1000, 4096), (1000, 16384),
         (4000, 256), (4000, 1024), (4000, 4096),
         (12000, 256), (12000, 1024),
         (50000, 256), (50000, 1024)]


def fence(*xs):
    return float(np.asarray(sum(jnp.sum(v) for v in xs)))


def main(rounds=5):
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    for n_comp, chains in CELLS:
        bw = [float(1.06 * n_comp ** -0.2)]
        dens = [kde(rng.normal(size=(2, n_comp)).astype(np.float32), bw,
                    dtype=jnp.float32),
                kde((rng.normal(size=(2, n_comp)) + 0.5).astype(np.float32),
                    bw, dtype=jnp.float32)]
        s = ProductSampler(dens, n_out=chains, n_iter=N_ITER)
        fns = {sel: (lambda seed, sel=sel: s.sample(
            jax.random.PRNGKey(seed), select=sel)[0]) for sel in SELECTS}
        t_warm = {}
        for sel, fn in fns.items():
            fence(fn(0))                       # compile
            t0 = time.perf_counter()
            fence(fn(0))                       # warm single-call probe
            t_warm[sel] = time.perf_counter() - t0
        # queue depth from the slowest arm's probe: window >= ~0.5 s
        reps = int(np.clip(0.5 / max(min(t_warm.values()), 1e-4), 2, 48))
        best = {sel: 0.0 for sel in SELECTS}
        for r in range(rounds):
            for sel, fn in fns.items():
                t0 = time.perf_counter()
                fence(*[fn(1000 * r + i + 1) for i in range(reps)])
                best[sel] = max(best[sel],
                                chains * reps / (time.perf_counter() - t0))
        win = max(best, key=best.get)
        cells = "  ".join(f"{sel}={best[sel]:9.0f}" for sel in SELECTS)
        print(f"comp={n_comp:>6,} chains={chains:>6,} reps={reps:2d}: "
              f"{cells}  samples/s -> {win}"
              f" ({best[win] / best['cdf']:.2f}x vs cdf)", flush=True)
        del s, fns
    print("done", flush=True)


if __name__ == "__main__":
    main()
