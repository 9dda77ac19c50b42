"""Benchmark: the BASELINE.json headline -- product of two 1000-component 2-D
KDEs via multiscale Gibbs sampling, Niter=5, 1000 output samples.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value        = samples/s of the TPU engine (steady-state, post-compile).
vs_baseline  = value / (serial CPU samples/s of the same algorithm).
The baseline is measured here (the reference publishes no numbers and Julia
is not in this image; see BASELINE.md): a chain-serial NumPy implementation
with vectorized inner loops -- the same chain-at-a-time schedule as the
reference's `for s in 1:Np` loop (reference src/MSGibbs01.jl:581).
"""

import json
import os
import sys
import time

import numpy as np

N_COMP = 1000       # components per density  (BASELINE.json: 2x1000-comp)
N_OUT = 1000        # product samples per product
N_ITER = 5          # reference Niter for `*` (src/MSGibbs01.jl:724)
# Chains are iid given the stream, so one dispatch draws several independent
# 1000-sample products of the same densities (the serving pattern for
# nonparametric belief propagation); 4 products/call saturates the chip --
# the per-call level schedule is latency-bound below ~4000 chains.
PRODUCTS_PER_CALL = 4
BASELINE_SAMPLES = 50


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from kde_tpu import kde, prod_appx_ms_gibbs
    from kde_tpu.reference_impl import serial_gibbs_product_fast

    rng = np.random.default_rng(0)
    dtype = jnp.float32
    pts_a = rng.normal(size=(2, N_COMP))
    pts_b = rng.normal(size=(2, N_COMP)) + 0.5
    dens = [kde(pts_a, [0.1], dtype=dtype), kde(pts_b, [0.1], dtype=dtype)]
    trees = [p.tree for p in dens]          # host precompute outside timing

    # --- TPU engine ---------------------------------------------------------
    # TIMING HONESTY: on the axon remote-TPU runtime, jax.block_until_ready
    # returns when the dispatch journal accepts the work -- NOT when the
    # device finishes (measured: "block-only" timing reports ~0.8 ms/call
    # while actual completion takes ~15 ms/call).  The only trustworthy
    # fence is a data dependency: reduce every output to one scalar and
    # fetch it inside the timed window.  The single fetch also pins the
    # process's dispatch mode, so every round sees the same regime.
    key = jax.random.PRNGKey(0)
    n_call = N_OUT * PRODUCTS_PER_CALL
    # warmup/compile (with a real completion fence)
    out = prod_appx_ms_gibbs(n_call, dens, n_iter=N_ITER, key=key)
    float(np.asarray(out[0][0, 0]))
    # steady-state throughput: queue all reps with distinct keys, then force
    # full completion via a dependent scalar; best of 6 rounds to damp
    # tunnel congestion episodes
    reps = 20
    tpu_rate = 0.0
    for rnd in range(8):
        keys = [jax.random.PRNGKey(1000 * rnd + r + 1) for r in range(reps)]
        t0 = time.perf_counter()
        outs = [prod_appx_ms_gibbs(n_call, dens, n_iter=N_ITER, key=k)
                for k in keys]
        fence = jnp.sum(jnp.stack([o[0].sum() for o in outs]))
        float(np.asarray(fence))                 # completion fence
        dt = (time.perf_counter() - t0) / reps
        tpu_rate = max(tpu_rate, n_call / dt)
    out = outs[-1]

    # sanity: each 1000-sample product of two unit-ish Gaussian mixtures
    # stays bounded (check the first product's block)
    pts = np.asarray(out[0][:, :N_OUT])
    assert np.all(np.isfinite(pts)) and np.abs(pts).max() < 10.0

    # --- serial CPU baseline (best of 3 runs for stability) -----------------
    cpu_rate = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        serial_gibbs_product_fast(trees, BASELINE_SAMPLES, N_ITER,
                                  np.random.default_rng(rep))
        cpu_rate = max(cpu_rate,
                       BASELINE_SAMPLES / (time.perf_counter() - t0))

    print(json.dumps({
        "metric": "gibbs product samples/s (2x1000-comp 2D KDE, Niter=5)",
        "value": round(tpu_rate, 2),
        "unit": "samples/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    main()
