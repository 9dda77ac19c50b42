"""Reps/batch sweeps behind the round-4/5 latency and headline numbers.

Reproduces, on the real chip, the sweeps recorded in
``tools/ab_latency_r4_output.txt`` sections 2-6 (committed per ADVICE r4:
the numbers BASELINE.md and bench.py comments cite must be regenerable
from committed code):

  star-reps     fence-RTT reps sweep of the 4-D end-to-end `*` flow
  headline-reps fence-RTT reps sweep of the batched headline sampler
  b-sweep       PRODUCTS_PER_CALL sweep (interleaved across B values)
  single-reps   single-product latency reps sweep (2x1000-comp)

Timing honesty (BASELINE.md): every window is completion-forced (outputs
reduced to a scalar fetched inside the window); the measured per-call time
decomposes as t_dev + fetchRTT/reps, so each sweep varies reps explicitly.
B values are interleaved round-robin so a congestion episode cannot poison
one arm.

Run: python tools/ab_sweeps.py [star-reps|headline-reps|b-sweep|single-reps|all]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax                                            # noqa: E402
import jax.numpy as jnp                               # noqa: E402

from kde_tpu import (BatchedProductSampler, kde, prod_appx_ms_gibbs,  # noqa: E402
                     product)

N_COMP, N_OUT, N_ITER = 1000, 1000, 5


def fence(*xs):
    return float(np.asarray(sum(jnp.sum(v) for v in xs)))


def _headline_densities(rng, dtype=jnp.float32):
    pts_a = rng.normal(size=(2, N_COMP))
    pts_b = rng.normal(size=(2, N_COMP)) + 0.5
    return [kde(pts_a, [0.1], dtype=dtype), kde(pts_b, [0.1], dtype=dtype)]


def star_reps_sweep(rounds=6):
    """4-D end-to-end `*` flow (README cfg 4) at increasing queue depth."""
    rng = np.random.default_rng(0)
    n4 = 200
    pts4 = np.vstack([2 * rng.normal(size=(1, n4)) + 3,
                      np.concatenate([2 * rng.normal(size=n4 // 2) + 3,
                                      2 * rng.normal(size=n4 // 2) - 3])[None],
                      2 * rng.normal(size=(2, n4)) + 3])
    p4 = kde(jnp.asarray(rng.normal(size=(4, 100)), jnp.float32))
    q4 = kde(jnp.asarray(pts4, jnp.float32))

    def star4(s):
        pq = product([p4, q4], key=jax.random.PRNGKey(s))
        return jnp.sum(pq.points) + jnp.sum(pq.bw)

    fence(star4(0))
    for reps in (3, 6, 12, 24, 48):
        best = 1e9
        for r in range(rounds):
            t0 = time.perf_counter()
            fence(*[star4(1000 * r + i + 1) for i in range(reps)])
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"reps={reps:3d}: {1e3 * best:6.2f} ms/flow  "
              f"({150 / best:7.0f} samples/s)", flush=True)
    print("done", flush=True)


def headline_reps_sweep(B=6, rounds=8):
    """Batched headline sampler at increasing queue depth."""
    rng = np.random.default_rng(0)
    dens = _headline_densities(rng)
    sampler = BatchedProductSampler([dens] * B, n_out=N_OUT, n_iter=N_ITER)
    n_call = N_OUT * B
    fence(sampler.sample(jax.random.PRNGKey(0))[0])
    for reps in (20, 40, 80):
        best = 0.0
        for r in range(rounds):
            t0 = time.perf_counter()
            outs = [sampler.sample(jax.random.PRNGKey(1000 * r + i + 1))[0]
                    for i in range(reps)]
            fence(*outs)
            best = max(best, n_call * reps / (time.perf_counter() - t0))
        print(f"reps={reps:3d}: {best:9.0f} samples/s", flush=True)
    print("done", flush=True)


def b_sweep(bs=(2, 4, 5, 6, 7, 8), work=480_000, rounds=8):
    """PRODUCTS_PER_CALL sweep, interleaved round-robin across B so one
    congestion episode cannot poison a single arm; reps ~= work/(B*N_OUT)
    keeps total queued samples per window comparable."""
    rng = np.random.default_rng(0)
    dens = _headline_densities(rng)
    samplers = {b: BatchedProductSampler([dens] * b, n_out=N_OUT,
                                         n_iter=N_ITER) for b in bs}
    for b, s in samplers.items():
        fence(s.sample(jax.random.PRNGKey(0))[0])      # warm each arm
    best = {b: 0.0 for b in bs}
    for r in range(rounds):
        for b in bs:                                   # interleave arms
            reps = max(1, work // (b * N_OUT))
            t0 = time.perf_counter()
            outs = [samplers[b].sample(jax.random.PRNGKey(1000 * r + i + 1))[0]
                    for i in range(reps)]
            fence(*outs)
            best[b] = max(best[b],
                          b * N_OUT * reps / (time.perf_counter() - t0))
    for b in bs:
        print(f"B={b}: {best[b]:9.0f} samples/s", flush=True)
    print("done", flush=True)


def _batched_mem(sampler, select):
    """Compiled-program memory analysis of the batched sampler's executable
    (same statics as sample())."""
    from kde_tpu.ops.gibbs import _gibbs_batched_sets, resolve_select
    addop, diffop, get_mu, get_lambda = sampler.hooks
    lowered = _gibbs_batched_sets.lower(
        jax.random.PRNGKey(0), sampler.lvl_arrays, sampler.t_mean,
        sampler.t_bw, sampler.mask, n_out=sampler.n_out, bu=sampler.bu,
        bn=sampler.bn, offsets=sampler.offsets, n_iter=sampler.n_iter,
        ndens=sampler.ndens, ndim=sampler.ndim, n_levels=sampler.n_levels,
        addop=addop, diffop=diffop, get_mu=get_mu, get_lambda=get_lambda,
        add_entropy=sampler.add_entropy, dtype=sampler._dtype_name,
        select=resolve_select(select))
    return lowered.compile().memory_analysis()


def b_select_sweep(bs=(4, 6, 8, 10, 12), selects=("cdf", "gumbel"),
                   work=480_000, rounds=8):
    """Round-5 headline search: PRODUCTS_PER_CALL x selection-arithmetic
    grid (VERDICT r4 #1).  All (B, select) arms interleaved round-robin;
    per-arm best over ``rounds``.  Also prints the compiled program's
    peak-memory analysis per arm (the round-3 B=8 regression was blamed on
    a VMEM spill -- this records what actually grows)."""
    rng = np.random.default_rng(0)
    dens = _headline_densities(rng)
    samplers = {b: BatchedProductSampler([dens] * b, n_out=N_OUT,
                                         n_iter=N_ITER) for b in bs}
    arms = [(b, s) for b in bs for s in selects]
    for b, s in arms:
        fence(samplers[b].sample(jax.random.PRNGKey(0), select=s)[0])
        try:                     # what actually grows with B: compiled
            m = _batched_mem(samplers[b], s)     # temp (spill) vs args
            print(f"B={b:2d} select={s:6s}: temp={m.temp_size_in_bytes:>12,}"
                  f"  args={m.argument_size_in_bytes:>11,}"
                  f"  code={m.generated_code_size_in_bytes:>10,}",
                  flush=True)
        except Exception as e:
            print(f"B={b:2d} select={s:6s}: memory_analysis unavailable "
                  f"({type(e).__name__})", flush=True)
    best = {a: 0.0 for a in arms}
    for r in range(rounds):
        for b, s in arms:
            reps = max(1, work // (b * N_OUT))
            t0 = time.perf_counter()
            outs = [samplers[b].sample(jax.random.PRNGKey(1000 * r + i + 1),
                                       select=s)[0] for i in range(reps)]
            fence(*outs)
            best[(b, s)] = max(best[(b, s)],
                               b * N_OUT * reps / (time.perf_counter() - t0))
    for b, s in arms:
        print(f"B={b:2d} select={s:6s}: {best[(b, s)]:9.0f} samples/s",
              flush=True)
    print("done", flush=True)


def single_reps_sweep(rounds=8):
    """Single 2x1000-comp product latency at increasing queue depth."""
    rng = np.random.default_rng(0)
    dens = _headline_densities(rng)
    one = lambda s: prod_appx_ms_gibbs(N_OUT, dens, n_iter=N_ITER,
                                       key=jax.random.PRNGKey(s))[0]
    fence(one(0))
    for reps in (1, 6, 12, 24, 48, 96):
        best = 1e9
        for r in range(rounds):
            t0 = time.perf_counter()
            fence(*[one(1000 * r + i + 1) for i in range(reps)])
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"reps={reps:3d}: {1e3 * best:6.2f} ms/product "
              f"({N_OUT / best:7.0f} samples/s)", flush=True)
    print("done", flush=True)


STAGES = {"star-reps": star_reps_sweep,
          "headline-reps": headline_reps_sweep,
          "b-sweep": b_sweep,
          "b-select-sweep": b_select_sweep,
          "single-reps": single_reps_sweep}


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", flush=True)
    for name, fn in STAGES.items():
        if which in (name, "all"):
            print(f"# {name}", flush=True)
            fn()
