"""Interleaved real-TPU A/B: unrolled vs while_loop golden search (LOOCV).

The LOOCV golden search ran as a lax.while_loop of ~10-30 dependent probe
iterations; on the axon runtime each while iteration pays ~1 ms dispatch
latency, which made the refit the dominant cost of the reference-style
``*`` path (product -> kde! refit, reference src/MSGibbs01.jl:724-725).
config.GOLDEN_UNROLL unrolls the first 32 iterations straight into the
program (masked updates, identical trajectory).

Stages (completion-forced timing; interleaved, best-of-N rounds):
  1. selection equality on device: unrolled == while (same bandwidths)
  2. device LOOCV fit latency, N=1000 d=2 (the `*` headline refit shape)
  3. device LOOCV fit latency, N=150 d=4 (the bench cfg-4 refit shape)
  4. end-to-end `*`: 4-D p*q incl. refit (bench cfg 4)
  5. end-to-end `*`: 2-D 2x1000-comp (the BASELINE.md serving row)

Run: python tools/ab_golden_unroll.py   (TPU-attached host)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax                                            # noqa: E402
import jax.numpy as jnp                               # noqa: E402

from kde_tpu import config, kde, product              # noqa: E402
from kde_tpu.ops.loocv import ksize_bandwidths_device  # noqa: E402


def fence(*xs):
    return float(np.asarray(sum(jnp.sum(v) for v in xs)))


def timed(fn, reps=8, rounds=6):
    """Best-of-rounds per-call latency, completion-forced (sequential
    calls, one fence per call -- the latency regime, as the `*` path is)."""
    fence(fn(0))                                       # warmup/compile
    best = 1e9
    for r in range(rounds):
        t0 = time.perf_counter()
        for i in range(reps):
            fence(fn(1000 * r + i + 1))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(7)

    # --- stage 1: selection equality --------------------------------------
    for n, d in [(1000, 2), (150, 4), (333, 3)]:
        pts = jnp.asarray(rng.normal(size=(n, d)) * np.arange(1, d + 1),
                          dtype=jnp.float32)
        config.GOLDEN_UNROLL = 32
        bw_u = np.asarray(ksize_bandwidths_device(pts))
        config.GOLDEN_UNROLL = 0
        bw_w = np.asarray(ksize_bandwidths_device(pts))
        config.GOLDEN_UNROLL = 32
        same = np.array_equal(bw_u, bw_w)
        print(f"stage1 N={n} d={d}: unrolled==while bitwise: {same} "
              f"(max rel diff {np.max(np.abs(bw_u - bw_w) / bw_w):.2e})",
              flush=True)

    # --- stages 2+3: fit latency, interleaved ------------------------------
    for n, d, label in [(1000, 2, "stage2 fit N=1000 d=2"),
                        (150, 4, "stage3 fit N=150 d=4")]:
        data = [jnp.asarray(rng.normal(size=(n, d)), dtype=jnp.float32)
                for _ in range(40)]

        def fit_unroll(s):
            config.GOLDEN_UNROLL = 32
            return ksize_bandwidths_device(data[s % 40])

        def fit_while(s):
            config.GOLDEN_UNROLL = 0
            return ksize_bandwidths_device(data[s % 40])

        t_u, t_w = 1e9, 1e9
        fence(fit_unroll(0)); fence(fit_while(0))      # compile both
        for r in range(6):                             # interleaved rounds
            t0 = time.perf_counter()
            for i in range(8):
                fence(fit_unroll(8 * r + i + 1))
            t_u = min(t_u, (time.perf_counter() - t0) / 8)
            t0 = time.perf_counter()
            for i in range(8):
                fence(fit_while(8 * r + i + 1))
            t_w = min(t_w, (time.perf_counter() - t0) / 8)
        config.GOLDEN_UNROLL = 32
        print(f"{label}: unrolled {t_u * 1e3:.2f} ms vs while "
              f"{t_w * 1e3:.2f} ms ({t_w / t_u:.2f}x)", flush=True)

    # --- stages 4+5: end-to-end `*`, interleaved ---------------------------
    n4 = 200
    pts4 = np.vstack([2 * rng.normal(size=(1, n4)) + 3,
                      np.concatenate([2 * rng.normal(size=n4 // 2) + 3,
                                      2 * rng.normal(size=n4 // 2) - 3])[None],
                      2 * rng.normal(size=(2, n4)) + 3])
    p4 = kde(jnp.asarray(rng.normal(size=(4, 100)), dtype=jnp.float32))
    q4 = kde(jnp.asarray(pts4, dtype=jnp.float32))
    pa = kde(jnp.asarray(rng.normal(size=(2, 1000)), dtype=jnp.float32),
             [0.1])
    pb = kde(jnp.asarray(rng.normal(size=(2, 1000)) + 0.5,
                         dtype=jnp.float32), [0.1])

    for dens, label in [([p4, q4], "stage4 4D p*q (cfg 4)"),
                        ([pa, pb], "stage5 2x1000-comp p*q")]:
        def star(s):
            pq = product(dens, key=jax.random.PRNGKey(s))
            return jnp.sum(pq.points) + jnp.sum(pq.bw)

        t_u, t_w = 1e9, 1e9
        config.GOLDEN_UNROLL = 32
        fence(star(0))
        config.GOLDEN_UNROLL = 0
        fence(star(0))
        for r in range(6):
            config.GOLDEN_UNROLL = 32
            t0 = time.perf_counter()
            for i in range(6):
                fence(star(6 * r + i + 1))
            t_u = min(t_u, (time.perf_counter() - t0) / 6)
            config.GOLDEN_UNROLL = 0
            t0 = time.perf_counter()
            for i in range(6):
                fence(star(6 * r + i + 1))
            t_w = min(t_w, (time.perf_counter() - t0) / 6)
        config.GOLDEN_UNROLL = 32
        print(f"{label}: unrolled {t_u * 1e3:.2f} ms vs while "
              f"{t_w * 1e3:.2f} ms ({t_w / t_u:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
