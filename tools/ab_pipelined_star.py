"""Pipelined end-to-end `*` throughput + unroll A/B under pipelining.

tools/ab_golden_unroll.py showed every SEQUENTIALLY-fenced call sits on the
~30 ms axon fetch RTT (fit N=150 and N=1000 both ~27 ms), so the while->
unroll difference was invisible.  This harness queues R flows per fence
(pipelined dispatch -- the serving/throughput regime bench.py's sampler
configs already use) to expose the device-side cost:

  1. pipelined device LOOCV fit, N=1000 d=2 and N=150 d=4, unroll A/B
  2. pipelined end-to-end `*` (4-D cfg 4 and 2x1000-comp), unroll A/B

Run: python tools/ab_pipelined_star.py
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


def pipelined(fn, reps=8, rounds=6):
    """Best-of-rounds per-call time with `reps` queued calls per fence."""
    fence(fn(0))
    best = 1e9
    for r in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(1000 * r + i + 1) for i in range(reps)]
        fence(*outs)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def ab(mk_fn, label, reps=8):
    t = {}
    for unroll in (32, 0):
        config.GOLDEN_UNROLL = unroll
        fence(mk_fn(0))                               # compile this variant
    t_u, t_w = 1e9, 1e9
    for r in range(6):                                # interleaved rounds
        config.GOLDEN_UNROLL = 32
        t0 = time.perf_counter()
        outs = [mk_fn(100 * r + i + 1) for i in range(reps)]
        fence(*outs)
        t_u = min(t_u, (time.perf_counter() - t0) / reps)
        config.GOLDEN_UNROLL = 0
        t0 = time.perf_counter()
        outs = [mk_fn(100 * r + i + 1) for i in range(reps)]
        fence(*outs)
        t_w = min(t_w, (time.perf_counter() - t0) / reps)
    config.GOLDEN_UNROLL = 32
    print(f"{label}: unrolled {t_u * 1e3:.2f} ms vs while {t_w * 1e3:.2f} "
          f"ms/call pipelined ({t_w / t_u:.2f}x)", flush=True)
    return t_u, t_w


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(7)

    for n, d, label in [(1000, 2, "fit N=1000 d=2"),
                        (150, 4, "fit N=150 d=4")]:
        data = [jnp.asarray(rng.normal(size=(n, d)), dtype=jnp.float32)
                for _ in range(64)]
        ab(lambda s, data=data: ksize_bandwidths_device(data[s % 64]),
           label)

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

    def star(dens, s):
        pq = product(dens, key=jax.random.PRNGKey(s))
        return jnp.sum(pq.points) + jnp.sum(pq.bw)

    ab(lambda s: star([p4, q4], s), "4D p*q (cfg 4)", reps=8)
    ab(lambda s: star([pa, pb], s), "2x1000 p*q", reps=8)


if __name__ == "__main__":
    main()
