"""Real-TPU A/B for the speculative golden-search lookahead (config.
GOLDEN_LOOKAHEAD), stranded opt-in by pathological XLA:CPU compile times
(config.py: >15 min at unroll=32 k>=2 on this host's CPU backend).

Measures, interleaved and completion-fenced (BASELINE.md timing honesty):

  1. compile wall time of the speculative fit program on the real TPU
     (axon compiles terminal-side, so the CPU pathology may not apply)
  2. pipelined device LOOCV fit, N=1000 d=2 and N=150 d=4: k=0 vs k=2 vs k=3
  3. pipelined end-to-end `*` (the 4-D README cfg 4): k=0 vs winner
  4. selection agreement between the k=0 and k>0 trajectories

Run: python tools/ab_lookahead.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax                                            # noqa: E402
import jax.numpy as jnp                               # noqa: E402

from kde_tpu import config, kde, product              # noqa: E402
from kde_tpu.ops import loocv                         # noqa: E402


def fence(*xs):
    return float(np.asarray(sum(jnp.sum(v) for v in xs)))


def compile_fit(pts, k):
    """Fresh-compile the fit program at lookahead k; returns (secs, bwds)."""
    config.GOLDEN_LOOKAHEAD = k
    # distinct static args -> distinct executable; jit cache keys on
    # (unroll, lookahead) so no manual cache clearing is needed
    t0 = time.perf_counter()
    out = loocv.device_fit_arrays(pts)
    fence(*out)
    return time.perf_counter() - t0, np.asarray(out[1][0])


def pipelined_fit(pts, k, reps=8, rounds=6):
    config.GOLDEN_LOOKAHEAD = k

    def one(s):
        # perturb by a traced-constant-free scalar so calls are distinct work
        return loocv.device_fit_arrays(pts + jnp.float32(1e-6 * s))[1]

    fence(one(0))
    best = 1e9
    for r in range(rounds):
        t0 = time.perf_counter()
        outs = [one(1000 * r + i + 1) for i in range(reps)]
        fence(*outs)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    results = {}

    cases = {
        "N=1000 d=2": jnp.asarray(rng.normal(size=(2, 1000)), jnp.float32),
        "N=150 d=4": jnp.asarray(rng.normal(size=(4, 150)), jnp.float32),
    }

    # --- stage 1: compile cost + selection agreement -------------------------
    for name, pts in cases.items():
        base = None
        for k in (0, 2, 3):
            secs, var0 = compile_fit(pts, k)
            if base is None:
                base = var0
            rel = float(np.max(np.abs(var0 - base) / base))
            print(f"[compile] {name} k={k}: {secs:6.1f} s   "
                  f"max rel var dev vs k=0: {rel:.2e}", flush=True)
            results[f"compile {name} k={k}"] = secs

    # --- stage 2: pipelined fit latency, interleaved -------------------------
    for name, pts in cases.items():
        t = {0: 1e9, 2: 1e9, 3: 1e9}
        for k in t:
            pipelined_fit(pts, k, reps=2, rounds=1)   # warm each variant
        for r in range(6):                            # interleave rounds
            for k in t:
                t[k] = min(t[k], pipelined_fit(pts, k, reps=8, rounds=1))
        for k in t:
            print(f"[fit] {name} k={k}: {1e3 * t[k]:7.2f} ms/fit "
                  f"({t[0] / t[k]:.2f}x vs k=0)", flush=True)
            results[f"fit {name} k={k}"] = t[k]

    # --- stage 3: end-to-end `*` (README cfg 4), k=0 vs best k ---------------
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

    # pick the k that wins on total fit time across BOTH measured cases
    # (the N=150 d=4 case is the regime lookahead was expected to pay in)
    best_k = min((2, 3), key=lambda k: (results[f"fit N=1000 d=2 k={k}"]
                                        + results[f"fit N=150 d=4 k={k}"]))
    t = {0: 1e9, best_k: 1e9}
    for k in t:
        config.GOLDEN_LOOKAHEAD = k
        fence(star4(0))
    reps = 6
    for r in range(6):
        for k in t:
            config.GOLDEN_LOOKAHEAD = k
            t0 = time.perf_counter()
            fence(*[star4(100 * r + i + 1) for i in range(reps)])
            t[k] = min(t[k], (time.perf_counter() - t0) / reps)
    for k in t:
        print(f"[star cfg4] k={k}: {1e3 * t[k]:7.2f} ms/flow "
              f"({t[0] / t[k]:.2f}x vs k=0)", flush=True)

    config.GOLDEN_LOOKAHEAD = 0
    print("done", flush=True)


if __name__ == "__main__":
    main()
