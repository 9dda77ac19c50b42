"""Stage-latency decomposition of the Gibbs product program (VERDICT r4
#1: "hit or retire the batched >=1M samples/s target ... with a
stage-latency decomposition (stages x dispatch cost vs HBM bytes)
proving the floor").

The B=6 headline dispatch runs ~121 SEQUENTIAL stages (per level:
1 vmapped conditioning selection + Niter x ndens sweep selections
+ 1 sample-point stage; 10 levels for 1000-comp trees + the final draw).
This tool measures, on the real chip, inside ONE jitted program (so the
numbers are in-program fusion-boundary latencies, not dispatch RTTs):

  skeleton   a dependent chain of K minimal reduce+broadcast stages at
             the chain-state width -- the cheapest possible sequential
             stage, i.e. the per-stage latency FLOOR;
  primitives the per-stage cost of each selection arithmetic (flat cdf
             chain / blocked / gumbel) and of the bare building blocks
             (sum, cumsum) at the leaf shapes of the headline
             ([6000, 1024]) and scale ([256, 50k]) programs, each as a
             K-deep dependent chain.

Floor assembly printed at the end: sum over the level schedule of
(selection stages x measured per-stage selection cost at that width)
vs the measured end-to-end dispatch, and the skeleton floor
(121 x minimal stage latency) -- if the skeleton floor alone exceeds
the 1M-samples/s budget (6.0 ms for 6000 samples), no selection
arithmetic can reach the target and it is retired on evidence.

Timing: completion-forced (dependent scalar fetched), reps-queued so the
fence RTT share is negligible; K amortizes per-program overhead.

Run: python tools/ab_stage_floor.py   (TPU host)
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax                                            # noqa: E402
import jax.numpy as jnp                               # noqa: E402

from kde_tpu.ops.gibbs import (_blocked_block_size, _select_label,  # noqa: E402
                               _select_label_blocked, _select_label_gumbel)

K = 48                 # dependent stages per program
DAMP = 1e-9            # feedback scale: serializes stages, preserves state


def fence(*xs):
    return float(np.asarray(sum(jnp.sum(v) for v in xs)))


def timed_chain(body, chains, width, rounds=6, reps=8):
    """Time a jitted K-deep dependent chain of ``body`` stages; returns
    seconds per stage.  ``body(y, u, i) -> feedback scalar/array`` reads
    the carry and its result is fed back (serializing the stages)."""
    @jax.jit
    def prog(y, u):
        for i in range(K):
            fb = body(y, u, i)
            y = y + DAMP * fb
        return jnp.sum(y)

    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.normal(size=(chains, width)), jnp.float32)
    u0 = jnp.asarray(rng.uniform(size=(chains, K)), jnp.float32)
    fence(prog(y0, u0))
    best = 1e9
    for r in range(rounds):
        t0 = time.perf_counter()
        fence(*[prog(y0 * (1.0 + 1e-6 * i), u0) for i in range(reps)])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best / K


def selection_bodies(chains, width):
    keys = jax.random.split(jax.random.PRNGKey(0), K)   # one key per stage
    blk = _blocked_block_size(width)

    def skeleton(y, u, i):
        return jnp.sum(y, axis=1, keepdims=True)

    def b_sum(y, u, i):
        return jnp.sum(y, axis=1, keepdims=True)

    def b_cumsum(y, u, i):
        return jnp.cumsum(y, axis=1)[:, -1:]

    def b_cdf(y, u, i):
        z = jax.vmap(_select_label)(u[:, i], y)
        return z[:, None].astype(y.dtype)

    def b_blocked(y, u, i):
        z = jax.vmap(lambda uu, lg: _select_label_blocked(uu, lg, blk)
                     )(u[:, i], y)
        return z[:, None].astype(y.dtype)

    def b_gumbel(y, u, i):
        z = _select_label_gumbel(keys[i], y)
        return z[:, None].astype(y.dtype)

    return {"skeleton(sum)": skeleton, "cumsum": b_cumsum,
            "select=cdf": b_cdf, "select=blocked": b_blocked,
            "select=gumbel": b_gumbel}


def main():
    print(f"devices: {jax.devices()}", flush=True)
    shapes = [("headline leaf", 6000, 1024),
              ("headline mid", 6000, 128),
              ("headline narrow", 6000, 8),
              ("scale leaf", 256, 50_000),
              ("16k-chain leaf", 16_384, 1024)]
    per = {}
    for name, chains, width in shapes:
        for bname, body in selection_bodies(chains, width).items():
            t = timed_chain(body, chains, width)
            per[(name, bname)] = t
            print(f"[{name:>15s} {chains:>6d}x{width:<6d}] {bname:15s}: "
                  f"{1e6 * t:8.1f} us/stage", flush=True)

    # floor assembly for the B=6 headline (6000 chains, 2x1000-comp trees):
    # level widths 2,4,...,512,1024 (padded); 11 selection stages per level
    # (1 conditioning [vmapped over 2 densities] + 5 sweeps x 2 densities)
    widths = [2 ** l for l in range(1, 11)]
    t_narrow = per[("headline narrow", "skeleton(sum)")]
    t_mid = per[("headline mid", "skeleton(sum)")]
    t_leaf = per[("headline leaf", "skeleton(sum)")]

    def interp(w):       # piecewise skeleton latency by width
        return t_narrow if w <= 16 else (t_mid if w <= 256 else t_leaf)

    floor = sum(11 * interp(w) for w in widths) + 11 * interp(8)
    sel_cdf = sum(11 * (per[("headline leaf", "select=cdf")] if w > 256 else
                        per[("headline mid", "select=cdf")] if w > 16 else
                        per[("headline narrow", "select=cdf")])
                  for w in widths)
    budget_1m = 6000 / 1e6
    print(f"\nheadline floor: {len(widths)}x11+11 = "
          f"{11 * len(widths) + 11} sequential stages", flush=True)
    print(f"  skeleton floor      : {1e3 * floor:6.2f} ms per dispatch "
          f"({6000 / floor:9.0f} samples/s ceiling)", flush=True)
    print(f"  all-cdf selections  : {1e3 * sel_cdf:6.2f} ms", flush=True)
    print(f"  1M-samples/s budget : {1e3 * budget_1m:6.2f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
