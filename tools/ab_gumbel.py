"""Real-TPU A/B of the KEYED-path label-selection arithmetics
(VERDICT r4 #1 -- the last unmet BASELINE target):

  cdf      flat normalize/cumsum/count inverse-CDF chain -- ~6
           materialized [chains, n_l] tensors per selection, and the
           cumsum's log-depth lowering grows the compiled temp footprint
           superlinearly in the batch (the round-4 "B=8 spill");
  blocked  the SAME single-uniform inverse-CDF draw, block-hierarchical
           (block sums -> pick block -> resolve within the dynamically
           sliced block; ops/gibbs.py::_select_label_blocked) -- no
           full-width prefix sum, exact-arithmetic-identical index;
  gumbel   argmax(logits + G) (ops/gibbs.py::_select_label_gumbel) --
           fewest tensors, but per-candidate threefry noise (VPU-bound).

The keyed path has no trace contract (PARITY.md "keyed reproducibility"),
so any distributionally-exact draw is legal; replay mode keeps the flat
CDF form.

Regimes (completion-forced, INTERLEAVED rounds so congestion episodes hit
both arms equally; best-of-N per arm; honest queue depths per
BASELINE.md round-4 finding 3):

  1. single 2x1000-comp product, 1000 samples (reps=48)
  2. 16k-chain single program (reps=12)
  3. batched-sets headline, B=6 (reps=80)
  4. scale row 2x50,000-comp, 256 samples (reps=12)
  5. distributional sanity: leaf-label histograms of the two arms agree
     within MC error on one product

Run: python tools/ab_gumbel.py [quick]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax                                            # noqa: E402
import jax.numpy as jnp                               # noqa: E402

from kde_tpu import BatchedProductSampler, ProductSampler, kde  # noqa: E402

N_COMP, N_OUT, N_ITER = 1000, 1000, 5


def fence(*xs):
    return float(np.asarray(sum(jnp.sum(v) for v in xs)))


def interleaved(name, fns, reps, rounds, per_call):
    """fns: {arm: fn(seed)->out}.  One timed window per arm per round,
    arms interleaved; prints best rate per arm and the ratio."""
    for arm, fn in fns.items():
        fence(fn(0))                                  # warm/compile each arm
    best = {arm: 0.0 for arm in fns}
    for r in range(rounds):
        for arm, fn in fns.items():
            t0 = time.perf_counter()
            outs = [fn(1000 * r + i + 1) for i in range(reps)]
            fence(*outs)
            best[arm] = max(best[arm],
                            per_call * reps / (time.perf_counter() - t0))
    arms = list(fns)
    base = best[arms[0]]
    for arm in arms:
        print(f"[{name}] {arm}: {best[arm]:12.0f} samples/s  "
              f"({best[arm] / base:.3f}x vs {arms[0]})", flush=True)
    return best


def main(quick=False):
    rounds = 4 if quick else 8
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    dens = [kde(rng.normal(size=(2, N_COMP)), [0.1], dtype=jnp.float32),
            kde(rng.normal(size=(2, N_COMP)) + 0.5, [0.1],
                dtype=jnp.float32)]

    selects = ("cdf", "blocked", "gumbel")

    def arms(sampler):
        return {sel: (lambda s, sel=sel: sampler.sample(
            jax.random.PRNGKey(s), select=sel)[0]) for sel in selects}

    # 1. single product at honest queue depth
    s1 = ProductSampler(dens, n_out=N_OUT, n_iter=N_ITER)
    interleaved("single 2x1000", arms(s1), reps=48, rounds=rounds,
                per_call=N_OUT)

    # 2. 16k chains
    s2 = ProductSampler(dens, n_out=16_384, n_iter=N_ITER)
    interleaved("16k chains", arms(s2), reps=12, rounds=rounds,
                per_call=16_384)

    # 3. batched-sets headline, B=6
    B = 6
    s3 = BatchedProductSampler([dens] * B, n_out=N_OUT, n_iter=N_ITER)
    interleaved("batched B=6", arms(s3), reps=80, rounds=rounds,
                per_call=B * N_OUT)

    # 4. scale row: 2x50k comps (HBM-bound regime)
    n_big = 50_000
    big = [kde(rng.normal(size=(2, n_big)).astype(np.float32),
               [float(1.06 * n_big ** -0.2)], dtype=jnp.float32),
           kde((rng.normal(size=(2, n_big)) + 0.5).astype(np.float32),
               [float(1.06 * n_big ** -0.2)], dtype=jnp.float32)]
    s4 = ProductSampler(big, n_out=256, n_iter=N_ITER)
    interleaved("scale 2x50k", arms(s4), reps=12,
                rounds=max(4, rounds // 2), per_call=256)

    # 5. distributional sanity on the real chip: leaf-label histograms
    n_chk = 8192
    s5 = ProductSampler(dens, n_out=n_chk, n_iter=N_ITER)
    _, ic = s5.sample(jax.random.PRNGKey(123), select="cdf")
    _, ig = s5.sample(jax.random.PRNGKey(321), select="gumbel")
    _, ibk = s5.sample(jax.random.PRNGKey(123), select="blocked")
    hc = np.bincount(np.asarray(ic)[0], minlength=N_COMP) / n_chk
    hg = np.bincount(np.asarray(ig)[0], minlength=N_COMP) / n_chk
    same_key_agree = float(np.mean(np.asarray(ic) == np.asarray(ibk)))
    print(f"[dist] same-key label agreement cdf vs blocked (f32, real "
          f"chip): {same_key_agree:.4f}", flush=True)
    tv = 0.5 * np.abs(hc - hg).sum()
    # expected TV between two independent n_chk-draw histograms of the
    # same categorical ~ sum_k sqrt(2 p_k (1-p_k) / (pi * n/2)); just pin a
    # loose factor-of-2 band around the K~1000, n=8192 scale (~0.5 max)
    print(f"[dist] leaf-label TV(cdf, gumbel) = {tv:.4f} "
          f"(same-arm resample TV for scale: "
          f"{0.5 * np.abs(hc - np.bincount(np.asarray(s5.sample(jax.random.PRNGKey(777), select='cdf')[1])[0], minlength=N_COMP) / n_chk).sum():.4f})",
          flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main(quick="quick" in sys.argv[1:])
