"""TPU A/B: fused upper-level Gibbs engine (ops/gibbs_fused.py) vs the
pure-XLA engine, interleaved in one process (tunnel congestion hits both
sides equally; best-of-N rounds damps transients -- BASELINE.md "timing
honesty").

Measures (completion-forced):
  1. correctness: same key -> label agreement + moments
  2. single 2x1000-comp product latency (VERDICT r3 target <= 3 ms)
  3. fused width sweep (W=128 vs 256)
  4. large chain count (gate check at 16k chains)
  5. batched-sets headline throughput (target >= 1M samples/s)
  6. end-to-end `*` latency (device-resident product + LOOCV refit)

Run: python tools/ab_fused.py   (on a TPU-attached host)
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from kde_tpu import config
from kde_tpu.density import kde
from kde_tpu.ops.gibbs import ProductSampler, BatchedProductSampler

print("backend:", jax.default_backend(), jax.devices(), flush=True)

rng = np.random.default_rng(0)
N = 1000
d = 2
dens = [kde(rng.normal(size=(d, N)), np.full((d,), 0.35)) for _ in range(2)]

samplers = {}
config.GIBBS_FUSED = False
samplers["xla"] = ProductSampler(dens, n_out=N, n_iter=5)
config.GIBBS_FUSED = True
config.GIBBS_FUSED_WIDTH = 128
samplers["fused128"] = ProductSampler(dens, n_out=N, n_iter=5)
config.GIBBS_FUSED_WIDTH = 256
samplers["fused256"] = ProductSampler(dens, n_out=N, n_iter=5)
config.GIBBS_FUSED_WIDTH = 128
config.GIBBS_FUSED = "auto"

key = jax.random.PRNGKey(0)

# ---- correctness ----
outs = {}
for name, s in samplers.items():
    t0 = time.time()
    try:
        p, i = s.sample(key)
        outs[name] = (np.asarray(p), np.asarray(i))
        print(f"{name}: compile+run {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        samplers[name] = None

p0, i0 = outs["xla"]
print("moments xla:", p0.mean(axis=1).round(4), p0.std(axis=1).round(4))
for name in ("fused128", "fused256"):
    if name in outs:
        p1, i1 = outs[name]
        print(f"{name}: label agreement {(i0 == i1).mean():.4f}, "
              f"moments {p1.mean(axis=1).round(4)} {p1.std(axis=1).round(4)}",
              flush=True)

# ---- interleaved single-product latency ----
REP = 10
best = {k: 1e9 for k, v in samplers.items() if v is not None}
for r in range(8):
    for name in best:
        s = samplers[name]
        ks = jax.random.split(jax.random.PRNGKey(r * 7 + 1), REP)
        t0 = time.perf_counter()
        outs_r = [s.sample(k) for k in ks]
        acc = sum(jnp.sum(p[:, :1]) for p, _ in outs_r)
        float(acc)
        best[name] = min(best[name], (time.perf_counter() - t0) / REP)
    print(f"round {r}: " + "  ".join(f"{k} {v*1e3:.2f}ms"
                                     for k, v in best.items()), flush=True)

print("\nBEST single-product (ms): " +
      "  ".join(f"{k}={v*1e3:.2f}" for k, v in best.items()))
for k, v in best.items():
    if k != "xla":
        print(f"  {k} speedup vs xla: {best['xla']/v:.2f}x, "
              f"samples/s {N/v:,.0f}")

# ---- large chain count (gate check: does fused still win at 16k chains?) --
big = {}
config.GIBBS_FUSED = False
big["xla"] = ProductSampler(dens, n_out=16384, n_iter=5)
config.GIBBS_FUSED = True
config.GIBBS_FUSED_WIDTH = 128
big["fused128"] = ProductSampler(dens, n_out=16384, n_iter=5)
config.GIBBS_FUSED = "auto"
gbest = {}
for name, s in big.items():
    try:
        s.sample(key)
        gbest[name] = 1e9
    except Exception as e:
        print(f"big {name}: FAILED {type(e).__name__}: {e}", flush=True)
for r in range(6):
    for name in list(gbest):
        s = big[name]
        ks = jax.random.split(jax.random.PRNGKey(500 + r), 4)
        t0 = time.perf_counter()
        outs_r = [s.sample(k) for k in ks]
        acc = sum(jnp.sum(p[:, :1]) for p, _ in outs_r)
        float(acc)
        gbest[name] = min(gbest[name], (time.perf_counter() - t0) / 4)
    print(f"big16k round {r}: " +
          "  ".join(f"{k} {16384/v:,.0f} samples/s" for k, v in gbest.items()),
          flush=True)

# ---- batched-sets headline (B=4 as BENCH r2; B=8 in case the fused
# engine shifts the optimum) ----
B = 4
sets = [[kde(rng.normal(size=(d, N)), np.full((d,), 0.35)) for _ in range(2)]
        for _ in range(B)]
sets8 = sets + [[kde(rng.normal(size=(d, N)), np.full((d,), 0.35))
                 for _ in range(2)] for _ in range(4)]
bb = {}
config.GIBBS_FUSED = False
bb["xla"] = BatchedProductSampler(sets, n_out=N, n_iter=5)
config.GIBBS_FUSED = True
config.GIBBS_FUSED_WIDTH = 128
bb["fused128"] = BatchedProductSampler(sets, n_out=N, n_iter=5)
bb["fused128xB8"] = BatchedProductSampler(sets8, n_out=N, n_iter=5)
config.GIBBS_FUSED = "auto"

bsize = {"xla": B, "fused128": B, "fused128xB8": 8}
bbest = {}
for name, s in bb.items():
    try:
        s.sample(key)
    except Exception as e:
        print(f"batched {name}: FAILED {type(e).__name__}: {e}", flush=True)
        continue
    bbest[name] = 1e9
for r in range(8):
    for name in list(bbest):
        s = bb[name]
        ks = jax.random.split(jax.random.PRNGKey(100 + r), REP)
        t0 = time.perf_counter()
        outs_r = [s.sample(k) for k in ks]
        acc = sum(jnp.sum(p[:, :, :1]) for p, _ in outs_r)
        float(acc)
        bbest[name] = min(bbest[name], (time.perf_counter() - t0) / REP)
    print(f"batched round {r}: " +
          "  ".join(f"{k} {bsize[k]*N/v:,.0f} samples/s"
                    for k, v in bbest.items()), flush=True)

print("\nBATCHED headline: " +
      "  ".join(f"{k}={bsize[k]*N/v:,.0f} samples/s"
                for k, v in bbest.items()))

# ---- end-to-end `*` latency (device-resident product + LOOCV refit) -------
from kde_tpu import product

dd = [kde(jnp.asarray(rng.normal(size=(d, N)), jnp.float32), [0.1]),
      kde(jnp.asarray(rng.normal(size=(d, N)) + 0.5, jnp.float32), [0.1])]

def star(s):
    pq = product(dd, key=jax.random.PRNGKey(s))
    return float(jnp.sum(pq.points) + jnp.sum(pq.bw))

sbest = {}
for name, flag in (("xla", False), ("fused128", True)):
    config.GIBBS_FUSED = flag
    if flag:
        config.GIBBS_FUSED_WIDTH = 128
    star(0)                                           # warmup/compile
    sbest[name] = 1e9
config.GIBBS_FUSED = "auto"
for r in range(6):
    for name, flag in (("xla", False), ("fused128", True)):
        config.GIBBS_FUSED = flag
        t0 = time.perf_counter()
        for i in range(4):
            star(100 * r + i + 1)
        sbest[name] = min(sbest[name], (time.perf_counter() - t0) / 4)
    config.GIBBS_FUSED = "auto"
    print(f"star round {r}: " + "  ".join(f"{k} {v*1e3:.1f}ms"
                                          for k, v in sbest.items()),
          flush=True)
print("\nEND-TO-END `*` (ms): " +
      "  ".join(f"{k}={v*1e3:.1f}" for k, v in sbest.items()))

from kde_tpu.ops import gibbs_fused
print("fused_k per sampler:",
      {k: getattr(s, "_fused_k", "?") for k, s in samplers.items() if s})
print("fused fallback fired:", gibbs_fused._FUSED_BROKEN)
