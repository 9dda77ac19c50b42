"""On-TPU statistical validation of the f32 Gibbs product engine.

Runs the reference's Monte-Carlo acceptance grid (test/runtests.jl:167-201:
product moments within coarse analytic brackets, majority vote over 10
trials) directly against the TPU float32 engine -- the hermetic test suite
runs on CPU/float64, so this is the evidence that accelerator precision
doesn't degrade sampling quality.  Measured 2026-08-16: 10/10 on every
config (the reference itself only requires 5/10).

Run: python tools/validate_tpu.py   (on a TPU-attached host)

Writes the results to VALIDATE_TPU.json at the repo root (the recorded
artifact the prose claims in BASELINE.md point at).
"""
import datetime
import json
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from kde_tpu import kde, prod_appx_ms_gibbs

def test_prods(key, D=3, M=6, N=100, n=100, dev=1.0, mcmc=5, plan="host"):
    # full reference grid (test/runtests.jl:189-201) on the f32 TPU engine
    keys = jax.random.split(key, M + 1)
    rng = np.random.default_rng(int(jax.random.randint(keys[0], (), 0, 2**31 - 1)))
    dens = [kde(dev * rng.normal(size=(D, N)), dtype=jnp.float32) for _ in range(M)]
    pts, _ = prod_appx_ms_gibbs(n, dens, n_iter=mcmc, key=keys[-1], plan=plan)
    pts = np.asarray(pts)
    prod_dev = np.sqrt(dev ** (2 * M) / (M * dev ** 2))
    t1 = np.linalg.norm(pts.mean(axis=1)) < 1.0 * prod_dev
    t2 = all(0.66 * prod_dev < pts[i].std() < 1.33 * prod_dev for i in range(D))
    return t1 and t2

print("backend:", jax.default_backend(), flush=True)
ok = True
rows = []
for cfg in [dict(D=2, M=2), dict(D=2, M=4), dict(D=2, M=6),
            dict(D=3, M=6, mcmc=10), dict(D=4, M=6, n=200, mcmc=10),
            dict(D=3, M=5, N=300), dict(D=2, M=7, n=300),
            dict(D=3, M=2, mcmc=100)]:
    for plan in ("host", "device"):
        keys = jax.random.split(jax.random.PRNGKey(17), 10)
        wins = int(sum(test_prods(k, plan=plan, **cfg) for k in keys))
        ok &= wins >= 5
        rows.append({**cfg, "plan": plan, "wins": wins, "of": 10})
        print(f"{cfg} plan={plan}: {wins}/10 trials passed (need >=5)",
              flush=True)
out = {"date": datetime.date.today().isoformat(),
       "backend": jax.default_backend(),
       "dtype": "float32", "threshold": "wins >= 5 of 10",
       "results": rows, "pass": bool(ok)}
root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
with open(os.path.join(root, "VALIDATE_TPU.json"), "w") as f:
    json.dump(out, f, indent=1)
print("PASS" if ok else "FAIL")
