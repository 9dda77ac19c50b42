"""Benchmark: the BASELINE.json headline plus the five reference configs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "configs"}.
The headline (top-level) fields are the BASELINE.json metric -- product
samples/s on the 2x1000-component 2-D KDE product, Niter=5 -- and "configs"
carries the five BASELINE.json workloads (the reference README/test
examples), each with its own completion-forced TPU number and measured
serial-CPU baseline ratio.

The baseline is measured here (the reference publishes no numbers and Julia
is not in this image; see BASELINE.md): a chain-serial NumPy implementation
with vectorized inner loops -- the same chain-at-a-time schedule as the
reference's `for s in 1:Np` loop (reference src/MSGibbs01.jl:581) -- plus a
serial NumPy golden-search LOOCV for the fit-path configs (reference
src/CrossValidation.jl:44-120).

TIMING HONESTY (see BASELINE.md): on the axon remote-TPU runtime,
jax.block_until_ready returns at dispatch-journal acceptance, NOT device
completion; every TPU window below is fenced by reducing outputs to a
scalar and fetching it inside the timed region.  Throughput configs queue
many calls per fence (pipelined dispatch).  The measured per-call time
decomposes as t_dev + RTT/reps where RTT is the ~30 ms blocking-fetch
round trip of the fence itself (measured sweep, BASELINE.md round-4
notes: the 4-D `*` flow reads 9.7 ms/flow at reps=3 and asymptotes to
3.2 ms by reps=48), so each config's reps is sized to keep the fence
share under ~15% of t_dev -- under-queuing would charge the tunnel's
fetch latency to the framework.  Best-of-N rounds damp congestion.
"""

import json
import os
import sys
import time

import numpy as np

N_COMP = 1000       # headline: components per density (2x1000-comp)
N_OUT = 1000        # headline: product samples per product
N_ITER = 5          # reference Niter for `*` (src/MSGibbs01.jl:724)
PRODUCTS_PER_CALL = 6
BASELINE_SAMPLES = 50

_GOLD_C = (3.0 - np.sqrt(5.0)) / 2.0
_GOLD_R = 1.0 - _GOLD_C


def _serial_loo_entropy(x, w, var):
    """N^2 LOO entropy of a 1-D KDE (reference nLOO_LL core,
    src/CrossValidation.jl:15-24 via src/DualTree01.jl:450-508).  f32
    arithmetic and a blocked sweep keep the working set cache-resident --
    the serial baseline is given its best shot."""
    n = x.size
    xf = x.astype(np.float32)
    wf = w.astype(np.float32)
    inv = np.float32(-0.5 / var)
    norm = np.float32(1.0 / np.sqrt(2.0 * np.pi * var))
    p_loo = np.empty(n, dtype=np.float32)
    blk = 2048
    for i0 in range(0, n, blk):
        d2 = (xf[i0:i0 + blk, None] - xf[None, :]) ** 2
        kern = np.exp(inv * d2)
        kern[np.arange(i0, min(i0 + blk, n)) - i0,
             np.arange(i0, min(i0 + blk, n))] = 0.0
        p_loo[i0:i0 + blk] = kern @ wf
    p_loo = p_loo * norm / (1.0 - wf)
    return -np.sum(wf * np.log(p_loo))


def _serial_golden(f, ax, bx, cx, tol=1e-2):
    """Scalar golden-section search (reference src/CrossValidation.jl:44-98)."""
    x0, x3 = ax, cx
    if abs(cx - bx) > abs(bx - ax):
        x1, x2 = bx, bx + _GOLD_C * (cx - bx)
    else:
        x1, x2 = bx - _GOLD_C * (bx - ax), bx
    f1, f2 = f(x1), f(x2)
    while abs(x3 - x0) > tol * (abs(x1) + abs(x2)):
        if f2 < f1:
            x0, x1, x2 = x1, x2, _GOLD_R * x2 + _GOLD_C * x3
            f1, f2 = f2, f(x2)
        else:
            x3, x2, x1 = x2, x1, _GOLD_R * x1 + _GOLD_C * x0
            f2, f1 = f1, f(x1)
    return x1 if f1 < f2 else x2


def _serial_loocv_bw(pts_nd, w):
    """Per-dim serial LOOCV bandwidths (reference ksize loop,
    src/KDE01.jl:17-23 + src/CrossValidation.jl:110-120)."""
    from kde_tpu.ops.balltree import build_balltree, neighbor_min_max
    n, d = pts_nd.shape
    out = np.empty(d)
    for k in range(d):
        tree = build_balltree(pts_nd[:, k:k + 1], w)
        minm, maxm = neighbor_min_max(tree)
        base = (minm + maxm) / 2.0
        x = pts_nd[:, k]
        f = lambda a: _serial_loo_entropy(x, w, (base * a) ** 2)
        amin = _serial_golden(f, 2 * minm / (minm + maxm), 1.0,
                              2 * maxm / (minm + maxm))
        out[k] = base * amin
    return out


def _serial_flow_1d(x, n_eval=200, n_res=75):
    """Serial config-1 flow: LOOCV fit + evaluate + lcv-resample
    (``n_res=0`` skips the resample refit)."""
    n = x.size
    w = np.full(n, 1.0 / n)
    bw = _serial_loocv_bw(x[:, None], w)[0]
    grid = np.linspace(x.min(), x.max(), n_eval)
    d2 = (grid[:, None] - x[None, :]) ** 2
    vals = (np.exp(-0.5 * d2 / bw ** 2)
            / np.sqrt(2 * np.pi * bw * bw)) @ w
    if n_res:
        rng = np.random.default_rng(0)
        idx = np.searchsorted(np.cumsum(w), np.sort(rng.uniform(size=n_res)))
        xr = x[np.clip(idx, 0, n - 1)] + bw * rng.standard_normal(n_res)
        wr = np.full(n_res, 1.0 / n_res)
        _serial_loocv_bw(xr[:, None], wr)
    return vals


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from kde_tpu import kde, prod_appx_ms_gibbs, product
    from kde_tpu.ops.sampling import resample
    from kde_tpu.reference_impl import serial_gibbs_product_fast

    dtype = jnp.float32
    fence = lambda *xs: float(np.asarray(sum(jnp.sum(v) for v in xs)))
    results = []

    # TPU configs register as ARMS and their timed windows run round-robin
    # (every arm measured once per round, best-of-rounds per arm): a
    # multi-minute tunnel-congestion episode then degrades one ROUND of
    # every config instead of every round of one config, so the recorded
    # BENCH snapshot measures the device, not the tunnel weather
    # (BASELINE.md round-4 congestion-spread note: config-at-a-time runs
    # spread 60-103x on cfg 4 across four same-day runs).
    arms = []

    def tpu_arm(fn, reps=48, per_call=1):
        """Register a pipelined arm: each window queues `reps` calls with
        distinct seeds behind one completion fence; returns a handle whose
        .rate is the best units/s across rounds (units = per_call)."""
        fence(fn(0))                                  # warmup/compile
        arm = {"fn": fn, "reps": reps, "per_call": per_call, "rate": 0.0}
        arms.append(arm)
        return arm

    def run_arms(rounds=8):
        for r in range(rounds):
            for arm in arms:                          # interleave configs
                t0 = time.perf_counter()
                outs = [arm["fn"](1000 * r + i + 1)
                        for i in range(arm["reps"])]
                fence(*outs)
                arm["rate"] = max(
                    arm["rate"],
                    arm["per_call"] * arm["reps"]
                    / (time.perf_counter() - t0))

    def cpu_best(fn, rounds=3):
        best = 1e9
        for r in range(rounds):
            t0 = time.perf_counter()
            fn(r)
            best = min(best, time.perf_counter() - t0)
        return best

    rng = np.random.default_rng(0)

    # --- headline: 2x1000-comp 2-D product (BASELINE.json metric) -----------
    pts_a = rng.normal(size=(2, N_COMP))
    pts_b = rng.normal(size=(2, N_COMP)) + 0.5
    dens = [kde(pts_a, [0.1], dtype=dtype), kde(pts_b, [0.1], dtype=dtype)]
    trees = [p.tree for p in dens]
    # The serving form: PRODUCTS_PER_CALL independent draws of the same
    # product per dispatch via the batched-sets engine (the vmapped-sets
    # program measures ~30% faster than one (PRODUCTS*N_OUT)-chain call of
    # the same total work; chains are iid given the stream either way).
    # B=6 per dispatch: interleaved sweeps at honest queue depths read
    # B=6 (835k) ~ B=7 > B=4-5 (807-814k) >> B=8 (568k, spill) -- round 4,
    # superseding round 2's B=4 pick made at fence-dominated depths.
    from kde_tpu import BatchedProductSampler
    sampler = BatchedProductSampler([dens] * PRODUCTS_PER_CALL, n_out=N_OUT,
                                    n_iter=N_ITER)
    n_call = N_OUT * PRODUCTS_PER_CALL
    headline = tpu_arm(lambda s: sampler.sample(jax.random.PRNGKey(s))[0],
                       reps=80, per_call=n_call)
    # sanity on one product block
    chk = np.asarray(prod_appx_ms_gibbs(N_OUT, dens, n_iter=N_ITER,
                                        key=jax.random.PRNGKey(1))[0])
    assert np.all(np.isfinite(chk)) and np.abs(chk).max() < 10.0

    # --- scale row: 2x50,000-comp 2-D product (BASELINE.md scale envelope) --
    # The HBM-bound regime: per-sample work is O(N) at the leaf level, so at
    # 50k components the level stages are [chains, 50k] ~ 50 MB and the
    # program runs at the bandwidth roofline instead of the dispatch-latency
    # floor.  Continuously measured here so the envelope claim stays a
    # recorded number (VERDICT r3 task 6).  select="auto" size-routes this
    # (256 chains, 50k width) to the blocked inverse-CDF form -- measured
    # 2.06x the flat chain (round-5 grid, BASELINE.md).
    n_big = 50_000
    big = [kde(rng.normal(size=(2, n_big)).astype(np.float32),
               [float(1.06 * n_big ** -0.2)], dtype=dtype),
           kde((rng.normal(size=(2, n_big)) + 0.5).astype(np.float32),
               [float(1.06 * n_big ** -0.2)], dtype=dtype)]
    n_out_big = 256
    arm_big = tpu_arm(
        lambda s: prod_appx_ms_gibbs(n_out_big, big, n_iter=N_ITER,
                                     key=jax.random.PRNGKey(s))[0],
        reps=12, per_call=n_out_big)

    # --- config 1: 1-D LOOCV fit + evaluate + resample (README.md:36-38) ----
    x1d = np.concatenate([rng.normal(size=50), 10.0 + 2.0 * rng.normal(size=50)])
    grid = np.linspace(x1d.min(), x1d.max(), 200)

    def flow1(s):
        # NumPy input routes the whole flow through the size-gated HOST fast
        # path (ops/host_small.py): f64 golden-search fit, host evaluate,
        # host CDF-draw resample + host refit.  Small-N flows are pure
        # dispatch latency on the axon runtime (~30x slower than serial CPU
        # in round 2); the framework's answer is to never touch the device.
        p = kde(x1d[None, :])
        v = p(grid)
        r = resample(p, 75, "lcv", key=int(s))
        # everything already materialized host-side; the sums ARE the fence
        return (float(np.sum(v)) + float(np.sum(r.host_points()))
                + float(np.sum(r.host_bw_std())))
    flow1(0)                                          # warmup
    assert isinstance(kde(x1d[None, :])(grid), np.ndarray)  # host path active
    t_best = 1e9
    for r in range(6):
        t0 = time.perf_counter()
        for i in range(20):
            flow1(20 * r + i)
        t_best = min(t_best, (time.perf_counter() - t0) / 20)
    rate1 = 1.0 / t_best

    # companion at N=10k (fit + evaluate): the regime where the N^2 LOOCV
    # entropy is real work -- the reference's own examples stay at N<=300
    # because the serial N^2 golden search does not scale
    x10k = np.concatenate([rng.normal(size=5000),
                           10.0 + 2.0 * rng.normal(size=5000)])
    grid10k = np.linspace(x10k.min(), x10k.max(), 200)

    def flow10k(s):
        p = kde(jnp.asarray(x10k[None, :], dtype=dtype))
        return jnp.sum(p(grid10k)) + jnp.sum(p.bw)
    arm_10k = tpu_arm(flow10k, reps=4, per_call=1)

    # --- config 2: 2-D product of two 100-comp KDEs (README.md:56-61) -------
    d100 = [kde(rng.normal(size=(2, 100)), [0.2], dtype=dtype),
            kde(rng.normal(size=(2, 100)) + 0.5, [0.2], dtype=dtype)]
    arm_c2 = tpu_arm(
        lambda s: prod_appx_ms_gibbs(100, d100, n_iter=5,
                                     key=jax.random.PRNGKey(s))[0],
        per_call=100)

    # --- config 3: Beta x Rayleigh 1-D product (README.md:76-80) ------------
    beta = rng.beta(1.0, 0.45, size=300)
    rayl = rng.rayleigh(0.5, size=100) - 0.5
    pb = kde(jnp.asarray(beta[None, :], dtype=dtype))        # LOOCV fits
    pr = kde(jnp.asarray(rayl[None, :], dtype=dtype))
    arm_c3 = tpu_arm(
        lambda s: prod_appx_ms_gibbs(100, [pb, pr], n_iter=5,
                                     key=jax.random.PRNGKey(s))[0],
        per_call=100)

    # --- config 4: 4-D multimodal end-to-end `*` (README.md:91-97) ----------
    n4 = 200
    pts4 = np.vstack([2 * rng.normal(size=(1, n4)) + 3,
                      np.concatenate([2 * rng.normal(size=n4 // 2) + 3,
                                      2 * rng.normal(size=n4 // 2) - 3])[None],
                      2 * rng.normal(size=(2, n4)) + 3])
    p4 = kde(jnp.asarray(rng.normal(size=(4, 100)), dtype=dtype))
    q4 = kde(jnp.asarray(pts4, dtype=dtype))
    n_out4 = 150

    def star4(s):
        pq = product([p4, q4], key=jax.random.PRNGKey(s))
        return jnp.sum(pq.points) + jnp.sum(pq.bw)
    # throughput form: queue several end-to-end `*` flows per completion
    # fence (the metric is samples/s; fencing every call would measure the
    # ~30 ms axon fetch RTT, not the framework -- BASELINE.md "pipelining
    # vs the fetch RTT").  The serial baseline needs no such treatment:
    # the CPU has no dispatch round trip to hide.
    arm_c4 = tpu_arm(star4, reps=24, per_call=n_out4)

    # --- config 5: partial/consensus product, 1000 comps each ---------------
    # (test/testPartialProd.jl:41-53 at consensus scale, ConsensusExample.jl)
    m1 = kde(np.vstack([rng.uniform(0, 10, 1000),
                        rng.normal(size=1000) * 5]), [0.5, 8.0], dtype=dtype)
    m2 = kde(np.vstack([rng.normal(size=1000) * 5,
                        rng.uniform(-10, 0, 1000)]), [8.0, 0.5], dtype=dtype)
    m3 = kde(np.vstack([rng.uniform(0, 10, 1000),
                        rng.uniform(-10, 0, 1000)]), [0.5, 0.5], dtype=dtype)
    mask = [[1, 0], [0, 1], [1, 1]]
    arm_c5 = tpu_arm(
        lambda s: prod_appx_ms_gibbs(100, [m1, m2, m3], n_iter=5,
                                     partial_dim_mask=mask,
                                     key=jax.random.PRNGKey(s))[0],
        per_call=100)
    # acceptance: samples land in the intersection box (reference :47-53)
    pc = np.asarray(prod_appx_ms_gibbs(100, [m1, m2, m3], n_iter=5,
                                       partial_dim_mask=mask,
                                       key=jax.random.PRNGKey(3))[0])
    assert np.sum((0 < pc[0]) & (pc[0] < 10)
                  & (-10 < pc[1]) & (pc[1] < 0)) > 80

    # --- every TPU config's timed windows, interleaved round-robin ----------
    run_arms(rounds=8)

    # --- serial-CPU baselines (no tunnel involved; measured after) ----------
    cpu_rate = BASELINE_SAMPLES / cpu_best(
        lambda r: serial_gibbs_product_fast(trees, BASELINE_SAMPLES, N_ITER,
                                            np.random.default_rng(r)))
    tbig = [p.tree for p in big]
    cpu_big = 4 / cpu_best(
        lambda r: serial_gibbs_product_fast(tbig, 4, N_ITER,
                                            np.random.default_rng(r)),
        rounds=2)
    cpu_t1 = cpu_best(lambda r: _serial_flow_1d(x1d))
    cpu_t10k = cpu_best(lambda r: _serial_flow_1d(x10k, n_res=0), rounds=1)
    t100 = [p.tree for p in d100]
    cpu_c2 = 100 / cpu_best(
        lambda r: serial_gibbs_product_fast(t100, 100, 5,
                                            np.random.default_rng(r)))
    tbr = [pb.tree, pr.tree]
    cpu_c3 = 100 / cpu_best(
        lambda r: serial_gibbs_product_fast(tbr, 100, 5,
                                            np.random.default_rng(r)))
    t4 = [p4.tree, q4.tree]

    def cpu4(r):
        pts, _ = serial_gibbs_product_fast(t4, n_out4, 5,
                                           np.random.default_rng(r))
        _serial_loocv_bw(pts.T, np.full(n_out4, 1.0 / n_out4))
    cpu_t4 = cpu_best(cpu4)
    tm = [m1.tree, m2.tree, m3.tree]
    cpu_c5 = 50 / cpu_best(
        lambda r: serial_gibbs_product_fast(tm, 50, 5,
                                            np.random.default_rng(r),
                                            partial_dim_mask=mask))

    def row(metric, arm, cpu_rate_, unit="samples/s"):
        return {"metric": metric, "value": round(arm["rate"], 2),
                "unit": unit, "vs_baseline": round(arm["rate"] / cpu_rate_, 2),
                "reps": arm["reps"]}

    results.append({**row("2D product 2x50000-comp Niter=5 (scale envelope)",
                          arm_big, cpu_big),
                    # round-5 semantics note: select='auto' size-routes this
                    # row to the blocked inverse-CDF form (2.06x the flat
                    # chain it used through round 4 -- BASELINE.md round-5
                    # study), so BENCH_r05+ values are not comparable to
                    # earlier rounds' for this row.
                    "select": "blocked(auto)"})
    results.append({
        "metric": "1D LOOCV fit+eval+resample (N=100, README cfg 1)",
        "value": round(rate1, 2), "unit": "flows/s",
        "vs_baseline": round(rate1 * cpu_t1, 2), "reps": 20})
    results.append(row("1D LOOCV fit+evaluate (N=10000)", arm_10k,
                       1.0 / cpu_t10k, unit="flows/s"))
    results.append(row("2D product 2x100-comp Niter=5 (README cfg 2)",
                       arm_c2, cpu_c2))
    results.append(row("1D Beta(1,.45) x Rayleigh(.5) product (README cfg 3)",
                       arm_c3, cpu_c3))
    results.append(row(
        "4D multimodal end-to-end p*q incl. LOOCV refit (README cfg 4)",
        arm_c4, n_out4 / cpu_t4))
    results.append(row("partial-dim consensus product 3x1000-comp (cfg 5)",
                       arm_c5, cpu_c5))

    print(json.dumps({
        "metric": "gibbs product samples/s (2x1000-comp 2D KDE, Niter=5)",
        "value": round(headline["rate"], 2),
        "unit": "samples/s",
        "vs_baseline": round(headline["rate"] / cpu_rate, 2),
        "reps": headline["reps"],
        # engine: the pure-XLA chain program (the round-3 fused upper-level
        # Pallas engine lost the interleaved real-TPU A/B in every regime
        # and was removed in round 4 -- tools/ab_fused_r4_output.txt)
        "engine": "xla",
        "configs": results,
    }))


if __name__ == "__main__":
    main()
