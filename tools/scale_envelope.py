"""Single-chip scale envelope of the Gibbs product engine (VERDICT r4 #7).

Pushes the plain (single-program) product engine toward the HBM boundary
on the real chip and records where the collective (kernel-sharded) engine
becomes the right routing:

  mem      AOT ``memory_analysis`` of the compiled product executable over
           an N grid x {cdf, gumbel}: what actually grows (temp vs args),
           and the compile-time OOM point if one exists.  No execution.
  time     completion-forced throughput at each feasible N, cdf/gumbel
           interleaved (the round-5 A/B showed gumbel 1.78x at 2x50k --
           this records where the crossover sits along N).
  sharded  kernel-sharded engine at S=1 on the real chip vs the plain
           engine at the same N (the collective formulation's overhead --
           the price paid when a product is routed to it).
  rule     fits temp-bytes = f(n_out, N_total) from the ``mem`` table and
           prints the routing-rule constants consumed by
           ``kde_tpu.parallel.product_hbm_bytes`` / ``recommend_shards``.

Timing honesty (BASELINE.md): every window is completion-forced via a
dependent scalar fetch; queue depths are sized so the ~30 ms fence RTT
stays well under 15% of device time; cdf/gumbel arms interleave round-robin
so a congestion episode cannot poison one arm.

Run: python tools/scale_envelope.py [mem|time|sharded|rule|all] (TPU host)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax                                            # noqa: E402
import jax.numpy as jnp                               # noqa: E402

from kde_tpu import kde, prod_appx_ms_gibbs           # noqa: E402

N_OUT = 256            # matches the BASELINE scale row (256-sample calls)
N_ITER = 5
D = 2
NS = (50_000, 100_000, 200_000, 400_000, 800_000)


def fence(*xs):
    return float(np.asarray(sum(jnp.sum(v) for v in xs)))


def _dens(N, seed=0):
    """Two device-resident N-component 2-D densities (device plan path --
    no host readbacks at any N)."""
    rng = np.random.default_rng(seed)
    a = kde(jnp.asarray(rng.normal(size=(D, N)), jnp.float32), [0.1])
    b = kde(jnp.asarray(rng.normal(size=(D, N)) + 0.5, jnp.float32), [0.1])
    return [a, b]


def _lowered(dens, select, n_out=N_OUT):
    """AOT-lower the keyed product executable exactly as
    prod_appx_ms_gibbs dispatches it (same statics, same plan arrays)."""
    from kde_tpu.ops import gibbs as G
    plan = G._get_plan(dens, n_out, jnp.float32,
                       G._resolve_plan_impl(dens, "auto", replay=False))
    dn, d, n_levels = plan.ndens, plan.ndim, plan.n_levels
    bu = dn * (1 + n_levels * (1 + N_ITER))
    bn = d * (n_levels + 1)
    return G._gibbs_from_key.lower(
        jax.random.PRNGKey(0), plan.lvl_arrays, plan.t_mean, plan.t_bw,
        G._full_mask_dev(dn, d), n_out=n_out, bu=bu, bn=bn,
        offsets=tuple(plan.offsets), n_iter=N_ITER, ndens=dn, ndim=d,
        n_levels=n_levels, addop=None, diffop=None, get_mu=None,
        get_lambda=None, add_entropy=True, dtype="float32", select=select)


def mem_stage(ns=NS, selects=("cdf", "gumbel")):
    rows = []
    for n in ns:
        dens = _dens(n)
        for s in selects:
            try:
                m = _lowered(dens, s).compile().memory_analysis()
                row = dict(N=n, select=s,
                           temp=int(m.temp_size_in_bytes),
                           args=int(m.argument_size_in_bytes),
                           out=int(m.output_size_in_bytes))
                print(f"N={n:>7,} select={s:6s}: temp={row['temp']:>14,}"
                      f"  args={row['args']:>13,}  out={row['out']:>11,}",
                      flush=True)
            except Exception as e:
                row = dict(N=n, select=s, error=f"{type(e).__name__}: {e}")
                print(f"N={n:>7,} select={s:6s}: COMPILE-FAIL "
                      f"{row['error'][:120]}", flush=True)
            rows.append(row)
    print("done", flush=True)
    return rows


def time_stage(ns=(100_000, 200_000, 400_000),
               selects=("cdf", "blocked", "gumbel"), rounds=6):
    dens = {n: _dens(n) for n in ns}
    arms, feasible = [], []
    for n in ns:
        ok = True
        for s in selects:
            try:            # warm (compile + first run); OOM lands here
                fence(prod_appx_ms_gibbs(N_OUT, dens[n], n_iter=N_ITER,
                                         key=jax.random.PRNGKey(0),
                                         select=s)[0])
            except Exception as e:
                print(f"N={n:>7,} select={s:6s}: RUN-FAIL "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                ok = False
        if ok:
            feasible.append(n)
            arms += [(n, s) for s in selects]
    # queue depth: ~43 ms/call at 50k and ~linear in N -> size reps so the
    # window is >= ~0.7 s (fence share < 5%) but bounded at large N
    reps_of = {n: max(2, int(0.7 / (0.043 * n / 50_000))) for n in feasible}
    best = {a: 0.0 for a in arms}
    for r in range(rounds):
        for n, s in arms:
            reps = reps_of[n]
            t0 = time.perf_counter()
            outs = [prod_appx_ms_gibbs(N_OUT, dens[n], n_iter=N_ITER,
                                       key=jax.random.PRNGKey(1000 * r + i + 1),
                                       select=s)[0] for i in range(reps)]
            fence(*outs)
            best[(n, s)] = max(best[(n, s)],
                               N_OUT * reps / (time.perf_counter() - t0))
    for n, s in arms:
        print(f"N={n:>7,} select={s:6s}: {best[(n, s)]:8.0f} samples/s  "
              f"({1e3 * N_OUT / best[(n, s)]:7.1f} ms/call, "
              f"reps={reps_of[n]})", flush=True)
    print("done", flush=True)
    return best


def sharded_stage(ns=(50_000,), rounds=6, reps=4):
    """Kernel-sharded S=1 on the real chip vs the plain engine: the
    collective formulation's overhead at scale (round-2 measured 1.30x at
    2x1000 comps; this records it at the envelope sizes)."""
    from jax.sharding import Mesh
    from kde_tpu.parallel.gibbs_kernel_sharded import (
        prod_appx_ms_gibbs_kernel_sharded)
    from kde_tpu.parallel.mesh import KERNELS
    mesh = Mesh(np.array(jax.devices()[:1]), (KERNELS,))
    for n in ns:
        dens = _dens(n)
        arms = {}
        arms["plain"] = lambda k: prod_appx_ms_gibbs(
            N_OUT, dens, n_iter=N_ITER, key=k)[0]
        arms["sharded(S=1)"] = lambda k: prod_appx_ms_gibbs_kernel_sharded(
            mesh, N_OUT, dens, n_iter=N_ITER, key=k)[0]
        for f in arms.values():
            fence(f(jax.random.PRNGKey(0)))
        best = {a: 1e9 for a in arms}
        for r in range(rounds):
            for a, f in arms.items():
                t0 = time.perf_counter()
                fence(*[f(jax.random.PRNGKey(1000 * r + i + 1))
                        for i in range(reps)])
                best[a] = min(best[a], (time.perf_counter() - t0) / reps)
        ratio = best["sharded(S=1)"] / best["plain"]
        print(f"N={n:>7,}: plain {1e3 * best['plain']:7.1f} ms/call, "
              f"sharded(S=1) {1e3 * best['sharded(S=1)']:7.1f} ms/call "
              f"({ratio:.2f}x)", flush=True)
    print("done", flush=True)


def rule_stage(ns=NS):
    """Fit temp ~ c0 + c1*(n_out*N_total) from the mem table (both engines
    share n_out=N_OUT here; the n_out scaling is exercised separately by
    the batched sampler's B sweep) and print routing constants."""
    rows = [r for r in mem_stage(ns=ns, selects=("cdf",)) if "temp" in r]
    if len(rows) >= 2:
        x = np.array([2.0 * r["N"] * N_OUT for r in rows])   # N_total*chains
        y = np.array([float(r["temp"]) for r in rows])
        c1, c0 = np.polyfit(x, y, 1)
        print(f"fit: temp_bytes ~= {c0:,.0f} + {c1:.2f} * chains*N_total",
              flush=True)
        args1, argsN = rows[0]["args"], rows[-1]["args"]
        ca = (argsN - args1) / (2.0 * (rows[-1]["N"] - rows[0]["N"]))
        print(f"fit: args_bytes  ~= {ca:.1f} per component", flush=True)
    print("done", flush=True)


STAGES = {"mem": mem_stage, "time": time_stage, "sharded": sharded_stage,
          "rule": rule_stage}

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", flush=True)
    for name, fn in STAGES.items():
        if which in (name, "all") and not (which == "all" and name == "rule"):
            print(f"# {name}", flush=True)
            fn()
