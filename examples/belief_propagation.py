"""Nonparametric belief propagation on a small chain graph.

The reference's primary downstream consumer (IncrementalInference.jl) runs
loopy NBP: every iteration multiplies, at each variable node, the incoming
message densities (Sudderth/Ihler NIPS-2003 -- the algorithm
``prodAppxMSGibbsS`` implements, reference src/MSGibbs01.jl:668-669).
This demo runs synchronous NBP on a 1-D chain of position variables
x0 -- x1 -- x2 with pairwise "offset by ~delta" potentials and a unary
measurement at each end, using ``BatchedProductSampler`` to draw every
node's message product in ONE device dispatch per iteration.

Run: python examples/belief_propagation.py
"""
import os
import sys

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from kde_tpu import BatchedProductSampler, kde

N = 128            # kernels per message
DELTA = 5.0        # true offset between neighboring variables
rng = np.random.default_rng(0)

# unary evidence: x0 measured near 0, x2 measured near 2*DELTA
prior_x0 = kde(rng.normal(0.0, 0.6, size=(1, N)), [0.5], dtype=np.float32)
prior_x2 = kde(rng.normal(2 * DELTA, 0.6, size=(1, N)), [0.5],
               dtype=np.float32)


def shift(msg, delta, key):
    """Propagate a belief through the pairwise potential x_j = x_i + delta
    (+ process noise): shift the kernel centers ON DEVICE -- the whole NBP
    loop stays device-resident (device-built product plans; no readbacks
    until the final diagnostics)."""
    noise = 0.3 * jax.random.normal(key, msg.get_points().shape,
                                    dtype=msg.points.dtype)
    return kde(msg.get_points() + delta + noise, [0.6])


# initialize beliefs with the priors (x1 starts diffuse between them)
belief = [prior_x0,
          kde(rng.uniform(-2, 2 * DELTA + 2, size=(1, N)), [2.0],
              dtype=np.float32),
          prior_x2]

mean_trace = []
for it in range(3):
    # messages into each node from its neighbors (+ unary where present)
    ks = jax.random.split(jax.random.PRNGKey(100 + it), 4)
    sets = [
        [prior_x0, shift(belief[1], -DELTA, ks[0])],                 # into x0
        [shift(belief[0], +DELTA, ks[1]),
         shift(belief[2], -DELTA, ks[2])],                           # into x1
        [prior_x2, shift(belief[1], +DELTA, ks[3])],                 # into x2
    ]
    sampler = (BatchedProductSampler(sets, n_out=N, n_iter=5)
               if it == 0 else sampler)
    if it > 0:
        sampler.refresh(sets)        # same shapes: no recompilation; the
                                     # device-resident message sets rebuild
                                     # all plans in one vmapped dispatch
    pts, _ = sampler.sample(jax.random.PRNGKey(it))
    belief = [kde(pts[i], [0.5]) for i in range(3)]   # device-resident
    # keep the diagnostics on device too -- a mid-loop fetch would trigger
    # the documented D2H dispatch cliff; means are read back after the loop
    mean_trace.append([b.points.mean() for b in belief])

for it, ms in enumerate(mean_trace):
    means = [float(np.asarray(m)) for m in ms]
    print(f"iter {it}: belief means = "
          + ", ".join(f"x{i}={m:6.2f}" for i, m in enumerate(means)))

assert abs(means[0] - 0.0) < 1.5
assert abs(means[1] - DELTA) < 2.0
assert abs(means[2] - 2 * DELTA) < 1.5
print("NBP converged to the expected chain geometry.")
