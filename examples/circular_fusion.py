"""On-manifold density fusion: products of angular (S^1) beliefs.

The robotics NBP use case the manifold hooks exist for (reference threads
addop/diffop/getMu/getLambda through every layer, src/MSGibbs01.jl:672-675):
two heading estimates concentrated just either side of +/-pi.  A Euclidean
product would put the fused mass near 0 -- the opposite side of the circle;
the circular hooks wrap correctly, and since round 3 the hooks ride on the
densities themselves, so the plain `*` operator stays on-manifold.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from kde_tpu import kde, manifolds

CIRC = dict(addop=(manifolds.circular_add,),
            diffop=(manifolds.circular_diff,),
            get_mu=(manifolds.circular_mu,),
            get_lambda=(manifolds.circular_lambda,))


def wrap(a):
    return a - 2 * np.pi * np.round(a / (2 * np.pi))


rng = np.random.default_rng(0)
# two heading beliefs straddling the +/-pi wrap point
a = wrap(np.pi - 0.2 + 0.05 * rng.normal(size=(1, 200)))
b = wrap(-np.pi + 0.2 + 0.05 * rng.normal(size=(1, 200)))
pa = kde(a, [0.1], **CIRC)
pb = kde(b, [0.1], **CIRC)

fused = pa * pb                       # hooks flow through the Gibbs engine
pts = np.asarray(fused.get_points())[0]
dist_to_pi = np.abs(wrap(pts - np.pi))
print(f"fused heading: median distance to pi = {np.median(dist_to_pi):.3f} rad "
      f"(Euclidean product would sit near 0: "
      f"{np.mean(np.abs(pts) < 1.0):.0%} of mass there)")
assert np.median(dist_to_pi) < 0.5
print("output density carries the circular hooks:",
      fused.addop[0] is manifolds.circular_add)
