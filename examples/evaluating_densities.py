"""Evaluating fitted densities at query points
(reference examples/EvaluatingDensities.jl)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from kde_tpu import kde

rng = np.random.default_rng(0)

# 1-D: vector of evaluation points
p1 = kde(rng.normal(size=(1, 100)))
y = np.asarray(p1.evaluate(np.arange(-2.0, 2.1, 0.1)))
print("1D eval:", np.round(y[:4], 5), "...")

# 3-D: column-per-point matrix
p3 = kde(rng.normal(size=(3, 75)))
v = np.array([[0.0, 1.0], [0.0, 0.0], [0.0, 0.0]])
print("3D eval at origin & (1,0,0):", np.round(np.asarray(p3.evaluate(v)), 5))
