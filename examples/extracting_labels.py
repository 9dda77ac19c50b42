"""Capturing the Gibbs sampler's final label selection per sample
(reference examples/ExtractingLabels.jl): with add_entropy=False, each
product point must equal the information-weighted mean of the kernels the
labels select."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from kde_tpu import kde, prod_appx_ms_gibbs

x1 = kde(np.array([1.0, 2.0, 3.0]), [1.0])
x2 = kde(np.array([0.5, 1.5, 2.5]), [1.0])
x3 = kde(np.array([4.0, 5.0, 6.0]), [1.0])

pts, idx, labels = prod_appx_ms_gibbs(
    3, [x1, x2, x3], n_iter=5, add_entropy=False, record_labels=True)
pts, idx = np.asarray(pts), np.asarray(idx)

for s in range(3):
    mus = [float(d.get_points()[0, idx[j, s]])
           for j, d in enumerate((x1, x2, x3))]
    mu = np.mean(mus)   # equal unit bandwidths -> arithmetic mean
    print(f"sample {s}: labels={idx[:, s].tolist()} "
          f"reconstructed mu={mu:.4f} returned={pts[0, s]:.4f}")
print("per-level label record shape:", np.asarray(labels).shape)
