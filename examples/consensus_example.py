"""Consensus fusion of several measurement densities
(reference examples/ConsensusExample.jl): a broad prior fused with two- and
three-way products, here on a sharded multi-device mesh when available."""
import os
import sys

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from kde_tpu import kde, prod_appx_ms_gibbs, resample
from kde_tpu.parallel.mesh import make_mesh
from kde_tpu.parallel.product import prod_appx_ms_gibbs_sharded

p = resample(kde(np.array([0.0]), [10.0]), 300)          # broad prior
q = resample(kde(np.array([-8.0, 13.0]), [1.5]), 300)    # bimodal evidence
r = resample(kde(np.array([-35.0, -11.0, 26.0]), [2.5]), 300)

pq = p * q
print("p*q modes (sample mean):", float(np.asarray(pq.get_points()).mean()))

if len(jax.devices()) > 1:
    mesh = make_mesh()
    pgm, _ = prod_appx_ms_gibbs_sharded(mesh, 300, [p, q, r], n_iter=5)
    print(f"sharded 3-way consensus over {len(mesh.devices.flat)} devices")
else:
    pgm, _ = prod_appx_ms_gibbs(300, [p, q, r], n_iter=5)
pqr = kde(np.asarray(pgm))
print("p*q*r support:", np.round([float(np.asarray(pgm).min()),
                                  float(np.asarray(pgm).max())], 2))
