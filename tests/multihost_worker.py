"""Worker process for the 2-process ``jax.distributed`` test (not a test).

Launched by tests/test_multihost.py as ``python multihost_worker.py <pid>
<nproc> <port>``.  Each process owns 2 virtual CPU devices and joins a gloo
collective world, so the 4-device global mesh spans a real process boundary
-- the closest single-machine analogue of a multi-host TPU pod
(SURVEY §5 distributed-backend note; VERDICT r1 #6).

Verifies, across the process boundary:
  1. the chain-sharded keyed product equals the single-process product with
     the same key (chunk-exact on this process's addressable shards);
  2. the kernel/component-sharded product with injected replay streams is
     trace-exact vs the serial oracle (its psum/all_gather label-CDF
     reductions run over gloo between the two processes);
  3. the cross-process moment diagnostics (all-reduce) match.
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
assert len(jax.devices()) == 2 * nproc, jax.devices()
assert len(jax.local_devices()) == 2

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from kde_tpu import kde, prod_appx_ms_gibbs  # noqa: E402
from kde_tpu.parallel import (CHAINS, KERNELS,  # noqa: E402
                              prod_appx_ms_gibbs_kernel_sharded,
                              prod_appx_ms_gibbs_sharded)
from kde_tpu.reference_impl import serial_gibbs_product  # noqa: E402

rng = np.random.default_rng(7)
dens = [kde(rng.normal(size=(2, 8)), [0.3]),
        kde(rng.normal(size=(2, 8)) + 0.5, [0.4])]
n_out, n_iter = 8, 1

# --- 1. chain-sharded keyed product across both processes -------------------
mesh = Mesh(np.array(jax.devices()), (CHAINS,))
key = jax.random.PRNGKey(0)
pts, idx = prod_appx_ms_gibbs_sharded(mesh, n_out, dens, n_iter=n_iter,
                                      key=key)
# expected: the unsharded keyed product (local, single device) -- same key,
# same fused stream generation, so chunk-exact equality is required
e_pts, e_idx = prod_appx_ms_gibbs(n_out, dens, n_iter=n_iter, key=key)
e_pts, e_idx = np.asarray(e_pts), np.asarray(e_idx)
for shard in pts.addressable_shards:
    np.testing.assert_array_equal(np.asarray(shard.data), e_pts[shard.index])
for shard in idx.addressable_shards:
    np.testing.assert_array_equal(np.asarray(shard.data), e_idx[shard.index])

# --- 2. kernel-axis-sharded replay product across both processes ------------
kmesh = Mesh(np.array(jax.devices()), (KERNELS,))
L = int(np.floor(np.log2(8))) + 1
bu = n_out * 2 * (1 + L * (1 + n_iter))
bn = n_out * 2 * (L + 1)
sr = np.random.default_rng(11)
ru, rn = sr.uniform(size=bu), sr.normal(size=bn)
s_pts, s_idx, _ = serial_gibbs_product([p.tree for p in dens], n_out, n_iter,
                                       ru, rn)
k_pts, k_idx = prod_appx_ms_gibbs_kernel_sharded(
    kmesh, n_out, dens, n_iter=n_iter, rand_u=ru, rand_n=rn)
# outputs are replicated over the kernels axis -> fully addressable
np.testing.assert_array_equal(np.asarray(k_idx), s_idx)
np.testing.assert_allclose(np.asarray(k_pts), s_pts, rtol=1e-9, atol=1e-12)

# --- 3. cross-process moment diagnostics (all-reduce) -----------------------
_, _, diag = prod_appx_ms_gibbs_sharded(mesh, n_out, dens, n_iter=n_iter,
                                        key=key, diagnostics=True)
np.testing.assert_allclose(np.asarray(diag["mean"]), e_pts.mean(axis=1),
                           rtol=1e-9)

print(f"MULTIHOST_OK {pid}")
