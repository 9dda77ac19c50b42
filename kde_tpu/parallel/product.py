"""Chain-sharded Gibbs products.

The Gibbs chains of a KDE product are statistically independent given their
random streams (SURVEY §2 parallelism call-out), so the product scales by
sharding the chain axis of the pre-generated uniform/normal streams across
the mesh; the per-density tree/level arrays are replicated.  XLA's SPMD
partitioner splits the vmapped chain kernel with zero communication until the
optional moment diagnostics, which are global ``mean``s (all-reduce over
``chains``).

Multi-host: initialize with :func:`initialize_multihost`, build the mesh over
``jax.devices()`` (all hosts), and call :func:`prod_appx_ms_gibbs_sharded`
with the same arguments on every process.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..density import KDE, kde
from ..ops import gibbs as _g
from ..utils.random import ensure_key
from .mesh import CHAINS, chains_sharding, pad_to_multiple


def prod_appx_ms_gibbs_sharded(mesh: Mesh,
                               n_out: int,
                               densities: Sequence[KDE],
                               n_iter: int = 3,
                               add_entropy: bool = True,
                               partial_dim_mask=None,
                               key=None,
                               diagnostics: bool = False,
                               dtype=None):
    """Sharded version of :func:`kde_tpu.prod_appx_ms_gibbs`: chains are
    distributed across ``mesh``'s ``chains`` axis.  ``n_out`` is padded up to
    a multiple of the axis size; the pad chains are computed and discarded.

    Returns ``(points [d, n_out], indices [ndens, n_out])`` and, with
    ``diagnostics``, a dict of cross-device moment reductions.
    """
    densities = list(densities)
    if dtype is None:
        dtype = densities[0].dtype      # property: no lazy device upload
    # density-attached manifold hooks flow exactly as product() does (same
    # per-dim quadruple consistency rule; the chain kernel applies them
    # elementwise, which shards over chains unchanged)
    addop, diffop, get_mu, get_lambda = _g._density_hooks(densities)
    # device-resident densities (e.g. a previous product's output) take the
    # device-built plan -- the host builder would read their points back
    impl = _g._resolve_plan_impl(densities, "auto", replay=False)
    plan = _g._get_plan(densities, n_out, dtype, impl)
    dn, d, n_levels = plan.ndens, plan.ndim, plan.n_levels

    if partial_dim_mask is None:
        mask = jnp.ones((dn, d), dtype=bool)
    else:
        mask = jnp.asarray(np.asarray(partial_dim_mask, bool).reshape(dn, d))

    axis = mesh.shape[CHAINS]
    n_pad = pad_to_multiple(n_out, axis)
    bu = dn * (1 + n_levels * (1 + n_iter))
    bn = d * (n_levels + 1)
    key = ensure_key(key)
    ku, kn = jax.random.split(key)
    u = jax.random.uniform(ku, (n_pad, bu), dtype=dtype)
    n_ = jax.random.normal(kn, (n_pad, bn), dtype=dtype)

    sh = chains_sharding(mesh)
    u = jax.device_put(u, sh)
    n_ = jax.device_put(n_, sh)

    pts, idx, _ = _g._gibbs_all_chains(
        u, n_, plan.lvl_arrays, plan.t_mean, plan.t_bw, mask,
        offsets=tuple(plan.offsets),
        n_iter=n_iter, ndens=dn, ndim=d, n_levels=n_levels,
        addop=addop, diffop=diffop, get_mu=get_mu, get_lambda=get_lambda,
        add_entropy=add_entropy)

    out = (pts[:n_out].T, idx[:n_out].T)
    if diagnostics:
        # cross-device reductions (all-reduce over the chain shards)
        diag = jax.jit(lambda p: {
            "mean": jnp.mean(p, axis=0),
            "std": jnp.std(p, axis=0),
        })(pts[:n_out])
        out = out + (diag,)
    return out


def product_sharded(mesh: Mesh, densities: Sequence[KDE], n_iter: int = 5,
                    key=None) -> KDE:
    """Sharded ``*`` operator: Gibbs product + LOOCV refit.

    The samples stay on device end-to-end (the refit runs the device LOOCV
    path, as the single-device ``product()`` does): an ``np.asarray`` here
    would be the documented process-wide dispatch-degrading readback."""
    n_out = int(round(float(np.mean([p.npts for p in densities]))))
    pts, _ = prod_appx_ms_gibbs_sharded(mesh, n_out, densities,
                                        n_iter=n_iter, key=key)
    return kde(pts)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host initialization (``jax.distributed``); after this,
    ``jax.devices()`` spans all hosts and the mesh helpers shard globally.
    No-op when JAX auto-detects the environment (TPU pods)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
