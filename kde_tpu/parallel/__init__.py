"""Distributed layer: meshes, sharded products/evaluation, multi-host init.

The reference has no parallelism of any kind (SURVEY §2 call-out); this
package *introduces* the scale axes -- ``chains`` (Gibbs chains / query
points, pure data parallel) and ``kernels`` (mixture components, collective
log-sum-exp / CDF reductions) -- as named mesh axes for pjit/shard_map.
"""

from .mesh import CHAINS, KERNELS, make_mesh, make_mesh_2d
from .product import (initialize_multihost, prod_appx_ms_gibbs_sharded,
                      product_sharded)
from .gibbs_kernel_sharded import prod_appx_ms_gibbs_kernel_sharded
from .eval import (ksize_bandwidths_sharded, sharded_log_eval,
                   sharded_loo_entropy)
from .sizing import estimate_product_memory, recommend_shards

__all__ = [
    "CHAINS", "KERNELS", "make_mesh", "make_mesh_2d",
    "initialize_multihost", "prod_appx_ms_gibbs_sharded", "product_sharded",
    "prod_appx_ms_gibbs_kernel_sharded",
    "ksize_bandwidths_sharded", "sharded_log_eval", "sharded_loo_entropy",
    "estimate_product_memory", "recommend_shards",
]
