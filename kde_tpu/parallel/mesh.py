"""Device mesh helpers.

The framework's two scale axes (SURVEY §5 long-context note):
  * ``chains`` -- Gibbs chains / product samples / query points: purely
    data-parallel (the reference runs these serially, src/MSGibbs01.jl:581);
  * ``kernels`` -- mixture components of a density: sharded for very large
    component counts, with log-sum-exp reductions over the axis.

Meshes are ordinary ``jax.sharding.Mesh`` objects so all of pjit/shard_map
composes; on a TPU slice the axes ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAINS = "chains"
KERNELS = "kernels"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = CHAINS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_mesh_2d(shape: Tuple[int, int],
                 axis_names: Tuple[str, str] = (CHAINS, KERNELS)) -> Mesh:
    """2-D mesh ``chains x kernels``."""
    n = shape[0] * shape[1]
    devs = np.array(jax.devices()[:n]).reshape(shape)
    return Mesh(devs, axis_names)


def chains_sharding(mesh: Mesh, axis_name: str = CHAINS) -> NamedSharding:
    """Shard the leading (chain/sample) axis, replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
