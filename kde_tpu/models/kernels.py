"""Kernel families.

The reference is Gaussian-only in practice (``GaussianKer`` is the single
kernel type, src/BallTreeDensity01.jl:3-5; the node-statistics merge is
explicitly "Gaussian only", src/BallTreeDensity01.jl:178-180, and kde!
squares bandwidths "Gaussian only at this point", src/KDE01.jl:45).  The
family descriptor is kept as an extension point: a family supplies the
log-kernel profile, its normalizer, and the sampler jitter, which is all the
evaluation (ops/kernels.py), sampling (ops/sampling.py), and moment-matching
(ops/balltree.py) layers consume.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class KernelFamily:
    name: str
    # log of the unnormalized kernel profile given squared Mahalanobis dist
    log_profile: Callable[[jnp.ndarray], jnp.ndarray]
    # log normalizer per dimension given the variance
    log_norm_1d: Callable[[jnp.ndarray], jnp.ndarray]
    # sampler jitter: standard draw to be scaled by the bandwidth std
    sample_std: Callable[..., jnp.ndarray]


GaussianKernel = KernelFamily(
    name="Gaussian",
    log_profile=lambda q2: -0.5 * q2,
    log_norm_1d=lambda var: 0.5 * (jnp.log(var) + math.log(2.0 * math.pi)),
    sample_std=lambda key, shape, dtype=jnp.float32: jax.random.normal(
        key, shape, dtype=dtype),
)
