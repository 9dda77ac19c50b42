"""Per-dimension manifold operation hooks.

The reference threads pluggable per-dimension operators through every layer:
``addop``/``diffop`` tuples for on-manifold +/- (reference src/KDE01.jl:10-11,
src/DualTree01.jl:261-262) and, in the Gibbs product engine, ``getMu``/
``getLambda`` for the information-form Gaussian product
(reference src/MSGibbs01.jl:141-161).  Euclidean operators are the defaults;
downstream users (e.g. circular / SE(2) state spaces) pass their own.

Here the hooks are plain Python callables applied *inside* jitted code to
whole arrays (they must be jnp-traceable and elementwise/broadcasting).  A
length-1 tuple broadcasts to all dimensions, exactly like the reference
(src/MSGibbs01.jl:672-675).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp

# ---- Euclidean defaults -----------------------------------------------------

def euclid_add(a, b):
    return a + b


def euclid_diff(a, b):
    return a - b


def euclid_lambda(lambdas, axis=-1):
    """Λ = Σ_i Λ_i (reference src/MSGibbs01.jl:141)."""
    return jnp.sum(lambdas, axis=axis)


def euclid_mu(mus, lambdas, scale, axis=-1):
    """μ = scale · Σ_i Λ_i μ_i (reference src/MSGibbs01.jl:152-161);
    ``scale`` is 1/Λ so the result is the information-weighted mean."""
    return scale * jnp.sum(mus * lambdas, axis=axis)


# ---- circular manifold (S^1), for tests and downstream users ----------------

def circular_diff(a, b):
    """Angular difference wrapped to (-pi, pi]."""
    d = a - b
    return d - 2.0 * jnp.pi * jnp.round(d / (2.0 * jnp.pi))


def circular_add(a, b):
    s = a + b
    return s - 2.0 * jnp.pi * jnp.round(s / (2.0 * jnp.pi))


def circular_lambda(lambdas, axis=-1):
    """Information sum is manifold-independent."""
    return jnp.sum(lambdas, axis=axis)


def circular_mu(mus, lambdas, scale, axis=-1):
    """Information-weighted mean of angles: differences are taken relative
    to the highest-information component so the average stays on the
    correct side of the wrap (the reference leaves getMu pluggable for
    exactly this, src/MSGibbs01.jl:152-161).

    The anchor must be a CONTRIBUTING component: during an LOO Gibbs sweep
    the skipped density's column carries lambda = 0, and anchoring at it
    (e.g. a stale selection near 0 while the live kernels sit at
    +/-(pi - 0.05)) would wrap the live differences to opposite signs and
    put the product mean at 0 instead of pi.  argmax(lambda) is always a
    live component when any exists (lambdas are >= 0)."""
    anchor = jnp.argmax(lambdas, axis=axis)
    ref = jnp.take_along_axis(mus, jnp.expand_dims(anchor, axis),
                              axis=axis).squeeze(axis)
    d = circular_diff(mus, jnp.expand_dims(ref, axis))
    return circular_add(ref, scale * jnp.sum(d * lambdas, axis=axis))


# ---- tuple broadcasting -----------------------------------------------------

def broadcast_ops(ops, ndim: int) -> Tuple[Callable, ...]:
    """Broadcast a length-1 op tuple to ``ndim`` dims (reference idiom at
    src/KDE01.jl:10-11 and src/MSGibbs01.jl:672-675).  Any other length
    mismatch raises -- silently replicating ``ops[0]`` would discard the
    user's remaining per-dimension operators (an off-by-one hook tuple
    must not turn a Euclidean dimension circular)."""
    if ops is None:
        return None
    ops = tuple(ops) if isinstance(ops, (tuple, list)) else (ops,)
    if len(ops) == ndim:
        return ops
    if len(ops) != 1:
        raise ValueError(
            f"manifold op tuple has {len(ops)} entries for {ndim} "
            "dimensions; pass one per dimension or a length-1 tuple to "
            "broadcast")
    return ops * ndim


def is_euclidean(ops, default) -> bool:
    """True if every per-dim op is the Euclidean default (enables the
    matmul fast paths)."""
    return ops is None or all(op is default for op in ops)
