"""RNG key management.

All stochastic APIs take an explicit ``key``; for reference-style convenience
(the reference uses Julia's global RNG) a module-level key is split when
``key=None``.  Call :func:`set_seed` for reproducibility.
"""

from __future__ import annotations

import jax

_state = {"key": jax.random.PRNGKey(0)}


def set_seed(seed: int) -> None:
    _state["key"] = jax.random.PRNGKey(seed)


def ensure_key(key=None):
    if key is not None:
        return key
    _state["key"], sub = jax.random.split(_state["key"])
    return sub
