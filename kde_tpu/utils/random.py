"""RNG key management.

All stochastic APIs take an explicit ``key``; for reference-style convenience
(the reference uses Julia's global RNG) a module-level key is split when
``key=None``.  Call :func:`set_seed` for reproducibility.

Plain Python ints are accepted anywhere a key is: they seed a
``jax.random.PRNGKey`` on the device paths and a NumPy generator on the host
fast paths (ops/host_small.py) -- creating a device key just to sample on
the host would itself be a device dispatch on the axon runtime.
"""

from __future__ import annotations

import jax
import numpy as np

# the device key is created LAZILY (on the first ensure_key(None)): a
# module-level PRNGKey would make a plain `import kde_tpu` dispatch to the
# JAX backend, which on a dead axon tunnel blocks silently at 0% CPU even
# for purely host-side flows (serialization, host_small fast paths)
_state = {"seed": 0, "key": None, "host": np.random.default_rng(0)}


def set_seed(seed: int) -> None:
    _state["seed"] = int(seed)
    _state["key"] = None                       # realized on next device use
    _state["host"] = np.random.default_rng(seed)


def ensure_key(key=None):
    if isinstance(key, (int, np.integer)):
        return jax.random.PRNGKey(int(key))
    if key is not None:
        return key
    if _state["key"] is None:
        _state["key"] = jax.random.PRNGKey(_state["seed"])
    _state["key"], sub = jax.random.split(_state["key"])
    return sub


def is_host_key(key) -> bool:
    """True when ``key`` can drive a host-side draw without touching the
    device: ``None`` (module generator) or a plain int seed."""
    return key is None or isinstance(key, (int, np.integer))


def host_rng(key=None) -> np.random.Generator:
    """NumPy generator for the host fast paths: a fresh deterministic
    generator for int seeds, the advancing module generator for ``None``."""
    if isinstance(key, (int, np.integer)):
        return np.random.default_rng(int(key))
    return _state["host"]
