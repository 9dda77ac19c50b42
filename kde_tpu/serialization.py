"""Serialization: reference-compatible strings and array checkpoints.

String format (reference src/StringSerialization.jl:1-26):
``KDE:<N>:[bw1, bw2, ...]:[r11 r12 ...; r21 r22 ...]`` -- bandwidths are the
per-dim std-devs, points are printed row-per-dim with ';' separating dims,
matching Julia's matrix printing so strings round-trip with the reference.
Single-bandwidth only (same limitation, src/StringSerialization.jl:2).

Array checkpoints: a KDE is fully determined by (points, bandwidth, weights)
(SURVEY §5 checkpoint note), saved as an ``.npz``.
"""

from __future__ import annotations

import io
import re

import numpy as np

from .density import KDE, kde


def _warn_hooks_dropped(p: KDE, fmt: str) -> None:
    """Manifold hooks are Python callables and cannot ride either format
    (the reference's string format has no hook field, StringSerialization.jl
    :1-5); say so instead of silently flattening a circular density to
    Euclidean -- the deserialized KDE must be re-attached via
    ``kde(..., addop=..., diffop=..., get_mu=..., get_lambda=...)``."""
    import warnings

    from . import manifolds
    if not (manifolds.is_euclidean(p.addop, manifolds.euclid_add)
            and manifolds.is_euclidean(p.diffop, manifolds.euclid_diff)
            and manifolds.is_euclidean(p.get_mu, manifolds.euclid_mu)
            and manifolds.is_euclidean(p.get_lambda,
                                       manifolds.euclid_lambda)):
        warnings.warn(
            f"{fmt} serialization drops the density's manifold hooks "
            "(addop/diffop/get_mu/get_lambda are callables); re-attach "
            "them when reconstructing", stacklevel=3)


def to_string(p: KDE) -> str:
    _warn_hooks_dropped(p, "string")
    pts = p.host_points()
    bw_all = p.host_bw_std()
    if p.multibandwidth or not np.allclose(bw_all, bw_all[:, :1]):
        # the reference format carries ONE bandwidth per dimension
        # (src/StringSerialization.jl:1-5, TODO "only supports single
        # bandwidth"); round-tripping a per-kernel-bandwidth density
        # through it would silently assign kernel 0's bandwidth to all
        warnings.warn(
            "string serialization keeps only the first kernel's bandwidth "
            "per dimension (reference format limitation); use save_kde "
            "(npz) for multibandwidth densities", stacklevel=2)
    bw = bw_all[:, 0]
    bw_s = "[" + ", ".join(repr(float(v)) for v in bw) + "]"
    rows = "; ".join(" ".join(repr(float(v)) for v in row) for row in pts)
    return f"KDE:{pts.shape[1]}:{bw_s}:[{rows}]"


def from_string(s: str) -> KDE:
    if not s.startswith("KDE:"):
        raise ValueError("not a serialized KDE string")
    parts = s.split(":")
    n = int(parts[1])
    bw = np.array([float(x) for x in parts[2].strip("[] ").split(",")])
    body = parts[3].strip()[1:-1]
    rows = [r.strip() for r in body.split(";")]
    if len(rows) != bw.size:
        raise ValueError("dims mismatch between bandwidth and points")
    pts = np.array([[float(x) for x in re.split(r"\s+", r) if x] for r in rows])
    if pts.shape != (bw.size, n):
        raise ValueError(f"expected [{bw.size}, {n}] points, got {pts.shape}")
    return kde(pts, bw)


def save_kde(path: str, p: KDE) -> None:
    _warn_hooks_dropped(p, "npz")
    # prefer the retained host copies (cast to the device dtype): a
    # host-backed KDE checkpoints without any device upload or readback
    np_dtype = np.dtype(p.dtype.name)
    if p._host_points is not None and p._host_bw is not None \
            and p._host_weights is not None:
        pts = p._host_points.astype(np_dtype)
        bw = p._host_bw.astype(np_dtype)
        w = p._host_weights.astype(np_dtype)
    else:
        pts, bw, w = (np.asarray(p.points), np.asarray(p.bw),
                      np.asarray(p.weights))
    np.savez(path, points=pts, bw=bw, weights=w,
             multibandwidth=np.asarray(p.multibandwidth))


def load_kde(path: str) -> KDE:
    z = np.load(path)
    return KDE(z["points"], z["bw"], z["weights"],
               multibandwidth=bool(z["multibandwidth"]))
