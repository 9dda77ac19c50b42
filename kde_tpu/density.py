"""The user-facing kernel density estimate container and constructors.

Mirrors the reference's BallTreeDensity + kde! API surface
(reference src/KDE01.jl, src/BallTreeDensity01.jl) on a TPU-native core:

  * a ``KDE`` holds ``points [N, d]``, per-kernel variances ``bw [N, d]``,
    and normalized ``weights [N]`` as JAX arrays in *original point order*
    (no permutation to undo -- accessors are trivial, unlike
    src/KDE01.jl:91-136 which must invert the tree permutation);
  * the flat ball tree (ops/balltree.py) is built lazily on host, and is only
    consumed by the Gibbs product engine's level schedule and the LOOCV
    bracket -- never by evaluation, which is dense (ops/kernels.py);
  * the public constructor ``kde(points, bw=None, weights=None)`` follows the
    reference's conventions: ``points`` is ``[d, N]`` (column per point,
    src/DualTree01.jl:429-430), ``bw`` is a std-dev that is squared into a
    variance internally (src/KDE01.jl:45), scalars broadcast across dims
    (src/KDE01.jl:41-43), and omitting ``bw`` triggers LOOCV bandwidth
    selection (src/KDE01.jl:3-27).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import manifolds
from .ops import kernels
from .ops.balltree import FlatBallTree, build_balltree
from .ops.loocv import ksize_bandwidths

Array = jnp.ndarray


class KDE:
    """An n-dimensional Gaussian kernel density estimate.

    Evaluation:  ``p(x) = sum_i w_i prod_k N(x_k; mu_ik, bw_ik)`` with ``bw``
    stored as variances.  Instances are callable like the reference's
    ``(bd::BallTreeDensity)(pos)`` (src/DualTree01.jl:431-446).
    """

    def __init__(self,
                 points: Array,
                 bw: Array,
                 weights: Array,
                 multibandwidth: bool = False,
                 addop=None,
                 diffop=None):
        # Host-side copies are captured BEFORE device upload whenever the
        # inputs arrive as NumPy (the common case): the ball-tree build and
        # LOOCV bracket are host-side consumers, and a device->host readback
        # both wastes tunnel bandwidth and (on the axon remote-TPU runtime)
        # permanently degrades dispatch latency for the whole process.
        self.points = jnp.asarray(points)            # [N, d]
        self.bw = jnp.asarray(bw)                    # [N, d] variances
        self.weights = jnp.asarray(weights)          # [N], normalized
        # Host copies are rounded through the device dtype so host consumers
        # (tree build, serialization) see exactly the device contents.
        def _host(x, dev):
            if isinstance(x, jnp.ndarray):
                return None
            return (np.asarray(x, dtype=np.dtype(dev.dtype.name))
                    .astype(np.float64))
        self._host_points = _host(points, self.points)
        self._host_bw = _host(bw, self.bw)
        self._host_weights = _host(weights, self.weights)
        self.multibandwidth = bool(multibandwidth)
        d = self.points.shape[1]
        self.addop = manifolds.broadcast_ops(addop, d)
        self.diffop = manifolds.broadcast_ops(diffop, d)
        self._tree: Optional[FlatBallTree] = None

    # ---- basic properties ---------------------------------------------------

    @property
    def npts(self) -> int:
        return self.points.shape[0]

    @property
    def ndim(self) -> int:
        return self.points.shape[1]

    @property
    def tree(self) -> FlatBallTree:
        """Host-side flat ball tree (lazily built; see ops/balltree.py)."""
        if self._tree is None:
            bw = (self._host_bw if self._host_bw is not None
                  else np.asarray(self.bw, dtype=np.float64))
            pts = (self._host_points if self._host_points is not None
                   else np.asarray(self.points, dtype=np.float64))
            w = (self._host_weights if self._host_weights is not None
                 else np.asarray(self.weights, dtype=np.float64))
            self._tree = build_balltree(
                pts, w, bw if self.multibandwidth else bw[0])
        return self._tree

    @property
    def _eval_diffop(self):
        if manifolds.is_euclidean(self.diffop, manifolds.euclid_diff):
            return None
        return self.diffop

    # ---- accessors (reference src/KDE01.jl:91-136) --------------------------

    def get_points(self) -> Array:
        """Kernel centers, ``[d, N]`` (reference orientation)."""
        return self.points.T

    # host-preferring accessors: use the retained NumPy copies when present
    # so result formatting / host-side math never forces a device readback
    # (which permanently degrades dispatch on the axon runtime; BASELINE.md)

    def host_points(self) -> np.ndarray:
        """``[d, N]`` kernel centers as NumPy, without a device readback
        when the host copy exists."""
        if self._host_points is not None:
            return self._host_points.T
        return np.asarray(self.points, dtype=np.float64).T

    def host_bw_std(self) -> np.ndarray:
        """``[d, N]`` per-kernel std-dev bandwidths as NumPy."""
        bw = (self._host_bw if self._host_bw is not None
              else np.asarray(self.bw, dtype=np.float64))
        return np.sqrt(bw).T

    def host_weights(self) -> np.ndarray:
        if self._host_weights is not None:
            return self._host_weights
        return np.asarray(self.weights, dtype=np.float64)

    def get_bw(self, ind=None) -> Array:
        """Per-kernel bandwidths as *standard deviations*, ``[d, N]`` or the
        selected columns (the reference's getBW takes the sqrt and accepts an
        index list, src/KDE01.jl:109-120)."""
        s = jnp.sqrt(self.bw).T
        return s if ind is None else s[:, jnp.asarray(ind)]

    def get_weights(self, ind=None) -> Array:
        return self.weights if ind is None else self.weights[jnp.asarray(ind)]

    def bw_min(self, i: int = 0) -> np.ndarray:
        """Per-dim lower bandwidth (variance) bound below tree node ``i``
        (reference ``bwMin``, src/BallTreeDensity01.jl:98-99; uniform-
        bandwidth densities return the shared bandwidth for every node,
        matching the reference's multibandwidth=0 stride)."""
        t = self.tree
        return np.asarray(t.bw_min if not t.multibandwidth else t.bw_min[i])

    def bw_max(self, i: int = 0) -> np.ndarray:
        """Per-dim upper bandwidth (variance) bound below tree node ``i``
        (reference ``bwMax``, src/BallTreeDensity01.jl:95-96)."""
        t = self.tree
        return np.asarray(t.bw_max if not t.multibandwidth else t.bw_max[i])

    def marginal(self, dims: Sequence[int]) -> "KDE":
        """Marginal KDE over the selected dims (reference src/KDE01.jl:143-153)."""
        dims = list(dims)
        sub = lambda ops: None if ops is None else tuple(ops[i] for i in dims)
        return KDE(self.points[:, dims], self.bw[:, dims], self.weights,
                   multibandwidth=self.multibandwidth,
                   addop=sub(self.addop), diffop=sub(self.diffop))

    # ---- evaluation ---------------------------------------------------------

    def log_eval(self, pos, chunk: Optional[int] = None) -> Array:
        """``log p`` at query positions ``pos`` (``[d, M]``, or ``[M]`` for 1-D
        densities as in the reference's deprecated vector API,
        src/DualTree01.jl:394-404)."""
        q = _as_query(pos, self.ndim, self.points.dtype)
        if chunk is None:
            # bound the [chunk, N] logit working set in HBM (config.DIRECT_PAIR_LIMIT)
            from . import config
            if q.shape[0] * self.npts > config.DIRECT_PAIR_LIMIT:
                if kernels.use_pallas_eval(self.points.dtype,
                                           self._eval_diffop):
                    # flash-style Pallas kernel: logits never touch HBM --
                    # ~1.8x the chunked dense path at 40k x 40k (BASELINE.md)
                    from .ops.pallas_eval import pallas_log_eval
                    return pallas_log_eval(q, self.points, self.bw,
                                           self.weights)
                chunk = max(1, config.DIRECT_PAIR_LIMIT // self.npts)
        return kernels.log_eval(q, self.points, self.bw, self.weights,
                                self._eval_diffop, chunk=chunk)

    def evaluate(self, pos, lv_flag: bool = False, err_tol: float = 1e-3,
                 chunk: Optional[int] = None) -> Array:
        """Density values at ``pos``; with ``lv_flag`` evaluate leave-one-out
        at the KDE's own points (reference evaluateDualTree,
        src/DualTree01.jl:370-421).  ``err_tol`` is accepted for API
        compatibility; dense evaluation is exact."""
        del err_tol
        if lv_flag:
            return jnp.exp(kernels.log_eval_loo(
                self.points, self.bw, self.weights, self._eval_diffop))
        return jnp.exp(self.log_eval(pos, chunk=chunk))

    __call__ = evaluate

    @property
    def kernel_type(self):
        """Kernel family (reference ``getType``/``GaussianKer``,
        src/BallTreeDensity01.jl:3-5,49)."""
        from .models.kernels import GaussianKernel
        return GaussianKernel

    # ---- operators ----------------------------------------------------------

    def __mul__(self, other: "KDE") -> "KDE":
        from .ops.gibbs import product   # local import: gibbs depends on density
        return product([self, other])

    def __repr__(self) -> str:
        bws = np.round(np.asarray(jnp.sqrt(self.bw[0])), 6)
        return (f"KDE:\n  dims: {self.ndim}\n  Npts: {self.npts}\n"
                f"  bws:  {bws.tolist()}")


def _as_query(pos, ndim: int, dtype) -> Array:
    pos = jnp.asarray(pos, dtype=dtype)
    if pos.ndim == 1:
        if ndim != 1:
            raise ValueError(
                "vector query positions are only supported for 1-D densities "
                "(one value per query point); pass a [d, M] matrix instead")
        return pos[:, None]
    if pos.shape[0] != ndim:
        raise ValueError(f"query must be [d={ndim}, M], got {pos.shape}")
    return pos.T


def kde(points,
        bw: Optional[Union[float, Sequence[float], np.ndarray]] = None,
        weights: Optional[Sequence[float]] = None,
        addop=None,
        diffop=None,
        dtype=None) -> KDE:
    """Construct a KDE (the reference's ``kde!``, src/KDE01.jl:3-84).

    Args:
      points: ``[d, N]`` array (column per point) or ``[N]`` for 1-D data.
      bw: bandwidth *standard deviations*: scalar (broadcast to all dims,
        src/KDE01.jl:41-43), ``[d]`` per-dim, or ``[d, N]`` per-kernel.
        ``None`` -> per-dim LOOCV selection (src/KDE01.jl:3-27).
      weights: ``[N]`` kernel weights (normalized internally, src/KDE01.jl:46).
      addop/diffop: per-dimension manifold hooks (length-1 broadcasts).
      dtype: array dtype (default: float64 if enabled, else float32).

    Device-resident path: when ``points`` is already a device array the fit
    stays on device end-to-end -- LOOCV bandwidths via
    :func:`kde_tpu.ops.loocv.ksize_bandwidths_device` (sort-based bracket,
    no host tree) and no ``np.asarray`` readback.  This is what keeps the
    ``*`` operator's product-then-refit loop (reference
    src/MSGibbs01.jl:724-725) off the device->host cliff (BASELINE.md); the
    ball tree, if later needed (e.g. the KDE enters another product), is
    built lazily from a readback at that point.
    """
    if isinstance(points, jnp.ndarray) and not isinstance(points, np.ndarray):
        return _kde_device(points, bw, weights, addop, diffop, dtype)
    pts = np.asarray(points, dtype=np.float64)
    if pts.ndim == 1:
        pts = pts[None, :]
    d, n = pts.shape
    pts_nd = pts.T                                   # [N, d]

    if weights is None:
        w = np.full(n, 1.0 / n)
    else:
        w = np.asarray(weights, dtype=np.float64).reshape(n)
        w = w / w.sum()

    if dtype is None:
        dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32

    if bw is None:
        # LOOCV bandwidth selection over all dims at once (ops/loocv.py)
        bwds = ksize_bandwidths(pts_nd, w, dtype=dtype)
        var = np.tile(np.asarray(bwds, dtype=np.float64) ** 2, (n, 1))
        multibw = False
    else:
        bwa = np.asarray(bw, dtype=np.float64)
        if bwa.ndim == 0 or bwa.size == 1:
            bwa = np.full(d, float(np.ravel(bwa)[0]))
        if bwa.ndim == 1:
            var = np.tile(bwa.reshape(d) ** 2, (n, 1))
            multibw = False
        else:
            var = (bwa.reshape(d, n) ** 2).T         # [N, d]
            multibw = True

    k = KDE(jnp.asarray(pts_nd, dtype=dtype),
            jnp.asarray(var, dtype=dtype),
            jnp.asarray(w, dtype=dtype),
            multibandwidth=multibw, addop=addop, diffop=diffop)
    # retain host-side copies: the ball-tree build consumes them without a
    # device->host readback (see KDE.__init__ note).  Round through the KDE
    # dtype first so host consumers (tree, to_string, host_* accessors) see
    # exactly the device contents even at float32.
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    k._host_points = pts_nd.astype(np_dtype).astype(np.float64)
    k._host_bw = var.astype(np_dtype).astype(np.float64)
    k._host_weights = w.astype(np_dtype).astype(np.float64)
    return k


def _kde_device(points: Array, bw, weights, addop, diffop, dtype) -> KDE:
    """Device-array constructor path of :func:`kde` (no host readbacks)."""
    from .ops.loocv import ksize_bandwidths_device

    if dtype is None:
        dtype = points.dtype
        if not jnp.issubdtype(dtype, jnp.floating):
            # integer device input: promote like the host path's float cast
            dtype = (jnp.float64 if jax.config.read("jax_enable_x64")
                     else jnp.float32)
    pts = jnp.asarray(points, dtype=dtype)
    if pts.ndim == 1:
        pts = pts[None, :]
    d, n = pts.shape
    pts_nd = pts.T                                   # [N, d]

    if weights is None:
        w = jnp.full((n,), 1.0 / n, dtype=dtype)
    else:
        w = jnp.asarray(weights, dtype=dtype).reshape(n)
        w = w / jnp.sum(w)

    if bw is None:
        bwds = ksize_bandwidths_device(pts_nd, w, dtype=dtype)
        var = jnp.tile(bwds[None, :] ** 2, (n, 1))
        multibw = False
    else:
        bwa = jnp.asarray(bw, dtype=dtype)
        if bwa.ndim == 0 or bwa.size == 1:
            bwa = jnp.full((d,), bwa.reshape(-1)[0], dtype=dtype)
        if bwa.ndim == 1:
            var = jnp.tile(bwa.reshape(d)[None, :] ** 2, (n, 1))
            multibw = False
        else:
            var = (bwa.reshape(d, n) ** 2).T         # [N, d]
            multibw = True

    return KDE(pts_nd, var, w, multibandwidth=multibw,
               addop=addop, diffop=diffop)
