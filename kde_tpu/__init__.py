"""kde_tpu -- a TPU-native kernel density estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
JuliaRobotics/KernelDensityEstimate.jl: n-dimensional KDEs with LOOCV
bandwidth selection, dense batched density evaluation and functionals,
sampling/resampling/marginals, and approximate products of multiple KDEs via
multiscale Gibbs sampling run as thousands of parallel chains.

See SURVEY.md at the repo root for the reference's structure and the build
plan; public names mirror the reference's export list
(reference src/KernelDensityEstimate.jl:13-51).
"""

from .density import KDE, kde
from .functionals import (
    entropy, eval_avg_logl, evaluate_dual_tree, get_kde_fit, get_kde_max,
    get_kde_mean, get_kde_range, get_kde_range_linspace, inters_intg_appx_is,
    kld, minkld,
)
from .ops.balltree import FlatBallTree, build_balltree
from .ops.loocv import golden_batched, ksize, nloo_ll

# The reference's golden-section search (src/CrossValidation.jl:44-98).
# kde_tpu's form is batched-functional -- it minimizes a vectorized
# objective over many brackets as one device program -- rather than the
# reference's (density, objective) signature; `ksize`/`nloo_ll` cover the
# reference's only call site (src/CrossValidation.jl:116).
golden = golden_batched
from .ops.sampling import rand_kde, resample, sample, sample_at
from .serialization import from_string, load_kde, save_kde, to_string
from .utils.random import set_seed
from .config import set_force_eval_direct
from . import manifolds

# Gibbs product engine (the reference's prodAppxMSGibbsS and `*`,
# src/MSGibbs01.jl:632-736)
from .ops.gibbs import (BatchedProductSampler, ProductSampler,
                        prod_appx_ms_gibbs, product, product_batched)

# Type-name compatibility aliases: the reference's density type is
# `BallTreeDensity <: MixtureDensity` (src/BallTreeDensity01.jl:9-24) and it
# exports the `VectorRange{T} = Union{Vector{T},UnitRange{T}}` argument alias
# (src/KernelDensityEstimate.jl:63).  Downstream code doing
# `isinstance(x, BallTreeDensity)` or annotating with VectorRange ports
# directly.
BallTreeDensity = KDE
MixtureDensity = KDE
BallTree = FlatBallTree


def marginal(p: KDE, dims):
    """Free-function form of the reference's ``marginal(p, dims)``
    (src/KDE01.jl:143-153)."""
    return p.marginal(dims)


def root(p) -> int:
    """Root node slot of a density's ball tree (reference ``root``,
    src/BallTree01.jl:64; exported at src/KernelDensityEstimate.jl:22).
    kde_tpu uses the fixture dumps' 0-based slot convention, so the root
    is slot 0 (the reference's 1-based Julia arrays call it 1)."""
    return 0


def npts(p) -> int:
    """Number of kernels (reference ``Npts``, src/BallTree01.jl:66)."""
    return p.npts


def ndim(p) -> int:
    """Dimensionality (reference ``Ndim``, src/BallTree01.jl:65)."""
    return p.ndim
try:                                    # typing alias (annotation use only)
    from typing import Sequence as _Seq, Union as _Union
    VectorRange = _Union[_Seq[int], _Seq[float], range]
except Exception:                       # pragma: no cover
    VectorRange = object

__all__ = [
    "KDE", "kde",
    "entropy", "eval_avg_logl", "kld", "minkld", "inters_intg_appx_is",
    "get_kde_range", "get_kde_range_linspace", "get_kde_max", "get_kde_mean",
    "get_kde_fit",
    "sample", "sample_at", "rand_kde", "resample",
    "to_string", "from_string", "save_kde", "load_kde",
    "BatchedProductSampler", "ProductSampler", "prod_appx_ms_gibbs",
    "product", "product_batched",
    "evaluate_dual_tree", "ksize", "nloo_ll", "golden", "golden_batched",
    "FlatBallTree", "build_balltree",
    "BallTreeDensity", "MixtureDensity", "BallTree", "VectorRange",
    "marginal", "npts", "ndim", "root",
    "set_seed", "set_force_eval_direct", "manifolds",
]
