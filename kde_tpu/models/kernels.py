"""Kernel-type marker (reference ``GaussianKer``/``getType``,
src/BallTreeDensity01.jl:3-5,49).

The reference -- and this framework -- is Gaussian-only by construction:
the node-statistics merge is moment matching ("Gaussian only",
src/BallTreeDensity01.jl:178-180), kde! squares bandwidths ("Gaussian only
at this point", src/KDE01.jl:45), and the Gibbs product engine's
information-form kernel products (src/MSGibbs01.jl:176-216) are only closed
under Gaussians.  A pluggable kernel-family abstraction was prototyped in
round 1 and removed: nothing non-Gaussian can flow through the product
engine, so the extension point was false generality.  What remains is the
reference's type marker for API compatibility (``KDE.kernel_type``).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class KernelFamily:
    name: str


GaussianKernel = KernelFamily(name="Gaussian")
