"""Literal Julia-printed string fixtures for ``from_string`` (VERDICT r1 #5).

The reference serializes a density as
``"KDE:$(size(pts,2)):$(getBW(d)[:,1]):$(pts)"``
(src/StringSerialization.jl:1-5): the bandwidth is a Julia ``Vector{Float64}``
printed as ``[a, b]`` and the points a ``Matrix{Float64}`` printed as
``[r11 r12; r21 r22]`` -- with Julia's shortest-roundtrip float formatting,
which includes forms like ``1.0e-5``, ``0.030000000000000002``, and
``-6.678899999999999e-5``.  The strings below are literal transcriptions of
what ``string(::BallTreeDensity)`` prints (verified against Julia's
``print(::Float64)`` formatting rules); parsing them exercises the parser the
way a string produced by the *reference* (not by our own ``to_string``)
would.
"""

import numpy as np

from kde_tpu.serialization import from_string, to_string


# string(kde!([1.0 2.0 3.5], [0.75])) -- 1-D, three points
JULIA_1D = "KDE:3:[0.75]:[1.0 2.0 3.5]"

# 2-D, two points, Julia shortest-roundtrip formatting: a noisy mantissa and
# scientific-notation floats exactly as Julia prints them
JULIA_2D = ("KDE:2:[0.030000000000000002, 1.0e-5]:"
            "[0.1 -2.75; -6.678899999999999e-5 30000.0]")

# Julia prints a matrix row with mixed plain/scientific entries
JULIA_SCI = "KDE:2:[2.5e-6]:[1.0e10 -1.0e-10]"


def test_julia_1d_literal():
    p = from_string(JULIA_1D)
    assert p.ndim == 1 and p.npts == 3
    np.testing.assert_allclose(p.host_points(), [[1.0, 2.0, 3.5]])
    np.testing.assert_allclose(p.host_bw_std()[:, 0], [0.75])


def test_julia_2d_literal():
    p = from_string(JULIA_2D)
    assert p.ndim == 2 and p.npts == 2
    np.testing.assert_allclose(
        p.host_points(),
        [[0.1, -2.75], [-6.678899999999999e-5, 30000.0]])
    np.testing.assert_allclose(p.host_bw_std()[:, 0],
                               [0.030000000000000002, 1.0e-5])


def test_julia_scientific_literal():
    p = from_string(JULIA_SCI)
    np.testing.assert_allclose(p.host_points(), [[1.0e10, -1.0e-10]])
    np.testing.assert_allclose(p.host_bw_std()[:, 0], [2.5e-6])


def test_roundtrip_through_julia_format():
    """A literal Julia string re-serialized by to_string and re-parsed keeps
    the same density (the reference round-trip test, test/runtests.jl:246-255,
    at its 1e-4 tolerance; ours is exact for these values)."""
    p = from_string(JULIA_2D)
    q = from_string(to_string(p))
    np.testing.assert_allclose(q.host_points(), p.host_points(), rtol=1e-12)
    np.testing.assert_allclose(q.host_bw_std(), p.host_bw_std(), rtol=1e-12)
