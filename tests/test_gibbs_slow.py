"""The remaining reference moment-grid configs (VERDICT r1).

test_gibbs.py runs the fast majority of the reference's ``rangeUnitTests``
grid (test/runtests.jl:189-201); the two configs here -- M=7 factor
densities at n=300 output samples, and the MCMC=100 deep-sweep config --
complete the grid.  Originally parked behind the ``slow`` marker, but they
measure ~1 min on the CPU mesh (the vectorized engine makes the deep-sweep
config cheap), so they now run in the default suite: every config of the
reference's grid is exercised on every run.
"""
from test_gibbs import _range_test


def test_range_prods_m7_n300():
    # reference config D=2, M=7, n=300 (test/runtests.jl:198)
    assert _range_test(seed=29, D=2, M=7, n=300)


def test_range_prods_mcmc100():
    # reference config D=3, M=2, MCMC=100 (test/runtests.jl:199)
    assert _range_test(seed=31, D=3, M=2, mcmc=100)
