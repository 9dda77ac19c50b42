"""The remaining reference moment-grid configs, full strength (VERDICT r1).

test_gibbs.py runs the fast majority of the reference's ``rangeUnitTests``
grid (test/runtests.jl:189-201); the two configs here are the slowest and
most stressing -- M=7 factor densities at n=300 output samples, and the
MCMC=100 deep-sweep config (which test_gibbs.py runs at mcmc=25).  They are
behind the ``slow`` marker (deselected by default; ``pytest -m slow``) so the
default suite stays within its time budget, exactly as the reference keeps
its own 2-D LCV golden cases disabled for speed (runtests.jl:236-238).
"""
import pytest

from test_gibbs import _range_test


@pytest.mark.slow
def test_range_prods_m7_n300():
    # reference config D=2, M=7, n=300 (test/runtests.jl:198)
    assert _range_test(seed=29, D=2, M=7, n=300)


@pytest.mark.slow
def test_range_prods_mcmc100():
    # reference config D=3, M=2, MCMC=100 (test/runtests.jl:199)
    assert _range_test(seed=31, D=3, M=2, mcmc=100)
