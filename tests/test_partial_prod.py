"""Partial-dimension products (reference test/testPartialProd.jl): three 2-D
densities with complementary dim masks; >=80/100 product samples must land in
the intersection box."""
import numpy as np
import jax

from kde_tpu import kde, prod_appx_ms_gibbs


def test_partial_product_intersection():
    rng = np.random.default_rng(11)
    pts1 = rng.uniform(size=(2, 100)) + 10.0   # informative on dim 0 only
    pts2 = rng.uniform(size=(2, 100))          # informative on both
    pts3 = rng.uniform(size=(2, 100)) - 10.0   # informative on dim 1 only

    p1 = kde(pts1)
    p2 = kde(pts2)
    p3 = kde(pts3)
    bw1 = np.asarray(p1.get_bw()[:, 0])
    bw3 = np.asarray(p3.get_bw()[:, 0])

    # poison the masked dims, as the reference test does (testPartialProd.jl:33-34)
    pts1[1, :] = 9999999.0
    pts3[0, :] = 9999999.0
    p1 = kde(pts1, bw1)
    p3 = kde(pts3, bw3)

    mask = np.array([[True, False], [True, True], [False, True]])
    pts, _ = prod_appx_ms_gibbs(100, [p1, p2, p3], n_iter=3,
                                partial_dim_mask=mask,
                                key=jax.random.PRNGKey(0))
    pts = np.asarray(pts)
    # dim 0 constrained by p1 (~10) and p2 (~0.5) -> in (0, 10)
    assert (np.sum((0 < pts[0]) & (pts[0] < 10))) > 80
    # dim 1 constrained by p2 (~0.5) and p3 (~-10) -> in (-10, 0)
    assert (np.sum((-10 < pts[1]) & (pts[1] < 0))) > 80
