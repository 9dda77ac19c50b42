"""On-manifold operation hooks threaded through the Gibbs product engine
(the cross-cutting concern of SURVEY §1: addop/diffop/getMu/getLambda)."""
import jax
import numpy as np

from kde_tpu import kde, manifolds, prod_appx_ms_gibbs, set_force_eval_direct


def _wrap(a):
    return a - 2 * np.pi * np.round(a / (2 * np.pi))


def test_circular_product_wraps_correctly():
    """Two angular densities concentrated just either side of +/-pi: the
    Euclidean product mean would sit near 0 (wrong side of the circle); the
    circular hooks must place the product mass near pi."""
    rng = np.random.default_rng(0)
    a = _wrap(np.pi - 0.2 + 0.05 * rng.normal(size=(1, 64)))
    b = _wrap(-np.pi + 0.2 + 0.05 * rng.normal(size=(1, 64)))
    pa = kde(a, [0.1], diffop=(manifolds.circular_diff,))
    pb = kde(b, [0.1], diffop=(manifolds.circular_diff,))
    pts, _ = prod_appx_ms_gibbs(
        64, [pa, pb], n_iter=5,
        addop=(manifolds.circular_add,),
        diffop=(manifolds.circular_diff,),
        get_mu=(manifolds.circular_mu,),
        get_lambda=(manifolds.circular_lambda,),
        key=jax.random.PRNGKey(0))
    pts = np.asarray(pts)[0]
    # distance to pi on the circle must be small for most samples
    dist_to_pi = np.abs(_wrap(pts - np.pi))
    assert np.median(dist_to_pi) < 0.5
    # and almost nothing lands near 0 (the wrong Euclidean answer)
    assert np.mean(np.abs(pts) < 1.0) < 0.2


def test_euclidean_hooks_match_default():
    """Passing the Euclidean hooks explicitly must be identical to the
    fast-path default (same injected streams)."""
    rng = np.random.default_rng(1)
    dens = [kde(rng.normal(size=(1, 16)), [0.4]) for _ in range(2)]
    n_levels = int(np.floor(np.log2(16))) + 1
    ru = rng.uniform(size=8 * 2 * (1 + n_levels * 4))
    rn = rng.normal(size=8 * (n_levels + 1))
    p1, i1 = prod_appx_ms_gibbs(8, dens, n_iter=3, rand_u=ru, rand_n=rn)
    p2, i2 = prod_appx_ms_gibbs(
        8, dens, n_iter=3, rand_u=ru, rand_n=rn,
        addop=(manifolds.euclid_add,), diffop=(manifolds.euclid_diff,),
        get_mu=(manifolds.euclid_mu,), get_lambda=(manifolds.euclid_lambda,))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-12)


def test_set_force_eval_direct_compat():
    set_force_eval_direct(False)
    set_force_eval_direct(True)
