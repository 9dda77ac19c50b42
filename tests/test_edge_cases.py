"""Edge cases: duplicates, degenerate weights, tiny densities, ragged
products, zero-likelihood regions."""
import jax
import numpy as np
import pytest

from kde_tpu import entropy, kde, prod_appx_ms_gibbs, product, sample
from kde_tpu.reference_impl import serial_gibbs_product


def test_duplicate_points_pipeline():
    """All-duplicate coordinates: tree build (tie-heavy quickselect), LOOCV
    bracket floor (minm clamped at 1e-6), eval, product."""
    pts = np.array([[1.0] * 8 + [2.0] * 8])
    p = kde(pts, [0.5])
    assert np.isfinite(float(entropy(p)))
    q = kde(pts + 0.5, [0.5])
    out, _ = prod_appx_ms_gibbs(8, [p, q], key=jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(out)))


def test_replay_parity_with_duplicates():
    rng = np.random.default_rng(0)
    pts = rng.integers(0, 3, size=(1, 16)).astype(float)
    dens = [kde(pts, [0.4]), kde(pts + 0.25, [0.4])]
    n_levels = int(np.floor(np.log2(16))) + 1
    ru = rng.uniform(size=8 * 2 * (1 + n_levels * 4))
    rn = rng.normal(size=8 * (n_levels + 1))
    ps, is_, _ = serial_gibbs_product([p.tree for p in dens], 8, 3, ru, rn)
    pv, iv = prod_appx_ms_gibbs(8, dens, n_iter=3, rand_u=ru, rand_n=rn)
    np.testing.assert_array_equal(np.asarray(iv), is_)
    np.testing.assert_allclose(np.asarray(pv), ps, rtol=1e-9, atol=1e-12)


def test_zero_weight_kernels():
    w = np.array([0.5, 0.0, 0.5])
    p = kde(np.array([[0.0, 1.0, 2.0]]), [0.3], w)
    y = np.asarray(p.evaluate(np.array([1.0])))
    # middle kernel contributes nothing
    q = kde(np.array([[0.0, 2.0]]), [0.3])
    np.testing.assert_allclose(y, np.asarray(q.evaluate(np.array([1.0]))),
                               rtol=1e-12)


def test_far_apart_product_degenerate_guard():
    """Densities with negligible overlap trigger the <1e-99 fallback path;
    the product must still produce finite samples."""
    rng = np.random.default_rng(1)
    p = kde(rng.normal(size=(1, 32)) - 50.0, [0.1])
    q = kde(rng.normal(size=(1, 32)) + 50.0, [0.1])
    pts, _ = prod_appx_ms_gibbs(16, [p, q], key=jax.random.PRNGKey(1))
    pts = np.asarray(pts)
    assert np.all(np.isfinite(pts))
    # product of two unit-variance-scale Gaussians 100 apart concentrates
    # near the midpoint
    assert np.all(np.abs(pts) < 60.0)


def test_tiny_densities_product():
    a = kde(np.array([[0.0]]), [1.0])        # single-kernel densities
    b = kde(np.array([[2.0]]), [1.0])
    pts, idx = prod_appx_ms_gibbs(4, [a, b], key=jax.random.PRNGKey(2))
    assert np.asarray(pts).shape == (1, 4)
    assert np.all(np.asarray(idx) == 0)
    # analytic product: N(1, 0.5)
    assert abs(float(np.asarray(pts).mean()) - 1.0) < 2.0


def test_three_way_ragged_product_moments():
    rng = np.random.default_rng(3)
    dens = [kde(rng.normal(size=(2, n)), [0.3]) for n in (50, 128, 200)]
    r = product(dens, key=jax.random.PRNGKey(3))
    assert r.npts == 126                      # round(mean(50,128,200))
    pts = np.asarray(r.get_points())
    assert np.abs(pts.mean(axis=1)).max() < 0.5


def test_sample_respects_weights():
    p = kde(np.array([[0.0, 100.0]]), [0.01], np.array([0.999, 0.001]))
    pts, ind = sample(p, 500, key=jax.random.PRNGKey(4))
    assert np.mean(np.asarray(ind) == 0) > 0.97
