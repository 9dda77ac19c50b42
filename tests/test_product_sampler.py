"""ProductSampler: reusable compiled product sampling (serving path)."""
import jax
import numpy as np

from kde_tpu import kde
from kde_tpu.ops.gibbs import ProductSampler, prod_appx_ms_gibbs


def test_product_sampler_matches_function_api():
    rng = np.random.default_rng(0)
    dens = [kde(rng.normal(size=(2, 32)), [0.4]),
            kde(rng.normal(size=(2, 32)), [0.4])]
    s = ProductSampler(dens, n_out=16, n_iter=3)
    key = jax.random.PRNGKey(7)
    pts_a, idx_a = s.sample(key)

    # function API with the same derived streams
    ku, kn = jax.random.split(key)
    u = jax.random.uniform(ku, (16, s.bu), dtype=s.dtype)
    n_ = jax.random.normal(kn, (16, s.bn), dtype=s.dtype)
    pts_b, idx_b = prod_appx_ms_gibbs(16, dens, n_iter=3,
                                      rand_u=np.asarray(u, np.float64),
                                      rand_n=np.asarray(n_, np.float64))
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
    np.testing.assert_allclose(np.asarray(pts_a), np.asarray(pts_b),
                               rtol=1e-6)


def test_product_sampler_distinct_keys():
    rng = np.random.default_rng(1)
    dens = [kde(rng.normal(size=(1, 16)), [0.3]),
            kde(rng.normal(size=(1, 16)), [0.3])]
    s = ProductSampler(dens, n_out=8)
    a, _ = s.sample(jax.random.PRNGKey(0))
    b, _ = s.sample(jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(a), np.asarray(b))
