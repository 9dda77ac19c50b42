"""BatchedProductSampler: B same-shaped density-set products in one
dispatch (the nonparametric-BP serving pattern; no reference counterpart --
the reference generates each product serially, src/MSGibbs01.jl:581)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kde_tpu import BatchedProductSampler, kde, prod_appx_ms_gibbs


def _sets(rng, B=3, n=32, d=2):
    return [[kde(rng.normal(size=(d, n)) + i, [0.4] * d, dtype=jnp.float32),
             kde(rng.normal(size=(d, n)) + 0.5 * i, [0.4] * d,
                 dtype=jnp.float32)] for i in range(B)]


def test_batched_equals_individual():
    """Set i's output must equal a standalone call keyed with split(key)[i]."""
    rng = np.random.default_rng(0)
    sets = _sets(rng)
    s = BatchedProductSampler(sets, n_out=16, n_iter=2)
    key = jax.random.PRNGKey(9)
    pts, idx = s.sample(key)
    assert pts.shape == (3, 2, 16) and idx.shape == (3, 2, 16)
    keys = jax.random.split(key, 3)
    for i in range(3):
        pi, ii = prod_appx_ms_gibbs(16, sets[i], n_iter=2, key=keys[i])
        np.testing.assert_array_equal(np.asarray(ii), np.asarray(idx[i]))
        np.testing.assert_allclose(np.asarray(pi), np.asarray(pts[i]),
                                   rtol=1e-6)


def test_refresh_reuses_shapes():
    rng = np.random.default_rng(1)
    s = BatchedProductSampler(_sets(rng), n_out=16, n_iter=1)
    s.refresh(_sets(rng, B=3))
    pts, _ = s.sample(jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(pts)))


def test_mismatched_shapes_rejected():
    rng = np.random.default_rng(2)
    sets = _sets(rng, B=2)
    bad = [kde(rng.normal(size=(2, 8)), [0.4], dtype=jnp.float32)] * 2
    with pytest.raises(ValueError):
        BatchedProductSampler([sets[0], bad], n_out=16)


def test_partial_dim_masks_per_set():
    rng = np.random.default_rng(3)
    d, n, B = 2, 16, 2
    sets = [[kde(rng.normal(size=(d, n)) + 3, [0.4] * d, dtype=jnp.float32),
             kde(rng.normal(size=(d, n)) - 3, [0.4] * d, dtype=jnp.float32)]
            for _ in range(B)]
    masks = np.array([[[True, False], [False, True]],
                      [[True, True], [True, True]]])
    s = BatchedProductSampler(sets, n_out=16, n_iter=2,
                              partial_dim_masks=masks)
    key = jax.random.PRNGKey(4)
    pts, idx = s.sample(key)
    keys = jax.random.split(key, B)
    for i in range(B):
        pi, ii = prod_appx_ms_gibbs(16, sets[i], n_iter=2, key=keys[i],
                                    partial_dim_mask=masks[i])
        np.testing.assert_array_equal(np.asarray(ii), np.asarray(idx[i]))


def test_set_sharded_equals_unsharded():
    """Sharding the set axis over a mesh (graph-parallel BP deployment)
    changes nothing: labels and points are exactly the unsharded ones."""
    from jax.sharding import Mesh
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    B = n_dev
    rng = np.random.default_rng(5)
    sets = [[kde(rng.normal(size=(2, 32)) + i, [0.4], dtype=jnp.float32),
             kde(rng.normal(size=(2, 32)), [0.4], dtype=jnp.float32)]
            for i in range(B)]
    mesh = Mesh(np.array(jax.devices()), ("sets",))
    key = jax.random.PRNGKey(3)
    p1, i1 = BatchedProductSampler(sets, n_out=16, n_iter=2,
                                   mesh=mesh).sample(key)
    p2, i2 = BatchedProductSampler(sets, n_out=16, n_iter=2).sample(key)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6)
