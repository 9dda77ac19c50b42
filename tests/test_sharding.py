"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Checks: sharded results are *identical* to single-device results (same
pre-generated random streams), and the 2-axis chains x kernels evaluation
with pmax/psum collectives matches the dense kernel.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kde_tpu import kde, prod_appx_ms_gibbs
from kde_tpu.ops import kernels
from kde_tpu.parallel.eval import sharded_log_eval, sharded_loo_entropy
from kde_tpu.parallel.mesh import make_mesh, make_mesh_2d
from kde_tpu.parallel.product import prod_appx_ms_gibbs_sharded


@pytest.fixture(scope="module")
def devices_ok():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def test_sharded_product_matches_unsharded(devices_ok):
    rng = np.random.default_rng(0)
    dens = [kde(rng.normal(size=(2, 64)), [0.4]),
            kde(rng.normal(size=(2, 64)), [0.4])]
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(42)
    pts_s, idx_s = prod_appx_ms_gibbs_sharded(mesh, 64, dens, n_iter=3,
                                              key=key)
    # unsharded with the same streams: replicate the sharded path's RNG
    ku, kn = jax.random.split(key)
    n_levels = int(np.floor(np.log2(64))) + 1
    bu = 2 * (1 + n_levels * (1 + 3))
    bn = 2 * (n_levels + 1)
    u = np.asarray(jax.random.uniform(ku, (64, bu), dtype=jnp.float64))
    n_ = np.asarray(jax.random.normal(kn, (64, bn), dtype=jnp.float64))
    pts_u, idx_u = prod_appx_ms_gibbs(64, dens, n_iter=3, rand_u=u, rand_n=n_)
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_u))
    np.testing.assert_allclose(np.asarray(pts_s), np.asarray(pts_u),
                               rtol=1e-12)


def test_sharded_product_padding(devices_ok):
    rng = np.random.default_rng(1)
    dens = [kde(rng.normal(size=(1, 32)), [0.4]),
            kde(rng.normal(size=(1, 32)), [0.4])]
    mesh = make_mesh(8)
    pts, idx = prod_appx_ms_gibbs_sharded(mesh, 50, dens,  # 50 % 8 != 0
                                          key=jax.random.PRNGKey(0))
    assert np.asarray(pts).shape == (1, 50)
    assert np.asarray(idx).shape == (2, 50)


def test_sharded_product_diagnostics(devices_ok):
    rng = np.random.default_rng(2)
    dens = [kde(rng.normal(size=(2, 32)), [0.5]),
            kde(rng.normal(size=(2, 32)), [0.5])]
    mesh = make_mesh(8)
    pts, _, diag = prod_appx_ms_gibbs_sharded(mesh, 64, dens, diagnostics=True,
                                              key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(diag["mean"]),
                               np.asarray(pts).mean(axis=1), rtol=1e-9)


def test_sharded_log_eval_matches_dense(devices_ok):
    rng = np.random.default_rng(3)
    mesh = make_mesh_2d((4, 2))
    n, m, d = 64, 32, 3
    means = jnp.asarray(rng.normal(size=(n, d)))
    var = jnp.asarray(rng.uniform(0.2, 1.0, size=(n, d)))
    w = jnp.asarray(rng.uniform(size=n))
    w = w / w.sum()
    q = jnp.asarray(rng.normal(size=(m, d)))
    got = sharded_log_eval(mesh, q, means, var, w)
    want = kernels.log_eval(q, means, var, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-10)


def test_sharded_loo_entropy_matches_dense(devices_ok):
    rng = np.random.default_rng(4)
    mesh = make_mesh_2d((4, 2))
    n, d = 64, 2
    pts = jnp.asarray(rng.normal(size=(n, d)))
    var = jnp.asarray(np.full((n, d), 0.3))
    w = jnp.full(n, 1.0 / n, dtype=jnp.float64)
    got = float(sharded_loo_entropy(mesh, pts, var, w))
    want = float(kernels.entropy_kernel(pts, var, w))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_ksize_bandwidths_sharded_matches_dense():
    """The fully sharded LOOCV golden search (chains x kernels mesh) selects
    the same bandwidths as the single-device fit, including with padding
    (N not a multiple of the mesh shape) and non-uniform weights."""
    import jax
    from jax.sharding import Mesh
    from kde_tpu.ops.loocv import ksize_bandwidths
    from kde_tpu.parallel import KERNELS, ksize_bandwidths_sharded, make_mesh_2d

    rng = np.random.default_rng(21)
    n, d = 205, 2                                  # 205 % 8 != 0 -> padding
    pts = rng.normal(size=(n, d)) * [1.0, 2.5]
    w = rng.uniform(0.5, 1.5, size=n)
    w = w / w.sum()
    dense = ksize_bandwidths(pts, w)
    mesh2 = make_mesh_2d((2, 4))
    got = np.asarray(ksize_bandwidths_sharded(mesh2, pts, w))
    np.testing.assert_allclose(got, dense, rtol=1e-8)
    # kernels-only mesh
    mesh1 = Mesh(np.array(jax.devices()[:8]), (KERNELS,))
    got1 = np.asarray(ksize_bandwidths_sharded(mesh1, pts, w))
    np.testing.assert_allclose(got1, dense, rtol=1e-8)


def test_sharded_product_circular_hooks(devices_ok):
    """Density-attached manifold hooks flow through the chain-sharded
    product exactly as through product(): same streams -> identical labels
    and points as the unsharded engine with explicit hooks (the sharded
    entry point used to silently sample Euclidean)."""
    from kde_tpu import manifolds
    circ = dict(addop=(manifolds.circular_add,),
                diffop=(manifolds.circular_diff,),
                get_mu=(manifolds.circular_mu,),
                get_lambda=(manifolds.circular_lambda,))
    rng = np.random.default_rng(5)
    th_a = np.mod(rng.normal(size=(1, 64)) * 0.3 + np.pi - 0.15 + np.pi,
                  2 * np.pi) - np.pi       # cluster straddling the wrap
    th_b = np.mod(rng.normal(size=(1, 64)) * 0.3 - np.pi + 0.15 + np.pi,
                  2 * np.pi) - np.pi
    dens = [kde(th_a, [0.2], **circ), kde(th_b, [0.2], **circ)]
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(9)
    pts_s, idx_s = prod_appx_ms_gibbs_sharded(mesh, 64, dens, n_iter=3,
                                              key=key)
    ku, kn = jax.random.split(key)
    n_levels = int(np.floor(np.log2(64))) + 1
    bu = 2 * (1 + n_levels * (1 + 3))
    bn = 1 * (n_levels + 1)
    u = np.asarray(jax.random.uniform(ku, (64, bu), dtype=jnp.float64))
    n_ = np.asarray(jax.random.normal(kn, (64, bn), dtype=jnp.float64))
    pts_u, idx_u = prod_appx_ms_gibbs(
        64, dens, n_iter=3, rand_u=u, rand_n=n_,
        addop=circ["addop"], diffop=circ["diffop"],
        get_mu=circ["get_mu"], get_lambda=circ["get_lambda"])
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_u))
    np.testing.assert_allclose(np.asarray(pts_s), np.asarray(pts_u),
                               rtol=1e-12)
    assert np.all(np.abs(np.asarray(pts_s)) <= np.pi)   # wrapped domain


def test_product_sharded_stays_device_resident(devices_ok):
    from kde_tpu.parallel.product import product_sharded
    rng = np.random.default_rng(6)
    dens = [kde(jnp.asarray(rng.normal(size=(2, 64))), [0.4]),
            kde(jnp.asarray(rng.normal(size=(2, 64))), [0.4])]
    mesh = make_mesh(8)
    pq = product_sharded(mesh, dens, key=jax.random.PRNGKey(1))
    assert pq._host_points is None and pq._tree is None   # no readbacks
    assert pq.npts == 64
