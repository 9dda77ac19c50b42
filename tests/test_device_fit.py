"""Device-resident fit paths: sort-based LOOCV bracket and batched ``*``.

The reference's ``*`` chain is product -> kde! -> per-dim tree build ->
golden search (src/MSGibbs01.jl:724-725 + src/KDE01.jl:3-27).  On the axon
runtime a device->host readback permanently degrades dispatch (BASELINE.md),
so the TPU build computes the LOOCV bracket from ``jnp.sort`` on device: for
a 1-D tree the recursive median splits fully sort the leaf order, making
every internal node's box extent a sorted-slice difference with slice
boundaries that depend only on N (ops/loocv.py::_internal_slices).  These
tests pin the device path to the host tree path exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kde_tpu import kde, prod_appx_ms_gibbs, product, product_batched
from kde_tpu.ops.balltree import build_balltree, neighbor_min_max
from kde_tpu.ops.loocv import (_internal_slices, ksize_bandwidths,
                               ksize_bandwidths_device)


@pytest.mark.parametrize("n", [2, 3, 5, 8, 17, 64, 100, 257])
def test_sorted_slice_bracket_matches_tree(n):
    """For every internal node of a 1-D tree, box extent == sorted-slice
    difference; hence minm/maxm from jnp.sort == neighbor_min_max from the
    built tree (reference src/CrossValidation.jl:100-108)."""
    rng = np.random.default_rng(n)
    x = rng.normal(size=(n, 1)) * 3.0
    w = np.full(n, 1.0 / n)
    tree = build_balltree(x, w)
    minm_t, maxm_t = neighbor_min_max(tree)
    lo, hi = _internal_slices(n)
    s = np.sort(x[:, 0])
    diag = s[hi] - s[lo]
    assert np.isclose(diag[0], maxm_t, rtol=1e-12)
    assert np.isclose(max(diag.min(), 1e-6), minm_t, rtol=1e-12)


def test_ksize_device_matches_host():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(300, 3)) * [0.5, 1.0, 4.0]
    w = rng.uniform(0.5, 1.5, size=300)
    w = w / w.sum()
    bw_host = ksize_bandwidths(pts, w)
    bw_dev = np.asarray(ksize_bandwidths_device(jnp.asarray(pts),
                                                jnp.asarray(w)))
    np.testing.assert_allclose(bw_dev, bw_host, rtol=1e-12)


def test_kde_device_array_matches_numpy():
    """kde(device_array) must select the same LOOCV bandwidths as
    kde(numpy_array) and keep no host copies (nothing to read back)."""
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(2, 200)) * [[1.0], [3.0]]
    p_np = kde(pts)
    p_dev = kde(jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(p_dev.bw), np.asarray(p_np.bw),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p_dev.points),
                               np.asarray(p_np.points))
    assert p_dev._host_points is None            # device-resident
    # fixed-bw and weighted device constructions
    q = kde(jnp.asarray(pts), [0.3, 0.7],
            weights=jnp.asarray(rng.uniform(1, 2, size=200)))
    np.testing.assert_allclose(np.asarray(q.get_bw())[:, 0], [0.3, 0.7],
                               rtol=1e-6)
    assert np.isclose(float(jnp.sum(q.weights)), 1.0)


def test_product_stays_device_resident():
    rng = np.random.default_rng(3)
    p = kde(rng.normal(size=(2, 64)), [0.4])
    q = kde(rng.normal(size=(2, 64)) + 0.3, [0.4])
    pq = product([p, q], key=jax.random.PRNGKey(0))
    assert pq._host_points is None               # no readback happened
    v = np.asarray(pq(rng.normal(size=(2, 20))))
    assert v.shape == (20,) and np.all(np.isfinite(v))


def test_product_batched_matches_individual():
    """product_batched == per-set product with the same per-set key: the
    batched sampler splits its key per set, and the fused refit must select
    the same bandwidths as kde()'s device path."""
    rng = np.random.default_rng(4)
    sets = []
    for b in range(3):
        p = kde(rng.normal(size=(2, 32)) + 0.1 * b, [0.4])
        q = kde(rng.normal(size=(2, 32)) - 0.1 * b, [0.4])
        sets.append([p, q])
    key = jax.random.PRNGKey(7)
    outs = product_batched(sets, n_iter=3, key=key)
    assert len(outs) == 3
    keys = jax.random.split(key, 3)
    for b, ds in enumerate(sets):
        pts, _ = prod_appx_ms_gibbs(32, ds, n_iter=3, key=keys[b])
        expect = kde(pts)                        # device-resident refit
        np.testing.assert_allclose(np.asarray(outs[b].points),
                                   np.asarray(expect.points), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(outs[b].bw),
                                   np.asarray(expect.bw), rtol=1e-10)
        assert outs[b]._host_points is None


def test_kde_integer_device_array_promotes_to_float():
    """kde() on an integer device array must promote to float like the host
    path, not build integer weights/variances (review finding r2)."""
    p = kde(jnp.asarray(np.array([[0, 1, 2, 5]])), [0.5])
    assert jnp.issubdtype(p.points.dtype, jnp.floating)
    np.testing.assert_allclose(np.asarray(p.weights), np.full(4, 0.25))
    v = np.asarray(p(np.array([[1.0]])))
    assert np.isfinite(v).all() and v[0] > 0


def test_product_batched_single_sample_sets():
    """n_out == 1 (single-component densities): the fused refit must take
    the degenerate-bracket path, not crash (review finding r2)."""
    sets = [[kde(np.array([[0.5]]), [0.4]), kde(np.array([[1.0]]), [0.4])]]
    outs = product_batched(sets, key=jax.random.PRNGKey(0))
    assert len(outs) == 1 and outs[0].npts == 1
    assert np.isfinite(np.asarray(outs[0].points)).all()
