"""Kernel/component-axis sharded Gibbs products (SURVEY §5, VERDICT r1 #1):
the sharded engine must reproduce the single-device engine and the serial
oracle exactly under the same injected streams, on the virtual 8-device mesh.
"""
import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from kde_tpu import kde, prod_appx_ms_gibbs
from kde_tpu.parallel.gibbs_kernel_sharded import (
    prod_appx_ms_gibbs_kernel_sharded)
from kde_tpu.parallel.mesh import KERNELS, make_mesh_2d
from kde_tpu.reference_impl import serial_gibbs_product


from fixtures import gibbs_streams  # noqa: E402 (shared sizing)


def _streams(rng, ndens, d, n_out, n_iter, max_np):
    ru, rn, _ = gibbs_streams(rng, ndens, d, n_out, n_iter, max_np)
    return ru, rn


def _kmesh(n):
    return Mesh(np.array(jax.devices()[:n]), (KERNELS,))


@pytest.mark.parametrize("cfg", [
    dict(d=2, ns=(64, 64), n_out=8, n_iter=2),
    dict(d=1, ns=(48, 80), n_out=8, n_iter=3),    # ragged counts
    dict(d=3, ns=(33, 17), n_out=6, n_iter=1),    # non-multiple-of-8 widths
    dict(d=2, ns=(16, 16, 16), n_out=8, n_iter=0),
])
def test_kernel_sharded_replay_parity(cfg):
    """Sharded(8 kernel shards) == serial oracle == single-device engine,
    exactly, under the same injected streams."""
    rng = np.random.default_rng(5)
    d, ns, n_out, n_iter = cfg["d"], cfg["ns"], cfg["n_out"], cfg["n_iter"]
    dens = [kde(rng.normal(size=(d, n)), list(rng.uniform(0.3, 0.8, size=d)))
            for n in ns]
    ru, rn = _streams(rng, len(ns), d, n_out, n_iter, max(ns + (n_out,)))

    pts_s, idx_s, lab_s = serial_gibbs_product(
        [p.tree for p in dens], n_out, n_iter, ru, rn)
    pts_1, idx_1, lab_1 = prod_appx_ms_gibbs(
        n_out, dens, n_iter=n_iter, rand_u=ru, rand_n=rn, record_labels=True)
    pts_k, idx_k, lab_k = prod_appx_ms_gibbs_kernel_sharded(
        _kmesh(8), n_out, dens, n_iter=n_iter, rand_u=ru, rand_n=rn,
        record_labels=True)

    np.testing.assert_array_equal(np.asarray(idx_k), idx_s)
    np.testing.assert_array_equal(np.asarray(lab_k), lab_s)
    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_1))
    np.testing.assert_allclose(np.asarray(pts_k), pts_s, rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(pts_k), np.asarray(pts_1),
                               rtol=1e-12, atol=1e-14)


def test_kernel_sharded_partial_dims():
    rng = np.random.default_rng(6)
    d, n = 2, 32
    p1 = kde(rng.normal(size=(d, n)) + 5.0, [0.4, 0.4])
    p2 = kde(rng.normal(size=(d, n)), [0.4, 0.4])
    p3 = kde(rng.normal(size=(d, n)) - 5.0, [0.4, 0.4])
    mask = np.array([[True, False], [True, True], [False, True]])
    ru, rn = _streams(rng, 3, d, 8, 2, n)
    pts_s, idx_s, _ = serial_gibbs_product(
        [p.tree for p in (p1, p2, p3)], 8, 2, ru, rn, partial_dim_mask=mask)
    pts_k, idx_k = prod_appx_ms_gibbs_kernel_sharded(
        _kmesh(8), 8, [p1, p2, p3], n_iter=2, rand_u=ru, rand_n=rn,
        partial_dim_mask=mask)
    np.testing.assert_array_equal(np.asarray(idx_k), idx_s)
    np.testing.assert_allclose(np.asarray(pts_k), pts_s, rtol=1e-9,
                               atol=1e-12)


def test_kernel_sharded_2d_mesh():
    """chains x kernels 2-D mesh: both axes at once, exact replay parity
    (chain padding rows are computed and discarded)."""
    rng = np.random.default_rng(7)
    d, n, n_out, n_iter = 2, 40, 6, 2
    dens = [kde(rng.normal(size=(d, n)), [0.5, 0.5]) for _ in range(2)]
    ru, rn = _streams(rng, 2, d, n_out, n_iter, max(n, n_out))
    pts_s, idx_s, _ = serial_gibbs_product(
        [p.tree for p in dens], n_out, n_iter, ru, rn)
    mesh = make_mesh_2d((2, 4))            # 2 chain shards x 4 kernel shards
    pts_k, idx_k = prod_appx_ms_gibbs_kernel_sharded(
        mesh, n_out, dens, n_iter=n_iter, rand_u=ru, rand_n=rn)
    np.testing.assert_array_equal(np.asarray(idx_k), idx_s)
    np.testing.assert_allclose(np.asarray(pts_k), pts_s, rtol=1e-9,
                               atol=1e-12)


def test_kernel_sharded_keyed_mode():
    """Keyed (non-replay) mode: finite outputs with plausible moments."""
    rng = np.random.default_rng(8)
    dens = [kde(rng.normal(size=(2, 64)), [0.3]) for _ in range(2)]
    pts, idx = prod_appx_ms_gibbs_kernel_sharded(
        _kmesh(8), 256, dens, n_iter=3, key=jax.random.PRNGKey(0))
    pts = np.asarray(pts)
    assert pts.shape == (2, 256)
    assert np.all(np.isfinite(pts))
    assert np.abs(pts.mean(axis=1)).max() < 1.0
    assert np.asarray(idx).min() >= 0 and np.asarray(idx).max() < 64


def test_kernel_sharded_exact_ties():
    """The engineered exact-CDF-tie case (see test_replay_parity) must also
    be exact under the sharded CDF decomposition: with identical kernels all
    partial sums are exact binary fractions, so resummation cannot move a
    boundary."""
    d, n, dn, n_out, n_iter = 2, 8, 2, 4, 1
    dens = [kde(np.zeros((d, n)), [0.5, 0.5]) for _ in range(dn)]
    L = int(np.floor(np.log2(max(n, n_out)))) + 1
    bu = n_out * dn * (1 + L * (1 + n_iter))
    bn = n_out * d * (L + 1)
    eps = np.finfo(np.float64).eps
    boundary = np.array([0.125, 0.25, 0.5, 0.75, 0.875,
                         0.5 - eps / 2, 0.5 + eps, 0.25 + eps / 2,
                         np.nextafter(1.0, 0.0), eps])
    ru = np.resize(boundary, bu)
    rn = np.zeros(bn)
    pts_s, idx_s, lab_s = serial_gibbs_product(
        [p.tree for p in dens], n_out, n_iter, ru, rn)
    pts_k, idx_k, lab_k = prod_appx_ms_gibbs_kernel_sharded(
        _kmesh(8), n_out, dens, n_iter=n_iter, rand_u=ru, rand_n=rn,
        record_labels=True)
    np.testing.assert_array_equal(np.asarray(idx_k), idx_s)
    np.testing.assert_array_equal(np.asarray(lab_k), lab_s)
    np.testing.assert_allclose(np.asarray(pts_k), pts_s, rtol=1e-9,
                               atol=1e-12)


def _circular_hooks():
    from kde_tpu import manifolds as mf
    return dict(addop=(mf.circular_add,), diffop=(mf.circular_diff,),
                get_mu=(mf.circular_mu,), get_lambda=(mf.circular_lambda,))


def test_kernel_sharded_circular_trace_exact():
    """Manifold-hooked sharded product == the plain engine under the same
    injected streams, on the 8-device mesh (VERDICT r4 #6): the hooks only
    enter per-shard local arithmetic, so the collective CDF decomposition
    must not move a single label even with kernels wrapped across +/-pi."""
    rng = np.random.default_rng(11)
    d, n, n_out, n_iter = 2, 48, 8, 2
    # mass on both sides of the wrap in dim 0; plain Euclidean-ish dim 1
    ang = np.where(rng.uniform(size=n) < 0.5,
                   np.pi - 0.1 * rng.uniform(size=n),
                   -np.pi + 0.1 * rng.uniform(size=n))
    hooks = _circular_hooks()
    dens = [kde(np.vstack([ang + 0.02 * j, rng.normal(size=n)]),
                [0.3, 0.4], **hooks) for j in range(2)]
    ru, rn = _streams(rng, 2, d, n_out, n_iter, max(n, n_out))

    pts_1, idx_1, lab_1 = prod_appx_ms_gibbs(
        n_out, dens, n_iter=n_iter, rand_u=ru, rand_n=rn,
        record_labels=True, **hooks)
    pts_k, idx_k, lab_k = prod_appx_ms_gibbs_kernel_sharded(
        _kmesh(8), n_out, dens, n_iter=n_iter, rand_u=ru, rand_n=rn,
        record_labels=True, **hooks)

    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_1))
    np.testing.assert_array_equal(np.asarray(lab_k), np.asarray(lab_1))
    np.testing.assert_allclose(np.asarray(pts_k), np.asarray(pts_1),
                               rtol=1e-12, atol=1e-14)
    # the product lives on the circle: sampled angles stay in (-pi, pi]
    a = np.asarray(pts_k)[0]
    assert np.all((a > -np.pi - 1e-9) & (a <= np.pi + 1e-9))


def test_kernel_sharded_collects_density_hooks():
    """Densities carrying the circular quadruple flow their hooks into the
    sharded engine automatically (same rule as product()); mixing hooked
    and hook-free densities raises instead of silently sampling
    Euclidean."""
    rng = np.random.default_rng(12)
    hooks = _circular_hooks()
    n = 32
    ang = np.pi - 0.05 * rng.uniform(size=n)
    p1 = kde(ang[None, :], [0.3], **hooks)
    p2 = kde((-ang)[None, :], [0.3], **hooks)
    ru, rn = _streams(rng, 2, 1, 8, 2, max(n, 8))
    pts_auto, idx_auto = prod_appx_ms_gibbs_kernel_sharded(
        _kmesh(8), 8, [p1, p2], n_iter=2, rand_u=ru, rand_n=rn)
    pts_exp, idx_exp = prod_appx_ms_gibbs_kernel_sharded(
        _kmesh(8), 8, [p1, p2], n_iter=2, rand_u=ru, rand_n=rn, **hooks)
    np.testing.assert_array_equal(np.asarray(idx_auto), np.asarray(idx_exp))
    np.testing.assert_allclose(np.asarray(pts_auto), np.asarray(pts_exp),
                               rtol=1e-12, atol=1e-14)
    # the wrap-straddling product mean must sit at +/-pi, not 0: the
    # Euclidean information mean of angles near +pi and -pi would land
    # near 0, so this asserts the hooks actually reached the engine
    a = np.asarray(pts_auto)[0]
    assert np.all(np.abs(a) > np.pi / 2)

    p3 = kde(rng.normal(size=(1, n)), [0.3])          # hook-free
    with pytest.raises(ValueError):
        prod_appx_ms_gibbs_kernel_sharded(
            _kmesh(8), 8, [p1, p3], n_iter=2, rand_u=ru, rand_n=rn)


def test_kernel_sharded_degenerate_far_apart():
    """Far-apart densities: the globally-reduced degenerate predicate
    (pmax + psum logsumexp < log 1e-99) must fire on every shard exactly
    as the serial oracle's linear-space total does."""
    rng = np.random.default_rng(37)
    d, n, n_out, n_iter = 1, 64, 8, 2
    dens = [kde(rng.normal(size=(d, n)), [0.1]),
            kde(rng.normal(size=(d, n)) + 100.0, [0.1])]
    ru, rn = _streams(rng, 2, d, n_out, n_iter, max(n, n_out))
    pts_s, idx_s, lab_s = serial_gibbs_product(
        [p.tree for p in dens], n_out, n_iter, ru, rn)
    pts_k, idx_k, lab_k = prod_appx_ms_gibbs_kernel_sharded(
        _kmesh(8), n_out, dens, n_iter=n_iter, rand_u=ru, rand_n=rn,
        record_labels=True)
    np.testing.assert_array_equal(np.asarray(idx_k), idx_s)
    np.testing.assert_array_equal(np.asarray(lab_k), lab_s)
    np.testing.assert_allclose(np.asarray(pts_k), pts_s, rtol=1e-9,
                               atol=1e-12)


def test_sizing_recommends_engine():
    """The routing rule (parallel/sizing.py, VERDICT r4 #7): XLA's own
    compile-time accounting sizes the exact keyed executable, the shard
    count is ceil(bytes/budget), and bigger products report more bytes."""
    from kde_tpu.parallel import estimate_product_memory, recommend_shards
    rng = np.random.default_rng(0)
    small = [kde(rng.normal(size=(2, 128)).astype(np.float32), [0.2],
                 dtype="float32") for _ in range(2)]
    big = [kde(rng.normal(size=(2, 1024)).astype(np.float32), [0.2],
               dtype="float32") for _ in range(2)]
    m_small = estimate_product_memory(small, n_out=64, n_iter=2)
    m_big = estimate_product_memory(big, n_out=64, n_iter=2)
    assert m_big["total"] > m_small["total"] > 0
    assert m_small["select"] == "cdf"          # size routing at tiny shapes
    # fits-one-chip -> plain engine
    r = recommend_shards(small, n_out=64, n_iter=2, mem=m_small)
    assert r == {"shards": 1, "engine": "plain", "bytes": m_small["total"],
                 "budget": r["budget"], "select": "cdf"}
    # force a tiny budget: ceil division drives the shard count
    r2 = recommend_shards(big, n_out=64, n_iter=2, mem=m_big,
                          hbm_budget=max(1, m_big["total"] // 3))
    assert r2["engine"] == "kernel-sharded" and r2["shards"] >= 3
