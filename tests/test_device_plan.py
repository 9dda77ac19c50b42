"""Device-built level hierarchy (ops/device_plan.py) vs the host ball tree.

Parity contract (module docstring there): 1-D hierarchies are identical to
the host tree's (both reduce to sorted slices); d>1 hierarchies are valid
median-split trees that may differ from the host builder only through the
reference's exclude-last-leaf most-spread-coordinate quirk, so we verify
them against an independent NumPy mirror of the sort-based build and
statistically through the product engine.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kde_tpu import kde, prod_appx_ms_gibbs, product
from kde_tpu.ops.device_plan import DeviceProductPlan, device_tree_stats
from kde_tpu.ops.gibbs import _ProductPlan, _resolve_plan_impl


@pytest.mark.parametrize("n", [1, 2, 3, 7, 16, 33, 100])
def test_device_stats_match_host_tree_1d(n):
    """1-D: device-built node stats equal the host tree's exactly."""
    rng = np.random.default_rng(n)
    pts = rng.normal(size=(n, 1)) * 2.0
    w = rng.uniform(0.5, 1.5, size=n)
    w = w / w.sum()
    var = np.full((n, 1), 0.3)
    p = kde(pts.T, np.sqrt(var).T, weights=w)
    t = p.tree
    m, b, wt, perm = device_tree_stats(jnp.asarray(pts), jnp.asarray(var),
                                       jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(m), t.means, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(b)[:max(n - 1, 1)],
                               t.bandwidth[:max(n - 1, 1)],
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(wt), t.weights, rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(perm)[n:], t.permutation[n:])


def _numpy_sortbuild(pts, var, w):
    """Independent mirror of the sort-based device build (plain NumPy
    recursion; full-slice variance for the split dimension)."""
    n, d = pts.shape
    two_n = 2 * n
    means = np.zeros((two_n, d))
    bw = np.ones((two_n, d))
    wts = np.zeros(two_n)
    perm = np.zeros(two_n, dtype=np.int64)
    order = np.arange(n)
    next_slot = [1]

    def rec(lo, hi, slot):
        if slot >= n:                       # leaf slot covers one position
            pos = slot - n
            means[slot] = pts[order[pos]]
            bw[slot] = var[order[pos]]
            wts[slot] = w[order[pos]]
            perm[slot] = order[pos]
            return
        seg = order[lo:hi + 1]
        dim = int(np.argmax(pts[seg].var(axis=0)))
        order[lo:hi + 1] = seg[np.argsort(pts[seg, dim], kind="stable")]
        split = (lo + hi) // 2
        if split <= lo:
            ls = n + lo
        else:
            ls = next_slot[0]; next_slot[0] += 1
        if split + 1 >= hi:
            rs = n + hi
        else:
            rs = next_slot[0]; next_slot[0] += 1
        rec(lo, split, ls)
        rec(split + 1, hi, rs)
        wl, wr = wts[ls], wts[rs]
        tot = wl + wr + np.finfo(np.float64).eps
        fl, fr = wl / tot, wr / tot
        m = fl * means[ls] + fr * means[rs]
        means[slot] = m
        bw[slot] = (fl * (bw[ls] + means[ls] ** 2)
                    + fr * (bw[rs] + means[rs] ** 2) - m ** 2)
        wts[slot] = wl + wr

    rec(0, n - 1, 0)
    return means, bw, wts, perm


@pytest.mark.parametrize("n", [5, 16, 50])
def test_device_stats_match_numpy_mirror_3d(n):
    rng = np.random.default_rng(n + 100)
    pts = rng.normal(size=(n, 3)) * [1.0, 2.5, 0.5]
    var = np.abs(rng.normal(size=(n, 3))) + 0.1
    w = rng.uniform(0.5, 1.5, size=n)
    w = w / w.sum()
    m, b, wt, perm = device_tree_stats(jnp.asarray(pts), jnp.asarray(var),
                                       jnp.asarray(w))
    em, eb, ewt, _ = _numpy_sortbuild(pts.copy(), var, w.copy())
    np.testing.assert_allclose(np.asarray(m), em, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(b)[:n - 1], eb[:n - 1],
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(wt), ewt, rtol=1e-9)


def test_device_plan_matches_host_plan_1d():
    """1-D: the full Gibbs plan (level arrays) is identical between
    builders, so keyed products agree draw-for-draw."""
    rng = np.random.default_rng(0)
    dens = [kde(rng.normal(size=(1, 33)), [0.4]),
            kde(rng.normal(size=(1, 20)), [0.3])]
    hp = _ProductPlan(dens, 16, jnp.float64)
    dp = DeviceProductPlan(dens, 16, jnp.float64)
    assert hp.offsets == dp.offsets
    for a, b in zip(hp.lvl_arrays[1:], dp.lvl_arrays[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)
    out_h = prod_appx_ms_gibbs(16, dens, n_iter=2, key=jax.random.PRNGKey(1),
                               plan="host")
    out_d = prod_appx_ms_gibbs(16, dens, n_iter=2, key=jax.random.PRNGKey(1),
                               plan="device")
    np.testing.assert_array_equal(np.asarray(out_h[1]), np.asarray(out_d[1]))
    np.testing.assert_allclose(np.asarray(out_h[0]), np.asarray(out_d[0]),
                               rtol=1e-9)


def test_auto_plan_selects_device_for_device_resident():
    rng = np.random.default_rng(1)
    p = kde(rng.normal(size=(2, 32)), [0.4])
    q = kde(rng.normal(size=(2, 32)), [0.4])
    pq = product([p, q], key=jax.random.PRNGKey(0))     # device-resident
    assert pq._host_points is None
    assert _resolve_plan_impl([pq, p], "auto", False) == "device"
    assert _resolve_plan_impl([p, q], "auto", False) == "host"
    assert _resolve_plan_impl([pq, p], "auto", True) == "host"   # replay


def test_chained_product_never_builds_host_tree():
    """(p*q)*r runs with no readback: the intermediate density's host tree
    is never constructed."""
    rng = np.random.default_rng(2)
    p = kde(rng.normal(size=(2, 32)), [0.5])
    q = kde(rng.normal(size=(2, 32)) + 0.2, [0.5])
    r = kde(rng.normal(size=(2, 32)) - 0.2, [0.5])
    pq = product([p, q], key=jax.random.PRNGKey(3))
    pqr = product([pq, r], key=jax.random.PRNGKey(4))
    assert pq._tree is None                 # device plan: no host tree built
    assert pq._host_points is None
    pts = np.asarray(pqr.get_points())
    assert np.all(np.isfinite(pts)) and np.abs(pts).max() < 6.0


def test_device_plan_product_moments():
    """Product of M unit Gaussians through the device plan passes the
    reference's moment brackets (test/runtests.jl:167-187)."""
    rng = np.random.default_rng(5)
    M, D, N = 3, 2, 100
    dens = [kde(jnp.asarray(rng.normal(size=(D, N))), [1.0 / np.sqrt(N)] * D)
            for _ in range(M)]
    wins = 0
    for t in range(10):
        pts, _ = prod_appx_ms_gibbs(100, dens, n_iter=5,
                                    key=jax.random.PRNGKey(t), plan="device")
        pts = np.asarray(pts)
        prod_dev = np.sqrt(1.0 / M)
        ok = (np.linalg.norm(pts.mean(axis=1)) < prod_dev
              and all(0.66 * prod_dev < pts[i].std() < 1.33 * prod_dev
                      for i in range(D)))
        wins += ok
    assert wins >= 5


def test_batched_sampler_device_sets_matches_individual():
    """BatchedProductSampler over device-resident sets (one vmapped plan
    build) must equal per-set device-plan products with the same split
    keys."""
    from kde_tpu import BatchedProductSampler
    rng = np.random.default_rng(7)
    base = [kde(rng.normal(size=(2, 32)) + 0.3 * b, [0.4]) for b in range(3)]
    # make the message densities device-resident (products of the bases)
    msgs = [product([base[b], base[(b + 1) % 3]],
                    key=jax.random.PRNGKey(10 + b)) for b in range(3)]
    for m in msgs:
        assert m._host_points is None
    sets = [[msgs[0], msgs[1]], [msgs[1], msgs[2]]]
    bs = BatchedProductSampler(sets, n_out=16, n_iter=2)
    key = jax.random.PRNGKey(5)
    pts, lab = bs.sample(key)
    keys = jax.random.split(key, 2)
    for b, ds in enumerate(sets):
        e_pts, e_lab = prod_appx_ms_gibbs(16, ds, n_iter=2, key=keys[b],
                                          plan="device")
        np.testing.assert_allclose(np.asarray(pts[b]), np.asarray(e_pts),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_array_equal(np.asarray(lab[b]), np.asarray(e_lab))


def test_device_plan_matches_host_plan_1d_multibandwidth():
    """1-D multibandwidth (per-kernel variances): the device build moment-
    matches per-kernel bandwidths up the tree identically to the host."""
    rng = np.random.default_rng(9)
    bw1 = rng.uniform(0.2, 0.8, size=(1, 24))
    bw2 = rng.uniform(0.1, 0.5, size=(1, 17))
    dens = [kde(rng.normal(size=(1, 24)), bw1),
            kde(rng.normal(size=(1, 17)), bw2)]
    assert dens[0].multibandwidth
    hp = _ProductPlan(dens, 16, jnp.float64)
    dp = DeviceProductPlan(dens, 16, jnp.float64)
    for a, b in zip(hp.lvl_arrays[1:], dp.lvl_arrays[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)
    out_h = prod_appx_ms_gibbs(16, dens, n_iter=2, key=jax.random.PRNGKey(2),
                               plan="host")
    out_d = prod_appx_ms_gibbs(16, dens, n_iter=2, key=jax.random.PRNGKey(2),
                               plan="device")
    np.testing.assert_array_equal(np.asarray(out_h[1]), np.asarray(out_d[1]))
