"""Statistical acceptance tests for the multiscale Gibbs product engine.

Mirrors the reference's Monte-Carlo test philosophy (test/runtests.jl:167-201):
the product of M standard-normal D-dim KDEs must have moments matching the
analytic product Gaussian within coarse brackets, with repeated-trial
majority voting to absorb MC noise.
"""
import numpy as np
import jax
import pytest

from kde_tpu import (BatchedProductSampler, ProductSampler, kde, prod_appx_ms_gibbs, product)


def _test_prods(key, D=3, M=6, N=100, n=100, dev=1.0, mcmc=5):
    """One trial of the reference's testProds (test/runtests.jl:167-182)."""
    keys = jax.random.split(key, M + 1)
    rng = np.random.default_rng(int(jax.random.randint(keys[0], (), 0, 2**31)))
    dens = [kde(dev * rng.normal(size=(D, N))) for _ in range(M)]
    pts, _ = prod_appx_ms_gibbs(n, dens, n_iter=mcmc, key=keys[-1])
    pts = np.asarray(pts)
    assert np.abs(pts).sum() > 1e-14
    prod_dev = np.sqrt(dev ** (2 * M) / (M * dev ** 2))
    t1 = np.linalg.norm(pts.mean(axis=1)) < 1.0 * prod_dev
    t2 = all(0.66 * prod_dev < pts[i].std() < 1.33 * prod_dev
             for i in range(D))
    return t1 and t2


def _range_test(seed, **kw):
    """>=5 of 10 trials must pass (reference rangeTestProds,
    test/runtests.jl:184-187)."""
    keys = jax.random.split(jax.random.PRNGKey(seed), 10)
    wins = sum(_test_prods(k, **kw) for k in keys)
    return wins >= 5


@pytest.mark.parametrize("cfg", [
    dict(D=2, M=2), dict(D=2, M=4), dict(D=2, M=6),
    dict(D=3, M=6, mcmc=10),
    dict(D=3, M=5, N=300),
    dict(D=3, M=2, mcmc=25),
])
def test_range_prods(cfg):
    assert _range_test(seed=17, **cfg)


def test_range_prods_4d():
    # reference config D=4, M=6, n=200, MCMC=10 (test/runtests.jl:195)
    assert _range_test(seed=23, D=4, M=6, n=200, mcmc=10)


def test_product_operator():
    """p*q of two bimodal KDEs: sizing, refit, sane support
    (reference src/MSGibbs01.jl:707-736 + README 2D example)."""
    rng = np.random.default_rng(0)
    p = kde(rng.normal(size=(2, 100)), [0.5])
    q = kde(rng.normal(size=(2, 80)) + 0.5, [0.5])
    pq = p * q
    assert pq.npts == 90 and pq.ndim == 2       # mean component count
    pts = np.asarray(pq.get_points())
    assert np.all(np.abs(pts) < 6.0)
    # product mode sits between the two factor modes
    assert 0.0 < pts.mean() < 0.6


def test_product_niter_zero_runs():
    rng = np.random.default_rng(1)
    p = kde(rng.normal(size=(1, 16)), [0.3])
    q = kde(rng.normal(size=(1, 16)), [0.3])
    pts, idx = prod_appx_ms_gibbs(8, [p, q], n_iter=0,
                                  key=jax.random.PRNGKey(0))
    assert np.asarray(pts).shape == (1, 8)
    assert np.asarray(idx).shape == (2, 8)


def test_single_density_short_circuit():
    rng = np.random.default_rng(2)
    p = kde(rng.normal(size=(1, 40)))
    r = product([p], add_entropy=False)
    np.testing.assert_allclose(np.asarray(r.get_points()),
                               np.asarray(p.get_points()), rtol=1e-12)


def test_labels_reconstruct_product_means():
    """reference examples/ExtractingLabels.jl: with add_entropy=False the
    returned points must equal the information-weighted mean of the selected
    kernels (equal bandwidths -> arithmetic mean)."""
    x1 = kde(np.array([1.0, 2.0, 3.0]), [1.0])
    x2 = kde(np.array([0.5, 1.5, 2.5]), [1.0])
    x3 = kde(np.array([4.0, 5.0, 6.0]), [1.0])
    pts, idx, labels = prod_appx_ms_gibbs(
        3, [x1, x2, x3], add_entropy=False, record_labels=True,
        key=jax.random.PRNGKey(3))
    pts, idx = np.asarray(pts), np.asarray(idx)
    dens = [x1, x2, x3]
    for s in range(3):
        mus = [float(dens[j].get_points()[0, idx[j, s]]) for j in range(3)]
        np.testing.assert_allclose(pts[0, s], np.mean(mus), rtol=1e-6)
    # final-level recorded labels agree with the returned indices
    labels = np.asarray(labels)                  # [Np, ndens, n_levels]
    np.testing.assert_array_equal(labels[:, :, -1], idx.T)


def test_gibbs_indices_valid():
    rng = np.random.default_rng(4)
    p = kde(rng.normal(size=(2, 33)), [0.4])
    q = kde(rng.normal(size=(2, 57)), [0.4])
    pts, idx = prod_appx_ms_gibbs(25, [p, q], key=jax.random.PRNGKey(5))
    idx = np.asarray(idx)
    assert idx.shape == (2, 25)
    assert np.all(idx[0] >= 0) and np.all(idx[0] < 33)
    assert np.all(idx[1] >= 0) and np.all(idx[1] < 57)


def test_replay_mode_deterministic():
    """Injected randU/randN streams must reproduce results exactly
    (the reference's replay hook, src/MSGibbs01.jl:691-695)."""
    rng = np.random.default_rng(6)
    p = kde(rng.normal(size=(1, 8)), [0.5])
    q = kde(rng.normal(size=(1, 8)), [0.5])
    n_out, n_iter = 4, 3
    n_levels = int(np.floor(np.log2(8))) + 1
    bu = 2 * (1 + n_levels * (1 + n_iter)) * n_out
    bn = 1 * (n_levels + 1) * n_out
    ru = rng.uniform(size=bu)
    rn = rng.normal(size=bn)
    out1 = prod_appx_ms_gibbs(n_out, [p, q], n_iter=n_iter, rand_u=ru, rand_n=rn)
    out2 = prod_appx_ms_gibbs(n_out, [p, q], n_iter=n_iter, rand_u=ru, rand_n=rn)
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
    np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out2[1]))


def test_replay_requires_both_streams_and_host_plan():
    import pytest
    rng = np.random.default_rng(41)
    dens = [kde(rng.normal(size=(1, 16)), [0.4]) for _ in range(2)]
    u = rng.uniform(size=4096)
    with pytest.raises(ValueError, match="BOTH streams"):
        prod_appx_ms_gibbs(8, dens, n_iter=1, rand_u=u)
    with pytest.raises(ValueError, match="host plan"):
        prod_appx_ms_gibbs(8, dens, n_iter=1, rand_u=u,
                           rand_n=rng.normal(size=4096), plan="device")


def test_explicit_partial_information_hooks_run_generic_path():
    """A custom get_mu with the get_lambda kwarg omitted (natural for
    circular manifolds, whose lambda is the plain sum) must reach the
    generic information-form path -- not silently take the Euclidean fast
    path (or crash in the reverse case)."""
    from kde_tpu import manifolds
    rng = np.random.default_rng(43)
    # two clusters straddling the wrap: Euclidean mean would sit near 0,
    # circular mean near +/-pi
    th_a = np.pi - 0.12 + 0.03 * rng.normal(size=(1, 48))
    th_b = -np.pi + 0.12 + 0.03 * rng.normal(size=(1, 48))
    dens = [kde(th_a, [0.1]), kde(th_b, [0.1])]
    pts, _ = prod_appx_ms_gibbs(
        200, dens, n_iter=3, key=jax.random.PRNGKey(43),
        addop=(manifolds.circular_add,), diffop=(manifolds.circular_diff,),
        get_mu=(manifolds.circular_mu,))       # get_lambda omitted
    pts = np.asarray(pts)
    assert np.mean(np.abs(pts) > 2.5) > 0.9    # mass at the wrap, not 0
    # reverse mix: only get_lambda -> generic path, no crash
    pts2, _ = prod_appx_ms_gibbs(
        50, dens, n_iter=1, key=jax.random.PRNGKey(44),
        addop=(manifolds.circular_add,), diffop=(manifolds.circular_diff,),
        get_lambda=(manifolds.circular_lambda,))
    assert np.all(np.isfinite(np.asarray(pts2)))


def test_sampler_accepts_int_keys():
    rng = np.random.default_rng(45)
    dens = [kde(rng.normal(size=(1, 32)), [0.4]) for _ in range(2)]
    s = ProductSampler(dens, n_out=16, n_iter=1)
    p1, _ = s.sample(7)
    p2, _ = s.sample(7)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    b = BatchedProductSampler([dens], n_out=16, n_iter=1)
    q1, _ = b.sample(7)
    assert np.asarray(q1).shape == (1, 1, 16)


def test_gumbel_select_distribution_exact():
    """argmax(logits + Gumbel) draws the same categorical as the
    inverse-CDF scan: empirical label frequencies over many chains match
    softmax(logits) within MC error, for a product whose level logits are
    nontrivial (kde_tpu/ops/gibbs.py::_select_label_gumbel)."""
    from kde_tpu.ops.gibbs import _select_label_gumbel
    import jax.numpy as jnp
    logits = jnp.log(jnp.asarray([0.5, 0.25, 0.125, 0.0625, 0.0625]))
    n = 40_000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    zs = np.asarray(jax.vmap(lambda k: _select_label_gumbel(k, logits))(keys))
    freq = np.bincount(zs, minlength=5) / n
    p = np.asarray(jnp.exp(logits))
    # 4-sigma binomial bands per category
    se = np.sqrt(p * (1 - p) / n)
    assert np.all(np.abs(freq - p) < 4 * se), (freq, p)
    # -inf logits (padding) are never selected
    logits2 = jnp.asarray([0.0, -jnp.inf, 0.0, -jnp.inf])
    zs2 = np.asarray(jax.vmap(
        lambda k: _select_label_gumbel(k, logits2))(keys[:2000]))
    assert set(np.unique(zs2)) <= {0, 2}


def test_gumbel_keyed_product_moments():
    """The full keyed product under select='gumbel' passes the reference's
    moment brackets (distributional-equality contract for the keyed path,
    PARITY.md 'keyed reproducibility')."""
    def trial(key, D=2, M=4, N=100, n=100, mcmc=5):
        keys = jax.random.split(key, M + 1)
        rng = np.random.default_rng(
            int(jax.random.randint(keys[0], (), 0, 2**31)))
        dens = [kde(rng.normal(size=(D, N))) for _ in range(M)]
        pts, idx = prod_appx_ms_gibbs(n, dens, n_iter=mcmc, key=keys[-1],
                                      select="gumbel")
        pts = np.asarray(pts)
        idx = np.asarray(idx)
        assert np.all((idx >= 0) & (idx < N))
        prod_dev = np.sqrt(1.0 / M)
        return (np.linalg.norm(pts.mean(axis=1)) < prod_dev
                and all(0.66 * prod_dev < pts[i].std() < 1.33 * prod_dev
                        for i in range(D)))
    keys = jax.random.split(jax.random.PRNGKey(31), 10)
    assert sum(trial(k) for k in keys) >= 5


def test_gumbel_degenerate_fallback_uniform():
    """Far-apart densities (total likelihood < 1e-99): the gumbel path's
    fallback must be the reference's uniform draw over candidates, not a
    near-deterministic pick of the least-distant kernel
    (src/MSGibbs01.jl:311-315)."""
    rng = np.random.default_rng(47)
    n = 32
    dens = [kde(rng.normal(size=(1, n)), [0.1]),
            kde(rng.normal(size=(1, n)) + 1000.0, [0.1])]
    pts, idx = prod_appx_ms_gibbs(512, dens, n_iter=2,
                                  key=jax.random.PRNGKey(5),
                                  select="gumbel")
    assert np.all(np.isfinite(np.asarray(pts)))
    # uniform fallback spreads the leaf labels widely; a softmax pick
    # would concentrate on the boundary kernels
    counts = np.bincount(np.asarray(idx)[0], minlength=n)
    assert (counts > 0).sum() > n * 0.7, counts


def test_gumbel_batched_and_sampler_paths():
    """select threads through ProductSampler and BatchedProductSampler;
    same-key draws are deterministic per mode."""
    rng = np.random.default_rng(48)
    dens = [kde(rng.normal(size=(2, 64)), [0.4]) for _ in range(2)]
    s = ProductSampler(dens, n_out=64, n_iter=2)
    g1, _ = s.sample(9, select="gumbel")
    g2, _ = s.sample(9, select="gumbel")
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    assert np.all(np.isfinite(np.asarray(g1)))
    b = BatchedProductSampler([dens, dens], n_out=32, n_iter=2)
    bg, bidx = b.sample(9, select="gumbel")
    assert np.asarray(bg).shape == (2, 2, 32)
    assert np.all(np.isfinite(np.asarray(bg)))
    assert np.all(np.asarray(bidx) >= 0) and np.all(np.asarray(bidx) < 64)


def test_blocked_select_matches_flat_exact():
    """The blocked two-level inverse-CDF draw returns the IDENTICAL index
    to the flat scan for the same uniform (exact-arithmetic identity; in
    f64 the ulp-wide tie window never fires across this grid), including
    -inf padding lanes and the 0/-inf degenerate-fallback shape
    (kde_tpu/ops/gibbs.py::_select_label_blocked)."""
    import jax.numpy as jnp
    from kde_tpu.ops.gibbs import (_blocked_block_size, _select_label,
                                   _select_label_blocked)
    rng = np.random.default_rng(0)
    us = jnp.asarray(rng.uniform(size=(2000,)), jnp.float64)
    for w in (129, 200, 1000, 4096):
        blk = _blocked_block_size(w)
        logits = jnp.asarray(rng.normal(size=(w,)) * 3, jnp.float64)
        zf = jax.vmap(lambda u: _select_label(u, logits))(us)
        zb = jax.vmap(lambda u: _select_label_blocked(u, logits, blk))(us)
        np.testing.assert_array_equal(np.asarray(zf), np.asarray(zb))
    # -inf padding lanes are never selected
    logits = jnp.concatenate([jnp.asarray(rng.normal(size=(300,))),
                              jnp.full((700,), -jnp.inf)])
    zf = jax.vmap(lambda u: _select_label(u, logits))(us)
    zb = jax.vmap(lambda u: _select_label_blocked(u, logits, 32))(us)
    np.testing.assert_array_equal(np.asarray(zf), np.asarray(zb))
    assert int(np.max(np.asarray(zb))) < 300
    # degenerate-fallback logits (0 real / -inf padding): uniform draw
    logits = jnp.where(jnp.arange(1000) < 600, 0.0, -jnp.inf)
    zb = np.asarray(jax.vmap(
        lambda u: _select_label_blocked(u, logits, 32))(us))
    assert zb.max() < 600
    assert np.abs(zb.mean() - 299.5) < 3 * 600 / np.sqrt(12 * len(zb))


def test_blocked_keyed_product_identical_to_cdf():
    """select='blocked' consumes the same uniform stream slot per
    selection as the flat CDF, so in f64 the whole keyed product is
    label- and point-identical to select='cdf' for the same key (the
    blocked form is the same draw, restructured)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    dens = [kde(rng.normal(size=(2, 300)), [0.2], dtype=jnp.float64),
            kde(rng.normal(size=(2, 300)) + 0.5, [0.2], dtype=jnp.float64)]
    k = jax.random.PRNGKey(7)
    pc, ic = prod_appx_ms_gibbs(200, dens, n_iter=3, key=k, select="cdf")
    pb, ib = prod_appx_ms_gibbs(200, dens, n_iter=3, key=k,
                                select="blocked")
    np.testing.assert_array_equal(np.asarray(ic), np.asarray(ib))
    np.testing.assert_array_equal(np.asarray(pc), np.asarray(pb))


def test_blocked_degenerate_fallback_uniform():
    """Far-apart densities: the blocked path's fallback is the uniform
    candidate draw (src/MSGibbs01.jl:311-315), like both other modes."""
    rng = np.random.default_rng(47)
    n = 256                       # leaf width > 128 engages the blocked form
    dens = [kde(rng.normal(size=(1, n)), [0.1]),
            kde(rng.normal(size=(1, n)) + 1000.0, [0.1])]
    pts, idx = prod_appx_ms_gibbs(512, dens, n_iter=2,
                                  key=jax.random.PRNGKey(5),
                                  select="blocked")
    assert np.all(np.isfinite(np.asarray(pts)))
    counts = np.bincount(np.asarray(idx)[0], minlength=n)
    assert (counts > 0).sum() > n * 0.5, counts


def test_blocked_batched_and_sampler_paths():
    rng = np.random.default_rng(48)
    dens = [kde(rng.normal(size=(2, 200)), [0.4]) for _ in range(2)]
    s = ProductSampler(dens, n_out=64, n_iter=2)
    g1, i1 = s.sample(9, select="blocked")
    g2, _ = s.sample(9, select="blocked")
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    # f64 CPU: sampler path also label-identical to cdf for the same key
    _, icdf = s.sample(9, select="cdf")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(icdf))
    b = BatchedProductSampler([dens, dens], n_out=32, n_iter=2)
    bg, bidx = b.sample(9, select="blocked")
    assert np.asarray(bg).shape == (2, 2, 32)
    assert np.all(np.isfinite(np.asarray(bg)))
    assert np.all(np.asarray(bidx) >= 0) and np.all(np.asarray(bidx) < 200)


def test_select_auto_reads_config():
    import pytest
    from kde_tpu import config
    from kde_tpu.ops.gibbs import resolve_select
    assert config.GIBBS_SELECT == "size"     # measured default (r5 grid)
    assert resolve_select("cdf") == "cdf"
    assert resolve_select("blocked") == "blocked"
    assert resolve_select("gumbel") == "gumbel"
    with pytest.raises(ValueError):
        resolve_select("bogus")
    old = config.GIBBS_SELECT
    try:
        config.GIBBS_SELECT = "gumbel"       # forcing a mode still works
        assert resolve_select("auto", 1000, 1024) == "gumbel"
    finally:
        config.GIBBS_SELECT = old


def test_select_size_routing():
    """The 'size' routing reproduces the measured winner grid
    (tools/ab_select_grid.py + ab_gumbel.py + ab_sweeps.py b-select-sweep,
    real chip 2026-08-20) at every measured cell."""
    from kde_tpu.ops.gibbs import resolve_select
    r = resolve_select
    # unknown sizes -> conservative flat cdf
    assert r("auto") == "cdf"
    # headline regime: cdf
    assert r("auto", 1000, 1024) == "cdf"
    assert r("auto", 1024, 1000) == "cdf"
    assert r("auto", 4096, 1024) == "cdf"
    assert r("auto", 1024, 4096) == "cdf"
    assert r("auto", 256, 4096) == "cdf"
    # broad middle: gumbel
    assert r("auto", 16384, 1024) == "gumbel"      # 1.42x measured
    assert r("auto", 4096, 4096) == "gumbel"       # 1.86x
    assert r("auto", 256, 12288) == "gumbel"       # 1.30x
    assert r("auto", 1024, 12288) == "gumbel"      # 1.46x
    assert r("auto", 1024, 50000) == "gumbel"      # 2.50x
    # very wide, few chains: blocked
    assert r("auto", 256, 50000) == "blocked"      # 2.06x
    # batched sets: cdf up to B=7, gumbel at B>=8 (cdf temp spill)
    assert r("auto", 1000, 1024, batch=6) == "cdf"
    assert r("auto", 1000, 1024, batch=8) == "gumbel"


def test_batched_refresh_keeps_masks():
    rng = np.random.default_rng(46)
    mk = lambda: [kde(rng.normal(size=(2, 32)), [0.4]) for _ in range(2)]
    masks = [[[True, False], [False, True]]]
    b = BatchedProductSampler([mk()], n_out=16, n_iter=1,
                              partial_dim_masks=masks)
    m0 = np.asarray(b.mask).copy()
    b.refresh([mk()])                          # default: keep masks
    np.testing.assert_array_equal(np.asarray(b.mask), m0)
    b.refresh([mk()], partial_dim_masks=None)  # explicit reset
    assert np.all(np.asarray(b.mask))
