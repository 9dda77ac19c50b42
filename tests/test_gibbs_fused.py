"""Fused upper-level Gibbs engine (ops/gibbs_fused.py) vs the pure-XLA
chain program.

The fused engine runs every narrow schedule level inside one Pallas launch
and hands the chain state to the XLA program for the wide levels.  Both
engines consume the same absolute per-chain stream layout, so with the same
PRNG key they must produce IDENTICAL labels and samples (the kernel mirrors
the chain arithmetic step for step; reference algorithm
src/MSGibbs01.jl:527-629).  On the CPU test mesh the kernel runs in Pallas
interpret mode (config.GIBBS_FUSED = True forces routing off-TPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kde_tpu import config
from kde_tpu.density import kde
from kde_tpu.ops import gibbs
from kde_tpu.ops import gibbs_fused
from kde_tpu.ops.gibbs import _fused_k, _grouped_vmap


@pytest.fixture
def force_fused():
    old = config.GIBBS_FUSED
    config.GIBBS_FUSED = True
    yield
    config.GIBBS_FUSED = old


def _mk_densities(rng, n_comp, d, dn, multibw=False, offset=1.0):
    dens = []
    for j in range(dn):
        pts = rng.normal(size=(d, n_comp)) + j * offset
        if multibw:
            bw = rng.uniform(0.2, 0.6, size=(d, n_comp))
        else:
            bw = np.full((d,), 0.35)
        dens.append(kde(pts, bw))
    return dens


def _ab(dens, n_out, key, n_iter=3, mask=None):
    """Product under both engines with the same key."""
    old = config.GIBBS_FUSED
    config.GIBBS_FUSED = False
    p0, i0, l0 = gibbs.prod_appx_ms_gibbs(
        n_out, dens, n_iter=n_iter, key=key, record_labels=True,
        partial_dim_mask=mask)
    config.GIBBS_FUSED = True
    p1, i1, l1 = gibbs.prod_appx_ms_gibbs(
        n_out, dens, n_iter=n_iter, key=key, record_labels=True,
        partial_dim_mask=mask)
    config.GIBBS_FUSED = old
    return map(np.asarray, (p0, i0, l0, p1, i1, l1))


def test_fused_routing_gate(force_fused):
    # width<=128 levels count; gate requires >= 3 fusable levels
    offsets = ((0, 2), (2, 4), (6, 8), (14, 200))
    assert _fused_k(offsets, 4, euclidean=True) == (3, 128)
    assert _fused_k(offsets[:2], 2, euclidean=True) == 0       # < 3 levels
    assert _fused_k(offsets, 4, euclidean=False) == 0          # manifold
    old_w = config.GIBBS_FUSED_WIDTH
    try:
        config.GIBBS_FUSED_WIDTH = 256
        assert _fused_k(offsets, 4, euclidean=True) == (4, 256)  # wider
    finally:
        config.GIBBS_FUSED_WIDTH = old_w
    config.GIBBS_FUSED = False
    assert _fused_k(offsets, 4, euclidean=True) == 0


def test_fused_identical_partial_schedule(force_fused):
    # n_comp=300 -> n_levels=9 with wide tail levels: fused region is a
    # strict prefix, XLA resumes mid-schedule
    rng = np.random.default_rng(0)
    dens = _mk_densities(rng, 300, 2, 2)
    p0, i0, l0, p1, i1, l1 = _ab(dens, 200, jax.random.PRNGKey(0))
    assert np.array_equal(i0, i1)
    assert np.array_equal(l0, l1)
    np.testing.assert_allclose(p0, p1, rtol=0, atol=0)


def test_fused_identical_full_schedule(force_fused):
    # n_comp=100 -> every level fits 128 wide: K == n_levels, the XLA
    # program contributes only the final draw
    rng = np.random.default_rng(1)
    dens = _mk_densities(rng, 100, 1, 3)
    p0, i0, l0, p1, i1, l1 = _ab(dens, 100, jax.random.PRNGKey(1))
    assert np.array_equal(i0, i1)
    assert np.array_equal(l0, l1)
    np.testing.assert_allclose(p0, p1, rtol=0, atol=0)


def test_fused_identical_multibandwidth(force_fused):
    rng = np.random.default_rng(2)
    dens = _mk_densities(rng, 150, 3, 2, multibw=True)
    p0, i0, l0, p1, i1, l1 = _ab(dens, 120, jax.random.PRNGKey(2))
    assert np.array_equal(i0, i1)
    assert np.array_equal(l0, l1)
    np.testing.assert_allclose(p0, p1, rtol=0, atol=0)


def test_fused_identical_partial_dims(force_fused):
    rng = np.random.default_rng(3)
    dens = _mk_densities(rng, 200, 2, 3)
    mask = [[True, True], [True, False], [False, True]]
    p0, i0, l0, p1, i1, l1 = _ab(dens, 100, jax.random.PRNGKey(3),
                                 mask=mask)
    assert np.array_equal(i0, i1)
    assert np.array_equal(l0, l1)
    np.testing.assert_allclose(p0, p1, rtol=0, atol=0)


def test_fused_identical_ragged_counts(force_fused):
    # densities with different component counts: level widths are the
    # per-level max across densities, so the shorter density's lanes carry
    # -inf log-weight padding inside the fused kernel
    rng = np.random.default_rng(6)
    dens = [kde(rng.normal(size=(2, n)), np.full((2,), 0.4))
            for n in (300, 150, 90)]
    p0, i0, l0, p1, i1, l1 = _ab(dens, 120, jax.random.PRNGKey(6))
    assert np.array_equal(i0, i1)
    assert np.array_equal(l0, l1)
    np.testing.assert_allclose(p0, p1, rtol=0, atol=0)


def test_fused_identical_zero_weight_kernels(force_fused):
    # kernels with zero weight produce -inf log-weight entries INSIDE the
    # valid level region (not just the lane padding) -- exercises the dead
    # candidate handling and the degenerate-fallback predicate
    rng = np.random.default_rng(8)
    dens = []
    for j in range(2):
        n = 140
        w = rng.uniform(size=n)
        w[: n // 4] = 0.0                       # quarter of kernels dead
        dens.append(kde(rng.normal(size=(2, n)) + j,
                        np.full((2,), 0.35), weights=w))
    p0, i0, l0, p1, i1, l1 = _ab(dens, 100, jax.random.PRNGKey(8))
    assert np.array_equal(i0, i1)
    assert np.array_equal(l0, l1)
    np.testing.assert_allclose(p0, p1, rtol=0, atol=0)


def test_fused_identical_no_gibbs_sweeps(force_fused):
    # n_iter=0: only the conditional re-selections run per level
    rng = np.random.default_rng(9)
    dens = _mk_densities(rng, 150, 2, 2)
    p0, i0, l0, p1, i1, l1 = _ab(dens, 80, jax.random.PRNGKey(9), n_iter=0)
    assert np.array_equal(i0, i1)
    assert np.array_equal(l0, l1)
    np.testing.assert_allclose(p0, p1, rtol=0, atol=0)


def test_fused_identical_device_plan(force_fused):
    # the device-built level hierarchy (ops/device_plan.py) feeds the same
    # lvl_arrays layout into the fused repacking; fused vs XLA must stay
    # bit-identical on that plan too (it's the auto-selected plan for
    # device-resident products, the main TPU serving path)
    rng = np.random.default_rng(7)
    dens = _mk_densities(rng, 200, 2, 2)
    key = jax.random.PRNGKey(7)
    old = config.GIBBS_FUSED
    config.GIBBS_FUSED = False
    p0, i0 = gibbs.prod_appx_ms_gibbs(150, dens, n_iter=3, key=key,
                                      plan="device")
    config.GIBBS_FUSED = True
    p1, i1 = gibbs.prod_appx_ms_gibbs(150, dens, n_iter=3, key=key,
                                      plan="device")
    config.GIBBS_FUSED = old
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                               rtol=0, atol=0)


def test_fused_batched_sets(force_fused):
    # vmapped pallas_call over the set axis of BatchedProductSampler
    rng = np.random.default_rng(4)
    sets = [_mk_densities(rng, 130, 2, 2) for _ in range(3)]
    key = jax.random.PRNGKey(4)
    old = config.GIBBS_FUSED
    config.GIBBS_FUSED = False
    s0 = gibbs.BatchedProductSampler(sets, n_out=100, n_iter=2)
    pts0, idx0 = s0.sample(key)
    config.GIBBS_FUSED = True
    s1 = gibbs.BatchedProductSampler(sets, n_out=100, n_iter=2)
    pts1, idx1 = s1.sample(key)
    config.GIBBS_FUSED = old
    assert np.array_equal(np.asarray(idx0), np.asarray(idx1))
    np.testing.assert_allclose(np.asarray(pts0), np.asarray(pts1),
                               rtol=0, atol=0)


def test_fused_moments(force_fused):
    # product of 2 standard normals (bw 0.35): mean ~ 0, std ~ 1/sqrt(2)
    # within Monte-Carlo brackets (reference test philosophy,
    # test/runtests.jl:167-182)
    rng = np.random.default_rng(5)
    dens = [kde(rng.normal(size=(2, 300)), np.full((2,), 0.35))
            for _ in range(2)]
    pts, _ = gibbs.prod_appx_ms_gibbs(300, dens, n_iter=5,
                                      key=jax.random.PRNGKey(5))
    pts = np.asarray(pts)
    pred = 1.0 / np.sqrt(2.0)
    assert np.linalg.norm(pts.mean(axis=1)) < pred
    assert np.all(pts.std(axis=1) > 0.5 * pred)
    assert np.all(pts.std(axis=1) < 1.6 * pred)


def test_grouped_vmap_layout_only():
    # grouping is layout only: same outputs as a flat vmap, including the
    # non-divisible remainder tail
    def chain(a, b):
        return a * 2 + b.sum(), (a + b).astype(jnp.int32)
    n = 2500                                    # 2 groups + 452 remainder
    a = jnp.arange(n, dtype=jnp.float32)
    b = jnp.ones((n, 3), jnp.float32)
    got = _grouped_vmap(chain, (a, b), n)
    want = jax.vmap(chain)(a, b)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_fused_fallback_on_compile_failure(monkeypatch):
    # under the "auto" gate, a fused region that fails to lower retries on
    # the pure-XLA engine (and disables fused for the process) instead of
    # crashing the user's first product call
    from kde_tpu.ops import gibbs_fused
    from kde_tpu.ops.gibbs import _run_with_fused_fallback

    calls = []

    def fn(x, *, fused_k):
        calls.append(fused_k)
        if fused_k:
            raise RuntimeError("mosaic lowering failed")
        return x + 1

    monkeypatch.setattr(gibbs_fused, "_FUSED_BROKEN", False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    old = config.GIBBS_FUSED
    config.GIBBS_FUSED = "auto"
    try:
        assert _run_with_fused_fallback(fn, 1, fused_k=(3, 128)) == 2
        assert calls == [(3, 128), 0]
        assert gibbs_fused._FUSED_BROKEN is True
        # ... and the gate now routes everything to the pure-XLA engine
        offsets = ((0, 2), (2, 4), (6, 8), (14, 200))
        assert _fused_k(offsets, 4, euclidean=True) == 0

        # an error NOT caused by the fused region re-raises unchanged
        gibbs_fused._FUSED_BROKEN = False

        def bad(x, *, fused_k):
            raise ValueError("user shape error")
        with pytest.raises(ValueError, match="user shape error"):
            _run_with_fused_fallback(bad, 1, fused_k=(3, 128))
        assert gibbs_fused._FUSED_BROKEN is False
    finally:
        config.GIBBS_FUSED = old
        gibbs_fused._FUSED_BROKEN = False


def test_fused_forced_never_falls_back(force_fused):
    # GIBBS_FUSED=True (tests, explicit opt-in) propagates failures
    from kde_tpu.ops.gibbs import _run_with_fused_fallback

    def fn(x, *, fused_k):
        raise RuntimeError("boom")
    with pytest.raises(RuntimeError, match="boom"):
        _run_with_fused_fallback(fn, 1, fused_k=(3, 128))


def test_sampler_freezes_engine_at_build(monkeypatch):
    # the engine choice is captured at construction: flipping the config
    # afterwards must not change which program a sampler RUNS (A/B
    # harnesses rely on this; tools/ab_fused.py).  A spy on the fused
    # entry point pins the behavior, not just the frozen attribute.
    from kde_tpu.ops import gibbs_fused
    calls = []
    real = gibbs_fused.fused_upper_levels

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)
    monkeypatch.setattr(gibbs_fused, "fused_upper_levels", spy)

    rng = np.random.default_rng(11)
    dens = _mk_densities(rng, 64, 2, 2)
    old = config.GIBBS_FUSED
    try:
        config.GIBBS_FUSED = False
        s_xla = gibbs.ProductSampler(dens, n_out=32, n_iter=2)
        config.GIBBS_FUSED = True
        s_fused = gibbs.ProductSampler(dens, n_out=32, n_iter=2)
        b_fused = gibbs.BatchedProductSampler([dens, dens], n_out=32,
                                              n_iter=2)
        # flip the config: frozen choices must still decide the program
        config.GIBBS_FUSED = True
        jax.clear_caches()                  # force a fresh trace
        s_xla.sample(jax.random.PRNGKey(0))
        assert not calls                    # frozen XLA: fused never traced
        config.GIBBS_FUSED = False
        p_f, i_f = s_fused.sample(jax.random.PRNGKey(0))
        assert calls                        # frozen fused: kernel traced
    finally:
        config.GIBBS_FUSED = old
    assert s_xla._fused_k == 0
    assert s_fused._fused_k and s_fused._fused_k[1] == 128
    assert b_fused._fused_k == s_fused._fused_k
    # and both engines still agree on the same key
    config.GIBBS_FUSED = False
    try:
        s2 = gibbs.ProductSampler(dens, n_out=32, n_iter=2)
        p_x, i_x = s2.sample(jax.random.PRNGKey(0))
    finally:
        config.GIBBS_FUSED = old
    assert np.array_equal(np.asarray(i_f), np.asarray(i_x))


def test_fused_fallback_end_to_end(monkeypatch):
    # wire check: a fused region that raises at trace/compile time inside
    # the real jitted product program still yields a correct product (the
    # pure-XLA retry), marks the engine broken, and later samplers skip it
    from kde_tpu.ops import gibbs_fused

    monkeypatch.setattr(gibbs_fused, "_FUSED_BROKEN", False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def boom(*a, **k):
        raise RuntimeError("mosaic lowering failed")
    monkeypatch.setattr(gibbs_fused, "fused_upper_levels", boom)

    rng = np.random.default_rng(12)
    dens = _mk_densities(rng, 96, 2, 2)
    old = config.GIBBS_FUSED
    config.GIBBS_FUSED = "auto"
    try:
        key = jax.random.PRNGKey(12)
        pts, idx = gibbs.prod_appx_ms_gibbs(64, dens, n_iter=2, key=key)
        assert np.all(np.isfinite(np.asarray(pts)))
        assert gibbs_fused._FUSED_BROKEN is True
        # equal to an explicit pure-XLA run with the same key
        config.GIBBS_FUSED = False
        p0, i0 = gibbs.prod_appx_ms_gibbs(64, dens, n_iter=2, key=key)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(i0))
        # batched sampler built after the failure freezes fused_k=0
        config.GIBBS_FUSED = "auto"
        assert gibbs.BatchedProductSampler([dens], n_out=32,
                                           n_iter=2)._fused_k == 0
    finally:
        config.GIBBS_FUSED = old
        gibbs_fused._FUSED_BROKEN = False


def test_fused_identical_degenerate_far_apart(force_fused):
    # the degenerate fallback (sum(exp(logits)) < 1e-99 -> uniform) fires
    # at every selection for far-apart densities; the fused kernel's
    # row-wise lse predicate must match the chain program's bit for bit
    rng = np.random.default_rng(14)
    dens = [kde(rng.normal(size=(1, 150)), np.full((1,), 0.1)),
            kde(rng.normal(size=(1, 150)) + 100.0, np.full((1,), 0.1))]
    p0, i0, l0, p1, i1, l1 = _ab(dens, 100, jax.random.PRNGKey(14))
    assert np.array_equal(i0, i1)
    assert np.array_equal(l0, l1)
    np.testing.assert_allclose(p0, p1, rtol=0, atol=0)


def test_lane_prefix_sum():
    # The TPU lowering of the in-kernel CDF scan (Mosaic has no cumsum
    # primitive) must compute the same prefix sums as jnp.cumsum up to
    # scan associativity: exact on the padded-zero tail, and within a few
    # ULPs of the f64 prefix everywhere (both are correct inverse-CDF
    # draws of the same normalized distribution).
    rng = np.random.default_rng(21)
    for W in (128, 256):
        logits = rng.normal(size=(64, W)).astype(np.float32)
        logits[:, W // 3:] = -np.inf          # padded lanes -> zero mass
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        p = (e / e.sum(axis=1, keepdims=True)).astype(np.float32)
        got = np.asarray(gibbs_fused._lane_prefix_sum(
            jnp.asarray(p), interpret=False))
        ref = np.cumsum(p.astype(np.float64), axis=1)
        np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-7)
        # the zero-mass tail stays within scan-associativity ULPs of the
        # running total (positions combine lanes in different tree orders,
        # so exact equality is NOT guaranteed -- only cumsum gives that)
        tail = got[:, W // 3:]
        total = got[:, W // 3 - 1:W // 3]
        np.testing.assert_allclose(tail, np.broadcast_to(total, tail.shape),
                                   rtol=1e-6)
        # interpret path IS jnp.cumsum (the bit-identity contract)
        np.testing.assert_array_equal(
            np.asarray(gibbs_fused._lane_prefix_sum(jnp.asarray(p),
                                                    interpret=True)),
            np.asarray(jnp.cumsum(jnp.asarray(p), axis=1)))
