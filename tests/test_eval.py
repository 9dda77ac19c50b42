"""Dense evaluation kernel correctness: values vs direct NumPy computation of
the reference's kernel formulas (src/DualTree01.jl:29-45, :130-162, :325-341).
"""
import numpy as np
import pytest

from kde_tpu import kde, manifolds
from kde_tpu.ops import kernels


def _np_eval(query_dn, pts_dn, bw_std_dn, w):
    """Direct O(M*N*d) reference-formula evaluation in NumPy."""
    d, m = query_dn.shape
    n = pts_dn.shape[1]
    var = bw_std_dn ** 2
    out = np.zeros(m)
    for j in range(m):
        acc = 0.0
        for i in range(n):
            quad = np.sum((query_dn[:, j] - pts_dn[:, i]) ** 2 / var[:, i])
            knorm = np.prod(np.sqrt(2 * np.pi * var[:, i]))
            acc += w[i] * np.exp(-0.5 * quad) / knorm
        out[j] = acc
    return out


def test_eval_matches_direct_uniform_bw():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2, 50))
    q = rng.normal(size=(2, 17))
    p = kde(pts, [0.3, 0.7])
    got = np.asarray(p.evaluate(q))
    bw = np.tile(np.array([[0.3], [0.7]]), (1, 50))
    want = _np_eval(q, pts, bw, np.full(50, 0.02))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_eval_matches_direct_multibw_weighted():
    rng = np.random.default_rng(1)
    n = 30
    pts = rng.normal(size=(3, n))
    bw = rng.uniform(0.2, 1.5, size=(3, n))
    w = rng.uniform(0.1, 1.0, size=n)
    q = rng.normal(size=(3, 11))
    p = kde(pts, bw, w)
    got = np.asarray(p.evaluate(q))
    want = _np_eval(q, pts, bw, w / w.sum())
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_loo_eval():
    """LOO at own points: sum_{i!=j} w_i K / norm / (1-w_j)
    (reference src/DualTree01.jl:146,:333-336)."""
    rng = np.random.default_rng(2)
    n = 20
    pts = rng.normal(size=(1, n))
    w = rng.uniform(0.5, 1.5, size=n)
    p = kde(pts, [0.4], w)
    got = np.asarray(p.evaluate(None, lv_flag=True))
    wn = w / w.sum()
    var = np.full((1, n), 0.16)
    want = np.zeros(n)
    for j in range(n):
        acc = 0.0
        for i in range(n):
            if i == j:
                continue
            acc += wn[i] * np.exp(-0.5 * (pts[0, j] - pts[0, i]) ** 2 / 0.16)
        want[j] = acc / np.sqrt(2 * np.pi * 0.16) / (1 - wn[j])
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_chunked_eval_matches():
    rng = np.random.default_rng(3)
    p = kde(rng.normal(size=(2, 40)), [0.5])
    q = rng.normal(size=(2, 100))
    np.testing.assert_allclose(np.asarray(p.evaluate(q, chunk=7)),
                               np.asarray(p.evaluate(q)), rtol=1e-12)


def test_eval_1d_vector_query():
    p = kde(np.array([0.0, 1.0]), [0.5])
    x = np.linspace(-1, 2, 7)
    got = np.asarray(p.evaluate(x))
    want = 0.5 * (np.exp(-0.5 * x ** 2 / 0.25) +
                  np.exp(-0.5 * (x - 1) ** 2 / 0.25)) / np.sqrt(2 * np.pi * 0.25)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_circular_manifold_eval():
    """Custom diffop path: density on S^1 must wrap."""
    pts = np.array([[3.1]])  # near +pi
    p = kde(pts, [0.3], diffop=(manifolds.circular_diff,))
    near = float(p.evaluate(np.array([[-3.1]]))[0])   # wraps to ~0.083 away
    far = float(p.evaluate(np.array([[0.0]]))[0])
    assert near > far
    # exact: distance is 2pi - 6.2
    dist = 2 * np.pi - 6.2
    want = np.exp(-0.5 * dist ** 2 / 0.09) / np.sqrt(2 * np.pi * 0.09)
    np.testing.assert_allclose(near, want, rtol=1e-9)


def test_entropy_positive_and_finite():
    rng = np.random.default_rng(4)
    from kde_tpu import entropy
    p = kde(rng.normal(size=(2, 64)), [0.5])
    h = float(entropy(p))
    assert np.isfinite(h)
    # near the differential entropy of N(0, I2 + bw) ~ 2.9
    assert 1.5 < h < 4.5


def test_marginal_consistency():
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(3, 30))
    bw = np.array([0.3, 0.5, 0.9])
    p = kde(pts, bw)
    m = p.marginal([1])
    x = np.linspace(-2, 2, 9)
    got = np.asarray(m.evaluate(x))
    q = kde(pts[1:2, :], [0.5])
    np.testing.assert_allclose(got, np.asarray(q.evaluate(x)), rtol=1e-12)


def test_log_eval_loo_auto_chunk_matches_dense(monkeypatch):
    """Above DIRECT_PAIR_LIMIT the LOO self-evaluation (entropy,
    evaluate(lv_flag=True)) auto-chunks; results must match the dense
    [N, N] path exactly."""
    import jax.numpy as jnp
    from kde_tpu import config
    from kde_tpu.ops.kernels import log_eval_loo
    rng = np.random.default_rng(11)
    n = 157
    pts = jnp.asarray(rng.normal(size=(n, 2)))
    var = jnp.full((n, 2), 0.2)
    w = rng.uniform(0.5, 1.5, size=n)
    w = jnp.asarray(w / w.sum())
    dense = log_eval_loo(pts, var, w)
    monkeypatch.setattr(config, "DIRECT_PAIR_LIMIT", 64 * n)
    chunked = log_eval_loo(pts, var, w)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                               rtol=1e-12)
