"""API smoke tests: accessors, sampling, resampling, serialization, repr --
mirroring the reference's testRand and the string round-trip testset
(reference test/runtests.jl:225-230, :246-255)."""
import numpy as np
import jax

from kde_tpu import (from_string, kde, load_kde, rand_kde, resample, sample,
                     sample_at, save_kde, set_seed, to_string)


def test_accessors_roundtrip():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2, 25))
    w = rng.uniform(0.5, 1.0, size=25)
    p = kde(pts, [0.3, 0.4], w)
    np.testing.assert_allclose(np.asarray(p.get_points()), pts, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p.get_bw()),
                               np.tile([[0.3], [0.4]], (1, 25)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p.get_weights()), w / w.sum(),
                               rtol=1e-12)


def test_sample_moments():
    """Samples from a KDE must match its mixture moments (law of total var)."""
    set_seed(42)
    pts = np.array([[-2.0, 2.0]])
    p = kde(pts, [0.5])
    s, ind = sample(p, 20000)
    s = np.asarray(s)
    assert s.shape == (1, 20000)
    assert set(np.unique(np.asarray(ind))) <= {0, 1}
    np.testing.assert_allclose(s.mean(), 0.0, atol=0.08)
    np.testing.assert_allclose(s.var(), 4.0 + 0.25, rtol=0.05)


def test_sample_at_fixed_labels():
    set_seed(1)
    p = kde(np.array([[0.0, 100.0]]), [0.1])
    pts, _ = sample_at(p, np.zeros(50, dtype=int))
    assert np.all(np.abs(np.asarray(pts)) < 1.0)


def test_rand_and_resample():
    set_seed(2)
    rng = np.random.default_rng(3)
    p = kde(rng.uniform(size=(2, 100)))
    assert np.asarray(rand_kde(p, 10)).shape == (2, 10)
    q = resample(p, 150)
    assert q.npts == 150 and q.ndim == 2
    qd = resample(p, 80, ks_type="discrete")
    assert qd.npts == 80
    # discrete resampling keeps the original kernel size
    np.testing.assert_allclose(np.asarray(qd.get_bw()[:, 0]),
                               np.asarray(p.get_bw()[:, 0]), rtol=1e-9)


def test_string_roundtrip():
    rng = np.random.default_rng(4)
    p = kde(rng.normal(size=(2, 3)))
    s = to_string(p)
    assert s.startswith("KDE:3:")
    pp = from_string(s)
    np.testing.assert_allclose(np.asarray(pp.get_points()),
                               np.asarray(p.get_points()), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pp.get_bw()),
                               np.asarray(p.get_bw()), atol=1e-4)


def test_npz_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    p = kde(rng.normal(size=(3, 20)), [0.2, 0.3, 0.4])
    path = str(tmp_path / "ckpt.npz")
    save_kde(path, p)
    q = load_kde(path)
    np.testing.assert_allclose(np.asarray(q.points), np.asarray(p.points))
    np.testing.assert_allclose(np.asarray(q.bw), np.asarray(p.bw))


def test_repr():
    p = kde(np.zeros((2, 5)), [0.1, 0.2])
    r = repr(p)
    assert "dims: 2" in r and "Npts: 5" in r


def test_kde_explicit_dtype_casts_device_inputs():
    """An explicit dtype= must be honored for device-array inputs too
    (it used to be silently ignored whenever any input was a jnp array)."""
    import jax.numpy as jnp
    from kde_tpu.density import KDE
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(16, 2)),
                      dtype=jnp.float32)
    p = kde(pts.T, [0.5], dtype=jnp.float32)
    assert p.dtype == jnp.float32
    with jax.enable_x64(True):
        var = jnp.full((16, 2), 0.25, jnp.float64)
        w = jnp.full((16,), 1.0 / 16, jnp.float64)
        q = KDE(jnp.asarray(pts, jnp.float64), var, w, dtype=jnp.float64)
        assert q.dtype == jnp.float64 and q.points.dtype == jnp.float64
        # explicit dtype casts mixed-precision inputs to one precision
        r = KDE(jnp.asarray(pts, jnp.float32), var, w, dtype=jnp.float64)
        assert r.points.dtype == jnp.float64
        assert r.bw.dtype == jnp.float64
        assert r.weights.dtype == jnp.float64
