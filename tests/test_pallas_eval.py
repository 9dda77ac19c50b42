"""Pallas tiled evaluation kernel vs the dense XLA kernel (interpret mode on
CPU; the same kernel compiles to Mosaic on TPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from kde_tpu.ops import kernels
from kde_tpu.ops.pallas_eval import pallas_log_eval


@pytest.mark.parametrize("m,n,d", [(100, 300, 2), (512, 512, 1), (70, 1200, 4)])
def test_pallas_matches_dense(m, n, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    var = jnp.asarray(rng.uniform(0.2, 1.0, size=(n, d)), jnp.float32)
    w = rng.uniform(0.1, 1.0, size=n)
    w = jnp.asarray(w / w.sum(), jnp.float32)
    got = pallas_log_eval(q, mu, var, w, interpret=True)
    want = kernels.log_eval(q, mu, var, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pallas_loo_matches_dense():
    rng = np.random.default_rng(1)
    n, d = 300, 2
    pts = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    var = jnp.asarray(np.full((n, d), 0.3), jnp.float32)
    w = jnp.full((n,), 1.0 / n, jnp.float32)
    got = pallas_log_eval(pts, pts, var, w, loo=True, interpret=True)
    got = got - jnp.log1p(-w)
    want = kernels.log_eval_loo(pts, var, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
