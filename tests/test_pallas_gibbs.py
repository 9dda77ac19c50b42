"""Tests for the fused Pallas Gibbs kernels (ops/gibbs_pallas.py).

The kernels only lower on a real TPU backend, so on the (hermetic CPU) test
mesh we validate the host-side plan packing they consume plus the support
predicate; the on-TPU label-for-label equivalence against the jnp engine is
exercised by scripts on the device (and was verified exact at 2x1000
components -- see the module docstring of ops/gibbs_pallas.py).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kde_tpu import kde
from kde_tpu.ops import gibbs as g
from kde_tpu.ops import gibbs_pallas as gp


def _plan(ns=(33, 50), d=2, n_out=40):
    rng = np.random.default_rng(3)
    dens = [kde(rng.normal(size=(d, n)), [0.4] * d, dtype=jnp.float32)
            for n in ns]
    return dens, g._ProductPlan(dens, n_out, jnp.float32)


def test_pk_offsets_pow2_and_aligned():
    _, plan = _plan()
    for (o, w), (_, true_w) in zip(plan.pk_offsets, plan.offsets):
        assert w >= max(gp.MIN_WIDTH, true_w)
        assert w & (w - 1) == 0, "bucket width must be a power of two"
        assert o % w == 0, "offset must be bucket-aligned (BlockSpec index)"


def test_pk_packing_matches_level_arrays():
    dens, plan = _plan()
    dn, d = plan.ndens, plan.ndim
    pk_mean = np.asarray(plan.pk_mean)
    pk_logw = np.asarray(plan.pk_logw)
    pk_perm = np.asarray(plan.pk_perm)
    lvl_mean = np.asarray(plan.lvl_mean)
    lvl_logw = np.asarray(plan.lvl_logw)
    trees = [p.tree for p in dens]
    for l in range(1, plan.n_levels + 1):
        o, w_true = plan.offsets[l - 1]
        po, pw = plan.pk_offsets[l - 1]
        for j in range(dn):
            nv = len(trees[j].level_lists(plan.n_levels)[l])
            # valid slots match the jnp path's level arrays
            for k in range(d):
                np.testing.assert_array_equal(
                    pk_mean[po:po + nv, j * d + k], lvl_mean[j, o:o + nv, k])
            np.testing.assert_allclose(
                pk_logw[po:po + nv, j], lvl_logw[j, o:o + nv], rtol=1e-6)
            # padded slots replicate the last valid node with -inf log-weight
            if nv < pw:
                assert np.all(np.isneginf(pk_logw[po + nv:po + pw, j]))
                np.testing.assert_array_equal(
                    pk_perm[po + nv:po + pw, j],
                    np.full(pw - nv, pk_perm[po + nv - 1, j]))
                for k in range(d):
                    np.testing.assert_array_equal(
                        pk_mean[po + nv:po + pw, j * d + k],
                        np.full(pw - nv, pk_mean[po + nv - 1, j * d + k]))


def test_pk_root_stats():
    dens, plan = _plan()
    d = plan.ndim
    root_mean = np.asarray(plan.pk_root_mean).reshape(plan.ndens, d)
    root_bw = np.asarray(plan.pk_root_bw).reshape(plan.ndens, d)
    for j, p in enumerate(dens):
        np.testing.assert_allclose(root_mean[j], p.tree.means[0], rtol=1e-6)
        np.testing.assert_allclose(root_bw[j], p.tree.bandwidth[0], rtol=1e-6)


def test_pallas_supported_gates():
    _, plan = _plan()
    on_cpu = jax.default_backend() == "cpu"
    # replay mode always falls back to the (semantically exact) jnp path
    assert not gp.pallas_supported(plan, jnp.float32, None, None, None, None,
                                   np.zeros(4))
    # manifold hooks fall back
    assert not gp.pallas_supported(plan, jnp.float32, (lambda a, b: a + b,),
                                   None, None, None, None)
    # float64 falls back
    assert not gp.pallas_supported(plan, jnp.float64, None, None, None, None,
                                   None)
    if on_cpu:
        assert not gp.pallas_supported(plan, jnp.float32, None, None, None,
                                       None, None)


def test_kde_retains_host_arrays():
    """Tree construction must not read back from device (a D2H readback
    permanently degrades dispatch latency on the axon remote-TPU runtime)."""
    rng = np.random.default_rng(0)
    p = kde(rng.normal(size=(2, 32)), [0.3], dtype=jnp.float32)
    assert p._host_points is not None and p._host_points.shape == (32, 2)
    assert p._host_bw is not None and p._host_weights is not None
    # the tree built from host copies matches one built from device values
    t = p.tree
    np.testing.assert_allclose(
        np.sort(t.means[t.num_points:], axis=0),
        np.sort(np.asarray(p.points, dtype=np.float64), axis=0), rtol=1e-6)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="Pallas TPU kernels require a TPU backend")
def test_pallas_matches_jnp_on_tpu():
    from kde_tpu import prod_appx_ms_gibbs
    rng = np.random.default_rng(1)
    dens = [kde(rng.normal(size=(2, 64)), [0.3], dtype=jnp.float32)
            for _ in range(2)]
    key = jax.random.PRNGKey(5)
    pts_p, idx_p = prod_appx_ms_gibbs(64, dens, n_iter=3, key=key,
                                      use_pallas=True)
    pts_j, idx_j = prod_appx_ms_gibbs(64, dens, n_iter=3, key=key,
                                      use_pallas=False)
    match = np.mean(np.asarray(idx_p) == np.asarray(idx_j))
    assert match > 0.95          # float-order differences only
