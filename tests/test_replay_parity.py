"""Trace-parity: the vectorized TPU Gibbs engine must reproduce the serial
CPU implementation *exactly* (labels and points) when both consume the same
injected random streams -- the reference's own cross-implementation
validation technique (src/MSGibbs01.jl:691-695, SURVEY §4 determinism hook).
"""
import numpy as np
import pytest

from kde_tpu import kde, prod_appx_ms_gibbs
from kde_tpu.reference_impl import serial_gibbs_product


from fixtures import gibbs_streams as _streams  # noqa: E402 (shared sizing)


@pytest.mark.parametrize("cfg", [
    dict(d=1, ns=(8, 8), n_out=8, n_iter=3),
    dict(d=2, ns=(16, 16, 16), n_out=8, n_iter=2),
    dict(d=3, ns=(10, 33), n_out=12, n_iter=1),   # ragged component counts
    dict(d=2, ns=(16, 16), n_out=8, n_iter=0),
])
def test_replay_parity(cfg):
    rng = np.random.default_rng(7)
    d, ns, n_out, n_iter = cfg["d"], cfg["ns"], cfg["n_out"], cfg["n_iter"]
    dens = [kde(rng.normal(size=(d, n)), list(rng.uniform(0.3, 0.8, size=d)))
            for n in ns]
    ru, rn, _ = _streams(rng, len(ns), d, n_out, n_iter, max(ns + (n_out,)))

    pts_s, idx_s, lab_s = serial_gibbs_product(
        [p.tree for p in dens], n_out, n_iter, ru, rn)
    pts_v, idx_v, lab_v = prod_appx_ms_gibbs(
        n_out, dens, n_iter=n_iter, rand_u=ru, rand_n=rn, record_labels=True)

    np.testing.assert_array_equal(np.asarray(idx_v), idx_s)
    np.testing.assert_array_equal(np.asarray(lab_v), lab_s)
    np.testing.assert_allclose(np.asarray(pts_v), pts_s, rtol=1e-9, atol=1e-12)


def test_replay_parity_partial_dims():
    rng = np.random.default_rng(8)
    d, n = 2, 16
    p1 = kde(rng.normal(size=(d, n)) + 5.0, [0.4, 0.4])
    p2 = kde(rng.normal(size=(d, n)), [0.4, 0.4])
    p3 = kde(rng.normal(size=(d, n)) - 5.0, [0.4, 0.4])
    mask = np.array([[True, False], [True, True], [False, True]])
    ru, rn, _ = _streams(rng, 3, d, 8, 2, 16)
    pts_s, idx_s, _ = serial_gibbs_product(
        [p.tree for p in (p1, p2, p3)], 8, 2, ru, rn, partial_dim_mask=mask)
    pts_v, idx_v = prod_appx_ms_gibbs(
        8, [p1, p2, p3], n_iter=2, rand_u=ru, rand_n=rn,
        partial_dim_mask=mask)
    np.testing.assert_array_equal(np.asarray(idx_v), idx_s)
    np.testing.assert_allclose(np.asarray(pts_v), pts_s, rtol=1e-9, atol=1e-12)


def test_replay_parity_no_entropy():
    rng = np.random.default_rng(9)
    dens = [kde(rng.normal(size=(1, 8)), [0.5]) for _ in range(2)]
    ru, rn, _ = _streams(rng, 2, 1, 4, 3, 8)
    pts_s, idx_s, _ = serial_gibbs_product(
        [p.tree for p in dens], 4, 3, ru, rn, add_entropy=False)
    pts_v, idx_v = prod_appx_ms_gibbs(
        4, dens, n_iter=3, rand_u=ru, rand_n=rn, add_entropy=False)
    np.testing.assert_array_equal(np.asarray(idx_v), idx_s)
    np.testing.assert_allclose(np.asarray(pts_v), pts_s, rtol=1e-9, atol=1e-12)


def test_replay_parity_multibandwidth():
    """Products of multi-bandwidth KDEs (per-kernel bw, reference
    BallTreeDensity01.jl:209-224) run through the same tree-stat plan."""
    rng = np.random.default_rng(11)
    d, n = 2, 16
    dens = []
    for _ in range(2):
        pts = rng.normal(size=(d, n))
        bw = rng.uniform(0.2, 0.8, size=(d, n))     # per-kernel std-devs
        dens.append(kde(pts, bw))
    assert all(p.multibandwidth for p in dens)
    ru, rn, _ = _streams(rng, 2, d, 8, 2, 16)
    pts_s, idx_s, _ = serial_gibbs_product(
        [p.tree for p in dens], 8, 2, ru, rn)
    pts_v, idx_v = prod_appx_ms_gibbs(8, dens, n_iter=2, rand_u=ru, rand_n=rn)
    np.testing.assert_array_equal(np.asarray(idx_v), idx_s)
    np.testing.assert_allclose(np.asarray(pts_v), pts_s, rtol=1e-9, atol=1e-12)


def test_replay_parity_cdf_near_ties():
    """Engineered exact CDF ties: densities whose kernels are all identical
    make every per-level candidate probability an exact binary fraction
    (1/2, 1/4 -- exactly representable), so the cumulative CDF hits exact
    floating-point boundaries.  The injected uniform stream lands exactly ON
    those boundaries and one ulp to either side, pinning the tie rule
    (``u <= cdf[z]`` accepts, reference selectLabelOnLevel
    src/MSGibbs01.jl:330-351) across the vectorized engine and the serial
    oracle -- the hazard VERDICT round 1 flagged as latent."""
    d, n, dn, n_out, n_iter = 2, 4, 2, 6, 1
    pts = np.zeros((d, n))                 # 4 identical kernels per density
    dens = [kde(pts, [0.5, 0.5]) for _ in range(dn)]
    max_np = max(n, n_out)
    L = int(np.floor(np.log2(max_np))) + 1
    bu = n_out * dn * (1 + L * (1 + n_iter))
    bn = n_out * d * (L + 1)
    eps = np.finfo(np.float64).eps
    # cycle through exact boundaries of the {1/2,1/4}-grid CDFs and their
    # one-ulp neighbours
    boundary = np.array([0.25, 0.5, 0.75,
                         0.25 - eps / 4, 0.5 - eps / 2, 0.75 - eps,
                         0.25 + eps / 2, 0.5 + eps, 0.75 + eps,
                         np.nextafter(1.0, 0.0), eps, 1.0 - 2 * eps])
    ru = np.resize(boundary, bu)
    rn = np.zeros(bn)                      # deterministic draws
    pts_s, idx_s, lab_s = serial_gibbs_product(
        [p.tree for p in dens], n_out, n_iter, ru, rn)
    pts_v, idx_v, lab_v = prod_appx_ms_gibbs(
        n_out, dens, n_iter=n_iter, rand_u=ru, rand_n=rn, record_labels=True)
    np.testing.assert_array_equal(np.asarray(idx_v), idx_s)
    np.testing.assert_array_equal(np.asarray(lab_v), lab_s)
    np.testing.assert_allclose(np.asarray(pts_v), pts_s, rtol=1e-9, atol=1e-12)


def test_replay_parity_randomized_grid():
    """Breadth fuzz (fixed seed): random dims/density-counts/ragged
    component counts/multibandwidth/partial masks/n_iter must all be
    trace-exact vs the serial oracle.  (A 60-config sweep of this generator
    passed 60/60; this keeps a 12-config slice as a fast regression.)"""
    rng = np.random.default_rng(123)
    for trial in range(12):
        d = int(rng.integers(1, 5))
        dn = int(rng.integers(2, 6))
        ns = [int(rng.integers(2, 40)) for _ in range(dn)]
        n_out = int(rng.integers(2, 24))
        n_iter = int(rng.integers(0, 5))
        multibw = rng.random() < 0.3
        use_mask = rng.random() < 0.3 and d > 1
        dens = []
        for n in ns:
            pts = rng.normal(size=(d, n)) * rng.uniform(0.5, 3)
            bw = (rng.uniform(0.2, 1.0, size=(d, n)) if multibw
                  else list(rng.uniform(0.2, 1.0, size=d)))
            dens.append(kde(pts, bw, weights=rng.uniform(0.1, 1.0, size=n)))
        mask = None
        if use_mask:
            while True:
                mask = rng.random(size=(dn, d)) < 0.7
                if mask.sum(axis=0).min() >= 2:
                    break
        max_np = max(ns + [n_out])
        L = int(np.floor(np.log2(max_np))) + 1
        ru = rng.uniform(size=n_out * dn * (1 + L * (1 + n_iter)))
        rn = rng.normal(size=n_out * d * (L + 1))
        ps, is_, _ = serial_gibbs_product([p.tree for p in dens], n_out,
                                          n_iter, ru, rn,
                                          partial_dim_mask=mask)
        pv, iv = prod_appx_ms_gibbs(n_out, dens, n_iter=n_iter, rand_u=ru,
                                    rand_n=rn, partial_dim_mask=mask)
        np.testing.assert_array_equal(np.asarray(iv), is_,
                                      err_msg=f"trial {trial}")
        np.testing.assert_allclose(np.asarray(pv), ps, rtol=1e-9, atol=1e-12)


def test_replay_parity_degenerate_far_apart():
    """Two densities ~100 bandwidths apart: every cross-density kernel
    likelihood underflows the reference's 1e-99 total (linear f64), so the
    serial oracle's degenerate fallback (uniform draw) fires at every
    selection.  The engine's log-space predicate (sum(exp(logits)) < 1e-99,
    ops/gibbs.py::_dead_predicate) must fire identically -- an all--inf
    predicate would instead softmax the finite ~-5e4 logits and
    near-deterministically pick the closest kernel, silently diverging from
    the reference in exactly this corner."""
    rng = np.random.default_rng(31)
    d, n, n_out, n_iter = 1, 16, 10, 2
    dens = [kde(rng.normal(size=(d, n)), [0.1]),
            kde(rng.normal(size=(d, n)) + 100.0, [0.1])]
    ru, rn, _ = _streams(rng, 2, d, n_out, n_iter, max(n, n_out))

    pts_s, idx_s, lab_s = serial_gibbs_product(
        [p.tree for p in dens], n_out, n_iter, ru, rn)
    pts_v, idx_v, lab_v = prod_appx_ms_gibbs(
        n_out, dens, n_iter=n_iter, rand_u=ru, rand_n=rn, record_labels=True)

    np.testing.assert_array_equal(np.asarray(idx_v), idx_s)
    np.testing.assert_array_equal(np.asarray(lab_v), lab_s)
    np.testing.assert_allclose(np.asarray(pts_v), pts_s, rtol=1e-9,
                               atol=1e-12)


def test_replay_degenerate_zero_last_weight():
    """Pin the ZERO-LAST-WEIGHT degenerate corner (the one deliberate
    behavioral divergence from the reference, PARITY.md "degenerate
    fallback").

    When a selection's candidate total underflows 1e-99, the reference
    assigns every candidate the LAST level-list node's weight
    (src/MSGibbs01.jl:311-315).  If that weight is 0 the reference's CDF
    degenerates to all-zeros and its scan (:330-351) falls through to the
    LAST candidate -- i.e. it deterministically selects the zero-weight
    kernel.  kde_tpu documents uniform-over-candidates instead
    (reference_impl.py): the fallback CDF is uniform over the level list
    regardless of the last node's weight.

    Fixture: 1-D densities 1e4 bandwidths apart (every selection
    degenerate), each with its LARGEST point (the last leaf of the sorted
    1-D tree) at weight 0.  With every injected uniform at 0.1, the uniform
    fallback selects candidate 0 at every level in ALL engines (serial
    oracle, XLA, kernel-sharded(8)); the reference would return the
    zero-weight last leaf instead.  Asserts trace equality across the
    engines AND the selected-label semantics directly."""
    import jax
    from jax.sharding import Mesh
    from kde_tpu.parallel.gibbs_kernel_sharded import (
        prod_appx_ms_gibbs_kernel_sharded)
    from kde_tpu.parallel.mesh import KERNELS

    d, n, n_out, n_iter = 1, 4, 4, 2
    # input order ascending: leaf order == input order, so input index 3
    # (value 3.0, the largest) is the LAST leaf -- give it weight 0
    pts = np.arange(float(n))[None, :]                      # [1, 4]
    w = np.array([0.4, 0.3, 0.3, 0.0])
    dens = [kde(pts, [0.1], weights=w),
            kde(pts + 1e4, [0.1], weights=w)]

    L = int(np.floor(np.log2(max(n, n_out)))) + 1
    bu = n_out * 2 * (1 + L * (1 + n_iter))
    bn = n_out * d * (L + 1)
    ru = np.full(bu, 0.1)
    rn = np.zeros(bn)

    # sanity: the corner is live -- the serial oracle's fallback fires with
    # a zero-weight last candidate at the leaf level
    pts_s, idx_s, lab_s = serial_gibbs_product(
        [p.tree for p in dens], n_out, n_iter, ru, rn)
    pts_v, idx_v, lab_v = prod_appx_ms_gibbs(
        n_out, dens, n_iter=n_iter, rand_u=ru, rand_n=rn, record_labels=True)
    mesh = Mesh(np.array(jax.devices()[:8]), (KERNELS,))
    pts_k, idx_k, lab_k = prod_appx_ms_gibbs_kernel_sharded(
        mesh, n_out, dens, n_iter=n_iter, rand_u=ru, rand_n=rn,
        record_labels=True)

    # engines agree exactly
    np.testing.assert_array_equal(np.asarray(idx_v), idx_s)
    np.testing.assert_array_equal(np.asarray(lab_v), lab_s)
    np.testing.assert_allclose(np.asarray(pts_v), pts_s, rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(idx_k), idx_s)
    np.testing.assert_array_equal(np.asarray(lab_k), lab_s)
    np.testing.assert_allclose(np.asarray(pts_k), pts_s, rtol=1e-9,
                               atol=1e-12)

    # the documented semantics: u=0.1 under the uniform fallback selects
    # candidate 0 (CDF 0.25 at the 4-wide leaf level), so every final label
    # is input index 0 -- NOT the reference's fall-to-last (which would
    # deterministically return 3, the zero-weight kernel)
    np.testing.assert_array_equal(idx_s, np.zeros((2, n_out), np.int64))
    assert not np.any(idx_s == 3)


def test_replay_parity_marginal_overlap():
    """Intermediate regime: kernel likelihoods small but ABOVE the 1e-99
    threshold (densities ~15 bandwidths apart, logits ~ -100): the fallback
    must NOT fire, and the max-shifted CDF must still match the oracle's
    linear-space normalization exactly."""
    rng = np.random.default_rng(33)
    d, n, n_out, n_iter = 1, 12, 8, 2
    dens = [kde(rng.normal(size=(d, n)) * 0.3, [1.0]),
            kde(rng.normal(size=(d, n)) * 0.3 + 15.0, [1.0])]
    ru, rn, _ = _streams(rng, 2, d, n_out, n_iter, max(n, n_out))
    pts_s, idx_s, lab_s = serial_gibbs_product(
        [p.tree for p in dens], n_out, n_iter, ru, rn)
    pts_v, idx_v, lab_v = prod_appx_ms_gibbs(
        n_out, dens, n_iter=n_iter, rand_u=ru, rand_n=rn, record_labels=True)
    np.testing.assert_array_equal(np.asarray(idx_v), idx_s)
    np.testing.assert_array_equal(np.asarray(lab_v), lab_s)
    np.testing.assert_allclose(np.asarray(pts_v), pts_s, rtol=1e-9,
                               atol=1e-12)
