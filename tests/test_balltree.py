"""Golden-file tree-construction parity vs the original MATLAB/C++ toolbox.

Mirrors the reference's UnitTest1D01 / UnitTest2D01 / UnitTest2Dvar01
(reference test/runtests.jl:90-153): build a density with fixed bandwidth and
compare every tree field against the dumped fixture.
"""
import numpy as np
import pytest

from fixtures import load_fixture
from kde_tpu.ops.balltree import build_balltree, neighbor_min_max


def _check_tree(tree, fx, tol):
    d, n2 = tree.dims, 2 * tree.num_points
    assert int(fx["dims"][0]) == d
    assert int(fx["num_points"][0]) == tree.num_points
    # every fixture field covers the full 2N-slot layout
    assert fx["weights"].size == n2 and fx["centers"].size == n2 * d
    np.testing.assert_allclose(
        tree.centers.reshape(-1), fx["centers"], atol=tol, err_msg="centers")
    np.testing.assert_allclose(
        tree.ranges.reshape(-1), fx["ranges"], atol=tol, err_msg="ranges")
    np.testing.assert_allclose(
        tree.weights, fx["weights"], atol=tol, err_msg="weights")
    np.testing.assert_allclose(
        tree.means.reshape(-1), fx["means"], atol=tol, err_msg="means")
    np.testing.assert_allclose(
        tree.bandwidth.reshape(-1), fx["bandwidth"], atol=tol, err_msg="bandwidth")
    # index fields: the fixtures are 0-based like ours; NO_CHILD stays -1.
    # Unused slots are 0 in the fixtures and 0 in our arrays.
    np.testing.assert_array_equal(tree.left, fx["left_child"].astype(int))
    np.testing.assert_array_equal(tree.right, fx["right_child"].astype(int))
    np.testing.assert_array_equal(tree.lowest_leaf, fx["lowest_leaf"].astype(int))
    np.testing.assert_array_equal(tree.highest_leaf, fx["highest_leaf"].astype(int))
    # permutation: only the leaf half is meaningful (reference test/runtests.jl:76)
    np.testing.assert_array_equal(
        tree.permutation[tree.num_points:],
        fx["permutation"][tree.num_points:].astype(int))
    # bwMin/bwMax: uniform case stores one [d] vector; fixture dumps N*d values
    if not tree.multibandwidth:
        np.testing.assert_allclose(
            np.tile(tree.bw_max, tree.num_points), fx["bwMax"], atol=tol)
        np.testing.assert_allclose(
            np.tile(tree.bw_min, tree.num_points), fx["bwMin"], atol=tol)


def test_fixed_bw_1d():
    # reference test/runtests.jl:90-101 (UnitTest1D01)
    pts = np.array([[0.1], [0.45], [0.55], [3.8]])
    w = np.full(4, 0.25)
    bw = np.array([0.08]) ** 2
    tree = build_balltree(pts, w, bw)
    _check_tree(tree, load_fixture("test1DResult.txt"), 1e-5)


def test_fixed_bw_2d():
    # reference test/runtests.jl:118-129 (UnitTest2D01)
    pts = np.array([[0.5172, 0.0312], [0.7169, 1.0094], [0.4049, 2.0204]])
    w = np.full(3, 1.0 / 3.0)
    bw = np.array([0.1, 0.1]) ** 2
    tree = build_balltree(pts, w, bw)
    _check_tree(tree, load_fixture("test2DResult.txt"), 1e-5)


def test_fixed_bw_2d_var():
    # reference test/runtests.jl:143-153 (UnitTest2Dvar01): per-dim bandwidths
    pts = np.array([[0.5172, 0.0312], [7.169, 10.0094], [4.049, -2.0204]])
    w = np.full(3, 1.0 / 3.0)
    bw = np.array([0.1, 1.0]) ** 2
    tree = build_balltree(pts, w, bw)
    _check_tree(tree, load_fixture("test2DvarResult.txt"), 1e-4)


def test_single_point_tree():
    tree = build_balltree(np.array([[1.0, 2.0]]), np.array([1.0]),
                          np.array([0.5, 0.5]))
    assert tree.left[0] == 1 and tree.right[0] == -1
    np.testing.assert_allclose(tree.means[0], [1.0, 2.0])
    np.testing.assert_allclose(tree.bandwidth[0], [0.5, 0.5], rtol=1e-12)
    np.testing.assert_allclose(tree.ranges[0], [0.0, 0.0])


def test_level_lists_cover_leaves():
    rng = np.random.default_rng(0)
    n = 37
    pts = rng.normal(size=(n, 3))
    tree = build_balltree(pts, np.full(n, 1.0 / n), np.ones(3))
    n_levels = int(np.floor(np.log2(n))) + 1
    lists = tree.level_lists(n_levels)
    assert list(lists[0]) == [0]
    final = lists[-1]
    # after n_levels descents every node is a leaf, each exactly once
    assert sorted(final.tolist()) == list(range(n, 2 * n))
    # down_map maps each internal node to one of its children
    dm = tree.down_map()
    for s in range(n - 1):
        if tree.depth[s] >= 0 and not tree.is_leaf(s):
            assert dm[s] in (tree.left[s], tree.right[s])


def test_moment_matching_consistency():
    """Each node's (mean, variance) must moment-match its leaf mixture."""
    rng = np.random.default_rng(1)
    n = 64
    pts = rng.normal(size=(n, 2))
    bw = np.abs(rng.normal(size=(n, 2))) + 0.1
    w = rng.uniform(0.5, 1.5, size=n)
    w /= w.sum()
    tree = build_balltree(pts, w, bw)
    for node in [0, 1, 2]:
        lo, hi = tree.lowest_leaf[node], tree.highest_leaf[node]
        lw = tree.weights[lo:hi + 1]
        lm = tree.means[lo:hi + 1]
        lb = tree.bandwidth[lo:hi + 1]
        wt = lw.sum()
        mean = (lw[:, None] * lm).sum(0) / wt
        var = (lw[:, None] * (lb + lm ** 2)).sum(0) / wt - mean ** 2
        np.testing.assert_allclose(tree.weights[node], wt, rtol=1e-12)
        np.testing.assert_allclose(tree.means[node], mean, rtol=1e-9)
        np.testing.assert_allclose(tree.bandwidth[node], var, rtol=1e-8)


def test_neighbor_min_max_positive():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(100, 1))
    tree = build_balltree(pts, np.full(100, 0.01), np.ones(1))
    minm, maxm = neighbor_min_max(tree)
    assert 0 < minm <= maxm
