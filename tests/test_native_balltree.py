"""Native (C++) tree builder must be bit-identical to the Python builder."""
import numpy as np
import pytest

from kde_tpu import native
from kde_tpu.ops.balltree import build_balltree


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def _compare(pts, w, bw):
    py = build_balltree(pts, w, bw, backend="python")
    nat = build_balltree(pts, w, bw, backend="native")
    for f in ("centers", "ranges", "weights", "means", "bandwidth",
              "left", "right", "lowest_leaf", "highest_leaf", "permutation",
              "depth", "bw_min", "bw_max"):
        np.testing.assert_array_equal(getattr(py, f), getattr(nat, f),
                                      err_msg=f)


def test_native_matches_python_uniform(lib):
    rng = np.random.default_rng(0)
    for n, d in [(2, 1), (7, 2), (100, 3), (513, 4)]:
        pts = rng.normal(size=(n, d))
        w = rng.uniform(0.5, 1.5, size=n)
        w /= w.sum()
        _compare(pts, w, np.full(d, 0.25))


def test_native_matches_python_multibw(lib):
    rng = np.random.default_rng(1)
    n, d = 64, 2
    pts = rng.normal(size=(n, d))
    bw = rng.uniform(0.1, 1.0, size=(n, d))
    _compare(pts, np.full(n, 1.0 / n), bw)


def test_native_matches_python_duplicates(lib):
    """Tie-handling in the quickselect must agree exactly."""
    rng = np.random.default_rng(2)
    pts = rng.integers(0, 4, size=(50, 2)).astype(float)  # many duplicates
    w = np.full(50, 0.02)
    _compare(pts, w, np.full(2, 0.5))


def test_native_golden_fixture(lib):
    """Native path passes the same golden dump as the Python path."""
    from fixtures import load_fixture
    pts = np.array([[0.1], [0.45], [0.55], [3.8]])
    tree = build_balltree(pts, np.full(4, 0.25), np.array([0.08]) ** 2,
                          backend="native")
    fx = load_fixture("test1DResult.txt")
    np.testing.assert_allclose(tree.centers.reshape(-1), fx["centers"],
                               atol=1e-5)
    np.testing.assert_array_equal(tree.left, fx["left_child"].astype(int))
