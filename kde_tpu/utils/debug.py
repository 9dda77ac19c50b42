"""Debug dumpers and profiling helpers.

The reference's only introspection tools are ``printBallTree``
(src/BallTree01.jl:465-475) and the commented-out ``printGlbs`` chain-state
dumper (src/MSGibbs01.jl:64-79); SURVEY §5 asks for TPU equivalents plus
``jax.profiler`` integration.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import numpy as np

from ..ops.balltree import FlatBallTree


def print_ball_tree(tree: FlatBallTree, digits: int = 6) -> None:
    """Field dump of the flat tree (reference printBallTree,
    src/BallTree01.jl:465-475 + src/BallTreeDensity01.jl:337-345)."""
    r = lambda a: np.round(a, digits)
    print(f"dims={tree.dims} num_points={tree.num_points} "
          f"multibandwidth={tree.multibandwidth}")
    print("centers =", r(tree.centers.reshape(-1)).tolist())
    print("ranges  =", r(tree.ranges.reshape(-1)).tolist())
    print("weights =", r(tree.weights).tolist())
    print("left    =", tree.left.tolist())
    print("right   =", tree.right.tolist())
    print("lowest  =", tree.lowest_leaf.tolist())
    print("highest =", tree.highest_leaf.tolist())
    print("perm    =", tree.permutation.tolist())
    print("means   =", r(tree.means.reshape(-1)).tolist())
    print("bw      =", r(tree.bandwidth.reshape(-1)).tolist())


def print_chain_state(points, indices, labels=None, sample: int = 0) -> None:
    """Per-chain dump of a Gibbs product result (the ``printGlbs``
    equivalent): the sampled point, final labels, and -- when recorded --
    the per-level label path."""
    pts = np.asarray(points)
    idx = np.asarray(indices)
    print(f"chain {sample}: x={np.round(pts[:, sample], 4).tolist()} "
          f"labels={idx[:, sample].tolist()}")
    if labels is not None:
        lab = np.asarray(labels)
        for j in range(lab.shape[1]):
            print(f"  density {j}: level path {lab[sample, j].tolist()}")


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/kde_tpu_trace"):
    """Wrap a region in a ``jax.profiler`` trace viewable in TensorBoard /
    Perfetto."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def fence(*outputs) -> float:
    """Force device completion of ``outputs`` and return a checksum scalar.

    ``jax.block_until_ready`` is NOT a completion fence on journaling remote
    runtimes (e.g. the axon TPU tunnel: it returns when the dispatch journal
    accepts the work).  The only reliable fence is a data dependency: reduce
    every output to one scalar and fetch it.  Use this around timed sections
    and before relying on side effects of queued work.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    leaves = [l for l in jax.tree_util.tree_leaves(outputs)
              if hasattr(l, "dtype")]
    if not leaves:
        return 0.0
    acc = jnp.sum(jnp.stack([jnp.sum(l).astype(jnp.float32) for l in leaves]))
    return float(np.asarray(acc))
