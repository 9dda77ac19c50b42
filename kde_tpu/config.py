"""Global configuration flags.

The reference's entire configuration system is two globals (SURVEY C15):
``FORCE_EVAL_DIRECT`` (src/KernelDensityEstimate.jl:54) -- which disables the
dual-tree pruning so every evaluation is brute-force direct -- and
``DirectSize`` (src/BallTreeDensity01.jl:7), the leaf-block threshold.

On TPU, evaluation is *always* dense/direct (exact), so ``FORCE_EVAL_DIRECT``
is inherently true; the setter is kept for API compatibility and emits a
notice when callers attempt to enable tree pruning (which would be a
pessimization on this hardware).  ``DIRECT_SIZE`` survives as the query-chunk
threshold above which evaluation auto-tiles to bound HBM working sets.
"""

from __future__ import annotations

import logging

_log = logging.getLogger("kde_tpu")

FORCE_EVAL_DIRECT: bool = True

# Above this many query*component pairs, dense evaluation chunks the query
# axis (and the Pallas path tiles both axes).
DIRECT_PAIR_LIMIT: int = 1 << 24

# Above this many N*N pairs per dimension, the LOOCV entropy kernel stops
# materializing the [d, N, N] logit tensor and tiles instead (Pallas
# flash-style on TPU, lax.map query chunks elsewhere); see ops/loocv.py.
LOOCV_PAIR_LIMIT: int = 1 << 28

# Query-block size for the tiled (non-Pallas) LOO entropy path.
LOOCV_CHUNK: int = 1024

# Golden-search iterations unrolled straight into the LOOCV program when the
# probe is the DENSE (small-N) entropy kernel.  Each lax.while_loop iteration
# costs ~1 ms of dispatch latency on the axon remote runtime, while an
# unrolled stage inside the same program costs tens of us; the search
# converges in 13-20 iterations at tol 1e-2 across typical LOOCV problems
# (measured over bracket/data variations), so unrolling turns the
# reference's product-then-refit `*` tail (src/MSGibbs01.jl:725) from
# ~20 round trips into one program.  A while_loop backstop still covers the
# rare straggler bracket past this count.  0 disables unrolling.  The
# compute-bound tiled/Pallas probes (large N) keep the loop form: there the
# probe itself dominates and unrolled stages would pay full compute for
# already-converged dims.
GOLDEN_UNROLL: int = 24

# Speculative lookahead depth k for the unrolled golden search: probe
# positions depend only on comparison outcomes, so the probes of all
# 2^(i+1) outcome paths for the next k iterations are enumerated with pure
# bracket arithmetic and evaluated in ONE batched stage, then resolved --
# k iterations per stage, identical trajectory.  Costs 2^(k+1)-2 probe
# evaluations per stage, so it is gated to the dense path AND to problems
# where the per-stage speculative workload stays under
# LOOKAHEAD_WORK_LIMIT probe-pair units (the depth auto-reduces until it
# fits).  0 or 1 disables speculation.
#
# DEFAULT OFF — measured a wash on the real chip (tools/ab_lookahead.py,
# 2026-08-19, interleaved best-of-6 pipelined): k=2 is 1.00-1.01x on the
# device fit (N=1000 d=2 and N=150 d=4) and 1.04x on the end-to-end 4-D
# `*`; k=3 is 0.93-0.94x.  Pipelined dispatch already overlaps the
# sequential probe stages across queued calls, so cutting stage depth buys
# nothing that pays for the 2^(k+1)-2x probe compute.  (TPU compile of the
# speculative program is fine, ~13 s — the >15 min pathology is XLA:CPU
# only, which is why tests pin the trajectory at small unroll.)
GOLDEN_LOOKAHEAD: int = 0
LOOKAHEAD_WORK_LIMIT: int = 1 << 26

# Label-selection arithmetic for the KEYED (non-replay) Gibbs product path:
#   "cdf"     -- flat normalize/cumsum/count-below inverse-CDF draw, the
#                same arithmetic shape as the reference and the replay
#                path (ops/gibbs.py::_select_label);
#   "blocked" -- the SAME single-uniform inverse-CDF draw computed
#                block-hierarchically (block sums -> pick block -> resolve
#                within block): no full-width prefix sum, whose log-depth
#                lowering is what grows the compiled batched program's
#                temp footprint superlinearly (the round-4 "B=8 spill";
#                25->158 MB from B=4 to B=8 measured round 5).  Exact-
#                arithmetic-identical index per uniform; ulp-wide CDF
#                boundary ties may resolve differently, so replay keeps
#                the flat form;
#   "gumbel"  -- argmax(logits + Gumbel noise): fewest materialized
#                tensors but pays per-candidate threefry noise generation
#                (VPU-bound; loses at the headline batch sizes, wins in
#                the 16k-chain and 2x50k-comp regimes).
# All three sample the identical categorical distribution; keyed outputs
# differ per key across modes (no trace contract on the keyed path --
# PARITY.md "keyed reproducibility").  Replay mode (rand_u=) ALWAYS uses
# the flat CDF form regardless of this flag.
#
# The default "size" routes per problem from the measured (width x chains)
# winner grid (tools/ab_select_grid.py + ab_gumbel.py + ab_sweeps.py
# b-select-sweep, real chip 2026-08-20, interleaved best-of-rounds):
# cdf wins the small/headline regime (2x1000 comps at <=4096 chains,
# batched B<=7); gumbel wins the broad middle (1.3-2.5x: >=8192-wide
# leaves, chains*width >= ~8M, and batched B>=8 where the cdf cumsum's
# temp buffers spill); blocked wins very-wide/few-chain products (2.06x
# at 2x50,000 comps x 256 chains).  Set to one of the modes to force it.
GIBBS_SELECT: str = "size"

# "size" routing thresholds (chain-candidate sizes, from the grid above;
# boundary cells are within ~1.3x of each other, so the exact split
# points are low-stakes).
SELECT_BLOCKED_WIDTH: int = 32768     # leaf width for the blocked form...
SELECT_BLOCKED_MAX_CHAINS: int = 512  # ...when this few chains (and B=1)
SELECT_GUMBEL_WIDTH: int = 8192       # leaf width for gumbel
SELECT_GUMBEL_BATCH: int = 8          # batched sets: cdf spills at B>=8
SELECT_GUMBEL_WORK: int = 8 << 20     # chains*width for gumbel below that

# -- size-gated HOST fast paths (ops/host_small.py) ---------------------------
# On the axon remote-TPU runtime every dispatch is a network round trip
# (~1 ms in the degraded regime, ~30 ms for a blocking fetch), so
# reference-README-scale problems (N <= ~300) are pure latency on device.
# At or below these work sizes the corresponding op runs on the host in f64
# NumPy -- same math, same selection -- and never touches the device.
# Host-path results are returned as NumPy arrays (f64); set a limit to 0 to
# pin that op to the device path (jnp results) regardless of size.  The
# gates only ever engage for host-backed densities with host (NumPy)
# queries -- jnp inputs and traced callers always take the device path.

# LOOCV bandwidth selection: host when N*N*d <= this (N=255 at d=1).
HOST_LOOCV_LIMIT: int = 1 << 16

# Evaluation: host when M*N*d <= this (e.g. 200 queries x 300 comps x 4 dims).
HOST_EVAL_LIMIT: int = 1 << 18

# Sampling: host when n_draw * (N + n_draw) * d <= this.
HOST_SAMPLE_LIMIT: int = 1 << 18

def set_force_eval_direct(flag: bool = False) -> None:
    """API-compatible setter (reference ``setForceEvalDirect!``,
    src/KernelDensityEstimate.jl:56-60).  Dense evaluation is exact on TPU,
    so disabling direct evaluation has no effect beyond this notice."""
    global FORCE_EVAL_DIRECT
    FORCE_EVAL_DIRECT = bool(flag)
    if not flag:
        _log.info("kde_tpu evaluates densities densely (exact); dual-tree "
                  "pruning does not exist on this backend and errTol is "
                  "accepted for compatibility only.")


def enable_compilation_cache(path: str = "~/.cache/kde_tpu_xla") -> None:
    """Opt-in persistent XLA compilation cache.

    First-compile of the product program costs ~20-40 s on TPU; with a
    persistent cache, repeat processes with the same shapes can skip it.
    (On the axon remote-compile runtime the win is small -- compilation
    happens terminal-side -- but on directly-attached TPU hosts this
    removes the recurring first-call cost.)
    """
    import os

    import jax

    p = os.path.expanduser(path)
    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
