"""Golden-fixture loading helpers.

The ``tests/testdata/*.txt`` files are the reference's golden dumps from the
original MATLAB/C++ toolbox (copied verbatim from the reference repo's
test/testdata; they are *data*, not code).  Format: one ``name=[v1, v2, ...]``
line per field, with **0-based** slot indices -- which is exactly this
framework's slot convention, so arrays compare element-for-element
(the reference's Julia tests need +1 fix-ups, see test/runtests.jl:55-68;
we need none).
"""
import os

import numpy as np

TESTDATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "testdata")


def load_fixture(name):
    out = {}
    with open(os.path.join(TESTDATA, name)) as f:
        for line in f:
            line = line.strip()
            if not line or "=" not in line:
                continue
            key, val = line.split("=", 1)
            body = val.strip().lstrip("[").rstrip("]")
            out[key.strip()] = np.array(
                [float(x) for x in body.split(",") if x.strip() != ""])
    return out


def load_points(name):
    """Whitespace-separated numeric table, one point per row."""
    return np.loadtxt(os.path.join(TESTDATA, name))


def gibbs_streams(rng, ndens, d, n_out, n_iter, max_np):
    """Pre-generated replay streams sized by the reference's budget
    (src/MSGibbs01.jl:661-662 as consumed by ops/gibbs.py: ``bu = ndens *
    (1 + L*(1+n_iter))`` uniforms and ``bn = d*(L+1)`` normals per chain,
    ``L = floor(log2 max_np) + 1``).  Single authority for the test
    suites' stream sizing."""
    n_levels = int(np.floor(np.log2(max_np))) + 1
    bu = n_out * ndens * (1 + n_levels * (1 + n_iter))
    bn = n_out * d * (n_levels + 1)
    return rng.uniform(size=bu), rng.normal(size=bn), n_levels
