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
