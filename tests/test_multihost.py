"""Executed multi-host path: 2 OS processes, gloo collectives (VERDICT r1 #6).

The reference has no distributed layer at all (SURVEY §2); ours is
``jax.distributed`` + named meshes.  Real pods are unavailable in this
environment, so this test runs the genuine multi-*process* path on CPU: two
subprocesses with 2 virtual devices each join one 4-device world over gloo,
and both the chain-sharded keyed product and the kernel-axis-sharded replay
product (whose label-CDF psum/all_gather reductions cross the process
boundary) must match their single-process results exactly -- see
multihost_worker.py for the assertions.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(sys.platform != "linux", reason="gloo transport")
def test_two_process_distributed_product():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK {i}" in out, out[-4000:]
