"""Multi-PROCESS distributed training (tests the jax.distributed path).

Everything else in tests/ exercises the SPMD programs on a virtual
multi-device mesh inside ONE process; this launches TWO OS processes
wired together with ``parallel.multihost.initialize`` (the exact API a
multi-host pod slice uses, SURVEY.md section 2.6) and runs the full
distributed DQN training step over a global mesh spanning both -- the
cross-process gradient psum and the tensor-parallel psum("model") both
cross the process boundary (collectives ride Gloo on CPU, ICI/DCN on
TPU; same program).

Pass criterion: each process reports the same env-step count and the
SAME replicated-params checksum after 3 chunks -- params stayed
bitwise-replicated through cross-process collectives.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_training():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "examples",
                                          "multiprocess_dryrun.py"),
             str(i), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    for tag, steps in (("PROC0 OK", 72), ("PROC0 FUSED OK", 3072),
                       ("PROC0 RAINBOW OK", 1536)):
        want = [ln for out in outs for ln in out.splitlines()
                if ln.startswith(tag.replace("PROC0", "PROC0"))
                or ln.startswith(tag.replace("PROC0", "PROC1"))]
        assert len(want) == 2, (tag, outs)
        # Same step count, same replicated-params checksum on BOTH
        # processes (XLA dp x tp step, then the fused local-SGD kernel).
        assert want[0].split(" ", 1)[1] == want[1].split(" ", 1)[1], want
        assert f"env_steps={steps}" in want[0]
