"""Standalone repro for the XLA:CPU backend_compile crash that forces
tests/test_spmd_fused.py's subprocess isolation (VERDICT r4 item 8).

Symptom
-------
XLA:CPU dies with SIGSEGV or SIGABRT inside ``backend_compile`` when it
compiles a LARGE shard_map + Pallas-interpret program late in a
long-lived process that has already accumulated many compilations.
Observed 5/5 on full-suite runs (round 4b): the first such compile to
execute after ~200 prior test-case compilations crashed -- four times
the fused-DRQN one-device lock, once (with the DRQN trio already
isolated) the fused-DQN two-device pmean lock.

Minimization evidence (why this script wraps the full suite)
------------------------------------------------------------
Every attempted reduction PASSES: this file's tests alone, every
bisected subset of the suite (native/ctypes + ui/io + multiprocess
combinations), and any order that puts the big compile early.  The
trigger is accumulated in-process compiler state crossing a threshold,
not a specific program or predecessor -- so the smallest known repro IS
the full suite with the isolation disabled, which is exactly what this
script runs (single pytest process, no xdist, MGT_SPMD_INPROC=1).
Runtime ~8-10 min on this machine's 2 CPUs.

Exit path
---------
* exit != 0 with a SIGSEGV/SIGABRT in the tail of the log: bug still
  present -- keep the subprocess scaffolding in test_spmd_fused.py.
* exit 0: the compiler is fixed at this jax/jaxlib version -- retire
  ``_run_in_fresh_process`` and the ``-n 2`` xdist addopts in
  pyproject.toml (see tests/test_spmd_fused.py docstring).

The suite-level canary (tests/test_spmd_fused.py::
test_crash_canary_full_suite_inprocess) runs this script when
MGT_RUN_CRASH_CANARY=1 and FAILS on exit 0, so a jax upgrade that fixes
the bug is flagged instead of silently ossifying the workaround.

Usage:  python docs/xla_cpu_crash_repro.py
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run():
    env = dict(os.environ, MGT_SPMD_INPROC="1",
               PYTHONFAULTHANDLER="1")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "-x", "-n", "0",
         "-p", "no:cacheprovider"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
    sys.stdout.write(r.stdout[-4000:])
    sys.stderr.write(r.stderr[-4000:])
    print(f"\nexit code: {r.returncode}", flush=True)
    if r.returncode < 0:
        print(f"CRASH REPRODUCED: died on signal {-r.returncode} "
              "(bug still present; keep the isolation)")
    elif r.returncode == 0:
        print("NO CRASH: compiler may be fixed -- see 'Exit path' above")
    else:
        print("suite failed without crashing (investigate separately)")
    return r.returncode


if __name__ == "__main__":
    sys.exit(0 if run() < 0 else 1)
