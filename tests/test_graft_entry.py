"""The driver entry points must work in a FRESH interpreter without
tests/conftest.py's CPU forcing — round 1's multichip dryrun failed exactly
because it relied on ambient platform config (VERDICT.md weak #1)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, extra_env=None, timeout=2700):
    env = dict(os.environ)
    # simulate the driver: no CPU forcing from the outside
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=timeout)


def test_dryrun_multichip_self_forces_cpu_mesh():
    # full dryrun incl. the selective-exchange and cross-session-alignment
    # collectives — a large compile set on the 1-core CI host, hence the
    # generous timeout
    r = _run(
        "import sys; sys.path.insert(0, '.');"
        "from __graft_entry__ import dryrun_multichip;"
        "dryrun_multichip(8)")
    assert r.returncode == 0, r.stderr[-4000:]
    assert "dryrun_multichip: 8 sessions stepped" in r.stdout
    assert "cross_session_loops=" in r.stdout


def test_dryrun_multichip_recovers_from_preinitialized_backend():
    # A 1-device CPU backend is already live when dryrun is called; it must
    # detect the mismatch and finish via its clean-subprocess fallback.
    # Lite mode: this test is about the recovery MECHANISM, so the heavy
    # cooperative compiles are skipped.
    r = _run(
        "import sys; sys.path.insert(0, '.');"
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "assert len(jax.devices()) < 8;"
        "from __graft_entry__ import dryrun_multichip;"
        "dryrun_multichip(8)",
        extra_env={"_MSST_DRYRUN_LITE": "1"}, timeout=1200)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "dryrun_multichip: 8 sessions stepped" in r.stdout
