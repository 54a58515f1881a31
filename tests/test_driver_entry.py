"""Driver-contract tests for __graft_entry__.py.

The round-1 failure mode: the driver IMPORTS the module and calls
dryrun_multichip(n) directly — it never runs the __main__ block — in an
environment where the axon TPU plugin is pinned and no CPU-mesh env vars
are set. These tests replicate that invocation exactly (fresh subprocess,
scrubbed env) so the MULTICHIP check can't silently regress again.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scrubbed_env():
    env = dict(os.environ)
    # remove everything conftest.py set up — the driver sets none of it
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def test_dryrun_multichip_driver_style():
    # exactly what the driver does: import module, call function, no env
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8); "
            "print('DRYRUN_OK')",
        ],
        cwd=REPO,
        env=_scrubbed_env(),
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout: {proc.stdout[-3000:]}\n"
        f"stderr: {proc.stderr[-3000:]}"
    )
    assert "DRYRUN_OK" in proc.stdout


def test_dryrun_multichip_after_backend_init():
    # pathological: caller already initialized a 1-device backend ->
    # the subprocess fallback must kick in
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "assert len(jax.devices()) == 1; "
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8); "
            "print('DRYRUN_OK')",
        ],
        cwd=REPO,
        env={**_scrubbed_env(), "JAX_PLATFORMS": "cpu", "XLA_FLAGS": ""},
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout: {proc.stdout[-3000:]}\n"
        f"stderr: {proc.stderr[-3000:]}"
    )
    assert "DRYRUN_OK" in proc.stdout
