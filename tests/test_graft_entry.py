"""Driver-contract tests for __graft_entry__.dryrun_multichip.

Round-1 failure mode (MULTICHIP_r01.json): the driver calls
``dryrun_multichip(8)`` in a process whose backend sees one device and no
``--xla_force_host_platform_device_count`` flag.  These tests reproduce that
environment in clean subprocesses (conftest's flags are stripped) and assert
the entry point self-provisions the virtual 8-device CPU mesh.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    # Strip everything conftest set up so the child looks like the driver.
    env.pop("XLA_FLAGS", None)
    env.pop("_GRAFT_DRYRUN_CHILD", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _run(code: str, timeout=600):
    return subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          env=_clean_env(), capture_output=True, text=True,
                          timeout=timeout)


@pytest.mark.slow
def test_dryrun_fresh_process():
    """Driver scenario: fresh interpreter, no device-count flags."""
    proc = _run("import __graft_entry__; __graft_entry__.dryrun_multichip(8)")
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip OK" in proc.stdout


@pytest.mark.slow
def test_dryrun_backend_already_initialised():
    """Worst case: the caller already initialised a 1-device backend before
    invoking dryrun_multichip — must fall back to a clean subprocess."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) < 8, 'precondition: small backend'\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
    )
    proc = _run(code)
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip OK" in proc.stdout
