"""The driver-facing entry points must never regress silently.

Round 1 shipped a ``dryrun_multichip`` that raised on the driver's host
(MULTICHIP_r01.json ``ok: false``) because nothing exercised it from tests.
These tests pin both invocation modes:

* in-process: conftest already provides an 8-device virtual CPU mesh, so the
  dryrun body must run directly;
* bootstrap: a fresh subprocess with the production env (axon platform
  pinned, no XLA device-count flag) must self-bootstrap a CPU mesh and pass.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_dryrun_multichip_in_process():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_bootstraps_from_bare_env():
    """Simulate the driver: no cpu platform, no device-count flag."""
    env = dict(os.environ)
    # Reconstruct the production env the driver runs under: the axon
    # platform pinned, no virtual-device escape hatch.  Drop the pool IP so
    # the subprocess does not actually dial the TPU tunnel (jax.devices()
    # then raises, which is exactly the "cannot run here" case the
    # bootstrap must survive).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("TDR_DRYRUN_SUBPROC", None)
    env["JAX_PLATFORMS"] = "axon"
    env["XLA_FLAGS"] = ""
    env["TDR_DRYRUN_DEVICES"] = "8"
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)" % REPO
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    if proc.returncode != 0:
        pytest.fail(
            f"bootstrap dryrun failed (rc={proc.returncode})\n"
            f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
        )
    assert "dryrun_multichip OK" in proc.stdout
