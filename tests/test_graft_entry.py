"""Driver-facing entry points must be self-hosting.

Round-1 regression: the driver ran ``dryrun_multichip(8)`` in a fresh process
with the ambient ``JAX_PLATFORMS=axon`` env and no XLA_FLAGS; ``make_mesh``
initialized the (version-skewed) TPU tunnel and crashed. The function now
forces an n-device virtual CPU mesh internally, so it must succeed from a
clean subprocess regardless of TPU tunnel state.
"""

import os
import subprocess
import sys
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_fresh_process():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # driver sets no flags; dryrun must set its own
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)" % REPO
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in proc.stdout
