"""Multi-host data parallelism: two real OS processes over localhost.

Exercises core.mesh.init_distributed + cross-process collectives — the path
the in-process virtual mesh can't cover (reference analog: Lightning DDP
multi-node, config/main.yaml:123)."""

import os
import re
import subprocess
import sys
from pathlib import Path
import pytest

WORKER = Path(__file__).parent / "dist_worker.py"


@pytest.mark.slow
def test_two_process_train_step():
    # ephemeral port: a hard-coded one collides with concurrent suite runs
    # or a leftover worker from a previously timed-out run
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, str(WORKER), str(i), "2", str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"

    losses = []
    for i, o in enumerate(outs):
        m = re.search(r"DIST_OK process=\d loss=(-?[\d.]+)", o)
        assert m, f"no DIST_OK line in proc {i} output:\n{o[-3000:]}"
        losses.append(m.group(1))
    assert losses[0] == losses[1]  # same global loss on both hosts
