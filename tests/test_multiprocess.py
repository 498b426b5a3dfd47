"""Simulated multi-host: 2 jax.distributed processes x 4 virtual CPU devices
sharing one 8-device ('sat','time') mesh across the process (DCN) boundary
(SURVEY.md §4: exercising mesh sharding + all-reduce argmax without a
cluster). The heavy lifting is in tests/_dist_worker.py."""

import os
import socket
import subprocess
import sys
from pathlib import Path

_WORKER = Path(__file__).parent / "_dist_worker.py"
_REPO = Path(__file__).parent.parent


def test_two_process_sharded_acquisition():
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(_REPO),
            env={**os.environ, "PYTHONPATH": str(_REPO)},
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i}: OK best_row=16" in out, out[-2000:]
