"""Real multi-process jax.distributed run on CPU (2 processes x 4 virtual
devices) — the missing multi-host orchestration exercise (SURVEY §2.3/§5.8):
jax.distributed.initialize, cross-process collectives, per-process data
loading, row-sharded lookup spanning both processes, one sharded train step.
"""

import os
import os.path as osp
import socket
import subprocess
import sys

import pytest

WORKER = osp.join(osp.dirname(osp.abspath(__file__)), "_distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_cpu():
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # worker sets its own device count (4)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"distributed worker {i} timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"OK process {i}" in out, out
