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


def _launch(worker, n_proc, extra_args=(), timeout=240):
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # worker sets its own device count (4)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, str(n_proc), str(i),
             *map(str, extra_args)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(n_proc)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"distributed worker {i} timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    return outs


def test_two_process_fused_mamdr_epoch(tmp_path):
    """A COMPLETE fused MAMDR DN+DR epoch + merged eval across 2 processes
    (global mesh, row-sharded frozen tables, lane-sharded parallel DR),
    asserting parity with the identical single-process run (VERDICT r2
    item 4; SURVEY §5.8)."""
    from tests._mamdr_epoch_common import run_fused_mamdr_epoch

    ref = run_fused_mamdr_epoch(str(tmp_path), tag="ref", mesh=None)

    worker = osp.join(osp.dirname(osp.abspath(__file__)),
                      "_distributed_mamdr_worker.py")
    outs = _launch(worker, 2, extra_args=(str(tmp_path),), timeout=420)
    for i, out in enumerate(outs):
        line = next(
            (ln for ln in out.splitlines() if ln.startswith(f"OK process {i}")),
            None,
        )
        assert line is not None, out
        vals = dict(kv.split("=") for kv in line.split()[3:])
        assert abs(float(vals["auc"]) - ref["auc"]) < 1e-3, (line, ref)
        assert abs(float(vals["shared_norm"]) - ref["shared_norm"]) < (
            1e-3 * max(1.0, ref["shared_norm"])
        ), (line, ref)
        assert abs(float(vals["spec_norm"]) - ref["spec_norm"]) < (
            1e-3 * max(1.0, ref["spec_norm"])
        ), (line, ref)


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
