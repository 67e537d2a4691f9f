"""Real multi-process ``jax.distributed`` test (2 processes x 4 CPU devices).

The virtual 8-device mesh used everywhere else in this suite lives inside
ONE process; this test is the only place the coordinator/client handshake,
cross-process global arrays, and cross-process collectives actually run —
the CPU stand-in for a 2-host TPU slice (gRPC in place of DCN). It drives
the production ``initialize_distributed`` helper (parallel/distributed.py),
``make_mesh_2d``, and ``sharded_bundle_adjustment`` end to end; the worker
(``multiproc_worker.py``) asserts the distributed camera solution matches a
single-device ``run_bundle_adjustment`` bitwise-ish.

The reference has no distributed layer at all (SURVEY.md section 5).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_two_process(mode: str) -> None:
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu itself
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2", mode],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIPROC-OK pid={pid}" in out, out


@pytest.mark.slow
def test_two_process_distributed_ba():
    _run_two_process("windowed")


@pytest.mark.slow
def test_two_process_global_solve():
    """The whole-trajectory ``solve_global`` sharded 8 ways across 2 OS
    processes (VERDICT r4 item 7): same parity bar as the windowed kernel,
    but through the global-BA assembly/partition/all-gather path."""
    _run_two_process("global")
