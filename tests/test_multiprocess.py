"""Two-process CPU execution test: multi-host Batcher striping + a dp
train step whose gradient all-reduce crosses process boundaries.

The reference has no multi-host story (single-process DataParallel,
SBL train.py:115); this covers the framework's beyond-parity claim that
``Batcher(process_index/process_count)`` + a dp mesh implement multi-host
SPMD training (data/pipeline.py:95-148).  The heavy lifting happens in
tests/_dp_worker.py, spawned here as two real OS processes joined through
a jax.distributed coordination service.
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


def _run_workers(nproc: int):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_dp_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), str(nproc),
                          str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            out = (out or "") + "\n[TIMEOUT after 900s]"
        outs.append(out)
    for p in procs:
        if p.poll() is None:
            p.kill()
    return procs, outs


@pytest.mark.slow
def test_two_process_dp_step_and_batcher_striping():
    nproc = 2
    # The gloo CPU-collectives backend has a fixed 30 s key-value-store
    # deadline during module setup; on a loaded 1-core box the two workers
    # can drift past it while compiling (observed flake: DEADLINE_EXCEEDED
    # under a concurrent full-suite + TPU-probe run).  One retry makes the
    # test robust to machine load without weakening any assertion.
    for attempt in range(2):
        procs, outs = _run_workers(nproc)
        if all(p.returncode == 0 for p in procs) or attempt == 1:
            break
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {i}" in out, out[-4000:]
    # both processes computed the SAME dp loss (replicated metric)
    losses = [out.split("WORKER_OK")[1].split()[1] for out in outs]
    assert losses[0] == losses[1], outs
