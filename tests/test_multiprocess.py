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


@pytest.mark.slow
def test_two_process_dp_step_and_batcher_striping():
    port = _free_port()
    nproc = 2
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
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {i}" in out, out[-4000:]
    # both processes computed the SAME dp loss (replicated metric)
    losses = [out.split("WORKER_OK")[1].split()[1] for out in outs]
    assert losses[0] == losses[1], outs
