"""Worker process for tests/test_multiprocess.py (not a pytest module).

Usage: python tests/_dp_worker.py <process_id> <num_processes> <port>

Each process owns 2 virtual CPU devices and joins a jax.distributed
coordination service, forming a 2-process x 2-device topology -- the
multi-host execution model the framework's Batcher striping and dp mesh
are designed for (data/pipeline.py:95-148).  Verifies:

1. global device visibility (device_count == 2 * num_processes),
2. Batcher process striping yields exactly this host's stripe of every
   global batch,
3. one dp train step over the GLOBAL mesh (cross-process gradient
   all-reduce via GSPMD) produces the same loss on every process AND the
   same loss as a single-device run over the full global batch.

Prints "WORKER_OK <pid> <dp_loss> <single_loss>" on success.
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from sbl_for_multilingual_lip_reading_tpu import config as C  # noqa: E402
from sbl_for_multilingual_lip_reading_tpu.data import (  # noqa: E402
    Batcher, SyntheticLipDataset)
from sbl_for_multilingual_lip_reading_tpu.models import build_model  # noqa: E402
from sbl_for_multilingual_lip_reading_tpu.parallel import make_mesh  # noqa: E402
from sbl_for_multilingual_lip_reading_tpu.training.steps import (  # noqa: E402
    make_sbl_train_step)
from sbl_for_multilingual_lip_reading_tpu.training.trainer import (  # noqa: E402
    attach_plans, init_state)

assert jax.process_index() == pid
assert jax.local_device_count() == 2
assert jax.device_count() == 2 * nproc, jax.devices()

cfg = C.tiny_test("sbl")
B = 4
ds = SyntheticLipDataset(size=8, frames=cfg.data.frames,
                         raw_size=cfg.data.raw_size)

# ---- 2. Batcher striping: every host sees exactly its stripe ------------
batcher = Batcher(ds, batch_size=B, shuffle=False,
                  process_index=pid, process_count=nproc)
local_batches = list(batcher)
assert len(local_batches) == 2
for bi, lb in enumerate(local_batches):
    expect_idx = list(range(bi * B, (bi + 1) * B))[pid::nproc]
    assert lb["labels"].shape[0] == len(expect_idx)
    for row, gi in enumerate(expect_idx):
        np.testing.assert_array_equal(lb["labels"][row], ds[gi]["labels"])
        np.testing.assert_array_equal(lb["clip_u8"][row], ds[gi]["clip_u8"])

# ---- 3. dp step across processes matches single-device full batch -------
model = build_model(cfg)
rng = jax.random.PRNGKey(cfg.seed)
state, tx = init_state(model, cfg, rng)
train_step = make_sbl_train_step(model, tx, cfg)

# one full global batch, plans attached once with a fixed seed so both the
# dp path and the single-device reference consume identical augmentation
full = {k: np.stack([ds[i][k] for i in range(B)]) for k in ds[0]}
full = attach_plans(full, np.random.default_rng(123), cfg, train=True)
local = {k: v[pid::nproc] for k, v in full.items()}   # Batcher._local stripe

# single-device reference on the full batch, in the GLOBAL order the dp
# mesh sees (host_local_array_to_global_array concatenates process stripes,
# i.e. a strided permutation of the batch -- dropout masks are
# position-dependent, so the reference must use the same order)
order = np.concatenate([np.arange(B)[p::nproc] for p in range(nproc)])
_, m_single = train_step(state, {k: v[order] for k, v in full.items()}, rng)
single_loss = float(m_single["loss"])

# global dp mesh over all 4 devices; host-local stripes -> global arrays
mesh = make_mesh(data=2 * nproc, model=1)
global_batch = {
    k: multihost_utils.host_local_array_to_global_array(v, mesh, P("data"))
    for k, v in local.items()
}
rep = NamedSharding(mesh, P())
state_g = state.replace(
    params=jax.tree_util.tree_map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P()), state.params),
    batch_stats=jax.tree_util.tree_map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P()), state.batch_stats),
    opt_state=jax.tree_util.tree_map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P()), state.opt_state),
    step=multihost_utils.host_local_array_to_global_array(
        np.asarray(state.step), mesh, P()))
with mesh:
    _, m_dp = train_step(state_g, global_batch, rng)
# the loss metric is fully replicated: every process holds an addressable
# shard with the (collectively-reduced) global value
dp_loss = float(np.asarray(m_dp["loss"].addressable_data(0)))

assert abs(dp_loss - single_loss) < 1e-3, (dp_loss, single_loss)
print(f"WORKER_OK {pid} {dp_loss:.6f} {single_loss:.6f}", flush=True)
