"""Worker for the real multi-process integration test (not a test module).

Launched by tests/test_multihost_integration.py as
``python tests/multihost_worker.py <process_id> <num_processes> <coordinator>``.
Each process provisions 4 virtual CPU devices and joins a
``jax.distributed`` cluster, so the `jax.process_count() > 1` branches —
`place_host_batch`'s `make_array_from_process_local_data` placement and the
globally-consistent negative permutations — execute for real (the reference
has no multi-process path at all; this guards the TPU build's pod story,
SURVEY.md §5 distributed-comm row).

Prints one line ``step ok full_loss=<loss>`` on success; the launcher
asserts both processes print the SAME loss (one global SPMD program).
"""
import os
import sys

pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax

# sitecustomize may have consumed JAX_PLATFORMS; force cpu explicitly
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=coord, num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == nproc * 4, len(jax.devices())

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from r3m_tpu.models.distilbert import distilbert_init
from r3m_tpu.models.r3m import R3MConfig
from r3m_tpu.parallel.mesh import make_mesh, place_host_batch, replicate
from r3m_tpu.training.trainer import create_train_state, make_train_step

n_dev = nproc * 4
mesh = make_mesh(n_dev)
bs_global = 2 * n_dev
bs_local = bs_global // nproc
cfg = R3MConfig(size=18, langweight=1.0, tcnweight=1.0, image_size=32, bs=bs_global)

bert = replicate(mesh, distilbert_init(jax.random.PRNGKey(1)))
state = replicate(mesh, create_train_state(cfg, jax.random.PRNGKey(0)))

t = 8
rng = np.random.default_rng(100 + pid)  # disjoint per-host shard, like ego4d
local = {
    "images": rng.uniform(0, 255, (bs_local, 5, 32, 32, 3)).astype(np.float32),
    "token_ids": np.ones((bs_local, t), np.int32),
    "attn_mask": np.ones((bs_local, t), np.int32),
    "lang_mask": np.ones((bs_local,), np.float32),
}
batch = place_host_batch(mesh, local)  # multihost=None -> process_count()>1 branch

step = make_train_step(cfg, bert_params=bert, mesh=mesh, donate=False, doaug="rctraj")
new_state, metrics = step(state, batch)
loss = float(metrics["full_loss"])
assert np.isfinite(loss), loss
assert int(new_state.step) == 1
print(f"step ok full_loss={loss:.6f}", flush=True)
