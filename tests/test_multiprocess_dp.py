"""Multi-host (multi-process) data parallelism, tested without a cluster:
two local processes, each with 2 virtual CPU devices, form one 4-device
'data' mesh via jax.distributed — the TPU answer to the reference's
multi-GPU DDP launch (torch.distributed.launch + env:// NCCL rendezvous,
train.py:62-68 + scripts/train_s1_alpha.sh:7).

Validates the full feed path the trainers use:
  epoch_indices (per-process strided shard == DistributedSampler)
  -> shard_batch (jax.make_array_from_process_local_data assembles the
     GLOBAL batch from per-process local rows)
  -> replicate (params identical on every device)
  -> a jitted grad step (jit inserts the cross-process psum == DDP hook)
and checks the result is numerically identical to a single-process
full-batch computation (the global batch is a permutation of the data;
mean loss/grad is permutation-invariant).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
import numpy as np
import jax
import jax.numpy as jnp

port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
sys.path.insert(0, os.environ["OTVM_REPO"])
from otvm_tpu.data.loader import epoch_indices
from otvm_tpu.parallel.mesh import make_mesh, replicate, shard_batch

assert jax.process_count() == 2 and jax.device_count() == 4

# shared dataset + params (same seed on every process, like a checkpoint)
rng = np.random.RandomState(0)
X = rng.randn(4, 8).astype(np.float32)
Y = rng.randn(4, 1).astype(np.float32)
W0 = rng.randn(8, 1).astype(np.float32)

mesh = make_mesh()
idx = epoch_indices(4, epoch=0, repeats=1, seed=3,
                    process_index=pid, process_count=2)
assert len(idx) == 2  # local shard of the global batch of 4
batch = shard_batch(mesh, dict(x=X[idx], y=Y[idx]))
w = replicate(mesh, W0)

@jax.jit
def step(w, batch):
    def loss_fn(w):
        return jnp.mean((batch["x"] @ w - batch["y"]) ** 2)
    loss, g = jax.value_and_grad(loss_fn)(w)
    return w - 0.1 * g, loss

for _ in range(3):
    w, loss = step(w, batch)

# single-process full-batch reference (order-invariant under mean)
w_ref = W0.copy()
for _ in range(3):
    g = 2.0 / 4.0 * X.T @ (X @ w_ref - Y)
    w_ref = w_ref - 0.1 * g

np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-5, atol=1e-6)
print(f"proc {pid} OK loss={float(loss):.6f}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = dict(
        os.environ,
        OTVM_REPO=REPO,
        JAX_PLATFORMS="cpu",
        JAX_PLATFORM_NAME="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    procs = [subprocess.Popen([sys.executable, str(script), str(port), str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out
