"""Real multi-process data-parallel training (jax.distributed over
localhost). Two CPU processes each hold one device and feed their local
shard of the global batch; the DP train step must equal the single-process
result.

This exercises the actual multi-host path (parallel/distributed.py):
initialize -> host-sharded batch -> make_array_from_process_local_data ->
jit with shardings -> XLA cross-process all-reduce.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
from svcc23_fastsvc_tpu.parallel import distributed
os.environ["SVC_NUM_PROCESSES"] = str(n)
os.environ["SVC_PROCESS_ID"] = str(pid)
os.environ["SVC_COORDINATOR"] = f"127.0.0.1:{port}"
distributed.initialize()

import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
from test_train_step import tiny_batch, tiny_task
from svcc23_fastsvc_tpu.parallel import global_batch, jit_train_step_dp, make_mesh, replicate

task = tiny_task()
mesh = make_mesh(jax.device_count())
state = replicate(task.init_state(jax.random.PRNGKey(0)), mesh)

# global batch of 2 rows; each process contributes its own row
full = tiny_batch(jax.random.PRNGKey(1), B=2)
local = {k: np.asarray(v)[pid : pid + 1] for k, v in full.items()}
gbatch = global_batch(local, mesh)

step = jit_train_step_dp(task.gen_step, mesh, donate=False)
new_state, metrics = step(state, gbatch)
loss = float(jax.device_get(metrics["generator_loss"]))

# single-process oracle
ref_state, ref_metrics = jax.jit(task.gen_step)(
    task.init_state(jax.random.PRNGKey(0)), full
)
ref = float(ref_metrics["generator_loss"])
assert abs(loss - ref) < 1e-4 * max(abs(ref), 1), (loss, ref)
print(f"proc {pid}: dp loss {loss:.6f} == single {ref:.6f}", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("SVC_SKIP_MULTIHOST") == "1", reason="disabled"
)
def test_two_process_dp_training(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + os.path.join(REPO, "tests") + ":" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single device per process
    port = "29517"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "dp loss" in out
