"""Multi-host data parallelism: a REAL two-process jax.distributed run.

The reference has no multi-node anything (SURVEY.md §2.6); this framework's
multi-host story is parallel.distributed.initialize + the same mesh code.
This test actually exercises it: two OS processes on localhost CPU (2
virtual devices each -> a 4-device global mesh), a cross-process
all-reduce, and the per-process local_batch_slice arithmetic.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

from unseenobjectclustering_tpu.parallel.distributed import (initialize,
                                                             local_batch_slice)

pid = int(sys.argv[1])
port = sys.argv[2]
initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2

sl = local_batch_slice(8)
assert sl == slice(pid * 4, (pid + 1) * 4), sl

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))
sharding = NamedSharding(mesh, P("data"))
full = np.arange(8, dtype=np.float32)
garr = jax.make_array_from_process_local_data(sharding, full[sl], (8,))

total = jax.jit(jnp.sum,
                out_shardings=NamedSharding(mesh, P()))(garr)
got = float(np.asarray(total))   # replicated output: fetch on every process
assert got == float(full.sum()), got
print("WORKER_OK", pid, got, flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_allreduce(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {pid} 28.0" in out, out
