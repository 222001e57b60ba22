"""Multi-host distributed initialization smoke test (SURVEY.md section 5
item 8): two REAL processes join one JAX runtime through
``parallel.mesh.maybe_initialize_distributed`` (the reference's NCCL
``dist.init_process_group`` equivalent), build the global data mesh, and
run a cross-process reduction.

Runs on CPU: each process contributes 2 virtual devices, so the data
mesh spans 4 global devices across 2 hosts.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
import jax
jax.config.update("jax_platforms", "cpu")
# share the suite's per-run persistent kernel cache (conftest sets the
# env var; this fresh process bypasses conftest)
if os.environ.get("ESVS_TEST_JAXCACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["ESVS_TEST_JAXCACHE"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, {repo!r})

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ensemble_svs_with_interactions_tpu.parallel.mesh import (
    make_mesh,
    maybe_initialize_distributed,
)

pid = int(sys.argv[1])
rank = maybe_initialize_distributed(
    coordinator="127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert rank == pid, (rank, pid)
assert jax.process_count() == 2
mesh = make_mesh()
assert mesh.devices.size == 4, mesh.devices

# shard a global batch over the data axis from per-process local shards,
# then reduce across every device (the gradient-psum pattern)
local = np.full((jax.local_device_count(),), float(pid + 1), np.float32)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (mesh.devices.size,)
)
total = jax.jit(
    jnp.sum, out_shardings=NamedSharding(mesh, P())
)(arr)
# 2 devices x 1.0 (proc 0) + 2 devices x 2.0 (proc 1)
assert float(total) == 6.0, float(total)
print("MULTIHOST_OK", pid, flush=True)
"""


def test_two_process_distributed_mesh(tmp_path):
    repo = str(Path(__file__).resolve().parent.parent)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo, port=port))

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MULTIHOST_OK {i}" in out, out
