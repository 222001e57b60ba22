"""Device mesh and sharding utilities.

The reference's only parallelism is DDP data parallelism over NCCL
(/root/reference/nnsvs/train_util.py:1444-1446,
nnsvs/bin/train_acoustic_multitrack.py:639-643).  The TPU-native equivalent
(SURVEY.md section 5 item 8) is single-controller JAX: a 1-D ``data`` mesh
axis, batches sharded over it with NamedSharding, parameters replicated, and
gradients reduced by the XLA-inserted collectives over ICI — no manual rank
logic, no process groups.

These models are small (tens of M params), so a pure-DP mesh is the right
layout; the helpers still accept extra axes for future model sharding.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host wiring (SURVEY.md section 5 item 8; the reference's NCCL
    ``dist.init_process_group`` at bin/train_acoustic_multitrack.py:639-643).

    With a ``coordinator`` address ("host:port"), joins the multi-host JAX
    runtime: every host then sees the global device set, the 1-D data mesh
    spans all hosts, and gradient psums ride ICI within a pod / DCN across
    pods — no NCCL-style rank logic in the trainers.  ``num_processes`` /
    ``process_id`` default to the standard cluster-env variables that
    ``jax.distributed.initialize`` auto-detects.

    No-op (returns process index 0) when no coordinator is given:
    single-host training paths stay untouched.
    """
    if coordinator:
        kwargs = {}
        if num_processes is not None:
            kwargs["num_processes"] = int(num_processes)
        if process_id is not None:
            kwargs["process_id"] = int(process_id)
        jax.distributed.initialize(coordinator_address=coordinator, **kwargs)
    return jax.process_index()


def make_mesh(
    num_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    """Create a mesh over the first ``num_devices`` devices (all if None).

    Under multi-host (``maybe_initialize_distributed``), ``jax.devices()``
    is the GLOBAL device list, so the data axis spans every host."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Device_put a dict of (B, ...) numpy arrays, batch-sharded."""
    sharding = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate_tree(tree, mesh: Mesh):
    """Device_put every leaf of a pytree replicated over the mesh.

    Checkpoint-restore companion for the DP layout: params / opt_state are
    replicated (PartitionSpec()), so a host pytree read back by
    ``train.loop.load_checkpoint`` re-enters the mesh with one call and the
    next ``train_step`` continues the optimizer trajectory bitwise
    (reference equivalent: rank-0 ``save_checkpoint`` + ``_resume``,
    train_util.py:1290-1384 — there every DDP rank reloads the same file)."""
    sharding = replicate(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
