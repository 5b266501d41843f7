"""Mesh construction and data-parallel shardings.

The reference's distributed story is one-process-per-GPU DDP over NCCL with
bucketed gradient all-reduce (SURVEY.md §2.10; train_ours.py:63-84,754).
The TPU-native equivalent: one process per host, a `jax.sharding.Mesh` over
all chips, params replicated / batch sharded on the ``data`` axis, and
XLA inserting the gradient all-reduce over ICI inside the jitted train step.
`jax.distributed.initialize` extends the same program to multi-host
(ICI within a slice, DCN across slices) without code changes.

A second mesh axis (``model``) is reserved for spatial/tensor sharding of
the 720p activations; conv layers shard cleanly on H with halo exchange
handled by XLA.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    model_parallel: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    devices = np.asarray(devices[:n])
    if model_parallel > 1:
        if n % model_parallel:
            raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
        grid = devices.reshape(n // model_parallel, model_parallel)
        return Mesh(grid, (data_axis, model_axis))
    return Mesh(devices.reshape(n, 1), (data_axis, model_axis))


def dp_shardings(mesh: Mesh) -> Tuple[NamedSharding, NamedSharding]:
    """(batch_sharding, replicated): batch split on its leading axis over
    ``data``; params/state replicated."""
    return NamedSharding(mesh, P("data")), NamedSharding(mesh, P())


def spatial_shardings(mesh: Mesh) -> Tuple[NamedSharding, NamedSharding]:
    """(activation_sharding, replicated) for spatial parallelism: NHWC
    activations split along H over the ``model`` axis (batch stays on
    ``data``).  XLA's SPMD partitioner inserts the halo exchanges for the
    convolutions automatically — this is how a single 720p frame is spread
    over several chips when latency (not batch throughput) matters."""
    return NamedSharding(mesh, P("data", "model")), NamedSharding(mesh, P())


def local_shard_info(mesh: Mesh) -> Tuple[int, int]:
    """(shard_index, num_shards) for the host data pipeline: one shard per
    process (multi-host) — the in-process mesh axis is fed by a single
    host-side loader whose batches jax lays out across local devices."""
    return jax.process_index(), jax.process_count()


def maybe_init_distributed() -> bool:
    """Multi-process rendezvous from the reference's env-var contract
    (train_ours.py:63-84: RANK / WORLD_SIZE / MASTER_ADDR / MASTER_PORT).
    Returns True if `jax.distributed.initialize` was called."""
    import os

    if "RANK" not in os.environ or "WORLD_SIZE" not in os.environ:
        return False
    if int(os.environ["WORLD_SIZE"]) <= 1:
        return False
    if jax.distributed.is_initialized():
        return True
    addr = os.environ.get("MASTER_ADDR", "localhost")
    port = os.environ.get("MASTER_PORT", "12355")
    jax.distributed.initialize(
        coordinator_address=f"{addr}:{port}",
        num_processes=int(os.environ["WORLD_SIZE"]),
        process_id=int(os.environ["RANK"]),
    )
    # Establish the cross-process collective context NOW, while process
    # skew is small: the CPU backend's gloo rendezvous has a short timeout,
    # and the first natural collective otherwise lands after minutes of
    # (rank-skewed) XLA compilation.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("ebfi:init")
    return True


def put_global_batch(batch: dict, sharding) -> dict:
    """Lay a host-local batch dict out onto a (possibly multi-process)
    mesh: single-process uses plain device_put; multi-process assembles
    jax.Arrays from each process's local shard (the loader gives every
    process `global_batch / process_count` items, so concatenating the
    per-process data along axis 0 IS the global batch)."""
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }
