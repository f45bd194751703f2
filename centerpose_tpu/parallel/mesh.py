"""Device mesh + sharding helpers (TPU-native data parallelism).

Replaces the reference's NCCL DistributedDataParallel stack (SURVEY.md §5.8):
instead of per-process gradient-bucket allreduce, we lay a 1-D ``Mesh`` over
all chips, shard the batch ``P('data')``, replicate params ``P()``, and jit
the train step — XLA inserts the gradient all-reduce over ICI (intra-slice)
/ DCN (inter-slice) automatically.

The same code path runs on: one real chip (mesh of 1), a virtual 8-device
CPU mesh (tests / dryrun), and a multi-host pod slice (after
``jax.distributed.initialize``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis_name: str = "data"
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for batch-leading arrays: first axis split over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, opt state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis_name: str = "data"):
    """Device-put a host batch dict with the leading axis sharded over the mesh.

    On multi-host: each process passes its *local* shard and we form global
    arrays via ``jax.make_array_from_process_local_data``, so no host ever
    materializes the global batch (SURVEY.md §5.8).
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()
        }
    return jax.device_put(batch, sharding)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (reference analog: dist.init_process_group('nccl')).

    On real TPU pods the launcher env usually provides everything and plain
    ``jax.distributed.initialize()`` suffices; explicit args support manual
    rendezvous.  Safe to skip entirely for single-host runs.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def create_mesh_2d(
    n_data: int,
    n_spatial: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D (data x spatial) mesh for activation-grid sharding.

    The reference has no sequence/context parallelism (pure CNN, SURVEY.md
    §5.7); the TPU-idiomatic analog for inputs that outgrow one chip's HBM
    is GSPMD spatial sharding of the conv grid: shard H over 'spatial' and
    let XLA insert the halo exchanges for every conv window.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_data * n_spatial]).reshape(
        n_data, n_spatial
    )
    return Mesh(devices, ("data", "spatial"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] arrays: batch over 'data', image rows over 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial"))
