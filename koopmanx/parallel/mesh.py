"""Device mesh + multi-host helpers.

The reference has no parallelism of any kind (SURVEY §2.2); scaling here is
a first-class new component. The design (BASELINE.json north star): a 1-D
``('data',)`` mesh over all chips/hosts — each scenario's closed loop is
sequential in time, so the scenario batch is the only (and sufficient)
parallel axis. Collectives: ``psum`` over ICI for Gram/metric reductions,
DCN for host boundaries — all emitted by XLA from ``shard_map`` bodies.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def data_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (scenario) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = DATA_AXIS):
    """Device-put a scenario-batched pytree with its leading dim sharded."""
    sharding = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up via ``jax.distributed.initialize`` (DCN
    coordination). No-op when running single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
