"""Device-mesh construction.

Replaces the reference's manual multi-GPU topology (explicit per-device
VarStore replicas + to_device copies, train/src/train/multi_gpu.rs) with a
``jax.sharding.Mesh``.  Axis names are fixed up front so multi-host DCN
extension is a mesh reshape, not new code (SURVEY §2.8): the data axis
rides ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"


def initialize_multi_host(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join a multi-host JAX runtime (DCN extension point, SURVEY §2.8).

    On TPU pods the defaults auto-discover from the environment; explicit
    arguments support manual clusters.  After this, ``jax.devices()`` spans
    all hosts and the same data-parallel mesh/axis-name code runs unchanged
    — the DP axis simply gets bigger.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def make_mesh(
    n_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_dp_shardings(n_devices: int):
    """(replicated, batch_sharded) NamedShardings on a fresh 1-D data mesh —
    the standard inference scale-out pattern (detect/eval/serve): params
    replicated, the batch axis of inputs split over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = make_mesh(n_devices)
    return (
        NamedSharding(mesh, PartitionSpec()),
        NamedSharding(mesh, PartitionSpec(DATA_AXIS)),
    )
