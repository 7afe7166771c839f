"""Multi-host (multi-process) execution: jax.distributed wiring + global
batch construction.

The reference has no distributed backend at all (SURVEY §2: no
torch.distributed/NCCL/MPI anywhere); this is the TPU build's multi-host
tier. One JAX process runs per host; `jax.distributed.initialize` wires
them to a coordinator, `jax.devices()` becomes the GLOBAL device list, and
the existing DP step (parallel/dp.py — a shard_map over Mesh('data'))
runs unchanged: XLA lowers the psum/pmean collectives onto ICI within a
slice and DCN across hosts.

The only genuinely multi-host-specific concern is data feeding: a process
can only materialize buffers on its OWN devices, so each process packs the
shards belonging to its addressable devices and the global stacked batch
is assembled with `jax.make_array_from_process_local_data`.

Validated by tests/test_multihost.py, which spawns REAL separate JAX
processes on CPU (loopback coordinator — the same code path a DCN pod
uses) and pins the 2-process x 2-device step to the single-process
4-device result.
"""

from __future__ import annotations

from typing import Any

import os

import jax
import numpy as np
from jax.sharding import Mesh

from p_div_gnn_tpu.graphs.batching import NODE_TILE, GraphSample
from p_div_gnn_tpu.parallel.dp import pack_sharded_batch


def ensure_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed (idempotent).

    Explicit args win; otherwise the standard env triple
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID is used;
    with neither present, returns False (single-process run). On TPU pods
    with no explicit config, `jax.distributed.initialize()` auto-detects.
    """
    # Idempotence check WITHOUT touching the backend: jax.process_count()
    # would initialize XLA, after which initialize() raises.
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return False
    if num_processes is None:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_data_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over ALL global devices (every process must call this with
    the same view, which jax.devices() guarantees post-initialize)."""
    return Mesh(np.array(jax.devices()), (axis,))


def pack_global_batch(
    samples: list[GraphSample],
    mesh: Mesh,
    graphs_per_shard: int | None = None,
    axis: str = "data",
    tile: int = NODE_TILE,
) -> Any:
    """Pack ``samples`` (the SAME full list on every process — cheap host
    work, deterministic) into one shard per global device, then build
    global arrays where this process contributes only its own devices'
    shards."""
    from p_div_gnn_tpu.parallel.dp import device_put_sharded_batch

    n_global = mesh.devices.size
    stacked = pack_sharded_batch(
        samples, n_shards=n_global, graphs_per_shard=graphs_per_shard,
        tile=tile,
    )
    return device_put_sharded_batch(stacked, mesh, axis)
