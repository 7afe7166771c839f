"""Worker process for tests/test_multihost.py: joins a loopback
jax.distributed cluster, runs ONE data-parallel train step over the global
mesh on deterministic toy data, and prints the resulting loss + a params
checksum (both must be identical across processes and equal to the
single-process reference)."""

from __future__ import annotations

import sys


def main() -> None:
    import os

    import jax

    from p_div_gnn_tpu.parallel.multihost import (
        ensure_distributed,
        global_data_mesh,
        pack_global_batch,
    )

    assert ensure_distributed(), "env triple must be set by the test"
    if os.environ.get("PDG_MH_MODE") == "partition":
        return main_partition()
    import optax

    from p_div_gnn_tpu.models import EncodeProcessDecode
    from p_div_gnn_tpu.parallel.dp import make_dp_train_step

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_model import STATS, _mesh_sample

    n_proc = jax.process_count()
    n_global = len(jax.devices())
    assert n_proc >= 2, f"expected >=2 processes, got {n_proc}"

    samples = [_mesh_sample(i, nx=4 + (i % 2)) for i in range(n_global)]
    mesh = global_data_mesh()
    batch = pack_global_batch(samples, mesh, graphs_per_shard=1)

    model = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    optimizer = optax.adam(1e-3)
    local0 = jax.tree.map(
        lambda x: jax.device_get(
            list(x.addressable_shards)[0].data
        )[0] if getattr(x, "ndim", 0) else x,
        batch,
    )
    params = model.init(jax.random.PRNGKey(0), local0, STATS)
    opt_state = optimizer.init(params)
    step = make_dp_train_step(
        model, STATS, optimizer, mesh,
        divergence_penalty=10.0, optimize_divergence=True,
    )
    params, opt_state, aux = step(params, opt_state, batch)
    total = float(aux["total"])
    checksum = float(
        sum(abs(jax.device_get(x)).sum() for x in jax.tree.leaves(params))
    )
    print(f"MULTIHOST_RESULT {jax.process_index()} {total:.10f} "
          f"{checksum:.6f}", flush=True)




def main_partition() -> None:
    """Edge-partitioned (per-peer a2a halo) step across REAL processes:
    one graph batch split by node range over the global mesh."""
    import jax
    import numpy as np
    import optax
    from jax.sharding import Mesh

    from p_div_gnn_tpu.graphs import pack_batch
    from p_div_gnn_tpu.models import EncodeProcessDecode
    from p_div_gnn_tpu.parallel.partition import (
        device_put_partitioned,
        make_partitioned_train_step,
        partition_batch,
    )

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_model import STATS, _mesh_sample

    n_global = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("graph",))
    batch = pack_batch([_mesh_sample(0), _mesh_sample(1, nx=4)], n_graphs=2)
    stacked, send_idx = partition_batch(batch, n_shards=n_global,
                                        halo_mode="a2a")
    local0 = jax.tree.map(
        lambda x: np.asarray(x)[0] if getattr(x, "ndim", 0) else x, stacked
    )
    stacked, send_idx = device_put_partitioned(stacked, send_idx, mesh)
    model = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    optimizer = optax.adam(1e-3)
    params = model.init(jax.random.PRNGKey(0), local0, STATS)
    opt_state = optimizer.init(params)
    step = make_partitioned_train_step(
        model, STATS, optimizer, mesh,
        divergence_penalty=10.0, optimize_divergence=True,
    )
    params, opt_state, aux = step(params, opt_state, stacked, send_idx)
    total = float(aux["total"])
    checksum = float(
        sum(abs(jax.device_get(x)).sum() for x in jax.tree.leaves(params))
    )
    print(f"MULTIHOST_RESULT {jax.process_index()} {total:.10f} "
          f"{checksum:.6f}", flush=True)


if __name__ == "__main__":
    main()
