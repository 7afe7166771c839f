"""Worker process for tests/test_multihost.py: joins a loopback
jax.distributed cluster, runs ONE data-parallel train step over the global
mesh on deterministic toy data, and prints the resulting loss + a params
checksum (both must be identical across processes and equal to the
single-process reference)."""

from __future__ import annotations

import sys


def main() -> None:
    import jax

    from p_div_gnn_tpu.parallel.multihost import (
        ensure_distributed,
        global_data_mesh,
        pack_global_batch,
    )

    assert ensure_distributed(), "env triple must be set by the test"
    import optax

    from p_div_gnn_tpu.graphs.container import NormStats
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


if __name__ == "__main__":
    main()
