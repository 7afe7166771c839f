"""Partition-at-scale evidence (VERDICT round-1 item 8): build one large
plate-with-hole mesh (~10^5 nodes), edge-partition it across N shards, and
report the quantities that decide whether the TP/SP analog holds up on real
meshes — halo sizes, per-shard edge-capacity blow-up, ghost traffic per
mode — plus (optionally) step timings on the active backend.

Usage:
    python scripts/partition_scale.py --target-nodes 100000 --shards 8 \
        --out docs/evidence/partition_scale.json [--time-steps]

On the default CPU backend timings are semantics-only; pass --time-steps on
a real chip (1-device mesh exercises the fused-kernel+halo code path on
hardware).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_sample(target_nodes: int, seed: int = 3):
    from p_div_gnn_tpu.datagen.mesher import hole_plate_mesh
    from p_div_gnn_tpu.datagen.opdiv import compute_op_div_matrix
    from p_div_gnn_tpu.graphs import compute_periodic_graph, mesh_to_graph
    from p_div_gnn_tpu.graphs.batching import GraphSample
    from p_div_gnn_tpu.graphs.labels import compute_node_labels

    # empirical: N ≈ 0.86 · (width / h)^2 for this geometry
    h = 100.0 * float(np.sqrt(0.86 / target_nodes))
    t0 = time.time()
    mesh = hole_plate_mesh(
        100.0, 100.0, radius=20.0, hole_center=(50.0, 50.0),
        hole_refinement_factor=3.0, global_mesh_refinement_size=h, seed=seed,
    )
    t_mesh = time.time() - t0
    t0 = time.time()
    g = compute_periodic_graph(mesh_to_graph(mesh))
    labels = compute_node_labels(mesh)
    op = compute_op_div_matrix(mesh.points[:, :2], mesh.faces)
    t_graph = time.time() - t0
    n = g.num_nodes
    rng = np.random.default_rng(seed)
    sample = GraphSample(
        graph=g,
        mean_stress=rng.normal(size=3).astype(np.float32),
        local_stress=rng.normal(size=(n, 3)).astype(np.float32),
        node_labels=labels,
        div_data=op.data.astype(np.float32),
        div_row=op.row.astype(np.int64),
        div_col=op.col.astype(np.int64),
    )
    return sample, {"t_mesh_s": round(t_mesh, 2), "t_graph_s": round(t_graph, 2)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--target-nodes", type=int, default=100_000)
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--out", default="docs/evidence/partition_scale.json")
    p.add_argument("--time-steps", action="store_true")
    p.add_argument("--latent", type=int, default=128)
    p.add_argument("--mp-steps", type=int, default=10)
    args = p.parse_args()

    from p_div_gnn_tpu.graphs import pack_batch
    from p_div_gnn_tpu.parallel.partition import partition_batch

    sample, times = build_sample(args.target_nodes)
    N, E = sample.num_nodes, sample.num_edges
    print(f"mesh: {N} nodes, {E} directed edges ({times})")
    batch = pack_batch([sample], n_graphs=1)
    Np, Ep = batch.num_nodes_padded, batch.num_edges_padded

    D = args.shards
    report = {
        "n_nodes": N, "n_edges": E,
        "padded_nodes": Np, "padded_edges": Ep,
        "n_shards": D, **times,
    }
    t0 = time.time()
    stacked_a2a, si_a2a = partition_batch(batch, D, halo_mode="a2a")
    report["t_partition_s"] = round(time.time() - t0, 2)
    _, si_ag = partition_batch(batch, D, halo_mode="all_gather")

    El = int(stacked_a2a.senders.shape[-1])
    Nl = int(stacked_a2a.pos.shape[-2])
    Hp = int(si_a2a.shape[-1])
    H = int(si_ag.shape[-1])
    report.update(
        {
            "local_nodes_per_shard": Nl,
            "local_edge_capacity": El,
            # capacity blow-up: total partitioned edge slots / unpartitioned
            "edge_capacity_blowup": round(D * El / Ep, 3),
            "halo_union_H": H,
            "halo_pair_Hp": Hp,
            # ghost rows received per shard per MP step
            "ghost_rows_all_gather": D * H,
            "ghost_rows_a2a": D * Hp,
            "ghost_traffic_ratio": round(H / Hp, 2),
            "halo_fraction_of_local": round(D * Hp / Nl, 3),
        }
    )
    print(json.dumps(report, indent=1))

    if args.time_steps:
        import jax
        import optax
        from jax.sharding import Mesh

        from p_div_gnn_tpu.graphs.container import NormStats
        from p_div_gnn_tpu.models import EncodeProcessDecode
        from p_div_gnn_tpu.parallel.partition import (
            device_put_partitioned,
            make_partitioned_train_step,
        )

        devs = jax.devices()
        Dm = min(D, len(devs))
        if Dm != D:
            stacked_a2a, si_a2a = partition_batch(batch, Dm, halo_mode="a2a")
            print(f"only {Dm} device(s) — timing the {Dm}-shard plan")
        mesh = Mesh(np.array(devs[:Dm]), ("graph",))
        stats = NormStats.ones()
        impl = "fused" if jax.default_backend() not in ("cpu",) else "xla"
        model = EncodeProcessDecode(
            latent_size=args.latent,
            message_passing_steps=args.mp_steps,
            scatter_impl=impl,
        )
        opt = optax.adam(1e-3)
        st, si = device_put_partitioned(stacked_a2a, si_a2a, mesh)
        local0 = jax.tree.map(lambda x: np.asarray(x)[0], stacked_a2a)
        params = model.init(jax.random.PRNGKey(0), local0, stats)
        opt_state = opt.init(params)
        step = make_partitioned_train_step(
            model, stats, opt, mesh,
            divergence_penalty=10.0, optimize_divergence=True,
        )
        params, opt_state, aux = step(params, opt_state, st, si)  # compile
        jax.block_until_ready(aux["total"])
        best = np.inf
        for _ in range(5):
            t0 = time.time()
            params, opt_state, aux = step(params, opt_state, st, si)
            jax.block_until_ready(aux["total"])
            best = min(best, time.time() - t0)
        report["partitioned_step_ms"] = round(best * 1e3, 1)
        report["partitioned_edges_per_s"] = int(E / best)
        report["backend"] = jax.default_backend()
        report["scatter_impl"] = impl
        print(f"partitioned train step ({Dm} shard(s), {impl}): "
              f"{best*1e3:.1f} ms → {E/best:,.0f} edges/s")

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
