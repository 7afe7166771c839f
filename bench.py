"""Headline benchmark: edges/s/chip on the flagship P-DivGNN training step.

Runs on the real TPU chip (do NOT force JAX_PLATFORMS). Workload: the
reference's published configuration — latent 128, 10 weight-tied
message-passing steps, batch 16 periodic plate-with-hole meshes, NMSE +
divergence-penalty loss (λ=10), Adam — i.e. one full fwd+bwd+update train
step (`configs_train/config_train_div.yml`; `BASELINE.md` north star).

Metric: real (non-padding) edges processed per second through the train
step. ``vs_baseline``: speedup of the Pallas-scatter path over the same
framework's XLA-scatter reference path (the reference repo publishes no
numeric baselines — BASELINE.json "published": {} — so the XLA path is the
baseline the kernel work is measured against).

Prints exactly ONE JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_workload(n_graphs: int = 16, seed: int = 0,
                   pair_blocks: bool = False):
    import numpy as np

    from p_div_gnn_tpu.datagen.mesher import hole_plate_mesh
    from p_div_gnn_tpu.datagen.opdiv import compute_op_div_matrix
    from p_div_gnn_tpu.graphs import (
        compute_node_labels,
        compute_periodic_graph,
        mesh_to_graph,
        pack_batch,
    )
    from p_div_gnn_tpu.graphs.batching import GraphSample

    rng = np.random.default_rng(seed)
    samples = []
    for i in range(n_graphs):
        mesh = hole_plate_mesh(
            100.0, 100.0,
            radius=float(rng.uniform(15, 30)),
            hole_center=(50.0, 50.0),
            hole_refinement_factor=8.0,
            global_mesh_refinement_size=2.5,
            seed=seed + i,
        )
        g = compute_periodic_graph(mesh_to_graph(mesh))
        op = compute_op_div_matrix(mesh.points[:, :2], mesh.faces)
        n = g.num_nodes
        samples.append(
            GraphSample(
                graph=g,
                mean_stress=rng.normal(size=3).astype(np.float32),
                local_stress=rng.normal(size=(n, 3)).astype(np.float32),
                node_labels=compute_node_labels(mesh),
                div_data=op.data.astype(np.float32),
                div_row=op.row.astype(np.int64),
                div_col=op.col.astype(np.int64),
            )
        )
    batch = pack_batch(samples, n_graphs=n_graphs, pair_blocks=pair_blocks)
    n_real_edges = sum(s.num_edges for s in samples)
    n_real_nodes = sum(s.num_nodes for s in samples)
    return batch, n_real_edges, n_real_nodes


def make_train_step(scatter_impl: str, batch, stream_dtype: str = "float32"):
    import jax

    from p_div_gnn_tpu.graphs.container import NormStats
    from p_div_gnn_tpu.models import EncodeProcessDecode
    from p_div_gnn_tpu.train.loop import Trainer

    model = EncodeProcessDecode(
        latent_size=128, message_passing_steps=10,
        scatter_impl=scatter_impl, stream_dtype=stream_dtype,
    )
    stats = NormStats.ones()
    trainer = Trainer(
        model=model,
        stats=stats,
        learning_rate=1e-3,
        divergence_penalty=10.0,
        optimize_divergence=True,
    )
    params, opt_state = trainer.init(jax.random.PRNGKey(0), batch)

    # non-donating jit so the same (params, opt_state) can be re-timed
    step = jax.jit(trainer._train_step_impl)
    params, opt_state, aux = step(params, opt_state, batch)  # compile
    jax.block_until_ready(aux["total"])
    return step, params, opt_state


SCAN_STEPS = 10


def make_scanned_train_step(scatter_impl: str, batch,
                            stream_dtype: str = "float32"):
    """K train steps under ONE jit dispatch (lax.scan over the step body).

    The remote-TPU tunnel charges a large per-dispatch/sync latency that a
    per-step Python loop pays on every step but pipelined training mostly
    hides (docs/evidence/ROOFLINE.md "Step decomposition"); scanning K
    steps device-side measures actual device throughput. Same weights,
    same optimizer, same batch — the quantity reported (edges/s through
    the full fwd+bwd+Adam step) is unchanged, only the transport overhead
    is out of the way."""
    import jax

    from p_div_gnn_tpu.graphs.container import NormStats
    from p_div_gnn_tpu.models import EncodeProcessDecode
    from p_div_gnn_tpu.train.loop import Trainer

    model = EncodeProcessDecode(
        latent_size=128, message_passing_steps=10,
        scatter_impl=scatter_impl, stream_dtype=stream_dtype,
    )
    trainer = Trainer(
        model=model, stats=NormStats.ones(), learning_rate=1e-3,
        divergence_penalty=10.0, optimize_divergence=True,
    )
    params, opt_state = trainer.init(jax.random.PRNGKey(0), batch)

    def body(carry, _):
        p, o = carry
        p, o, aux = trainer._train_step_impl(p, o, batch)
        return (p, o), aux["total"]

    scanned = jax.jit(
        lambda p, o: jax.lax.scan(body, (p, o), None, length=SCAN_STEPS)
    )
    _, totals = scanned(params, opt_state)  # compile
    jax.block_until_ready(totals)
    return scanned, params, opt_state


def main() -> None:
    import jax

    log(f"devices: {jax.devices()}")
    batch, n_edges, n_nodes = build_workload()
    log(
        f"workload: {n_nodes} nodes, {n_edges} edges "
        f"(padded {batch.num_nodes_padded}/{batch.num_edges_padded})"
    )
    # The tunneled chip shows large (up to ~5x) run-to-run contention noise,
    # so each implementation is timed in short blocks, INTERLEAVED across
    # several rounds, and the per-impl best block is used.
    pair_batch, _, _ = build_workload(pair_blocks=True)
    log(f"pair layout: {pair_batch.num_edges_padded} edge slots "
        f"({pair_batch.num_edges_padded / batch.num_edges_padded:.3f}x)")
    impls = ["xla", "pallas", "fused", "fused2", "hybrid"]
    batches = {impl: batch for impl in impls}
    batches["fused2"] = pair_batch
    cases = {}
    for impl in impls:
        try:
            cases[impl] = make_scanned_train_step(impl, batches[impl])
        except Exception as exc:  # pragma: no cover
            log(f"{impl} path failed ({type(exc).__name__}: {exc})")
    best_t = {impl: float("inf") for impl in cases}
    for r in range(6):
        for impl, (scanned, params, opt_state) in cases.items():
            t0 = time.perf_counter()
            _, totals = scanned(params, opt_state)
            jax.block_until_ready(totals)
            t = (time.perf_counter() - t0) / SCAN_STEPS
            best_t[impl] = min(best_t[impl], t)
            log(f"r{r} {impl}: {t*1e3:.2f} ms")
    for impl, t in best_t.items():
        log(f"best {impl} train step: {t*1e3:.2f} ms")
    t_xla = best_t.get("xla", float("inf"))
    best = min(best_t.values())
    result = {
        "metric": "edges/s/chip (P-DivGNN train fwd+bwd, L=128, 10 MP steps, batch 16)",
        "value": round(n_edges / best, 1),
        "unit": "edges/s",
        "vs_baseline": round(t_xla / best, 4),
    }
    # %speed-of-light against the roofline computed by scripts/roofline.py
    # (XLA cost analysis + v5e peaks); see docs/evidence/roofline.json
    try:
        roof = json.load(open("docs/evidence/roofline.json"))
        # compare against the SAME config the roofline measured: impl AND
        # stream dtype (bench times fp32-stream models only, so a roofline
        # taken with bf16 streams must not be used as the floor here)
        t_ref = best_t.get(roof["impl"])
        if roof.get("stream_dtype", "float32") != "float32":
            t_ref = None
        if t_ref is not None and t_ref < float("inf"):
            result["pct_speed_of_light"] = round(
                100.0 * roof["speed_of_light_ms"] / (t_ref * 1e3), 1
            )
            result["sol_impl"] = roof["impl"]
            result["sol_bound"] = roof["bound"]
    except Exception:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
