"""GNN-vs-FEM wall-time benchmark (reference C18,
`/root/reference/scripts/benchmark_gnn_fem.py:485-590`).

Sweeps hole-refinement factors (mesh size sweep), timing:
- (a) GNN forward only (jit'd, device-synced via block_until_ready — the
  TPU analog of the reference's cuda-synchronize bracketing, :89-99);
- (b) GNN including mesh→graph + periodic-edge preprocessing and host→
  device transfer (:90-93);
- (c) the FEM solve (CPU, like the reference's fedoo solve);
with one warmup per shape to exclude compile time (:539-542), a
random-weight model with latent 128 and 10 MP steps (:500-516), averaging
over 5 random loadings (:517), and writes ``benchmark_data.csv`` plus the
log-scale plot (:570-586).
"""

from __future__ import annotations

import time
from pathlib import Path

from typing import Any, Callable

import numpy as np
import pandas as pd


def benchmark_gnn(
    apply_fn: Any, params: Any, batch: Any, use_preprocessing: bool,
    rebuild: Callable[[], Any],
) -> float:
    """`benchmark_gnn_fem.py:81-100`: synced wall time of one forward."""
    import jax

    t0 = time.perf_counter()
    if use_preprocessing:
        batch = rebuild()
    out = apply_fn(params, batch)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def benchmark_fem(points2d: np.ndarray, tris: np.ndarray,
                  strains: np.ndarray, hyperelastic: bool) -> float:
    t0 = time.perf_counter()
    if hyperelastic:
        from p_div_gnn_tpu.datagen.hyperelastic import (
            solve_periodic_rve_neohookean,
        )

        try:
            solve_periodic_rve_neohookean(points2d, tris, *strains)
        except Exception:
            return 0.0  # failed solves report 0 (`benchmark_gnn_fem.py:113-115`)
    else:
        from p_div_gnn_tpu.datagen.fem import solve_periodic_rve

        solve_periodic_rve(points2d, tris, *strains)
    return time.perf_counter() - t0


def main(
    csv_data_filename: str | None = None,
    hyperelastic: bool = False,
    output_folder: str = "benchmark_results",
    steps: int = 20,
    n_mean_steps: int = 5,
) -> None:
    out = Path(output_folder)
    out.mkdir(parents=True, exist_ok=True)
    if csv_data_filename:
        data = pd.read_csv(csv_data_filename)
        plot(data, out / "benchmark.pdf", hyperelastic)
        return

    import jax

    from p_div_gnn_tpu.datagen.mesher import hole_plate_mesh
    from p_div_gnn_tpu.graphs import (
        compute_node_labels,
        compute_periodic_graph,
        mesh_to_graph,
        pack_batch,
    )
    from p_div_gnn_tpu.graphs.batching import GraphSample
    from p_div_gnn_tpu.graphs.container import NormStats
    from p_div_gnn_tpu.models import EncodeProcessDecode

    seed = 69
    rng = np.random.default_rng(seed=seed)
    strain_range = (-0.15, 0.15) if hyperelastic else (-0.05, 0.05)
    hole_refinement_factors = np.linspace(1, 100, steps)
    model = EncodeProcessDecode(latent_size=128, message_passing_steps=10)
    stats = NormStats.ones()
    apply_fn = jax.jit(
        lambda p, b: model.apply(p, b, stats, scale_input=True,
                                 scale_output=True)
    )
    params = None

    rows = []
    for factor in hole_refinement_factors:
        mesh = hole_plate_mesh(
            100.0, 100.0, radius=30.0, hole_center=(50.0, 50.0),
            hole_refinement_factor=float(factor),
            global_mesh_refinement_size=5.0, seed=seed,
        )
        pts = mesh.points[:, :2]
        labels = compute_node_labels(mesh)

        def build_batch():
            g = compute_periodic_graph(mesh_to_graph(mesh))
            n = g.num_nodes
            s = GraphSample(
                graph=g,
                mean_stress=rng.normal(size=3).astype(np.float32),
                local_stress=np.zeros((n, 3), np.float32),
                node_labels=labels,
                div_data=np.zeros(1, np.float32),
                div_row=np.zeros(1, np.int64),
                div_col=np.zeros(1, np.int64),
            )
            return pack_batch([s], n_graphs=1, reorder="rcm")

        batch = build_batch()
        if params is None:
            params = model.init(jax.random.PRNGKey(0), batch, stats)
        # warmups (compile excluded, `benchmark_gnn_fem.py:539-542`)
        benchmark_gnn(apply_fn, params, batch, False, build_batch)
        strains = rng.uniform(*strain_range, size=3)
        benchmark_fem(pts, mesh.faces, strains, hyperelastic)

        t_gnn, t_gnn_pre, t_fem = [], [], []
        for _ in range(n_mean_steps):
            strains = rng.uniform(*strain_range, size=3)
            t_fem.append(benchmark_fem(pts, mesh.faces, strains, hyperelastic))
            t_gnn.append(
                benchmark_gnn(apply_fn, params, batch, False, build_batch)
            )
            t_gnn_pre.append(
                benchmark_gnn(apply_fn, params, batch, True, build_batch)
            )
        rows.append(
            {
                "n_nodes": mesh.n_points,
                "hole_refinement_factor": float(factor),
                "gnn_gpu": float(np.mean(t_gnn)),
                "gnn_gpu_prepro": float(np.mean(t_gnn_pre)),
                "fem": float(np.mean(t_fem)),
            }
        )
        print(
            f"factor {factor:6.1f}: N={mesh.n_points:6d} "
            f"gnn={rows[-1]['gnn_gpu']*1e3:7.2f}ms "
            f"gnn+pre={rows[-1]['gnn_gpu_prepro']*1e3:7.2f}ms "
            f"fem={rows[-1]['fem']*1e3:8.2f}ms"
        )
    data = pd.DataFrame(rows)
    data.to_csv(out / "benchmark_data.csv", index=False)
    plot(data, out / "benchmark.pdf", hyperelastic)


def plot(data: pd.DataFrame, output_file: str,
         hyperelastic: bool) -> None:
    """Log-scale wall-time plot (`benchmark_gnn_fem.py:418-482` /
    `plot_benchmark.py:23-76`, without the LaTeX text rendering)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.style.use("seaborn-v0_8-whitegrid")
    fig, ax = plt.subplots(figsize=(7, 5))
    ax.plot(data["n_nodes"], data["gnn_gpu"], label="GNN (TPU)", color="C0",
            marker="o")
    ax.plot(
        data["n_nodes"], data["gnn_gpu_prepro"],
        label="GNN with Periodic Edges (TPU)", color="C1", marker="s",
    )
    ax.plot(data["n_nodes"], data["fem"], label="FEM", color="C3", marker="^")
    ax.set_xlabel("Number of nodes")
    ax.set_ylabel("Time [s]")
    ax.set_yscale("log")
    kind = (
        "Non linear hyper-elasticity" if hyperelastic else "Linear elasticity"
    )
    ax.set_title(f"Computation Time vs. Number of Nodes ({kind})")
    ax.grid(True, which="both", ls="--", linewidth=0.5)
    ax.legend()
    fig.tight_layout()
    fig.savefig(output_file)
    plt.close(fig)
