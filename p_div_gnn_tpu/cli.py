"""Command-line entry points (argparse; the reference used python-fire).

Mirrors the reference CLIs:
- ``pdg-train --config_path cfg.yml`` ↔ `scripts/gnn_train.py:438-447`
- ``pdg-infer --config_path cfg.yml`` ↔ `scripts/gnn_inference.py:141-149`
- ``pdg-generate ...``               ↔ `scripts/generate_dataset.py:665-776`
- ``pdg-benchmark ...``              ↔ `scripts/benchmark_gnn_fem.py:485-590`
- ``pdg-compare ...``                ↔ `scripts/compare_results.py:1057-1437`
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# persistent XLA compile cache: 200-epoch runs relaunch (watchdog resumes)
# and re-pay ~minutes of compiles otherwise
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def train_main(argv: list[str] | None = None) -> None:
    from p_div_gnn_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    p = argparse.ArgumentParser(prog="pdg-train")
    p.add_argument("--config_path", required=True)
    p.add_argument(
        "--resume", action="store_true",
        help="resume from the run's last-epoch checkpoint (overrides the "
        "config's resume key; used by scripts/train_watchdog.sh restarts)",
    )
    args = p.parse_args(argv)
    # Layout auto-guard: the fp32 fused kernels' backward exceeds the
    # 16 MB scoped-VMEM limit above 512-row edge blocks, but the default
    # layout is 768×256 (bf16 optimum). The layout constants bind when
    # the package first imports, so the decision must happen HERE, from
    # the config, before the runner import — otherwise every fp32 fused
    # config would hit the runner's fail-fast guard (round-5 review).
    import yaml

    with open(args.config_path) as fh:
        cfg = yaml.safe_load(fh) or {}
    if (
        cfg.get("scatter_impl") in ("fused", "fused2", "fused3")
        and cfg.get("stream_dtype", "float32") == "float32"
        and "PDG_EDGE_BLOCK" not in os.environ
    ):
        os.environ["PDG_EDGE_BLOCK"] = "512"
        print(
            "pdg-train: fp32 fused config -> EDGE_BLOCK=512 (the largest "
            "fp32-safe block; export PDG_EDGE_BLOCK to override)"
        )
    from p_div_gnn_tpu.train.runner import main

    main(args.config_path, resume_override=True if args.resume else None)


def infer_main(argv: list[str] | None = None) -> None:
    from p_div_gnn_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    p = argparse.ArgumentParser(prog="pdg-infer")
    p.add_argument("--config_path", required=True)
    args = p.parse_args(argv)
    from p_div_gnn_tpu.inference import main

    main(args.config_path)


def generate_main(argv: list[str] | None = None) -> None:
    from p_div_gnn_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    p = argparse.ArgumentParser(prog="pdg-generate")
    p.add_argument("--n_samples", type=int, default=1000)
    p.add_argument("--test_size", type=float, default=0.25)
    p.add_argument("--seed", type=int, default=69)
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--max_workers", type=int, default=None)
    p.add_argument(
        "--hyperelastic", action="store_true",
        help="Neo-Hookean finite-strain dataset (reference C17)",
    )
    p.add_argument(
        "--bc", choices=("dirichlet", "neumann"), default="dirichlet",
        help="elastic BC mode: strain-controlled (reference main) or "
             "stress-controlled (compute_mechanical_fields_neumann)",
    )
    p.add_argument(
        "--element", choices=("tri", "quad"), default="tri",
        help="element type: P1 triangles (reference main) or Q4 quads "
             "(reference capability hole_plate_mesh_quad, "
             "generate_dataset_hyperelast.py:106-161)",
    )
    args = p.parse_args(argv)
    t0 = time.perf_counter()
    from p_div_gnn_tpu.datagen.generate import main

    main(
        n_samples=args.n_samples,
        test_size=args.test_size,
        seed=args.seed,
        dataset_path=args.dataset_path,
        max_workers=args.max_workers,
        hyperelastic=args.hyperelastic,
        bc=args.bc,
        element=args.element,
    )
    print(f"Data generated in {time.perf_counter() - t0:9.4f} seconds")


def benchmark_main(argv: list[str] | None = None) -> None:
    from p_div_gnn_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    p = argparse.ArgumentParser(prog="pdg-benchmark")
    p.add_argument("--csv_data_filename", default=None)
    p.add_argument("--hyperelastic", action="store_true")
    p.add_argument("--output_folder", default="benchmark_results")
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args(argv)
    from p_div_gnn_tpu.analysis.benchmark import main

    main(
        csv_data_filename=args.csv_data_filename,
        hyperelastic=args.hyperelastic,
        output_folder=args.output_folder,
        steps=args.steps,
    )


def compare_main(argv: list[str] | None = None) -> None:
    from p_div_gnn_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    p = argparse.ArgumentParser(prog="pdg-compare")
    p.add_argument("--dataset_csv", required=True)
    p.add_argument(
        "--inference_folders", nargs="+", required=True,
        help="one or more inference result folders (each with dataset.csv)",
    )
    p.add_argument("--model_names", nargs="+", default=None)
    p.add_argument("--figures_folder", default=None)
    p.add_argument("--topk", type=int, default=0)
    args = p.parse_args(argv)
    from p_div_gnn_tpu.analysis.compare import main

    main(
        dataset_csv=args.dataset_csv,
        inference_folders=args.inference_folders,
        model_names=args.model_names,
        figures_folder=args.figures_folder,
        topk=args.topk,
    )


def scaling_main(argv: list[str] | None = None) -> None:
    """DP weak-scaling efficiency report (north-star metric harness)."""
    from p_div_gnn_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    p = argparse.ArgumentParser(prog="pdg-scaling")
    p.add_argument("--graphs_per_device", type=int, default=4)
    p.add_argument("--latent_size", type=int, default=128)
    p.add_argument("--message_passing_steps", type=int, default=10)
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)
    import json

    import numpy as np

    from p_div_gnn_tpu.datagen.mesher import hole_plate_mesh
    from p_div_gnn_tpu.datagen.opdiv import compute_op_div_matrix
    from p_div_gnn_tpu.graphs import (
        compute_node_labels,
        compute_periodic_graph,
        mesh_to_graph,
    )
    from p_div_gnn_tpu.graphs.batching import GraphSample
    from p_div_gnn_tpu.parallel.scaling import measure_dp_scaling

    rng = np.random.default_rng(0)
    samples = []
    for i in range(args.graphs_per_device):
        mesh = hole_plate_mesh(
            100.0, 100.0, radius=20.0, hole_center=(50.0, 50.0),
            hole_refinement_factor=6.0, global_mesh_refinement_size=4.0,
            seed=i,
        )
        g = compute_periodic_graph(mesh_to_graph(mesh))
        op = compute_op_div_matrix(mesh.points[:, :2], mesh.faces)
        samples.append(
            GraphSample(
                graph=g,
                mean_stress=rng.normal(size=3).astype(np.float32),
                local_stress=rng.normal(size=(g.num_nodes, 3)).astype(
                    np.float32
                ),
                node_labels=compute_node_labels(mesh),
                div_data=op.data.astype(np.float32),
                div_row=op.row.astype(np.int64),
                div_col=op.col.astype(np.int64),
            )
        )
    rows = measure_dp_scaling(
        samples,
        latent_size=args.latent_size,
        message_passing_steps=args.message_passing_steps,
    )
    for r in rows:
        print(
            f"devices={r['devices']:2d}  step={r['step_s']*1e3:8.2f} ms  "
            f"{r['edges_per_s']/1e6:8.3f} M edges/s  "
            f"efficiency={r['efficiency']*100:6.1f}%"
        )
    if args.output:
        with open(args.output, "w") as fh:
            json.dump(rows, fh, indent=2)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    dispatch = {
        "train": train_main,
        "infer": infer_main,
        "generate": generate_main,
        "benchmark": benchmark_main,
        "compare": compare_main,
        "scaling": scaling_main,
    }
    if cmd not in dispatch:
        print(f"usage: python -m p_div_gnn_tpu.cli {{{'|'.join(dispatch)}}} ...")
        raise SystemExit(2)
    dispatch[cmd](sys.argv[2:])
