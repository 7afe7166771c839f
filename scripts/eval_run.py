"""Evaluate a trained run end-to-end: inference on the test split, then
paper-style metrics (mean standardized NMSE, R², model-vs-FEM divergence),
written to docs/evidence/.

Usage:
    python scripts/eval_run.py --run results/elast_200e_div \
        --dataset datasets/dataset_10k_elast --name P-DivGNN \
        [--checkpoint best|last] [--subset N]

Mirrors the reference flow gnn_inference.py → compare_results.py
(`/root/reference/scripts/compare_results.py:1325-1339` prints the
headline table).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import pandas as pd


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True, help="training results folder")
    p.add_argument("--dataset", required=True, help="dataset root (with test/)")
    p.add_argument("--name", required=True, help="model display name")
    p.add_argument("--checkpoint", default="last", choices=["best", "last"])
    p.add_argument("--subset", type=int, default=0,
                   help="evaluate only the first N test samples (0 = all)")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--latent_size", type=int, default=128)
    p.add_argument("--message_passing_steps", type=int, default=10)
    p.add_argument("--periodic", default="true")
    p.add_argument("--out", default="docs/evidence")
    args = p.parse_args()

    run = Path(args.run)
    ckpt = run / "weights" / (
        "model_weights.ckpt" if args.checkpoint == "best"
        else "last_epoch_model_weights.ckpt"
    )
    assert ckpt.exists(), ckpt
    test_csv = Path(args.dataset) / "test" / "dataset.csv"
    if args.subset:
        df = pd.read_csv(test_csv)
        test_csv = Path(f"/tmp/eval_subset_{args.name}.csv")
        df.head(args.subset).to_csv(test_csv, index=False)

    infer_dir = run / f"inference_{args.checkpoint}"
    from p_div_gnn_tpu.inference import run_inference

    run_inference(
        dataset_csv=str(test_csv),
        results_folder=str(infer_dir),
        model_weights_path=str(ckpt),
        batch_size=args.batch_size,
        latent_size=args.latent_size,
        message_passing_steps=args.message_passing_steps,
        periodic_graph=args.periodic.lower() == "true",
    )

    from p_div_gnn_tpu.analysis.compare import main as compare_main

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    results = compare_main(
        dataset_csv=str(test_csv),
        inference_folders=[str(infer_dir)],
        model_names=[args.name],
        figures_folder=str(out),
        topk=2,
    )
    metrics = results[args.name]
    summary = {
        "model": args.name,
        "checkpoint": args.checkpoint,
        "n_samples": int(len(metrics)),
        "mean_nmse_standardized": float(metrics["nmse_standardized"].mean()),
        "mean_nmse": float(metrics["nmse"].mean()),
        "mean_r2": float(metrics["r2"].mean()),
        "mean_div_model_std": float(metrics["div_model_standardized"].mean()),
        "mean_div_fem_std": float(metrics["div_fem_standardized"].mean()),
    }
    summary_path = out / f"summary_{args.name}.json"
    summary_path.write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
