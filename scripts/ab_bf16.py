"""Multi-seed bf16-stream A/B (VERDICT round-2 item 5).

Round 2's single-seed 200-epoch A/B measured +8.2% NMSE for bf16 streams
against a <5% pre-registered bar, with fp32's own best-to-last checkpoint
spread larger than the gap — one run decides nothing. This driver runs a
PAIRED multi-seed study: for each seed, fp32 and bf16 train on the same
data with the same shuffle order and init, and the per-seed gap
(bf16 − fp32) is what's tested — pairing cancels the seed-level variance
that swamped the single-run comparison.

Budget-constrained protocol (documented deviation from the 200-epoch
flagship): 2k-sample elastic dataset, 60 epochs, flagship architecture
(L=128, 10 MP steps, λ=10, batch 16, fused kernels). Runs are ordered
pair-major so an interrupted sweep still yields complete pairs.

Usage: python scripts/ab_bf16.py [--epochs 60] [--data /root/data_elast_2k]
Writes docs/evidence/ab_bf16_seeds.json incrementally (atomic).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# the fp32 leg of every pair needs the fp32-safe block size; must be set
# before the package binds the layout constants (round-5 review finding)
os.environ.setdefault("PDG_EDGE_BLOCK", "512")




def atomic_dump(obj, path: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=1)
    os.replace(tmp, path)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="/root/data_elast_2k")
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--seeds", nargs="+", type=int, default=[17, 23, 42])
    p.add_argument("--out", default="docs/evidence/ab_bf16_seeds.json")
    p.add_argument("--runs-root", default="/root/ab_runs")
    p.add_argument("--scatter-impl", default="fused",
                   help="kernel family under test (round-5: 'fused3' "
                        "pairs extend the bf16 evidence to the raw-x "
                        "kernels; use a separate --out)")
    args = p.parse_args()

    from p_div_gnn_tpu.train.runner import run_experience
    from p_div_gnn_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    rows = []
    if os.path.exists(args.out):
        rows = json.load(open(args.out)).get("runs", [])
    done = {(r["seed"], r["stream_dtype"]) for r in rows}

    for seed in args.seeds:
        for sd in ("float32", "bfloat16"):
            if (seed, sd) in done:
                continue
            folder = Path(args.runs_root) / f"{args.scatter_impl}_{sd}_s{seed}"
            # tunnel-stall tolerance (scripts/ab_watchdog.sh restarts a
            # wedged sweep): resume a partially-trained run from its
            # last-epoch checkpoint; a folder with no checkpoint yet is a
            # pre-first-epoch casualty — start it over
            from p_div_gnn_tpu.train.checkpoint import LAST_CHECKPOINT
            if folder.exists() and not (
                folder / "weights" / LAST_CHECKPOINT
            ).exists():
                import shutil
                shutil.rmtree(folder)
            t0 = time.perf_counter()
            train_losses, test_losses = run_experience(
                dataset_train_csv=f"{args.data}/train/dataset.csv",
                dataset_test_csv=f"{args.data}/test/dataset.csv",
                results_folder=str(folder),
                epochs=args.epochs,
                batch_size=16,
                divergence=True,
                latent_size=128,
                divergence_penalty=10.0,
                early_stopping_limit=10,
                learning_rate=1e-3,
                message_passing_steps=10,
                train_all_epochs=True,
                scatter_impl=args.scatter_impl,
                stream_dtype=sd,
                seed=seed,
                resume=True,
            )
            rows.append({
                "seed": seed,
                "stream_dtype": sd,
                "epochs": args.epochs,
                "best_test_loss": min(test_losses),
                "last_test_loss": test_losses[-1],
                "best_epoch": int(test_losses.index(min(test_losses))) + 1,
                "wall_min": round((time.perf_counter() - t0) / 60, 1),
            })
            summary = summarize(rows)
            atomic_dump(summary, args.out)
            print(json.dumps(rows[-1]), flush=True)
    print(json.dumps(summarize(rows), indent=1))


def summarize(rows):
    import numpy as np

    by = {}
    for r in rows:
        by.setdefault(r["seed"], {})[r["stream_dtype"]] = r
    gaps = []
    for seed, d in sorted(by.items()):
        if "float32" in d and "bfloat16" in d:
            f, b = d["float32"]["best_test_loss"], d["bfloat16"][
                "best_test_loss"]
            gaps.append({"seed": seed, "fp32_best": f, "bf16_best": b,
                         "rel_gap_pct": round(100 * (b - f) / f, 2)})
    out = {
        "protocol": ("paired per-seed fp32-vs-bf16, 2k-sample elastic "
                     "dataset, 60 epochs, flagship config (documented "
                     "deviation from the 200-epoch protocol: chip-time "
                     "budget); gap = (bf16_best - fp32_best)/fp32_best"),
        "runs": rows,
        "pairs": gaps,
    }
    if gaps:
        g = [x["rel_gap_pct"] for x in gaps]
        out["mean_gap_pct"] = round(float(np.mean(g)), 2)
        out["spread_gap_pct"] = round(float(np.std(g)), 2)
        f = [x["fp32_best"] for x in gaps]
        out["fp32_seed_spread_pct"] = round(
            100 * float(np.std(f) / np.mean(f)), 2
        )
    return out


if __name__ == "__main__":
    main()
