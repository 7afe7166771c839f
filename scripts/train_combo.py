"""Time the FULL flagship train step for one (impl, EDGE_BLOCK, NODE_TILE,
stream_dtype) combo on the real chip — the decision driver for the round-4
layout/kernel choice. Run one combo per process (layout constants bind at
import):

    PDG_EDGE_BLOCK=256 PDG_NODE_TILE=256 python scripts/train_combo.py \
        --impl fused2 [--stream-dtype bfloat16]

Appends a row to docs/evidence/train_combo.json (atomic).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--impl", default="fused")
    p.add_argument("--stream-dtype", default="float32")
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--out", default="docs/evidence/train_combo.json")
    args = p.parse_args()

    import jax

    from p_div_gnn_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from bench import SCAN_STEPS, build_workload, make_scanned_train_step
    from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK, NODE_TILE

    t0 = time.perf_counter()
    batch, n_edges, n_nodes = build_workload(
        pair_blocks=args.impl == "fused2"
    )
    row = {
        "impl": args.impl,
        "edge_block": EDGE_BLOCK,
        "node_tile": NODE_TILE,
        "stream_dtype": args.stream_dtype,
        "edge_slots": int(batch.num_edges_padded),
        "driver": "scan",
    }
    scanned, params, opt_state = make_scanned_train_step(
        args.impl, batch, stream_dtype=args.stream_dtype
    )
    row["compile_s"] = round(time.perf_counter() - t0, 1)
    best = float("inf")
    for _ in range(args.rounds):
        t1 = time.perf_counter()
        _, totals = scanned(params, opt_state)
        jax.block_until_ready(totals)
        best = min(best, (time.perf_counter() - t1) / SCAN_STEPS)
    row["train_ms"] = round(best * 1e3, 2)
    row["edges_per_s"] = round(n_edges / best, 1)
    print(json.dumps(row), flush=True)

    rows = []
    if os.path.exists(args.out):
        rows = json.load(open(args.out)).get("rows", [])
    rows.append(row)
    tmp = args.out + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"rows": rows}, fh, indent=1)
    os.replace(tmp, args.out)


if __name__ == "__main__":
    main()
