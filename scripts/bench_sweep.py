"""Sweep (scatter_impl × EDGE_BLOCK × stream dtype) on the real chip and
pick the fastest training configuration. Each cell runs in a subprocess
because EDGE_BLOCK freezes at import (PDG_EDGE_BLOCK env).

Usage: python scripts/bench_sweep.py [--out docs/evidence/kernel_sweep.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _atomic_dump(obj, path: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=1)
    os.replace(tmp, path)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/evidence/kernel_sweep.json")
    p.add_argument("--impls", nargs="+",
                   default=["fused3", "hybrid", "fused", "fused2", "xla"])
    p.add_argument("--blocks", nargs="+", type=int, default=[128, 512])
    p.add_argument("--dtypes", nargs="+", default=["float32"])
    args = p.parse_args()

    rows = []
    for eb in args.blocks:
        for impl in args.impls:
            for sd in args.dtypes:
                if sd == "bfloat16" and impl in ("xla", "pallas", "hybrid"):
                    continue  # stream dtype only affects the fused kernels
                env = dict(os.environ, PDG_EDGE_BLOCK=str(eb))
                try:
                    r = subprocess.run(
                        [sys.executable, os.path.join(HERE, "bench_impl.py"),
                         impl, sd],
                        env=env, capture_output=True, text=True, timeout=1800,
                    )
                except subprocess.TimeoutExpired:
                    # a wedged tunnel must not discard the finished cells
                    print(f"TIMEOUT impl={impl} eb={eb} sd={sd}", flush=True)
                    continue
                line = r.stdout.strip().splitlines()[-1] if r.stdout else ""
                try:
                    row = json.loads(line)
                    rows.append(row)
                    print(json.dumps(row), flush=True)
                except json.JSONDecodeError:
                    print(f"FAILED impl={impl} eb={eb} sd={sd}: "
                          f"{r.stderr.strip().splitlines()[-3:]}", flush=True)
                # persist incrementally so a crash keeps completed cells;
                # write-temp + os.replace so a kill mid-dump can't leave a
                # truncated results file (same atomic pattern as
                # train/checkpoint.py)
                _atomic_dump(sorted(rows, key=lambda r: r["step_ms"]),
                             args.out)
    rows.sort(key=lambda r: r["step_ms"])
    _atomic_dump(rows, args.out)
    if rows:
        b = rows[0]
        print(f"best: {b['impl']} EB={b['edge_block']} {b['stream_dtype']} "
              f"-> {b['step_ms']} ms ({b['edges_per_s']:,} edges/s)")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
