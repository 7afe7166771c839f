"""A/B the sender-view MXU-scatter VJP (ops/gather.py) on the real chip:
the fused train step with the sender view vs with it stripped (XLA generic
scatter in the gather transpose). Interleaved best-of timing."""

from __future__ import annotations

import json
import os
import sys
import time

# persistent cache (env var is a no-op under the axon sitecustomize —
# see p_div_gnn_tpu/utils/cache.py)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from p_div_gnn_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax

from bench import build_workload, make_train_step  # noqa: E402


def main() -> None:
    batch, n_edges, n_nodes = build_workload()
    stripped = batch.replace(
        snd_perm=None, snd_sorted=None, snd_block_tile=None
    )
    print(f"workload: {n_nodes} nodes / {n_edges} edges", flush=True)
    cases = {
        "fused+sndview": (batch, *make_train_step("fused", batch)),
        "fused-noview": (stripped, *make_train_step("fused", stripped)),
    }
    best = {k: float("inf") for k in cases}
    for r in range(5):
        for name, (b, step, params, opt_state) in cases.items():
            t0 = time.perf_counter()
            for _ in range(5):
                _, _, aux = step(params, opt_state, b)
            jax.block_until_ready(aux["total"])
            t = (time.perf_counter() - t0) / 5
            best[name] = min(best[name], t)
            print(f"r{r} {name}: {t*1e3:.1f} ms", flush=True)
    out = {k: round(v * 1e3, 1) for k, v in best.items()}
    out["speedup"] = round(best["fused-noview"] / best["fused+sndview"], 3)
    out["edges_per_s"] = int(n_edges / best["fused+sndview"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
