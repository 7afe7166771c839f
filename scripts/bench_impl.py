"""Time ONE (scatter_impl, EDGE_BLOCK) configuration of the flagship train
step and print a JSON line. EDGE_BLOCK is frozen at import, so the sweep
driver (bench_sweep.py) runs this in a subprocess per configuration:

    PDG_EDGE_BLOCK=512 python scripts/bench_impl.py hybrid [bfloat16]
"""

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



def main() -> None:
    impl = sys.argv[1] if len(sys.argv) > 1 else "fused"
    stream_dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    from bench import SCAN_STEPS, build_workload, make_scanned_train_step

    from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK

    batch, n_edges, n_nodes = build_workload(pair_blocks=impl == "fused2")
    # same scan-driver construction as the headline benchmark (single
    # source of truth; device throughput, not tunnel-transport time)
    scanned, params, opt_state = make_scanned_train_step(
        impl, batch, stream_dtype=stream_dtype
    )
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        _, totals = scanned(params, opt_state)
        jax.block_until_ready(totals)
        best = min(best, (time.perf_counter() - t0) / SCAN_STEPS)
    print(json.dumps({
        "impl": impl, "edge_block": EDGE_BLOCK,
        "stream_dtype": stream_dtype,
        "edge_slots": batch.num_edges_padded,
        "step_ms": round(best * 1e3, 1),
        "edges_per_s": int(n_edges / best),
    }))


if __name__ == "__main__":
    main()
