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

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    impl = sys.argv[1] if len(sys.argv) > 1 else "fused"
    stream_dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    from bench import build_workload

    from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK
    from p_div_gnn_tpu.graphs.container import NormStats
    from p_div_gnn_tpu.models import EncodeProcessDecode
    from p_div_gnn_tpu.train.loop import Trainer

    batch, n_edges, n_nodes = build_workload(pair_blocks=impl == "fused2")
    model = EncodeProcessDecode(
        latent_size=128, message_passing_steps=10,
        scatter_impl=impl, stream_dtype=stream_dtype,
    )
    trainer = Trainer(model=model, stats=NormStats.ones(),
                      learning_rate=1e-3, divergence_penalty=10.0,
                      optimize_divergence=True)
    params, opt_state = trainer.init(jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer._train_step_impl)  # full step, nothing DCE'd
    params2, opt2, aux = step(params, opt_state, batch)
    jax.block_until_ready(aux["total"])
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(5):
            _, _, aux = step(params, opt_state, batch)
        jax.block_until_ready(aux["total"])
        best = min(best, (time.perf_counter() - t0) / 5)
    print(json.dumps({
        "impl": impl, "edge_block": EDGE_BLOCK,
        "stream_dtype": stream_dtype,
        "edge_slots": batch.num_edges_padded,
        "step_ms": round(best * 1e3, 1),
        "edges_per_s": int(n_edges / best),
    }))


if __name__ == "__main__":
    main()
