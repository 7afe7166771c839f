"""Decompose the flagship train-step time into fixed overhead vs marginal
per-message-passing-step cost.

Times the FULL train step (fwd+bwd+Adam, headline workload) at several
``message_passing_steps`` settings, interleaved best-of like the other
harnesses, and fits time(M) = a + b·M. The slope b is the true marginal
cost of one MP step (what kernel work can reduce); the intercept a is
everything else (encoders/decoder/loss/optimizer + dispatch). Comparing b
against the per-step HBM roofline says whether the MP kernels — as opposed
to the fixed parts — are the thing to optimize next.

Usage: python scripts/step_scaling.py [--impl fused] [--steps 1 2 5 10 20]
Writes docs/evidence/step_scaling.json.
"""

from __future__ import annotations

import argparse
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
import numpy as np



def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--impl", default="fused")
    p.add_argument("--stream_dtype", default="float32")
    p.add_argument("--steps", nargs="+", type=int, default=[1, 2, 5, 10, 20])
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--out", default="docs/evidence/step_scaling.json")
    args = p.parse_args()

    from bench import build_workload

    from p_div_gnn_tpu.graphs.container import NormStats
    from p_div_gnn_tpu.models import EncodeProcessDecode
    from p_div_gnn_tpu.train.loop import Trainer

    batch, n_edges, n_nodes = build_workload(
        pair_blocks=args.impl == "fused2"
    )
    print(f"workload: {n_nodes} nodes / {n_edges} edges", file=sys.stderr)

    cases = {}
    for m in args.steps:
        model = EncodeProcessDecode(
            latent_size=128, message_passing_steps=m,
            scatter_impl=args.impl, stream_dtype=args.stream_dtype,
        )
        trainer = Trainer(
            model=model, stats=NormStats.ones(), learning_rate=1e-3,
            divergence_penalty=10.0, optimize_divergence=True,
        )
        params, opt_state = trainer.init(jax.random.PRNGKey(0), batch)
        step = jax.jit(trainer._train_step_impl)
        _, _, aux = step(params, opt_state, batch)  # compile
        jax.block_until_ready(aux["total"])
        cases[m] = (step, params, opt_state)
        print(f"compiled M={m}", file=sys.stderr)

    best = {m: float("inf") for m in cases}
    for r in range(args.rounds):
        for m, (step, params, opt_state) in cases.items():
            t0 = time.perf_counter()
            for _ in range(5):
                _, _, aux = step(params, opt_state, batch)
            jax.block_until_ready(aux["total"])
            t = (time.perf_counter() - t0) / 5
            best[m] = min(best[m], t)
            print(f"r{r} M={m}: {t * 1e3:.1f} ms", file=sys.stderr)

    ms = np.array(sorted(best))
    ts = np.array([best[m] * 1e3 for m in ms])
    slope, intercept = np.polyfit(ms, ts, 1)
    result = {
        "impl": args.impl,
        "stream_dtype": args.stream_dtype,
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "times_ms": {int(m): round(best[m] * 1e3, 1) for m in ms},
        "marginal_ms_per_mp_step": round(float(slope), 2),
        "fixed_overhead_ms": round(float(intercept), 2),
        "mp_fraction_at_10_steps": round(
            float(slope * 10 / (intercept + slope * 10)), 3
        ),
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
