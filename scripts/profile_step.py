"""Ad-hoc profiling of the flagship train step on the real chip.

The tunneled TPU shows large run-to-run variance (shared link/chip), so
implementations are timed INTERLEAVED over several rounds and the per-impl
minimum block time is reported.

Usage: python scripts/profile_step.py [impl ...]  (default: fused xla)
"""
from __future__ import annotations

import os
import sys
import time

# persistent cache (env var is a no-op under the axon sitecustomize —
# see p_div_gnn_tpu/utils/cache.py)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from p_div_gnn_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax

from bench import build_workload  # noqa: E402

from p_div_gnn_tpu.graphs.container import NormStats  # noqa: E402
from p_div_gnn_tpu.models import EncodeProcessDecode  # noqa: E402
from p_div_gnn_tpu.train.loop import Trainer  # noqa: E402


def block_time(fn, *args, steps=5):
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    impls = sys.argv[1:] or ["fused", "xla"]
    batch, n_edges, n_nodes = build_workload()
    print(f"workload: {n_nodes} nodes / {n_edges} edges "
          f"(padded {batch.num_nodes_padded}/{batch.num_edges_padded})")
    batches = {impl: batch for impl in impls}
    if "fused2" in impls:
        batches["fused2"], _, _ = build_workload(pair_blocks=True)
        print(f"pair layout: {batches['fused2'].num_edges_padded} edge slots")

    stats = NormStats.ones()
    cases = {}
    for impl in impls:
        batch = batches[impl]
        model = EncodeProcessDecode(
            latent_size=128, message_passing_steps=10, scatter_impl=impl
        )
        trainer = Trainer(model=model, stats=stats, learning_rate=1e-3,
                          divergence_penalty=10.0, optimize_divergence=True)
        params, opt_state = trainer.init(jax.random.PRNGKey(0), batch)
        fwd = jax.jit(lambda p, b, m=trainer.model: m.apply(
            p, b, stats, scale_input=True, scale_output=False))
        lg = jax.jit(jax.value_and_grad(trainer._loss_fn, has_aux=True))
        grad = lambda p, b, f=lg: f(p, b)[0][0]

        def make_step(tr):
            def step(p, o, b):
                return tr._train_step_impl(p, o, b)[2]["total"]
            return jax.jit(step)
        jstep = make_step(trainer)
        # compile everything once
        jax.block_until_ready(fwd(params, batch))
        jax.block_until_ready(grad(params, batch))
        jax.block_until_ready(jstep(params, opt_state, batch))
        cases[impl] = (fwd, grad, jstep, params, opt_state, batch)

    best = {impl: [1e9, 1e9, 1e9] for impl in impls}
    rounds = int(os.environ.get("PDG_PROFILE_ROUNDS", "6"))
    for r in range(rounds):
        for impl in impls:
            fwd, grad, jstep, params, opt_state, batch = cases[impl]
            t = [
                block_time(fwd, params, batch),
                block_time(grad, params, batch),
                block_time(jstep, params, opt_state, batch),
            ]
            best[impl] = [min(a, b) for a, b in zip(best[impl], t)]
            print(f"  r{r} {impl:8s} fwd {t[0]*1e3:8.2f}  fwd+bwd "
                  f"{t[1]*1e3:8.2f}  step {t[2]*1e3:8.2f} ms", flush=True)
    print("=== best-of ===")
    for impl in impls:
        b = best[impl]
        print(f"{impl:8s} fwd {b[0]*1e3:8.2f} ms | fwd+bwd {b[1]*1e3:8.2f} ms"
              f" | train step {b[2]*1e3:8.2f} ms | {n_edges/b[2]/1e3:.0f} kE/s")


if __name__ == "__main__":
    main()
