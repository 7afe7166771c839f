"""Tracing/profiling harness (SURVEY §5: the reference only has manual
cuda-synced perf_counter timing; the TPU build gets jax.profiler traces and
a device-synced timing helper with compile-cache awareness)."""

from __future__ import annotations

from typing import Any

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pdg_trace") -> Any:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timeit(
    fn: Callable,
    *args: Any,
    iters: int = 20,
    warmup: int = 1,
    **kwargs: Any,
) -> dict[str, float]:
    """Device-synced wall time of fn(*args): compile excluded by warmup,
    result blocked via block_until_ready (the TPU analog of the reference's
    torch.cuda.synchronize bracketing, benchmark_gnn_fem.py:89-99)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    total = time.perf_counter() - t0
    return {"mean_s": total / iters, "total_s": total, "iters": iters}


def compiled_stats(fn: Any, *args: Any) -> dict[str, float]:
    """FLOP/memory estimates from XLA's cost analysis of the lowered fn."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", -1.0)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
    }
