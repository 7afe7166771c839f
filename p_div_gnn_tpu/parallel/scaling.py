"""Scaling-efficiency harness: edges/s at 1..N devices (BASELINE.md north
star: ≥80% edges/s scaling efficiency; no reference counterpart — the
reference is single-GPU).

Runs the flagship train step data-parallel over growing mesh sizes and
reports efficiency relative to 1 device. On a real pod slice the collective
traffic rides ICI; under tests it runs on the virtual CPU mesh (semantics
only — CPU numbers are not performance claims).
"""

from __future__ import annotations

import time

import jax
import numpy as np
import optax
from jax.sharding import Mesh

from p_div_gnn_tpu.graphs.container import NormStats
from p_div_gnn_tpu.models.epd import EncodeProcessDecode
from p_div_gnn_tpu.parallel.dp import (
    device_put_sharded_batch,
    make_dp_train_step,
    pack_sharded_batch,
)


def measure_dp_scaling(
    samples_per_device: list,
    device_counts: list[int] | None = None,
    latent_size: int = 128,
    message_passing_steps: int = 10,
    iters: int = 10,
    stats: NormStats | None = None,
) -> list[dict]:
    """For each n in device_counts, time a DP train step over n devices,
    each carrying `samples_per_device` graphs (weak scaling: work grows
    with devices; perfect scaling = constant step time)."""
    devs = jax.devices()
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8) if n <= len(devs)]
    stats = stats or NormStats.ones()
    model = EncodeProcessDecode(
        latent_size=latent_size, message_passing_steps=message_passing_steps
    )
    optimizer = optax.adam(1e-3)
    rows = []
    edges_per_shard = sum(s.num_edges for s in samples_per_device)
    base_rate = None
    for n in device_counts:
        mesh = Mesh(np.array(devs[:n]), ("data",))
        shard_samples = samples_per_device * n
        stacked = pack_sharded_batch(
            shard_samples, n_shards=n,
            graphs_per_shard=len(samples_per_device),
        )
        stacked = device_put_sharded_batch(stacked, mesh)
        local = jax.tree.map(
            lambda x: np.asarray(x)[0] if getattr(x, "ndim", 0) else x,
            stacked,
        )
        params = model.init(jax.random.PRNGKey(0), local, stats)
        opt_state = optimizer.init(params)
        step = make_dp_train_step(
            model, stats, optimizer, mesh,
            divergence_penalty=10.0, optimize_divergence=True,
        )
        params, opt_state, aux = step(params, opt_state, stacked)
        jax.block_until_ready(aux["total"])
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, aux = step(params, opt_state, stacked)
        jax.block_until_ready(aux["total"])
        dt = (time.perf_counter() - t0) / iters
        rate = n * edges_per_shard / dt
        if base_rate is None:
            base_rate = rate / n  # per-device rate at the smallest count
        eff = (rate / n) / base_rate
        rows.append(
            {
                "devices": n,
                "step_s": dt,
                "edges_per_s": rate,
                "efficiency": eff,
            }
        )
    return rows
