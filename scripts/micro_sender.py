"""On-chip microbench of the sender gather/scatter machinery (round-5).

Motivation: at the 512x256 production layout the fp32 block sweep
(docs/evidence/block_sweep.json) shows sender_gather_pair fwd+bwd at
~10 ms/MP step — half the whole bf16 MP step — and that machinery runs
fp32 with TWO streams regardless of stream_dtype (the casts happen
around it). This script times the candidate replacement pieces on the
real chip with the scan driver:

- gpair_fp32:   current sender_gather_pair fwd+bwd (baseline)
- gather1_bf16: ONE XLA row gather x[snd] in bf16 (fused3 fwd piece)
- gather1_fp32: same in fp32 (dtype effect)
- scat1_bf16:   ONE permute-gather + single-stream scatter kernel in
                bf16 streams (fused3 bwd piece; scatter accum stays fp32)
- scat1_fp32:   same in fp32 (current pallas_segment_sum cost)

Writes docs/evidence/micro_sender.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from p_div_gnn_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from bench import build_workload  # noqa: E402

KK = 30


def scan_self(f, length):
    def run(x, *ops):
        def body(c, _):
            return f(c, *ops), None

        return jax.lax.scan(body, x, None, length=length)[0]

    return jax.jit(run)


def timed(fn, *args, reps=KK, rounds=3):
    o = fn(*args)
    jax.block_until_ready(o)
    assert float(jnp.sum(jnp.abs(o))) > 0, "scan body was DCEd"
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        o = fn(*args)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main() -> None:
    batch, n_edges, n_nodes = build_workload()
    Np, Ep = batch.num_nodes_padded, batch.num_edges_padded
    L = 128
    key = jax.random.PRNGKey(0)
    x32 = jax.random.normal(key, (Np, L), jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    s32 = jax.random.normal(key, (Ep, L), jnp.float32) * 0.1
    s16 = s32.astype(jnp.bfloat16)
    out = {"Np": int(Np), "Ep": int(Ep),
           "snd_view_slots": int(batch.snd_perm.shape[0])}

    # current machinery: merged pair gather fwd+bwd (fp32 internals)
    from p_div_gnn_tpu.ops.gather import sender_gather_pair

    def gpair(c, snd, sp, ss, sbt):
        def lo(p):
            gv, gu = sender_gather_pair(p, p * 0.5, snd, sp, ss, sbt, Np)
            return jnp.sum(gv * gv) + jnp.sum(gu)

        return c + 1e-6 * jax.grad(lo)(c)

    f = scan_self(gpair, KK)
    out["gpair_fp32_ms"] = timed(
        f, x32, batch.senders, batch.snd_perm, batch.snd_sorted,
        batch.snd_block_tile,
    )
    print(json.dumps(out), flush=True)

    # fused3 fwd piece: ONE raw row gather
    def g1(c, x, snd):
        g = jnp.take(x, snd, axis=0)
        return c + 1e-6 * jnp.sum(g.astype(jnp.float32) ** 2)

    f = scan_self(g1, KK)
    out["gather1_bf16_ms"] = timed(f, jnp.zeros((), jnp.float32) + 1.0,
                                   x16, batch.senders)
    out["gather1_fp32_ms"] = timed(f, jnp.zeros((), jnp.float32) + 1.0,
                                   x32, batch.senders)
    print(json.dumps(out), flush=True)

    # fused3 bwd piece: permute-gather + single-stream MXU scatter
    from p_div_gnn_tpu.ops.scatter_pallas import pallas_segment_sum

    def sc1(c, stream, sp, ss, sbt):
        g_sorted = stream.at[sp].get(mode="promise_in_bounds")
        d = pallas_segment_sum(g_sorted.astype(jnp.float32), ss, sbt, Np)
        return c + 1e-6 * jnp.sum(d)

    f = scan_self(sc1, KK)
    out["scat1_fp32_ms"] = timed(f, jnp.zeros((), jnp.float32) + 1.0, s32,
                                 batch.snd_perm, batch.snd_sorted,
                                 batch.snd_block_tile)
    out["scat1_bf16viaf32_ms"] = timed(
        f, jnp.zeros((), jnp.float32) + 1.0, s16,
        batch.snd_perm, batch.snd_sorted, batch.snd_block_tile,
    )
    print(json.dumps(out), flush=True)

    with open("docs/evidence/micro_sender.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
