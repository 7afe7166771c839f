"""Micro-timings: sender-scatter components (round-3 perf work).

- take_fill:    jnp.take mode="fill" (current pair-bwd gather)
- take_clip:    jnp.take default (clip)
- take_pib:     jnp.take mode="promise_in_bounds" on pre-clamped indices
- pair_kernel:  pallas_segment_sum_pair alone (no gather)
- pair_full:    gather(fill) x2 + pair kernel (current production bwd)
- pair_fast:    gather(pib, clamped) x2 + pair kernel
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
# persistent cache (env var is a no-op under the axon sitecustomize —
# see p_div_gnn_tpu/utils/cache.py)
from p_div_gnn_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_workload


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, jfn, x0, K=30, rounds=3):
    def body(c, _):
        return jfn(c), None

    f = jax.jit(lambda x: jax.lax.scan(body, x, None, length=K)[0])
    out = f(x0)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = f(x0)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / K)
    log(f"{name}: {best*1e3:.3f} ms")
    return best * 1e3


def main():
    batch, n_edges, n_nodes = build_workload()
    Ep = batch.num_edges_padded
    Np = batch.num_nodes_padded
    L = 128
    Ep2 = int(batch.snd_perm.shape[0])
    log(f"Ep={Ep} Ep2={Ep2} Np={Np}")
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(Ep, L)), jnp.float32)
    rcv = batch.receivers
    perm = batch.snd_perm
    perm_clamped = jnp.minimum(perm, Ep - 1)

    from p_div_gnn_tpu.ops.scatter_pallas import pallas_segment_sum_pair

    results = {}

    def mk_take(mode, idx):
        def f(zc):
            if mode is None:
                g = jnp.take(zc, idx, axis=0)
            elif mode == "promise_in_bounds":
                g = zc.at[idx].get(mode="promise_in_bounds")
            else:
                g = jnp.take(zc, idx, axis=0, mode=mode, fill_value=0.0)
            return zc + g[:Ep] * 1e-20

        return f

    results["take_fill"] = timed("take_fill", mk_take("fill", perm), z)
    results["take_clip"] = timed("take_clip", mk_take(None, perm_clamped), z)
    results["take_pib"] = timed(
        "take_pib", mk_take("promise_in_bounds", perm_clamped), z
    )

    gv0 = jnp.take(z, perm, axis=0, mode="fill", fill_value=0.0)

    def pk(zc):
        dv, du = pallas_segment_sum_pair(
            zc, zc * 0.5, batch.snd_sorted, batch.snd_block_tile, Np
        )
        return zc.at[:Ep].add(dv[rcv] * 1e-20)

    results["pair_kernel"] = timed("pair_kernel", pk, gv0)

    def full(zc, mode, idx):
        if mode == "promise_in_bounds":
            gv = zc.at[idx].get(mode="promise_in_bounds")
            gu = (zc * 0.5).at[idx].get(mode="promise_in_bounds")
        else:
            gv = jnp.take(zc, idx, axis=0, mode=mode, fill_value=0.0)
            gu = jnp.take(zc * 0.5, idx, axis=0, mode=mode, fill_value=0.0)
        dv, du = pallas_segment_sum_pair(
            gv, gu, batch.snd_sorted, batch.snd_block_tile, Np
        )
        return zc + dv[rcv] * 1e-20

    results["pair_full_fill"] = timed(
        "pair_full_fill", lambda zc: full(zc, "fill", perm), z
    )
    results["pair_full_pib"] = timed(
        "pair_full_pib",
        lambda zc: full(zc, "promise_in_bounds", perm_clamped), z
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
