"""Micro-timings of the train step's XLA glue pieces (round-3 perf work).

Times, each under a lax.scan driver on the real chip:
- deg:    segment_sum(edge_mask) over sorted receivers  (per MP step today)
- affine: new_e = (z*a2 + b2)*mask                      (per MP step)
- matmul: (Ep, L) @ (L, L) HIGHEST                      (e_proj / dE class)
- pairsc: sender-view pair scatter (the bwd of sender_gather_pair)
- ellsc:  ELL gather-only sender scatter (candidate replacement)

Prints one JSON dict at the end.
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


def timed(name, jfn, x0, K, rounds=3):
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
    K = 30
    batch, n_edges, n_nodes = build_workload()
    Ep = batch.num_edges_padded
    Np = batch.num_nodes_padded
    L = 128
    log(f"workload Ep={Ep} Np={Np}")
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(Ep, L)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(L, L)) / np.sqrt(L), jnp.float32)
    mask = batch.edge_mask.astype(jnp.float32)[:, None]
    rcv = batch.receivers

    results = {}

    from p_div_gnn_tpu.ops.segment import segment_sum

    # deg: carry a scalar so scan iterations serialize without (Np,1) carry
    def deg_fn(c):
        d = segment_sum(mask + c, rcv, Np)
        return jnp.sum(d) * 1e-20

    results["deg_segsum"] = timed("deg_segsum", deg_fn, jnp.float32(0), K)

    def affine_fn(zc):
        a2 = jnp.sum(zc[0, :1]) * 1e-20 + 1.0
        return (zc * a2 + 0.1) * mask

    results["affine"] = timed("affine", affine_fn, z, K)

    def mm_fn(zc):
        return jax.lax.dot(
            zc, w, precision=jax.lax.Precision.HIGHEST
        )

    results["matmul_EpLL"] = timed("matmul_EpLL", mm_fn, z, K)

    from p_div_gnn_tpu.ops.scatter_pallas import pallas_segment_sum_pair

    def pairsc_fn(zc):
        gv = jnp.take(zc, batch.snd_perm, axis=0, mode="fill",
                      fill_value=0.0)
        gu = jnp.take(zc * 0.5, batch.snd_perm, axis=0, mode="fill",
                      fill_value=0.0)
        dv, du = pallas_segment_sum_pair(
            gv, gu, batch.snd_sorted, batch.snd_block_tile, Np
        )
        # feed result back into an (Ep, L) tensor to serialize
        return zc + dv[rcv] * 1e-20

    results["pair_scatter"] = timed("pair_scatter", pairsc_fn, z, K)

    # ELL gather-only sender scatter: node n's incoming (sender-side) edge
    # ids padded to max degree; dproj[n] = sum_d stream[ell[n, d]]
    snd = np.asarray(batch.senders)
    emask = np.asarray(batch.edge_mask)
    order = np.argsort(snd[emask], kind="stable")
    eids = np.nonzero(emask)[0][order]
    ssorted = snd[emask][order]
    counts = np.bincount(ssorted, minlength=Np)
    maxdeg = int(counts.max())
    ell = np.full((Np, maxdeg), Ep, np.int64)  # Ep = OOB sentinel
    pos = np.zeros(Np, np.int64)
    for e, s in zip(eids, ssorted):
        ell[s, pos[s]] = e
        pos[s] += 1
    log(f"ELL max degree {maxdeg}, fill "
        f"{counts.sum() / (Np * maxdeg):.2f}")
    ell_j = jnp.asarray(ell)

    def ellsc_fn(zc):
        acc = jnp.zeros((Np, L), jnp.float32)
        for d in range(maxdeg):
            acc = acc + jnp.take(zc, ell_j[:, d], axis=0, mode="fill",
                                 fill_value=0.0)
        return zc + acc[rcv] * 1e-20

    results["ell_scatter_x1"] = timed("ell_scatter_x1", ellsc_fn, z, K)

    # pair version (two streams, shared indices)
    def ellsc2_fn(zc):
        acc = jnp.zeros((Np, 2 * L), jnp.float32)
        z2 = jnp.concatenate([zc, zc * 0.5], axis=1)
        for d in range(maxdeg):
            acc = acc + jnp.take(z2, ell_j[:, d], axis=0, mode="fill",
                                 fill_value=0.0)
        return zc + acc[rcv, :L] * 1e-20

    results["ell_scatter_pair"] = timed("ell_scatter_pair", ellsc2_fn, z, K)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
