"""On-chip sweep of the (EDGE_BLOCK, NODE_TILE) layout space (round-4 perf).

Motivation (docs/evidence/microbench.json, r3): a 1982-block kernel with
ONE matmul costs 2.3 ms vs 3.59 ms with five — ~2.3 ms of the fused
forward is per-grid-step fixed overhead (DMA issue + pipeline
bookkeeping, ~1.2 µs/block), not compute. The flagship step runs FOUR
~2k-block kernels per MP step (gather-pair fwd, fused fwd, fused bwd,
merged scatter bwd), so the fixed cost is ~9 µs × 10 steps ≈ 90+ ms of
the 183 ms step. Larger EDGE_BLOCK cuts grid steps linearly; larger
NODE_TILE keeps the padding penalty bounded (a tile's edge run rounds up
to a block multiple) at the cost of wider one-hot contractions.

Each combo runs in a SUBPROCESS (the layout constants are bound at
import) and times, with a lax.scan driver on the real chip:
- kfwd:  one fused_edge_step forward
- kbwd:  one fused_edge_step fwd+bwd (custom VJP pair)
- gpair: sender_gather_pair fwd+bwd (gather + merged scatter kernel)
- train: the full train step (only with --train, compile is expensive)

Writes docs/evidence/block_sweep.json incrementally (atomic).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import jax
import jax.numpy as jnp
from p_div_gnn_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from bench import build_workload, make_scanned_train_step, SCAN_STEPS
from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK, NODE_TILE

out = {{"edge_block": EDGE_BLOCK, "node_tile": NODE_TILE}}
batch, n_edges, n_nodes = build_workload()
out["edge_slots"] = int(batch.num_edges_padded)
out["node_slots"] = int(batch.num_nodes_padded)
out["n_real_edges"] = int(n_edges)

def timed(fn, *args, reps=1, rounds=3):
    o = fn(*args); jax.block_until_ready(jax.tree.leaves(o)[0])
    assert float(jnp.sum(jnp.abs(o - args[0]))) > 0, "scan body was DCEd"
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        o = fn(*args); jax.block_until_ready(jax.tree.leaves(o)[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3

# NB: every big operand is an EXPLICIT jit argument — closed-over device
# arrays are serialized into the remote-compile request body on the axon
# tunnel, and the flagship streams blow its length limit (HTTP 413).
def scan_self(f, length):
    def run(x, *ops):
        def body(c, _):
            return f(c, *ops), None
        return jax.lax.scan(body, x, None, length=length)[0]
    return jax.jit(run)

KK = 30
L = 128
Np, Ep = batch.num_nodes_padded, batch.num_edges_padded
key = jax.random.PRNGKey(0)
a_u = jax.random.normal(key, (Np, L), jnp.float32)
a_v = a_u * 0.5
g_v = jax.random.normal(key, (Ep, L), jnp.float32) * 0.1
g_u = g_v * 0.7
ep = g_v * 0.3
b0 = jnp.zeros((L,)); b2 = jnp.zeros((L,))
w2 = jax.random.normal(key, (L, L), jnp.float32) * 0.05
aux = (batch.edge_gid, batch.edge_block_tile)
G = batch.n_graphs

from p_div_gnn_tpu.ops.fused_edge import fused_edge_step

def kfwd(c, a_u, a_v, g_u, ep, we, b0, w2, b2, rcv, eg, bt):
    z, r, m = fused_edge_step(a_u, a_v, c, g_u, ep, we, b0, w2, b2,
                              rcv, (eg, bt), G)
    # 1e-6*z keeps every scan step live (XLA folds 0*z to 0 and DCEs
    # the whole kernel chain - measured 0.027 "ms" ghosts)
    return c + 1e-6 * z

f = scan_self(kfwd, KK)
out["kfwd_ms"] = timed(f, g_v, a_u, a_v, g_u, ep, w2 * 0.1, b0, w2, b2,
                       batch.receivers, aux[0], aux[1], reps=KK)
print(json.dumps(out), flush=True)

def kbwd(c, a_u, a_v, g_u, ep, we, b0, w2, b2, rcv, eg, bt):
    def lo(gv):
        z, r, m = fused_edge_step(a_u, a_v, gv, g_u, ep, we, b0, w2, b2,
                                  rcv, (eg, bt), G)
        return jnp.sum(z) + jnp.sum(r) + jnp.sum(m)
    return c + 1e-6 * jax.grad(lo)(c)

f = scan_self(kbwd, KK)
out["kbwd_ms"] = timed(f, g_v, a_u, a_v, g_u, ep, w2 * 0.1, b0, w2, b2,
                       batch.receivers, aux[0], aux[1], reps=KK)
print(json.dumps(out), flush=True)

from p_div_gnn_tpu.ops.gather import sender_gather_pair

def gpair(c, snd, sp, ss, sbt):
    def lo(p):
        gv, gu = sender_gather_pair(p, p * 0.5, snd, sp, ss, sbt, Np)
        return jnp.sum(gv * gv) + jnp.sum(gu)
    return c + 1e-6 * jax.grad(lo)(c)

f = scan_self(gpair, KK)
out["gpair_ms"] = timed(f, a_u, batch.senders, batch.snd_perm,
                        batch.snd_sorted, batch.snd_block_tile, reps=KK)
print(json.dumps(out), flush=True)

if {train!r} == "1":
    scanned, params, opt_state = make_scanned_train_step("fused", batch)
    o = scanned(params, opt_state); jax.block_until_ready(o[1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = scanned(params, opt_state); jax.block_until_ready(o[1])
        best = min(best, (time.perf_counter() - t0) / SCAN_STEPS)
    out["train_ms"] = best * 1e3
    out["edges_per_s"] = n_edges / best
    print(json.dumps(out), flush=True)
"""


def atomic_dump(obj, path):
    tmp = str(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=1)
    os.replace(tmp, path)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--combos", default="128x128,256x128,512x128,256x256,512x256,768x256,512x512"
    )
    p.add_argument("--train", action="store_true",
                   help="also time the full train step (expensive compile)")
    p.add_argument("--out", default=str(REPO / "docs/evidence/block_sweep.json"))
    p.add_argument("--timeout", type=int, default=900)
    args = p.parse_args()

    rows = []
    if os.path.exists(args.out):
        rows = json.load(open(args.out)).get("rows", [])
    done = {(r["edge_block"], r["node_tile"], "train_ms" in r) for r in rows}

    for combo in args.combos.split(","):
        eb, nt = (int(x) for x in combo.split("x"))
        if (eb, nt, args.train) in done or (eb, nt, True) in done:
            continue
        env = dict(os.environ, PDG_EDGE_BLOCK=str(eb), PDG_NODE_TILE=str(nt))
        code = WORKER.format(repo=str(REPO), train="1" if args.train else "0")
        print(f"--- {eb}x{nt} ---", file=sys.stderr, flush=True)
        try:
            res = subprocess.run(
                [sys.executable, "-c", code], env=env, cwd=str(REPO),
                capture_output=True, text=True, timeout=args.timeout,
            )
        except subprocess.TimeoutExpired:
            rows.append({"edge_block": eb, "node_tile": nt,
                         "error": "timeout"})
            atomic_dump({"rows": rows}, args.out)
            continue
        lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
        if lines:
            row = json.loads(lines[-1])
            if res.returncode != 0:
                row["error"] = res.stderr[-500:]
            rows.append(row)
        else:
            rows.append({"edge_block": eb, "node_tile": nt,
                         "error": (res.stderr or "no output")[-500:]})
        print(json.dumps(rows[-1]), flush=True)
        atomic_dump({"rows": rows}, args.out)
    print(json.dumps({"rows": rows}, indent=1))


if __name__ == "__main__":
    main()
