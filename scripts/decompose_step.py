"""On-device decomposition of the flagship train step (round-3 perf work).

Times each constituent of the fused-path train step SEPARATELY on the real
chip, every piece under a lax.scan driver (K dependent reps in ONE jit
dispatch, so tunnel transport is out of every number):

- train:        full fwd+bwd+Adam step (the headline quantity)
- train_norem:  same with remat_steps=False (isolates the replay cost)
- fwdloss:      loss forward only
- glue0:        full train step with message_passing_steps=0
                (encoders + decoder + loss + optimizer, no MP)
- kfwd:         ONE fused_edge_step kernel call (fwd)
- kbwd:         ONE fused_edge_step fwd+bwd (custom VJP pair)
- scat:         ONE pallas_segment_sum call (the sender-view scatter)
- gath:         ONE XLA row gather proj[snd] (Ep rows from Np)

Derived accounting printed at the end. Writes docs/evidence/decompose.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import build_workload, make_scanned_train_step


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, fn, *args, reps_divisor=1, rounds=3):
    """fn is already jitted+scanned; returns best per-rep ms."""
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])  # compile
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / reps_divisor)
    log(f"{name}: {best*1e3:.3f} ms")
    return best * 1e3


def scan_self(f, x0, length):
    """Scan f over itself: each rep consumes the previous output (no DCE,
    fully serialized like real steps)."""

    def body(c, _):
        return f(c), None

    return jax.jit(lambda x: jax.lax.scan(body, x, None, length=length)[0])


def main():
    K = 10  # train-step scan length
    KK = 30  # kernel-level scan length
    results = {}
    log(f"devices: {jax.devices()}")
    batch, n_edges, n_nodes = build_workload()
    log(f"workload: {n_nodes} nodes / {n_edges} edges "
        f"(padded {batch.num_nodes_padded}/{batch.num_edges_padded})")

    # --- full steps ----------------------------------------------------
    from p_div_gnn_tpu.graphs.container import NormStats
    from p_div_gnn_tpu.models import EncodeProcessDecode
    from p_div_gnn_tpu.train.loop import Trainer

    scanned, params, opt_state = make_scanned_train_step("fused", batch)
    results["train"] = timed("train", scanned, params, opt_state,
                             reps_divisor=K)

    def scanned_variant(**kw):
        model = EncodeProcessDecode(
            latent_size=128, message_passing_steps=10, scatter_impl="fused",
            **kw,
        )
        trainer = Trainer(model=model, stats=NormStats.ones(),
                          learning_rate=1e-3, divergence_penalty=10.0,
                          optimize_divergence=True)
        p0, o0 = trainer.init(jax.random.PRNGKey(0), batch)

        def body(c, _):
            p, o = c
            p, o, aux = trainer._train_step_impl(p, o, batch)
            return (p, o), aux["total"]

        f = jax.jit(lambda p, o: jax.lax.scan(body, (p, o), None, length=K))
        return f, p0, o0

    f, p0, o0 = scanned_variant(remat_steps=False)
    results["train_noremat"] = timed("train_noremat", f, p0, o0,
                                     reps_divisor=K)

    # fwd-only loss (scan over params-dependent loss; carry a scalar to
    # serialize)
    model = EncodeProcessDecode(latent_size=128, message_passing_steps=10,
                                scatter_impl="fused")
    trainer = Trainer(model=model, stats=NormStats.ones(),
                      learning_rate=1e-3, divergence_penalty=10.0,
                      optimize_divergence=True)
    p0, _ = trainer.init(jax.random.PRNGKey(0), batch)

    def loss_body(c, _):
        # params must depend on the carry or XLA hoists the whole loss out
        # of the scan as loop-invariant
        p = jax.tree.map(lambda a: a * (1.0 + c * 1e-30), p0)
        loss, aux = trainer._loss_fn(p, batch)
        return c + loss * 1e-30, None

    floss = jax.jit(
        lambda s: jax.lax.scan(loss_body, s, None, length=K)[0]
    )
    results["fwdloss"] = timed("fwdloss", floss, jnp.float32(0.0),
                               reps_divisor=K)

    # glue: mp=0 variant
    model0 = EncodeProcessDecode(latent_size=128, message_passing_steps=0,
                                 scatter_impl="fused", unroll_steps=True)
    trainer0 = Trainer(model=model0, stats=NormStats.ones(),
                       learning_rate=1e-3, divergence_penalty=10.0,
                       optimize_divergence=True)
    p0g, o0g = trainer0.init(jax.random.PRNGKey(0), batch)

    def body0(c, _):
        p, o = c
        p, o, aux = trainer0._train_step_impl(p, o, batch)
        return (p, o), aux["total"]

    f0 = jax.jit(lambda p, o: jax.lax.scan(body0, (p, o), None, length=K))
    results["glue0"] = timed("glue0", f0, p0g, o0g, reps_divisor=K)

    # --- kernel-level --------------------------------------------------
    # NB: big operands are EXPLICIT jit args — the axon remote-compile
    # endpoint rejects request bodies with large closed-over constants
    # (HTTP 413; scripts/block_sweep.py).
    from p_div_gnn_tpu.ops.fused_edge import fused_edge_step
    from p_div_gnn_tpu.ops.scatter_pallas import pallas_segment_sum

    Np = batch.num_nodes_padded
    Ep = batch.num_edges_padded
    L = 128
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)
    a_u = jax.random.normal(ks[0], (Np, L), jnp.float32)
    a_v = jax.random.normal(ks[1], (Np, L), jnp.float32)
    s0 = jax.random.normal(ks[2], (Ep, L), jnp.float32)
    w2 = jax.random.normal(ks[3], (L, L), jnp.float32) * 0.05
    b2 = jnp.zeros((L,), jnp.float32)
    G = batch.n_graphs

    b0 = jnp.zeros((L,), jnp.float32)

    def scan_ops(f, length):
        def run(x, *ops):
            def body(c, _):
                return f(c, *ops), None
            return jax.lax.scan(body, x, None, length=length)[0]
        return jax.jit(run)

    def kfwd(s, a_u, a_v, w2, b0, b2, rcv, eg, bt):
        z_upd, r, m = fused_edge_step(a_u, a_v, s, s, s, w2, b0, w2, b2,
                                      rcv, (eg, bt), G)
        return s + 1e-6 * z_upd  # live carry (0*z would be DCEd)

    f = scan_ops(kfwd, KK)
    results["kfwd"] = timed(
        "kfwd", f, s0, a_u, a_v, w2, b0, b2, batch.receivers,
        batch.edge_gid, batch.edge_block_tile, reps_divisor=KK)

    def kbwd(s, a_u, a_v, w2, b0, b2, rcv, eg, bt):
        def kloss(ss):
            z_upd, r, m = fused_edge_step(a_u, a_v, ss, ss, ss, w2, b0,
                                          w2, b2, rcv, (eg, bt), G)
            return jnp.sum(z_upd) + jnp.sum(r) + jnp.sum(m)
        return s * 0.999 + jax.grad(kloss)(s)

    f = scan_ops(kbwd, KK)
    results["kbwd"] = timed(
        "kbwd (fwd+bwd)", f, s0, a_u, a_v, w2, b0, b2, batch.receivers,
        batch.edge_gid, batch.edge_block_tile, reps_divisor=KK)

    def scat(s, rcv, bt):
        out = pallas_segment_sum(s, rcv, bt, Np)
        return s + out[rcv] * 1e-6  # keep shape, serialize

    f = scan_ops(scat, KK)
    results["scat_plus_gather"] = timed(
        "scat(+gather)", f, s0, batch.receivers, batch.edge_block_tile,
        reps_divisor=KK)

    def gath(p, snd, rcv):
        g = jnp.take(p, snd, axis=0)
        # fold back to node size to keep the carry shape
        return p * 0.999 + jax.ops.segment_sum(
            g, rcv, num_segments=Np, indices_are_sorted=True
        ) * 1e-6

    f = scan_ops(gath, KK)
    results["gather_plus_sorted_segsum"] = timed(
        "gather+sorted_segsum", f, a_u, batch.senders, batch.receivers,
        reps_divisor=KK)

    # --- accounting -----------------------------------------------------
    mp_cost = results["train"] - results["glue0"]
    log("\n--- accounting (ms/train step) ---")
    log(f"train total:        {results['train']:8.2f}")
    log(f"glue (mp=0):        {results['glue0']:8.2f}")
    log(f"10 MP fwd+bwd:      {mp_cost:8.2f}  ({mp_cost/10:.2f}/step)")
    log(f"kernel fwd x20:     {results['kfwd']*20:8.2f} (fwd+replay)")
    log(f"kernel bwdpair x10: {results['kbwd']*10:8.2f}")
    results["n_edges"] = n_edges
    results["n_nodes"] = n_nodes
    out = Path("docs/evidence/decompose.json")
    out.write_text(json.dumps(results, indent=1))
    log(f"wrote {out}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
