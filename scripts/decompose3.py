"""Train-step decomposition for the round-5 fused3 (raw-x) path.

Times, on the real chip with the scan driver (best-of blocks):
- train:    full fused3 train step (production stream dtype)
- fwdloss:  forward + loss only
- glue0:    MP=0 step (encoders+decoder+loss+Adam fixed cost)
- k3fwd:    ONE fused_edge_step3 forward kernel
- k3pair:   ONE fused_edge_step3 fwd+bwd (custom VJP pair)
- gather1:  the raw sender gather x[snd] (fwd piece of the machinery)
- scat1:    permute-gather + dtype-generic scatter (bwd piece)

Writes docs/evidence/decompose3.json. Usage:
    python scripts/decompose3.py [bfloat16|float32]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# float32 mode needs the fp32-safe block; decide before the package binds
# the layout constants (bench.py/runner.py carry the same guard)
if (len(sys.argv) > 1 and sys.argv[1] == "float32"):
    os.environ.setdefault("PDG_EDGE_BLOCK", "512")

from p_div_gnn_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

KK = 20


def scan_self(f, length):
    def run(x, *ops):
        def body(c, _):
            return f(c, *ops), None

        return jax.lax.scan(body, x, None, length=length)[0]

    return jax.jit(run)


def timed(fn, *args, reps=KK, rounds=3):
    o = fn(*args)
    jax.block_until_ready(o)
    assert float(jnp.sum(jnp.abs(jnp.asarray(o, jnp.float32)))) > 0
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        o = fn(*args)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main() -> None:
    stream_dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    from bench import SCAN_STEPS, build_workload, make_scanned_train_step

    from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK, NODE_TILE
    from p_div_gnn_tpu.graphs.container import NormStats
    from p_div_gnn_tpu.models import EncodeProcessDecode
    from p_div_gnn_tpu.train.loop import Trainer

    batch, n_edges, n_nodes = build_workload()
    out = {
        "impl": "fused3", "stream_dtype": stream_dtype,
        "edge_block": EDGE_BLOCK, "node_tile": NODE_TILE,
        "n_edges": n_edges, "n_nodes": n_nodes,
    }

    def put(k, v):
        out[k] = v
        print(json.dumps(out), flush=True)
        with open("docs/evidence/decompose3.json", "w") as fh:
            json.dump(out, fh, indent=1)

    # full train step
    scanned, params, opt_state = make_scanned_train_step(
        "fused3", batch, stream_dtype=stream_dtype
    )
    o = scanned(params, opt_state)
    jax.block_until_ready(o[1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = scanned(params, opt_state)
        jax.block_until_ready(o[1])
        best = min(best, (time.perf_counter() - t0) / SCAN_STEPS)
    put("train_ms", best * 1e3)

    stats = NormStats.ones()

    # forward+loss only
    model = EncodeProcessDecode(
        latent_size=128, message_passing_steps=10, scatter_impl="fused3",
        stream_dtype=stream_dtype, remat_steps=False,
    )
    trainer = Trainer(model=model, stats=stats, learning_rate=1e-3,
                      divergence_penalty=10.0, optimize_divergence=True)
    params, opt_state = trainer.init(jax.random.PRNGKey(0), batch)

    from p_div_gnn_tpu.losses import batch_loss

    def fwdloss(p):
        pred = model.apply(p, batch, stats, scale_output=False)
        gt = batch.local_stress
        return batch_loss(batch, pred, gt, 10.0, True)[0]

    # the carry must perturb the params or XLA hoists the whole
    # loss computation out of the scan as loop-invariant (the same
    # DCE/LICM ghost block_sweep.py documents)
    def fwd_body(c, p):
        pc = jax.tree.map(lambda w: w + 1e-12 * c, p)
        return c + 1e-6 * fwdloss(pc)

    f = scan_self(fwd_body, KK)
    put("fwdloss_ms", timed(f, jnp.zeros(()), params))

    # MP=0 fixed cost
    model0 = EncodeProcessDecode(
        latent_size=128, message_passing_steps=0, scatter_impl="fused3",
        stream_dtype=stream_dtype, remat_steps=False,
    )
    trainer0 = Trainer(model=model0, stats=stats, learning_rate=1e-3,
                       divergence_penalty=10.0, optimize_divergence=True)
    p0, o0 = trainer0.init(jax.random.PRNGKey(0), batch)

    def step0(c, p, o):
        p = jax.tree.map(lambda w: w + 1e-12 * c, p)  # defeat LICM
        p, o, aux = trainer0._train_step_impl(p, o, batch)
        return c + aux["total"]

    f = scan_self(step0, KK)
    put("glue0_ms", timed(f, jnp.zeros(()), p0, o0))

    # isolated kernels + machinery
    from p_div_gnn_tpu.ops.fused_edge3 import fused_edge_step3
    from p_div_gnn_tpu.ops.gather import sender_gather_one

    Np, Ep, L = batch.num_nodes_padded, batch.num_edges_padded, 128
    sd = jnp.bfloat16 if stream_dtype == "bfloat16" else jnp.float32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (Np, L), jnp.float32).astype(sd)
    g = (jax.random.normal(key, (Ep, L), jnp.float32) * 0.1).astype(sd)
    e = g * 0.3
    w = (jax.random.normal(key, (L, L), jnp.float32) * 0.05).astype(sd)
    b = jnp.zeros((L,), sd)
    G = batch.n_graphs
    aux = (batch.edge_gid, batch.edge_block_tile)

    def k3fwd(c, x, e, w, b, rcv, eg, bt):
        z, r, m = fused_edge_step3(x, c, e, w, w * 0.5, w * 0.3, b, w, b,
                                   rcv, (eg, bt), G)
        return c + (1e-6 * z).astype(c.dtype)

    f = scan_self(k3fwd, KK)
    put("k3fwd_ms", timed(f, g, x, e, w, b, batch.receivers, aux[0],
                          aux[1]))

    def k3pair(c, x, e, w, b, rcv, eg, bt):
        def lo(gg):
            z, r, m = fused_edge_step3(x, gg, e, w, w * 0.5, w * 0.3, b, w,
                                       b, rcv, (eg, bt), G)
            return (jnp.sum(z.astype(jnp.float32)) + jnp.sum(r)
                    + jnp.sum(m))

        return c + (1e-6 * jax.grad(lo)(c).astype(jnp.float32)).astype(
            c.dtype
        )

    f = scan_self(k3pair, KK)
    put("k3pair_ms", timed(f, g, x, e, w, b, batch.receivers, aux[0],
                           aux[1]))

    def gather1(c, x, snd):
        gg = jnp.take(x, snd, axis=0)
        return c + 1e-6 * jnp.sum(gg.astype(jnp.float32) ** 2)

    f = scan_self(gather1, KK)
    put("gather1_ms", timed(f, jnp.zeros(()) + 1.0, x, batch.senders))

    def gpath(c, x, snd, sp, ss, sbt):
        def lo(xx):
            gg = sender_gather_one(xx, snd, sp, ss, sbt, Np)
            return jnp.sum(gg.astype(jnp.float32) ** 2)

        return c + (1e-6 * jax.grad(lo)(x).astype(jnp.float32)[0, 0])

    f = scan_self(gpath, KK)
    put("gather1_fwdbwd_ms", timed(
        f, jnp.zeros(()) + 1.0, x, batch.senders, batch.snd_perm,
        batch.snd_sorted, batch.snd_block_tile,
    ))


if __name__ == "__main__":
    main()
