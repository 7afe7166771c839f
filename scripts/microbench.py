"""Round-3 microbenchmarks: where exactly do glue0 (51 ms) and the fused
kernel's 3.4 ms go?

Parts (all scan-driven, real chip):
1. glue pieces: batch_loss fwd+bwd | NMSE-only fwd+bwd | encoders fwd |
   Adam update
2. MXU precision ladder on a standalone fused-fwd-shaped kernel
   (5 matmuls/block over the real grid): HIGHEST / HIGH / DEFAULT,
   plus matmuls-per-block scaling (1 vs 5) to split MXU passes from
   per-block pipeline overhead.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import build_workload


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, fn, *args, reps, rounds=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    log(f"{name}: {best*1e3:.3f} ms")
    return best * 1e3


def scan_self(f, x0, length):
    def body(c, _):
        return f(c), None

    return jax.jit(lambda x: jax.lax.scan(body, x, None, length=length)[0])


def main():
    results = {}
    KK = 30
    batch, n_edges, n_nodes = build_workload()
    Np, Ep, L = batch.num_nodes_padded, batch.num_edges_padded, 128
    log(f"workload: padded {Np}/{Ep}")

    # ---------------- glue pieces ----------------
    from p_div_gnn_tpu.losses import batch_loss, per_graph_nmse

    key = jax.random.PRNGKey(0)
    pred0 = jax.random.normal(key, (Np, 3), jnp.float32)
    gt = jax.random.normal(jax.random.PRNGKey(1), (Np, 3), jnp.float32)

    def loss_full(pred):
        total, aux = batch_loss(batch, pred, gt, 10.0, True)
        return total

    gfull = jax.grad(loss_full)
    f = scan_self(lambda p: p * 0.999 + gfull(p), pred0, KK)
    results["loss_fwdbwd"] = timed("loss fwd+bwd (nmse+div)", f, pred0,
                                   reps=KK)

    def loss_nmse(pred):
        return jnp.sum(per_graph_nmse(batch, pred, gt))

    gn = jax.grad(loss_nmse)
    f = scan_self(lambda p: p * 0.999 + gn(p), pred0, KK)
    results["nmse_fwdbwd"] = timed("nmse-only fwd+bwd", f, pred0, reps=KK)

    # encoders fwd (edge encoder dominates: 264k rows)
    from p_div_gnn_tpu.graphs.container import NormStats
    from p_div_gnn_tpu.models import EncodeProcessDecode

    model0 = EncodeProcessDecode(latent_size=128, message_passing_steps=0,
                                 scatter_impl="fused", unroll_steps=True)
    stats = NormStats.ones()
    p0 = model0.init(jax.random.PRNGKey(0), batch, stats)

    def enc_fwd(c):
        p = jax.tree.map(lambda a: a * (1.0 + c * 1e-30), p0)
        out = model0.apply(p, batch, stats)
        return c + jnp.sum(out) * 1e-30

    f = jax.jit(lambda s: jax.lax.scan(
        lambda c, _: (enc_fwd(c), None), s, None, length=KK)[0])
    results["enc_dec_fwd"] = timed("encoders+decoder fwd", f,
                                   jnp.float32(0.0), reps=KK)

    # Adam update alone
    import optax

    opt = optax.adam(1e-3)
    ostate0 = opt.init(p0)
    g0 = jax.tree.map(lambda a: a * 1e-3, p0)

    def adam_body(carry, _):
        p, o = carry
        upd, o = opt.update(g0, o, p)
        p = optax.apply_updates(p, upd)
        return (p, o), None

    f = jax.jit(lambda p, o: jax.lax.scan(adam_body, (p, o), None,
                                          length=KK)[0])
    results["adam"] = timed("adam update", f, p0, ostate0, reps=KK)

    # ---------------- kernel precision ladder ----------------
    from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK

    NT = 128
    n_blocks = Ep // EDGE_BLOCK
    rcv2d = batch.receivers.astype(jnp.int32).reshape(Ep, 1)
    bt = batch.edge_block_tile.astype(jnp.int32)
    a_u = jax.random.normal(jax.random.PRNGKey(2), (Np, L), jnp.float32)
    w2 = jax.random.normal(jax.random.PRNGKey(3), (L, L), jnp.float32) * 0.05
    s0 = jax.random.normal(jax.random.PRNGKey(4), (Ep, L), jnp.float32)

    def make_kernel(prec, n_mm):
        def kern(bt_ref, a_ref, s_ref, rcv_ref, w_ref, out_ref):
            col = jax.lax.broadcasted_iota(jnp.int32, (EDGE_BLOCK, NT), 1)
            base = bt_ref[pl.program_id(0)] * NT
            onehot = (col == rcv_ref[:, :] - base).astype(jnp.float32)

            def mm(x, y, dims=((1,), (0,))):
                return jax.lax.dot_general(
                    x, y, dimension_numbers=(dims, ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)

            h = mm(onehot, a_ref[:, :]) + s_ref[:, :]
            for _ in range(max(0, n_mm - 2)):
                h = mm(h, w_ref[:, :])
            out_ref[:, :] = mm(h, w_ref[:, :]) if n_mm >= 2 else h

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((NT, L), lambda b, t: (t[b], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((EDGE_BLOCK, L), lambda b, t: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((EDGE_BLOCK, 1), lambda b, t: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, L), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((EDGE_BLOCK, L), lambda b, t: (b, 0),
                                   memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Ep, L), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )
        return lambda s: call(bt, a_u, s, rcv2d, w2)

    # NB: Precision.HIGH is NOT supported by the Mosaic lowering
    # ("Unsupported dot precision: HIGH") — in-kernel choices are
    # DEFAULT (1 bf16 pass) or HIGHEST (6 passes; measured ~0.27 ms per
    # extra matmul over this grid = 197/6 TFLOP/s, exactly 6 passes).
    for prec, label in ((jax.lax.Precision.HIGHEST, "highest"),
                        (jax.lax.Precision.DEFAULT, "default")):
        for n_mm in (5, 1):
            k = make_kernel(prec, n_mm)
            f = scan_self(k, s0, KK)
            results[f"kern_{label}_{n_mm}mm"] = timed(
                f"kernel {label} x{n_mm}mm", f, s0, reps=KK)

    # hi/lo split gather: 2 DEFAULT passes reconstructing ~16 mantissa bits
    a_hi = a_u.astype(jnp.bfloat16)
    a_lo = (a_u - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def kern_hilo(bt_ref, hi_ref, lo_ref, s_ref, rcv_ref, w_ref, out_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (EDGE_BLOCK, NT), 1)
        base = bt_ref[pl.program_id(0)] * NT
        onehot = (col == rcv_ref[:, :] - base).astype(jnp.bfloat16)

        def mmd(x, y, dims=((1,), (0,))):
            return jax.lax.dot_general(
                x, y, dimension_numbers=(dims, ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        g = mmd(onehot, hi_ref[:, :]) + mmd(onehot, lo_ref[:, :])
        h = g + s_ref[:, :]
        h = jax.lax.dot_general(
            h, w_ref[:, :], dimension_numbers=((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        out_ref[:, :] = h

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((NT, L), lambda b, t: (t[b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NT, L), lambda b, t: (t[b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_BLOCK, L), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_BLOCK, 1), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EDGE_BLOCK, L), lambda b, t: (b, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kern_hilo,
        out_shape=jax.ShapeDtypeStruct((Ep, L), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    f = scan_self(lambda s: call(bt, a_hi, a_lo, s, rcv2d, w2), s0, KK)
    results["kern_hilo_gather_1hmm"] = timed("kernel hilo gather + 1 HI mm",
                                             f, s0, reps=KK)

    # index stream as (NB, 128) rows — lane-dim-128 blocks — instead of
    # (Ep, 1) columns whose (EB, 1) blocks violate the TPU lane tiling
    rcv_rows = batch.receivers.astype(jnp.int32).reshape(n_blocks, EDGE_BLOCK)

    def kern_rowidx(bt_ref, a_ref, s_ref, rcv_ref, w_ref, out_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (EDGE_BLOCK, NT), 1)
        b = pl.program_id(0)
        base = bt_ref[b] * NT
        # (8, EB) index block shared by 8 consecutive grid steps (the
        # index map is constant across them, so Pallas skips the re-fetch)
        rcv_local = rcv_ref[b % 8, :].reshape(EDGE_BLOCK, 1) - base
        onehot = (col == rcv_local).astype(jnp.float32)

        def mm(x, y, dims=((1,), (0,))):
            return jax.lax.dot_general(
                x, y, dimension_numbers=(dims, ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        h = mm(onehot, a_ref[:, :]) + s_ref[:, :]
        for _ in range(3):
            h = mm(h, w_ref[:, :])
        out_ref[:, :] = mm(h, w_ref[:, :])

    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((NT, L), lambda b, t: (t[b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_BLOCK, L), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, EDGE_BLOCK), lambda b, t: (b // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EDGE_BLOCK, L), lambda b, t: (b, 0),
                               memory_space=pltpu.VMEM),
    )
    # pad the row-index table to a multiple of 8 block rows
    nb8 = (n_blocks + 7) // 8 * 8
    rcv_rows8 = jnp.pad(rcv_rows, ((0, nb8 - n_blocks), (0, 0)))
    call = pl.pallas_call(
        kern_rowidx,
        out_shape=jax.ShapeDtypeStruct((Ep, L), jnp.float32),
        grid_spec=grid_spec2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    f = scan_self(lambda s: call(bt, a_u, s, rcv_rows8, w2), s0, KK)
    results["kern_highest_5mm_rowidx"] = timed(
        "kernel highest x5mm row-idx", f, s0, reps=KK)

    # fixed-cost scaling probe: same work in (2*EB, L) blocks (half the
    # grid steps; tile indexing deliberately approximate — timing only)
    def kern_fat(bt_ref, a_ref, s_ref, rcv_ref, w_ref, out_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (2 * EDGE_BLOCK, NT), 1)
        base = bt_ref[2 * pl.program_id(0)] * NT
        onehot = (col == rcv_ref[:, :] - base).astype(jnp.float32)

        def mm(x, y, dims=((1,), (0,))):
            return jax.lax.dot_general(
                x, y, dimension_numbers=(dims, ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        h = mm(onehot, a_ref[:, :]) + s_ref[:, :]
        for _ in range(3):
            h = mm(h, w_ref[:, :])
        out_ref[:, :] = mm(h, w_ref[:, :])

    nb2 = n_blocks // 2
    grid_spec3 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb2,),
        in_specs=[
            pl.BlockSpec((NT, L), lambda b, t: (t[2 * b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * EDGE_BLOCK, L), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * EDGE_BLOCK, 1), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * EDGE_BLOCK, L), lambda b, t: (b, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kern_fat,
        out_shape=jax.ShapeDtypeStruct((nb2 * 2 * EDGE_BLOCK, L),
                                       jnp.float32),
        grid_spec=grid_spec3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    s0f = s0[: nb2 * 2 * EDGE_BLOCK]
    f = scan_self(lambda s: call(bt, a_u, s, rcv2d[: nb2 * 2 * EDGE_BLOCK],
                                 w2)[: s.shape[0]], s0f, KK)
    results["kern_highest_5mm_fat2x"] = timed(
        "kernel highest x5mm fat(2xEB blocks)", f, s0f, reps=KK)

    out = Path("docs/evidence/microbench.json")
    out.write_text(json.dumps(results, indent=1))
    log(f"wrote {out}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
