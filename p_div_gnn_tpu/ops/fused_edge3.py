"""Fused edge-step v3 (round-5): raw-x streams, in-kernel slot projections.

The round-4 step decomposition showed the per-MP-step cost at the
512×256 production layout (bf16) splits as ~4.4 ms fused kernels vs
~12.5 ms sender gather/scatter machinery (`docs/evidence/
micro_sender.json`, block_sweep.json): the machinery moved TWO projected
(Ep, L) streams each way in fp32 regardless of the stream dtype. v3
restructures the step so the graph's irregular traffic is ONE raw
stream in the stream dtype, each way:

    forward:  g_x = x[snd]              (one XLA row gather, bf16-able)
              kernel: x_rows = onehot_rcv · x_tile   (receiver gather)
                      pre_msg = x_rows·Wu + g_x·Wv + e·We + b0
                      pre_upd = x_rows·Wv + g_x·Wu + e·We + b0
                      … two shared-weight MLP evaluations, raw message
                      scatter R, graph-LN moment partials M (exactly the
                      fused_edge_step contract)
    backward: kernel emits ONE sender cotangent stream
              dg = dpre1·Wvᵀ + dpre2·Wuᵀ (plus de, per-tile dx receiver
              accumulators, and ALL weight grads in one packed block);
              dg is scattered over senders by one permute-gather + one
              dtype-generic block-CSR scatter kernel pass.

vs the v2 ("fused") step this removes per MP step: two N×L×L XLA
projection matmuls, one of two forward gather streams, one of two
backward scatter streams — and runs the remaining gather/scatter in the
stream dtype (measured 12.5 ms → ~3.4 ms of machinery per step).

Semantics are identical to fused_edge_step (reference Processor,
`/root/reference/gnn_local_stress/models.py:182-243`): project-then-
gather equals gather-then-project exactly in fp32 mode (row selection
commutes with the per-row matmul; fp32 mode keeps HIGHEST general
matmuls and exact 3-pass one-hot contractions), and in bf16 mode the
projections round once in bf16 instead of rounding a fp32 projection —
covered by the bf16-mode tolerance tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK, NODE_TILE
from p_div_gnn_tpu.ops.fused_edge import (
    _dot_default,
    _maybe_interpret,
    _mm_f32,
    _mm_onehot,
)

# Packed weight-grad accumulator rows (extends the shared v2 order with
# the two slot-projection weights the v3 kernel also owns):
#   [dW2 (L); db2 (1); db0 (1); dWe (L); dWu (L); dWv (L); pad (6)]


def _pack_wgrads3(dw2, db2, db0, dwe, dwu, dwv):
    L = dw2.shape[1]
    zero = jnp.zeros((6, L), jnp.float32)
    return jnp.concatenate([dw2, db2, db0, dwe, dwu, dwv, zero], axis=0)


def _unpack_wgrads3(dwb, L):
    return (
        dwb[:L],                     # dW2
        dwb[L],                      # db2
        dwb[L + 1],                  # db0
        dwb[L + 2 : 2 * L + 2],      # dWe
        dwb[2 * L + 2 : 3 * L + 2],  # dWu
        dwb[3 * L + 2 : 4 * L + 2],  # dWv
    )


def _mms(dt):
    """(gather, scatter, general) contraction strategies for a stream
    dtype — fp32: exact 3-pass one-hot + 6-pass HIGHEST generals; bf16:
    single DEFAULT passes with fp32 accumulation (fused_edge.py header)."""
    if dt == jnp.float32:
        mk_onehot = lambda eq: eq.astype(jnp.bfloat16)
        mm_gather = lambda oh, a: _mm_onehot(oh, a, ((1,), (0,)))
        mm_scatter = lambda oh, z: _mm_onehot(oh, z, ((0,), (0,)))
        mm = _mm_f32
    else:
        mk_onehot = lambda eq: eq.astype(dt)
        mm_gather = lambda oh, a: _dot_default(oh, a, ((1,), (0,)))
        mm_scatter = lambda oh, z: _dot_default(oh, z.astype(dt), ((0,), (0,)))
        mm = lambda x, y, dims: _dot_default(x.astype(dt), y.astype(dt), dims)
    return mk_onehot, mm_gather, mm_scatter, mm


def _step3_kernel(block_tile_ref, x_ref, g_ref, e_ref, code_ref,
                  wb_ref, z_upd_ref, r_ref, m_ref, *, L: int):
    # Operands are PACKED to minimize per-grid-step buffer bookkeeping
    # (round-5 experiment): code = rcv | (pad_bit << 30) in one (EB, 1)
    # stream; wb = [Wu; Wv; We; W2; b0; b2; zero-pad] in one (4L+8, L)
    # block.
    dt = g_ref.dtype
    b = pl.program_id(0)
    tile = block_tile_ref[b]
    prev = block_tile_ref[jnp.maximum(b - 1, 0)]
    tile_first = jnp.logical_or(b == 0, tile != prev)

    code = code_ref[:, :]
    rcv_local = (code & ((1 << 30) - 1)) - tile * NODE_TILE
    pad = (code >> 30).astype(jnp.float32)
    mask = 1.0 - pad
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (EDGE_BLOCK, NODE_TILE), 1)
    mk_onehot, mm_gather, mm_scatter, mm = _mms(dt)
    onehot = mk_onehot(col_ids == rcv_local)

    wu = wb_ref[0:L, :]
    wv = wb_ref[L : 2 * L, :]
    we = wb_ref[2 * L : 3 * L, :]
    w2_ref = wb_ref[3 * L : 4 * L, :]

    x_rows = mm_gather(onehot, x_ref[:, :])  # (EB, L) fp32
    xu = mm(x_rows, wu, ((1,), (0,)))
    xv = mm(x_rows, wv, ((1,), (0,)))
    gu = mm(g_ref[:, :], wu, ((1,), (0,)))
    gv = mm(g_ref[:, :], wv, ((1,), (0,)))
    base = (
        mm(e_ref[:, :], we, ((1,), (0,)))
        + wb_ref[4 * L, :].astype(jnp.float32)
    )
    b2 = wb_ref[4 * L + 1, :].astype(jnp.float32)

    def tail(pre):
        h = jnp.maximum(pre, 0.0)
        y = mm(h, w2_ref, ((1,), (0,))) + b2
        return jnp.maximum(y, 0.0) * mask

    # message: edge_net([x_target, x_source, e]) → u-slot at receiver,
    # v-slot at sender; edge update: slots swapped (models.py:210-243)
    z_msg = tail(xu + gv + base)
    z_upd = tail(xv + gu + base)
    z_upd_ref[:, :] = z_upd.astype(dt)

    r_contrib = mm_scatter(onehot, z_msg)

    @pl.when(tile_first)
    def _():
        r_ref[:, :] = r_contrib

    @pl.when(jnp.logical_not(tile_first))
    def _():
        r_ref[:, :] = r_ref[:, :] + r_contrib

    zero = jnp.zeros((1, z_msg.shape[1]), jnp.float32)
    m_contrib = jnp.concatenate(
        [
            jnp.sum(z_msg, axis=0, keepdims=True),
            jnp.sum(z_msg * z_msg, axis=0, keepdims=True),
            jnp.sum(z_upd, axis=0, keepdims=True),
            jnp.sum(z_upd * z_upd, axis=0, keepdims=True),
            zero, zero, zero, zero,
        ],
        axis=0,
    )

    @pl.when(b == 0)
    def _():
        m_ref[:, :] = m_contrib

    @pl.when(b != 0)
    def _():
        m_ref[:, :] = m_ref[:, :] + m_contrib


def _step3_specs(L):
    tile = pl.BlockSpec((NODE_TILE, L), lambda b, bt: (bt[b], 0),
                        memory_space=pltpu.VMEM)
    edge = pl.BlockSpec((EDGE_BLOCK, L), lambda b, bt: (b, 0),
                        memory_space=pltpu.VMEM)
    idx = pl.BlockSpec((EDGE_BLOCK, 1), lambda b, bt: (b, 0),
                       memory_space=pltpu.VMEM)
    wmat = pl.BlockSpec((4 * L + 8, L), lambda b, bt: (0, 0),
                        memory_space=pltpu.VMEM)
    return tile, edge, idx, wmat


def _pack_operands(receivers, edge_gid, n_graphs, w_u, w_v, w_e, b0, w2,
                   b2, sd):
    """code = rcv | (pad << 30) one stream; wb = stacked weights+biases
    one (4L+8, L) block (zero rows pad to a sublane multiple)."""
    Ep = receivers.shape[0]
    L = w2.shape[0]
    pad = (edge_gid.astype(jnp.int32) >= n_graphs).astype(jnp.int32)
    # receivers are node ids < Np; the pad flag lives in bit 30, so the
    # packing is exact for any graph below 2^30 ≈ 1.07e9 nodes (static
    # check — receivers is bounded by the batch's node capacity)
    code = (receivers.astype(jnp.int32) | (pad << 30)).reshape(Ep, 1)
    wb = jnp.concatenate(
        [w_u, w_v, w_e, w2, b0.reshape(1, L), b2.reshape(1, L),
         jnp.zeros((6, L), w2.dtype)], axis=0
    ).astype(sd)
    return code, wb


def _step3_forward(x, g_x, e, w_u, w_v, w_e, b0, w2, b2, receivers, aux,
                   n_graphs):
    edge_gid, block_tile = aux
    Ep, L = g_x.shape
    Np = x.shape[0]
    assert Ep % EDGE_BLOCK == 0 and Np % NODE_TILE == 0
    n_blocks = Ep // EDGE_BLOCK
    code, wb = _pack_operands(receivers, edge_gid, n_graphs, w_u, w_v,
                              w_e, b0, w2, b2, g_x.dtype)
    tile, edge, idx, wmat = _step3_specs(L)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[tile, edge, edge, idx, wmat],
        out_specs=(
            edge,
            tile,
            pl.BlockSpec((8, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    with _maybe_interpret():
        call = pl.pallas_call(
            functools.partial(_step3_kernel, L=L),
            out_shape=(
                jax.ShapeDtypeStruct((Ep, L), g_x.dtype),  # z_upd
                jax.ShapeDtypeStruct((Np, L), jnp.float32),  # R
                jax.ShapeDtypeStruct((8, L), jnp.float32),  # M
            ),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Ep * L * (2 * NODE_TILE + 7 * L),
                bytes_accessed=Ep * L * 12 + Ep * 8
                + n_blocks * NODE_TILE * L * 8,
                transcendentals=0,
            ),
        )
        return call(block_tile.astype(jnp.int32), x, g_x, e, code, wb)


def _step3_bwd_kernel(block_tile_ref, x_ref, g_ref, e_ref, z_upd_ref,
                      dz_upd_ref, dr_ref, dm_ref, code_ref, wb_ref,
                      dg_ref, de_ref, dx_ref, dwb_ref, *, L: int):
    """One-pass backward. Recomputes both pre-activations from the raw
    streams, gathers the scatter/moment cotangents, and emits:
    - dg (edge stream, stream dtype): the ONE sender cotangent
      dpre1·Wvᵀ + dpre2·Wuᵀ — scattered over senders OUTSIDE by the
      dtype-generic block-CSR scatter (sender revisits are
      non-consecutive in receiver-major grid order);
    - de (edge stream): (dpre1+dpre2)·Weᵀ;
    - dx receiver-tile accumulators: onehotᵀ·(dpre1·Wuᵀ + dpre2·Wvᵀ)
      (receiver revisits ARE grid-consecutive);
    - the packed weight-grad accumulator (_pack_wgrads3), including the
      slot weights dWu/dWv the v3 kernel owns."""
    dt = g_ref.dtype
    b = pl.program_id(0)
    tile = block_tile_ref[b]
    prev = block_tile_ref[jnp.maximum(b - 1, 0)]
    tile_first = jnp.logical_or(b == 0, tile != prev)

    code = code_ref[:, :]
    rcv_local = (code & ((1 << 30) - 1)) - tile * NODE_TILE
    mask = 1.0 - (code >> 30).astype(jnp.float32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (EDGE_BLOCK, NODE_TILE), 1)
    mk_onehot, mm_gather, mm_scatter, mm = _mms(dt)
    onehot = mk_onehot(col_ids == rcv_local)

    wu = wb_ref[0:L, :]
    wv = wb_ref[L : 2 * L, :]
    we = wb_ref[2 * L : 3 * L, :]
    w2 = wb_ref[3 * L : 4 * L, :]

    # --- recompute the forward in-VMEM (the fwd masked z_msg, so it is
    # re-masked before the relu gate or padding edges would leak grad)
    x_rows = mm_gather(onehot, x_ref[:, :])
    xu = mm(x_rows, wu, ((1,), (0,)))
    xv = mm(x_rows, wv, ((1,), (0,)))
    gu = mm(g_ref[:, :], wu, ((1,), (0,)))
    gv = mm(g_ref[:, :], wv, ((1,), (0,)))
    base = (
        mm(e_ref[:, :], we, ((1,), (0,)))
        + wb_ref[4 * L, :].astype(jnp.float32)
    )
    b2 = wb_ref[4 * L + 1, :].astype(jnp.float32)

    h1 = jnp.maximum(xu + gv + base, 0.0)
    z_msg = jnp.maximum(mm(h1, w2, ((1,), (0,))) + b2, 0.0) * mask
    h2 = jnp.maximum(xv + gu + base, 0.0)
    z_upd = z_upd_ref[:, :].astype(jnp.float32)

    # --- message path
    g_r = mm_gather(onehot, dr_ref[:, :])
    dz_msg = g_r + dm_ref[0:1, :] + 2.0 * dm_ref[1:2, :] * z_msg
    dy1 = dz_msg * (z_msg > 0)
    dh1 = mm(dy1, w2, ((1,), (1,)))
    dpre1 = dh1 * (h1 > 0)

    # --- edge-update path (z_upd streamed from fwd)
    dz_upd = (
        dz_upd_ref[:, :].astype(jnp.float32)
        + dm_ref[2:3, :] + 2.0 * dm_ref[3:4, :] * z_upd
    )
    dy2 = dz_upd * (z_upd > 0)
    dh2 = mm(dy2, w2, ((1,), (1,)))
    dpre2 = dh2 * (h2 > 0)

    dpre_sum = dpre1 + dpre2
    dg_ref[:, :] = (
        mm(dpre1, wv, ((1,), (1,)))
        + mm(dpre2, wu, ((1,), (1,)))
    ).astype(dt)
    de_ref[:, :] = mm(dpre_sum, we, ((1,), (1,))).astype(dt)

    dx_rows = (
        mm(dpre1, wu, ((1,), (1,)))
        + mm(dpre2, wv, ((1,), (1,)))
    )
    dx = mm_scatter(onehot, dx_rows)

    @pl.when(tile_first)
    def _():
        dx_ref[:, :] = dx

    @pl.when(jnp.logical_not(tile_first))
    def _():
        dx_ref[:, :] = dx_ref[:, :] + dx

    dw2 = mm(h1, dy1, ((0,), (0,))) + mm(h2, dy2, ((0,), (0,)))
    db2 = jnp.sum(dy1 + dy2, axis=0, keepdims=True)
    db0 = jnp.sum(dpre_sum, axis=0, keepdims=True)
    dwe = mm(e_ref[:, :], dpre_sum, ((0,), (0,)))
    # x_rows in fp32 mode is an fp32 gather result; cast through the
    # stream dtype for the weight-grad contraction like the other mms
    dwu = mm(x_rows, dpre1, ((0,), (0,))) + mm(g_ref[:, :], dpre2,
                                               ((0,), (0,)))
    dwv = mm(x_rows, dpre2, ((0,), (0,))) + mm(g_ref[:, :], dpre1,
                                               ((0,), (0,)))
    dwb = _pack_wgrads3(dw2, db2, db0, dwe, dwu, dwv)

    @pl.when(b == 0)
    def _():
        dwb_ref[:, :] = dwb

    @pl.when(b != 0)
    def _():
        dwb_ref[:, :] = dwb_ref[:, :] + dwb


def _step3_backward_pallas(x, g_x, e, w_u, w_v, w_e, b0, w2, b2, receivers,
                           block_tile, edge_gid, z_upd, dz_upd, dr, dm,
                           n_graphs):
    Ep, L = g_x.shape
    Np = x.shape[0]
    n_blocks = Ep // EDGE_BLOCK
    code, wb = _pack_operands(receivers, edge_gid, n_graphs, w_u, w_v,
                              w_e, b0, w2, b2, g_x.dtype)
    tile, edge, idx, wmat = _step3_specs(L)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            tile, edge, edge, edge, edge, tile,
            pl.BlockSpec((8, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
            idx, wmat,
        ],
        out_specs=(
            edge,
            edge,
            tile,
            pl.BlockSpec((4 * L + 8, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    with _maybe_interpret():
        call = pl.pallas_call(
            functools.partial(_step3_bwd_kernel, L=L),
            out_shape=(
                jax.ShapeDtypeStruct((Ep, L), g_x.dtype),  # dg
                jax.ShapeDtypeStruct((Ep, L), g_x.dtype),  # de
                jax.ShapeDtypeStruct((Np, L), jnp.float32),  # dx (rcv side)
                jax.ShapeDtypeStruct((4 * L + 8, L), jnp.float32),
            ),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )
        return call(
            block_tile.astype(jnp.int32), x, g_x, e, z_upd, dz_upd, dr, dm,
            code, wb,
        )


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def fused_edge_step3(
    x: jax.Array,  # (Np, L) node latents (stream dtype; local rows)
    g_x: jax.Array,  # (Ep, L) sender gather of x (extended space OK)
    e: jax.Array,  # (Ep, L) RAW edge latents
    w_u: jax.Array,  # (L, L) target-slot first-layer weight
    w_v: jax.Array,  # (L, L) source-slot first-layer weight
    w_e: jax.Array,  # (L, L) edge-slot first-layer weight
    b0: jax.Array,  # (L,)
    w2: jax.Array,  # (L, L)
    b2: jax.Array,  # (L,)
    receivers: jax.Array,  # (Ep,) i32, block-aligned CSR
    aux: tuple,  # (edge_gid (Ep,), block_tile (NB,))
    n_graphs: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Raw-x fused edge step. Returns (z_upd, R, M) — the same contract
    as fused_edge_step — with BOTH slot projections and the e-projection
    formed in-kernel from raw streams. The backward emits ONE sender
    cotangent stream (w.r.t. g_x); the caller owns the sender scatter
    (ops/gather.sender_gather_one pairs with this)."""
    return _step3_forward(x, g_x, e, w_u, w_v, w_e, b0, w2, b2, receivers,
                          aux, n_graphs)


def _step3_fwd(x, g_x, e, w_u, w_v, w_e, b0, w2, b2, receivers, aux,
               n_graphs):
    out = _step3_forward(x, g_x, e, w_u, w_v, w_e, b0, w2, b2, receivers,
                         aux, n_graphs)
    return out, (x, g_x, e, w_u, w_v, w_e, b0, w2, b2, receivers, aux,
                 out[0])


def _step3_bwd(n_graphs, res, cot):
    (x, g_x, e, w_u, w_v, w_e, b0, w2, b2, receivers, aux, z_upd) = res
    dz_upd, dr, dm = cot
    edge_gid, block_tile = aux
    dg, de, dx, dwb = _step3_backward_pallas(
        x, g_x, e, w_u, w_v, w_e, b0, w2, b2, receivers, block_tile,
        edge_gid, z_upd, dz_upd, dr, dm, n_graphs,
    )
    dw2, db2, db0, dwe, dwu, dwv = _unpack_wgrads3(dwb, w2.shape[0])
    return (
        dx.astype(x.dtype),
        dg,
        de,
        dwu.astype(w_u.dtype),
        dwv.astype(w_v.dtype),
        dwe.astype(w_e.dtype),
        db0.astype(b0.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b2.dtype),
        None,
        None,
    )


fused_edge_step3.defvjp(_step3_fwd, _step3_bwd)
