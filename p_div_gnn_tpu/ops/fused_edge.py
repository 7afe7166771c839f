"""Fused edge-step Pallas kernel (TPU) — the Processor's hot path.

One kernel pass over the edge stream computes, per Processor step:

    z_msg = relu( relu( A_u[rcv] + S_msg ) @ W2 + b2 ) · mask   (messages)
    z_upd = relu( relu( A_v[rcv] + S_upd ) @ W2 + b2 ) · mask   (edge upd)
    R     = scatter_add(z_msg → receivers)       (RAW message aggregation)
    M     = per-lane [Σz_msg, Σz_msg², Σz_upd, Σz_upd²]   (graph-LN moments)

where ``A_*`` are hoisted node projections (tile-resident: receivers of an
edge block live in ONE 128-node tile by the block-aligned CSR layout, so
the per-edge gather A[rcv] — and the scatter of z_msg — become MXU one-hot
contractions against the streamed tile, no random access), and ``S_*`` are
precomputed per-edge sums (other-endpoint gather + e-projection +
first-layer bias, one XLA fusion each). ``mask`` zeroes padding edges
(their graph-LN output is exactly zero in the reference formulation, so
masking preserves semantics).

The graph-LN that follows in the reference
(`/root/reference/gnn_local_stress/models.py:199,207`) is applied lazily:
its per-lane affine (α, β) is derived from M in XLA and folded into the
consumers —

    aggr  = α1·R + β1·deg     (deg = per-node real-edge count)
    new_e = (z_upd·α2 + β2)·mask

so z_msg is NEVER materialized in HBM and the normalized (E, L) message
tensor never exists. Backward is a matching one-pass Pallas kernel
(custom VJP) that recomputes z_msg in-VMEM; under per-step
rematerialization the forward replay also uses the fused kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK, NODE_TILE

_PREC = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# In-kernel fp32 matmul strategy. Mosaic lowers Precision.HIGHEST on fp32
# operands to SIX bf16 MXU passes (measured 0.27 ms per (2065-block ×
# 128³) matmul = 197/6 TFLOP/s; Precision.HIGH is not supported at all —
# docs/evidence/microbench.json). The one-hot contraction class admits an
# exact cheaper formulation built from DEFAULT (single-pass) dots:
#
# - one-hot gather/scatter contractions: the 0/1 matrix is EXACT in bf16
#   and each output element is a plain SELECTION/SUM of input values, so
#   splitting the fp32 value operand into three bf16 terms
#   (x = b1 + b2 + b3, ~24 mantissa bits) and summing three DEFAULT passes
#   reproduces the fp32 gather/scatter to ~2^-24 — 3 passes instead of 6.
# - general matmuls (h @ W2 etc.) STAY on HIGHEST: see _mm_f32 for why the
#   3-pass bf16x3 shortcut is not accurate enough here.
#
# Numerical parity with the previous all-HIGHEST kernels is pinned by
# tests/test_fused.py (fused-vs-XLA tolerances unchanged).
# ---------------------------------------------------------------------------


def _split2(x):
    """fp32 → (hi, lo) bf16 with hi + lo capturing ~16 mantissa bits."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split3(x):
    """fp32 → 3 bf16 terms summing to x to ~2^-24 (full fp32 mantissa)."""
    b1 = x.astype(jnp.bfloat16)
    r1 = x - b1.astype(jnp.float32)
    b2 = r1.astype(jnp.bfloat16)
    b3 = (r1 - b2.astype(jnp.float32)).astype(jnp.bfloat16)
    return b1, b2, b3


def _dot_default(x, y, dims):
    return jax.lax.dot_general(
        x, y, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _mm_onehot(onehot_bf16, val_f32, dims):
    """Exact one-hot contraction in 3 DEFAULT passes (see header)."""
    b1, b2, b3 = _split3(val_f32)
    return (
        _dot_default(onehot_bf16, b1, dims)
        + _dot_default(onehot_bf16, b2, dims)
        + _dot_default(onehot_bf16, b3, dims)
    )


def _mm_f32(x_f32, y_f32, dims):
    """General fp32 matmul. Manual bf16x3 (3 passes) was measured: its
    2-way operand splits cap representation at ~2^-18, giving ~4e-5
    activation error — 50× worse than fp32 and outside the fused-vs-XLA
    test tolerances. True fp32 needs the 6-pass algorithm, which is
    exactly what Mosaic's HIGHEST lowers to — so general matmuls stay on
    HIGHEST and only the one-hot contractions use the exact 3-pass split
    (_mm_onehot)."""
    return jax.lax.dot_general(
        x_f32, y_f32, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32, precision=_PREC,
    )


# Shared packed weight-grad accumulator layout for BOTH fused backward
# kernels (advisor round-4: divergent row orders between step and step2
# were an easy future slicing mistake). Rows of the (2L+8, L) block:
#   [dW2 (L rows); db2 (1); db0 (1); dWe (L); zero padding (6)]


def _pack_wgrads(dw2, db2, db0, dwe):
    L = dw2.shape[1]
    zero = jnp.zeros((6, L), jnp.float32)
    return jnp.concatenate([dw2, db2, db0, dwe, zero], axis=0)


def _unpack_wgrads(dwb, L):
    """Returns (dW2, db2, db0, dWe) views of the packed accumulator."""
    return dwb[:L], dwb[L], dwb[L + 1], dwb[L + 2 : 2 * L + 2]


def _maybe_interpret():
    """On a genuine CPU backend (no TPU), run the kernels in TPU-interpret
    mode so the fused path stays functional everywhere (tests/dev boxes);
    production CPUs should prefer scatter_impl='xla'."""
    import contextlib

    if jax.default_backend() == "cpu":
        return pltpu.force_tpu_interpret_mode()
    return contextlib.nullcontext()


# ---------------------------------------------------------------------------
# v2: whole edge step in ONE pass over the edge stream.
#
# A single kernel computes BOTH edge-net evaluations of a Processor step
# (messages and edge update share the receiver one-hot and W2), the RAW
# message scatter R = Σ onehot·z_msg, and the per-lane graph-LN moment
# partials M — so z_msg is never materialized in HBM and neither the
# standalone scatter kernel's (E, L) re-read nor the XLA moment reductions'
# two extra (E, L) passes happen. The LN affine is applied lazily in XLA:
#   aggr  = α1·R + β1·deg          (deg = per-node real-edge count)
#   new_e = (z_upd·α2 + β2)·mask   (one elementwise pass)
# ---------------------------------------------------------------------------


def _step_kernel(block_tile_ref, a_u_ref, a_v_ref, g_v_ref, g_u_ref,
                 e_ref, rcv_ref, gid_ref, we_ref, w2_ref, b01_ref,
                 z_upd_ref, r_ref, m_ref, *, n_graphs: int):
    # dtype-generic: streams (a/g/e/w2/z_upd) may be bf16 (speed mode,
    # halved HBM traffic) or fp32 (parity mode); all MXU contractions
    # accumulate fp32 and the R/M accumulators stay fp32 either way.
    # fp32 mode uses the 3-pass split formulations (see module header)
    # instead of Mosaic's 6-pass HIGHEST.
    # The per-edge first-layer sums s_* = gather + e-proj + b0 are formed
    # IN-KERNEL from the raw streams (g_v, g_u) and the RAW edge latents
    # (the e @ We projection happens here too, round-4) — XLA never
    # materializes the two (Ep, L) s-streams nor the (Ep, L) ep stream
    # (saves ~1.1 GB/step of fusion traffic at the flagship workload).
    dt = g_v_ref.dtype
    b = pl.program_id(0)
    tile = block_tile_ref[b]
    prev = block_tile_ref[jnp.maximum(b - 1, 0)]
    tile_first = jnp.logical_or(b == 0, tile != prev)

    base = tile * NODE_TILE
    rcv_local = rcv_ref[:, :] - base
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (EDGE_BLOCK, NODE_TILE), 1)
    mask = (gid_ref[:, :] < n_graphs).astype(jnp.float32)

    if dt == jnp.float32:
        onehot = (col_ids == rcv_local).astype(jnp.bfloat16)
        mm_gather = lambda a: _mm_onehot(onehot, a, ((1,), (0,)))
        mm_scatter = lambda z: _mm_onehot(onehot, z, ((0,), (0,)))
        mm_w = lambda h, w: _mm_f32(h, w, ((1,), (0,)))
    else:
        onehot = (col_ids == rcv_local).astype(dt)
        mm_gather = lambda a: _dot_default(onehot, a, ((1,), (0,)))
        mm_scatter = lambda z: _dot_default(
            onehot, z.astype(dt), ((0,), (0,))
        )
        mm_w = lambda h, w: _dot_default(h.astype(dt), w, ((1,), (0,)))

    ep = mm_w(e_ref[:, :], we_ref[:, :])  # in-kernel e-projection
    base_e = ep + b01_ref[0, :].astype(jnp.float32)

    def edge_mlp(a_ref, g_ref):
        a_rows = mm_gather(a_ref[:, :])
        h = jnp.maximum(
            a_rows + g_ref[:, :].astype(jnp.float32) + base_e, 0.0
        )
        y = mm_w(h, w2_ref[:, :]) + b01_ref[1, :].astype(jnp.float32)
        return jnp.maximum(y, 0.0) * mask

    z_msg = edge_mlp(a_u_ref, g_v_ref)
    z_upd = edge_mlp(a_v_ref, g_u_ref)
    z_upd_ref[:, :] = z_upd.astype(dt)

    r_contrib = mm_scatter(z_msg)

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
            zero, zero, zero, zero,  # pad to the fp32 (8, 128) tile
        ],
        axis=0,
    )

    @pl.when(b == 0)
    def _():
        m_ref[:, :] = m_contrib

    @pl.when(b != 0)
    def _():
        m_ref[:, :] = m_ref[:, :] + m_contrib


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def fused_edge_step(
    a_u: jax.Array,  # (Np, L) receiver-slot projection for messages
    a_v: jax.Array,  # (Np, L) receiver-slot projection for the edge update
    g_v: jax.Array,  # (Ep, L) sender gather of proj_v (message path)
    g_u: jax.Array,  # (Ep, L) sender gather of proj_u (edge-update path)
    e: jax.Array,  # (Ep, L) RAW edge latents (projected in-kernel)
    w_e: jax.Array,  # (L, L) edge-slot first-layer weight
    b0: jax.Array,  # (L,) edge-net first-layer bias
    w2: jax.Array,  # (L, L)
    b2: jax.Array,  # (L,)
    receivers: jax.Array,  # (Ep,) i32, block-aligned CSR
    aux: tuple,  # (edge_gid (Ep,), block_tile (NB,))
    n_graphs: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (z_upd (Ep, L), R (Np, L) raw message scatter, M (8, L)
    per-lane moment partials [Σz_msg, Σz_msg², Σz_upd, Σz_upd², 0...]).
    The first-layer sums (gathers + e @ We + b0) form in-kernel — the
    shared e-projection never exists in HBM (round-4: saves the XLA
    matmul plus an (Ep, L) stream round-trip per MP step each way)."""
    return _step_forward(a_u, a_v, g_v, g_u, e, w_e, b0, w2, b2,
                         receivers, aux, n_graphs)


def _step_forward(a_u, a_v, g_v, g_u, e, w_e, b0, w2, b2, receivers, aux,
                  n_graphs):
    edge_gid, block_tile = aux
    Ep, L = g_v.shape
    Np = a_u.shape[0]
    assert Ep % EDGE_BLOCK == 0 and Np % NODE_TILE == 0
    n_blocks = Ep // EDGE_BLOCK
    rcv2d = receivers.astype(jnp.int32).reshape(Ep, 1)
    gid2d = edge_gid.astype(jnp.int32).reshape(Ep, 1)
    b01 = jnp.stack([b0, b2], axis=0)  # (2, L)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((NODE_TILE, L), lambda b, bt: (bt[b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NODE_TILE, L), lambda b, bt: (bt[b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_BLOCK, L), lambda b, bt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_BLOCK, L), lambda b, bt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_BLOCK, L), lambda b, bt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_BLOCK, 1), lambda b, bt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_BLOCK, 1), lambda b, bt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((EDGE_BLOCK, L), lambda b, bt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NODE_TILE, L), lambda b, bt: (bt[b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    with _maybe_interpret():
        call = pl.pallas_call(
            functools.partial(_step_kernel, n_graphs=n_graphs),
            out_shape=(
                jax.ShapeDtypeStruct((Ep, L), g_v.dtype),  # z_upd stream
                jax.ShapeDtypeStruct((Np, L), jnp.float32),  # R accumulator
                jax.ShapeDtypeStruct((8, L), jnp.float32),  # M partials
            ),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Ep * L * (3 * NODE_TILE + 3 * L),
                bytes_accessed=Ep * L * 16 + Ep * 8
                + n_blocks * NODE_TILE * L * 8,
                transcendentals=0,
            ),
        )
        return call(
            block_tile.astype(jnp.int32), a_u, a_v, g_v, g_u, e, rcv2d,
            gid2d, w_e, w2, b01,
        )


def _step_bwd_kernel(block_tile_ref, a_u_ref, a_v_ref, g_v_ref, g_u_ref,
                     e_ref, z_upd_ref, dz_upd_ref, dr_ref, dm_ref,
                     rcv_ref, gid_ref, we_ref, w2_ref, b01_ref,
                     dg_v_ref, dg_u_ref, de_ref, da_u_ref, da_v_ref,
                     dwb_ref, *, n_graphs: int):
    """One-pass backward: recomputes z_msg/h from the streamed inputs
    (incl. the in-kernel e-projection), gathers the scatter cotangent
    dR[rcv] as the transposed one-hot contraction, adds the moment-partial
    cotangents, and back-propagates through both edge MLPs. Emits the
    raw-stream cotangents directly (dg_v = dpre1, dg_u = dpre2,
    de = (dpre1 + dpre2) @ We^T). Per-tile dA accumulators are revisited
    blocks (grid-consecutive by the block-aligned CSR layout);
    dW2/db2/db0/dWe accumulate in one revisited (2L+8, L) block — the TPU
    grid is sequential so read-modify-write is safe."""
    dt = g_v_ref.dtype
    b = pl.program_id(0)
    tile = block_tile_ref[b]
    prev = block_tile_ref[jnp.maximum(b - 1, 0)]
    tile_first = jnp.logical_or(b == 0, tile != prev)

    base = tile * NODE_TILE
    rcv_local = rcv_ref[:, :] - base
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (EDGE_BLOCK, NODE_TILE), 1)
    mask = (gid_ref[:, :] < n_graphs).astype(jnp.float32)

    # fp32 mode: 3-pass split formulations (module header); bf16 mode:
    # single DEFAULT pass in the stream dtype. fp32 accumulation either way.
    if dt == jnp.float32:
        onehot = (col_ids == rcv_local).astype(jnp.bfloat16)
        mm_gather = lambda a: _mm_onehot(onehot, a, ((1,), (0,)))
        mm_scatter = lambda z: _mm_onehot(onehot, z, ((0,), (0,)))
        mm = _mm_f32
    else:
        onehot = (col_ids == rcv_local).astype(dt)
        mm_gather = lambda a: _dot_default(onehot, a, ((1,), (0,)))
        mm_scatter = lambda z: _dot_default(onehot, z.astype(dt),
                                            ((0,), (0,)))
        mm = lambda x, y, dims: _dot_default(
            x.astype(dt), y.astype(dt), dims
        )

    ep = mm(e_ref[:, :], we_ref[:, :], ((1,), (0,)))
    base_e = ep + b01_ref[0, :].astype(jnp.float32)
    b2 = b01_ref[1, :].astype(jnp.float32)

    # --- message path (z_msg recomputed; it was never written in fwd; the
    # fwd masked z_msg, so the recomputed value must be re-masked before the
    # relu gate or padding edges would leak gradient) ---
    a_u_rows = mm_gather(a_u_ref[:, :])
    h1 = jnp.maximum(
        a_u_rows + g_v_ref[:, :].astype(jnp.float32) + base_e, 0.0
    )
    y1 = mm(h1, w2_ref[:, :], ((1,), (0,))) + b2
    z_msg = jnp.maximum(y1, 0.0) * mask

    g_r = mm_gather(dr_ref[:, :])  # dR gathered at receivers
    dz_msg = g_r + dm_ref[0:1, :] + 2.0 * dm_ref[1:2, :] * z_msg
    dy1 = dz_msg * (z_msg > 0)
    dh1 = mm(dy1, w2_ref[:, :], ((1,), (1,)))
    dpre1 = dh1 * (h1 > 0)

    # --- edge-update path (z_upd streamed from fwd) ---
    a_v_rows = mm_gather(a_v_ref[:, :])
    h2 = jnp.maximum(
        a_v_rows + g_u_ref[:, :].astype(jnp.float32) + base_e, 0.0
    )
    z_upd = z_upd_ref[:, :].astype(jnp.float32)
    dz_upd = (
        dz_upd_ref[:, :].astype(jnp.float32)
        + dm_ref[2:3, :] + 2.0 * dm_ref[3:4, :] * z_upd
    )
    dy2 = dz_upd * (z_upd > 0)
    dh2 = mm(dy2, w2_ref[:, :], ((1,), (1,)))
    dpre2 = dh2 * (h2 > 0)

    dpre_sum = dpre1 + dpre2
    dg_v_ref[:, :] = dpre1.astype(dt)
    dg_u_ref[:, :] = dpre2.astype(dt)
    de_ref[:, :] = mm(dpre_sum, we_ref[:, :], ((1,), (1,))).astype(dt)

    da_u = mm_scatter(dpre1)
    da_v = mm_scatter(dpre2)

    @pl.when(tile_first)
    def _():
        da_u_ref[:, :] = da_u
        da_v_ref[:, :] = da_v

    @pl.when(jnp.logical_not(tile_first))
    def _():
        da_u_ref[:, :] = da_u_ref[:, :] + da_u
        da_v_ref[:, :] = da_v_ref[:, :] + da_v

    L = h1.shape[1]
    dw2 = mm(h1, dy1, ((0,), (0,))) + mm(h2, dy2, ((0,), (0,)))
    db2 = jnp.sum(dy1 + dy2, axis=0, keepdims=True)
    db0 = jnp.sum(dpre_sum, axis=0, keepdims=True)
    dwe = mm(e_ref[:, :], dpre_sum, ((0,), (0,)))
    dwb = _pack_wgrads(dw2, db2, db0, dwe)

    @pl.when(b == 0)
    def _():
        dwb_ref[:, :] = dwb

    @pl.when(b != 0)
    def _():
        dwb_ref[:, :] = dwb_ref[:, :] + dwb


def _step_backward_pallas(a_u, a_v, g_v, g_u, e, w_e, b0, w2, b2,
                          receivers, block_tile, edge_gid, z_upd, dz_upd,
                          dr, dm, n_graphs):
    Ep, L = g_v.shape
    Np = a_u.shape[0]
    n_blocks = Ep // EDGE_BLOCK
    rcv2d = receivers.astype(jnp.int32).reshape(Ep, 1)
    gid2d = edge_gid.astype(jnp.int32).reshape(Ep, 1)
    b01 = jnp.stack([b0, b2], axis=0)
    edge_spec = pl.BlockSpec((EDGE_BLOCK, L), lambda b, bt: (b, 0),
                             memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((NODE_TILE, L), lambda b, bt: (bt[b], 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            tile_spec, tile_spec, edge_spec, edge_spec, edge_spec,
            edge_spec, edge_spec,
            tile_spec,
            pl.BlockSpec((8, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_BLOCK, 1), lambda b, bt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_BLOCK, 1), lambda b, bt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            edge_spec,
            edge_spec,
            edge_spec,
            tile_spec,
            tile_spec,
            pl.BlockSpec((2 * L + 8, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    with _maybe_interpret():
        call = pl.pallas_call(
            functools.partial(_step_bwd_kernel, n_graphs=n_graphs),
            out_shape=(
                # stream cotangents in the stream dtype; the dA/dW2/db/dWe
                # ACCUMULATORS stay fp32 (revisited-block accumulation) and
                # are cast to the input dtypes in _step_bwd
                jax.ShapeDtypeStruct((Ep, L), g_v.dtype),  # dg_v
                jax.ShapeDtypeStruct((Ep, L), g_v.dtype),  # dg_u
                jax.ShapeDtypeStruct((Ep, L), g_v.dtype),  # de
                jax.ShapeDtypeStruct((Np, L), jnp.float32),
                jax.ShapeDtypeStruct((Np, L), jnp.float32),
                jax.ShapeDtypeStruct((2 * L + 8, L), jnp.float32),
            ),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )
        return call(
            block_tile.astype(jnp.int32), a_u, a_v, g_v, g_u, e, z_upd,
            dz_upd, dr, dm, rcv2d, gid2d, w_e, w2, b01,
        )


def _step_fwd(a_u, a_v, g_v, g_u, e, w_e, b0, w2, b2, receivers, aux,
              n_graphs):
    out = _step_forward(a_u, a_v, g_v, g_u, e, w_e, b0, w2, b2, receivers,
                        aux, n_graphs)
    z_upd, r, m = out
    return out, (a_u, a_v, g_v, g_u, e, w_e, b0, w2, b2, receivers, aux,
                 z_upd)


def _step_bwd(n_graphs, res, cot):
    (a_u, a_v, g_v, g_u, e, w_e, b0, w2, b2, receivers, aux,
     z_upd) = res
    dz_upd, dr, dm = cot
    edge_gid, block_tile = aux
    dg_v, dg_u, de, da_u, da_v, dwb = _step_backward_pallas(
        a_u, a_v, g_v, g_u, e, w_e, b0, w2, b2, receivers, block_tile,
        edge_gid, z_upd, dz_upd, dr, dm, n_graphs,
    )
    dw2, db2, db0, dwe = _unpack_wgrads(dwb, w2.shape[0])
    return (
        da_u.astype(a_u.dtype),
        da_v.astype(a_v.dtype),
        dg_v,
        dg_u,
        de,
        dwe.astype(w_e.dtype),
        db0.astype(b0.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b2.dtype),
        None,
        None,
    )


fused_edge_step.defvjp(_step_fwd, _step_bwd)


def moments_from_partials(
    m_sum: jax.Array,
    m_sumsq: jax.Array,
    edge_mask: jax.Array,
    axis_name: str | None = None,
) -> tuple:
    """Whole-tensor mean/std from per-lane partial sums of the pre-masked
    z (padding rows contribute exactly 0). Under sharding the graph-mode LN
    statistics span the WHOLE batch (the reference normalizes over the full
    edge tensor jointly), so the scalar partials are psum'd over
    ``axis_name``."""
    L = m_sum.shape[-1]
    count = jnp.sum(edge_mask.astype(m_sum.dtype)) * L
    total = jnp.sum(m_sum)
    total_sq = jnp.sum(m_sumsq)
    if axis_name is not None:
        count, total, total_sq = jax.lax.psum(
            (count, total, total_sq), axis_name
        )
    count = jnp.maximum(count, 1.0)
    mean = total / count
    # One-pass variance E[z²] − mean² can CANCEL to ≤0 in fp32 even for
    # non-constant z (the two-pass torch form cannot), and d(sqrt)/dvar is
    # infinite at 0 — i.e. a finite forward with nonfinite gradients. The
    # 1e-12 floor is far below any healthy variance (bitwise no-op there)
    # and bounds the backward at the cancellation edge.
    var = jnp.maximum(total_sq / count - mean * mean, 1e-12)
    return mean, jnp.sqrt(var)


def lazy_layernorm_affine(
    mean: jax.Array, std: jax.Array, weight: jax.Array, bias: jax.Array,
    eps: float = 1e-5,
) -> tuple[jax.Array, jax.Array]:
    """Fold graph-LN into per-lane (alpha, beta): LN(z) = z·alpha + beta
    for real rows."""
    alpha = weight / (std + eps)
    beta = bias - mean * alpha
    return alpha, beta


# ---------------------------------------------------------------------------
# v3 (fused2): pair-blocked FULL fusion. With the (receiver_tile,
# sender_tile) layout (graphs/batching.blockify_edges_pair) BOTH endpoint
# gathers are in-VMEM one-hot contractions and the e-projection runs inside
# the kernel, so the per-edge s_msg/s_upd HBM streams (and their XLA prep
# fusions) disappear entirely: the forward touches each edge stream once
# (read e, write z_upd). Cost: ~1.35x more edge slots (pair padding) and
# two extra one-hot MXU passes — a win whenever the step is stream- or
# fusion-launch-bound.
# ---------------------------------------------------------------------------


def _step2_kernel(meta_ref, u_r_ref, v_r_ref, u_s_ref, v_s_ref, e_ref,
                  rcv_ref, snd_ref, gid_ref, we_ref, b0_ref, w2_ref, b2_ref,
                  z_upd_ref, r_ref, m_ref, *, n_graphs: int):
    dt = e_ref.dtype
    prec = _PREC if dt == jnp.float32 else jax.lax.Precision.DEFAULT
    b = pl.program_id(0)
    tile = meta_ref[0, b]
    prev = meta_ref[0, jnp.maximum(b - 1, 0)]
    tile_first = jnp.logical_or(b == 0, tile != prev)
    s_base = meta_ref[1, b] * NODE_TILE

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (EDGE_BLOCK, NODE_TILE), 1)
    onehot_r = (col_ids == rcv_ref[:, :] - tile * NODE_TILE).astype(dt)
    onehot_s = (col_ids == snd_ref[:, :] - s_base).astype(dt)
    mask = (gid_ref[:, :] < n_graphs).astype(jnp.float32)

    def mm(x, y, dims=((1,), (0,))):
        return jax.lax.dot_general(
            x.astype(dt), y.astype(dt), dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    ep = mm(e_ref[:, :], we_ref[:, :])  # in-kernel e-projection
    b0 = b0_ref[0, :].astype(jnp.float32)
    b2 = b2_ref[0, :].astype(jnp.float32)

    def edge_mlp(a_ref, p_ref):
        # pre = proj_a[rcv] + proj_p[snd] + e@We + b0
        pre = mm(onehot_r, a_ref[:, :]) + mm(onehot_s, p_ref[:, :]) + ep + b0
        h = jnp.maximum(pre, 0.0)
        y = mm(h, w2_ref[:, :]) + b2
        return jnp.maximum(y, 0.0) * mask

    z_msg = edge_mlp(u_r_ref, v_s_ref)  # messages: u@rcv + v@snd
    z_upd = edge_mlp(v_r_ref, u_s_ref)  # edge upd: v@rcv + u@snd

    # NB: edge_mlp(u_r, v_s) uses u at the RECEIVER tile and v at the
    # SENDER tile; the four tile refs are (u@rt, v@rt, u@st, v@st).
    z_upd_ref[:, :] = z_upd.astype(dt)

    r_contrib = jax.lax.dot_general(
        onehot_r, z_msg.astype(dt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )

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


def _step2_specs(L, n_blocks):
    tile_r = pl.BlockSpec((NODE_TILE, L), lambda b, mt: (mt[0, b], 0),
                          memory_space=pltpu.VMEM)
    tile_s = pl.BlockSpec((NODE_TILE, L), lambda b, mt: (mt[1, b], 0),
                          memory_space=pltpu.VMEM)
    edge = pl.BlockSpec((EDGE_BLOCK, L), lambda b, mt: (b, 0),
                        memory_space=pltpu.VMEM)
    idx = pl.BlockSpec((EDGE_BLOCK, 1), lambda b, mt: (b, 0),
                       memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((L, L), lambda b, mt: (0, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, L), lambda b, mt: (0, 0), memory_space=pltpu.VMEM)
    return tile_r, tile_s, edge, idx, mat, vec


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def fused_edge_step2(
    proj_u: jax.Array,  # (Np, L)
    proj_v: jax.Array,  # (Np, L)
    e: jax.Array,  # (Ep, L) edge latents (pair-blocked order)
    w_e: jax.Array,  # (L, L)
    b0: jax.Array,  # (L,)
    w2: jax.Array,  # (L, L)
    b2: jax.Array,  # (L,)
    receivers: jax.Array,  # (Ep,) i32
    senders: jax.Array,  # (Ep,) i32
    aux: tuple,  # (edge_gid, block_tile_rcv, block_tile_snd,
    #               snd_perm, snd_sorted, snd_block_tile)
    # n_graphs via nondiff
    n_graphs: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Pair-blocked fully-fused edge step. Returns (z_upd, R, M) like
    fused_edge_step; the e-projection + first bias live inside."""
    return _step2_forward(proj_u, proj_v, e, w_e, b0, w2, b2, receivers,
                          senders, aux, n_graphs)


def _step2_forward(proj_u, proj_v, e, w_e, b0, w2, b2, receivers, senders,
                   aux, n_graphs):
    edge_gid, bt_rcv, bt_snd = aux[0], aux[1], aux[2]
    Ep, L = e.shape
    Np = proj_u.shape[0]
    assert Ep % EDGE_BLOCK == 0 and Np % NODE_TILE == 0
    n_blocks = Ep // EDGE_BLOCK
    meta = jnp.stack(
        [bt_rcv.astype(jnp.int32), bt_snd.astype(jnp.int32)], axis=0
    )
    rcv2d = receivers.astype(jnp.int32).reshape(Ep, 1)
    snd2d = senders.astype(jnp.int32).reshape(Ep, 1)
    gid2d = edge_gid.astype(jnp.int32).reshape(Ep, 1)
    tile_r, tile_s, edge, idx, mat, vec = _step2_specs(L, n_blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[tile_r, tile_r, tile_s, tile_s, edge, idx, idx, idx,
                  mat, vec, mat, vec],
        out_specs=(
            edge,
            pl.BlockSpec((NODE_TILE, L), lambda b, mt: (mt[0, b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, L), lambda b, mt: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    with _maybe_interpret():
        call = pl.pallas_call(
            functools.partial(_step2_kernel, n_graphs=n_graphs),
            out_shape=(
                jax.ShapeDtypeStruct((Ep, L), e.dtype),
                jax.ShapeDtypeStruct((Np, L), jnp.float32),
                jax.ShapeDtypeStruct((8, L), jnp.float32),
            ),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Ep * L * (5 * NODE_TILE + 3 * L),
                bytes_accessed=Ep * L * 8 + Ep * 12
                + n_blocks * NODE_TILE * L * 16,
                transcendentals=0,
            ),
        )
        return call(
            meta, proj_u, proj_v, proj_u, proj_v, e, rcv2d, snd2d, gid2d,
            w_e, b0.reshape(1, L), w2, b2.reshape(1, L),
        )


def _step2_bwd_kernel(meta_ref, u_r_ref, v_r_ref, u_s_ref, v_s_ref, e_ref,
                      z_upd_ref, dz_upd_ref, dr_ref, dm_ref, rcv_ref,
                      snd_ref, gid_ref, we_ref, b0_ref, w2_ref, b2_ref,
                      de_ref, dpre1_ref, dpre2_ref, du_r_ref, dv_r_ref,
                      dwb_ref, *, n_graphs: int):
    """Backward: recomputes both pre-activations from the streamed inputs,
    gathers the scatter/moment cotangents, and emits:
    - de (edge stream): (dpre1+dpre2) @ We^T
    - dpre1/dpre2 streams (scattered over SENDERS outside, via the
      sender-view MXU scatter — sender-tile revisits are non-consecutive
      in rcv-major grid order, so they can't accumulate in-kernel)
    - du_rcv/dv_rcv tile accumulators (rcv revisits ARE consecutive)
    - the shared packed weight-grad accumulator (_pack_wgrads)."""
    dt = e_ref.dtype
    prec = _PREC if dt == jnp.float32 else jax.lax.Precision.DEFAULT
    b = pl.program_id(0)
    tile = meta_ref[0, b]
    prev = meta_ref[0, jnp.maximum(b - 1, 0)]
    tile_first = jnp.logical_or(b == 0, tile != prev)
    s_base = meta_ref[1, b] * NODE_TILE

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (EDGE_BLOCK, NODE_TILE), 1)
    onehot_r = (col_ids == rcv_ref[:, :] - tile * NODE_TILE).astype(dt)
    onehot_s = (col_ids == snd_ref[:, :] - s_base).astype(dt)
    mask = (gid_ref[:, :] < n_graphs).astype(jnp.float32)

    def mm(x, y, dims=((1,), (0,))):
        return jax.lax.dot_general(
            x.astype(dt), y.astype(dt), dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    ep = mm(e_ref[:, :], we_ref[:, :])
    b0 = b0_ref[0, :].astype(jnp.float32)
    b2 = b2_ref[0, :].astype(jnp.float32)

    # message path recompute
    h1 = jnp.maximum(
        mm(onehot_r, u_r_ref[:, :]) + mm(onehot_s, v_s_ref[:, :]) + ep + b0,
        0.0,
    )
    z_msg = jnp.maximum(mm(h1, w2_ref[:, :]) + b2, 0.0) * mask
    g_r = mm(onehot_r, dr_ref[:, :])
    dz_msg = g_r + dm_ref[0:1, :] + 2.0 * dm_ref[1:2, :] * z_msg
    dy1 = dz_msg * (z_msg > 0)
    dh1 = mm(dy1, w2_ref[:, :], ((1,), (1,)))
    dpre1 = dh1 * (h1 > 0)

    # edge-update path (z_upd streamed)
    h2 = jnp.maximum(
        mm(onehot_r, v_r_ref[:, :]) + mm(onehot_s, u_s_ref[:, :]) + ep + b0,
        0.0,
    )
    z_upd = z_upd_ref[:, :].astype(jnp.float32)
    dz_upd = (
        dz_upd_ref[:, :].astype(jnp.float32)
        + dm_ref[2:3, :] + 2.0 * dm_ref[3:4, :] * z_upd
    )
    dy2 = dz_upd * (z_upd > 0)
    dh2 = mm(dy2, w2_ref[:, :], ((1,), (1,)))
    dpre2 = dh2 * (h2 > 0)

    dpre_sum = dpre1 + dpre2
    de_ref[:, :] = mm(dpre_sum, we_ref[:, :], ((1,), (1,))).astype(dt)
    dpre1_ref[:, :] = dpre1.astype(dt)
    dpre2_ref[:, :] = dpre2.astype(dt)

    du_r = mm(onehot_r, dpre1, ((0,), (0,)))  # d proj_u at receiver rows
    dv_r = mm(onehot_r, dpre2, ((0,), (0,)))  # d proj_v at receiver rows

    @pl.when(tile_first)
    def _():
        du_r_ref[:, :] = du_r
        dv_r_ref[:, :] = dv_r

    @pl.when(jnp.logical_not(tile_first))
    def _():
        du_r_ref[:, :] = du_r_ref[:, :] + du_r
        dv_r_ref[:, :] = dv_r_ref[:, :] + dv_r

    L = h1.shape[1]
    dw2 = mm(h1, dy1, ((0,), (0,))) + mm(h2, dy2, ((0,), (0,)))
    db2 = jnp.sum(dy1 + dy2, axis=0, keepdims=True)
    dwe = mm(e_ref[:, :], dpre_sum, ((0,), (0,)))
    db0 = jnp.sum(dpre_sum, axis=0, keepdims=True)
    dwb = _pack_wgrads(dw2, db2, db0, dwe)

    @pl.when(b == 0)
    def _():
        dwb_ref[:, :] = dwb

    @pl.when(b != 0)
    def _():
        dwb_ref[:, :] = dwb_ref[:, :] + dwb


def _step2_fwd(proj_u, proj_v, e, w_e, b0, w2, b2, receivers, senders, aux,
               n_graphs):
    out = _step2_forward(proj_u, proj_v, e, w_e, b0, w2, b2, receivers,
                         senders, aux, n_graphs)
    z_upd, r, m = out
    return out, (proj_u, proj_v, e, w_e, b0, w2, b2, receivers, senders,
                 aux, z_upd)


def _step2_bwd(n_graphs, res, cot):
    (proj_u, proj_v, e, w_e, b0, w2, b2, receivers, senders, aux,
     z_upd) = res
    dz_upd, dr, dm = cot
    edge_gid, bt_rcv, bt_snd = aux[0], aux[1], aux[2]
    snd_perm, snd_sorted, snd_block_tile = aux[3], aux[4], aux[5]
    Ep, L = e.shape
    Np = proj_u.shape[0]
    n_blocks = Ep // EDGE_BLOCK
    meta = jnp.stack(
        [bt_rcv.astype(jnp.int32), bt_snd.astype(jnp.int32)], axis=0
    )
    rcv2d = receivers.astype(jnp.int32).reshape(Ep, 1)
    snd2d = senders.astype(jnp.int32).reshape(Ep, 1)
    gid2d = edge_gid.astype(jnp.int32).reshape(Ep, 1)
    tile_r, tile_s, edge, idx, mat, vec = _step2_specs(L, n_blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[tile_r, tile_r, tile_s, tile_s, edge, edge, edge,
                  tile_r,
                  pl.BlockSpec((8, L), lambda b, mt: (0, 0),
                               memory_space=pltpu.VMEM),
                  idx, idx, idx, mat, vec, mat, vec],
        out_specs=(
            edge, edge, edge,
            tile_r,
            pl.BlockSpec((NODE_TILE, L), lambda b, mt: (mt[0, b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * L + 8, L), lambda b, mt: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    with _maybe_interpret():
        call = pl.pallas_call(
            functools.partial(_step2_bwd_kernel, n_graphs=n_graphs),
            out_shape=(
                jax.ShapeDtypeStruct((Ep, L), e.dtype),  # de
                jax.ShapeDtypeStruct((Ep, L), e.dtype),  # dpre1
                jax.ShapeDtypeStruct((Ep, L), e.dtype),  # dpre2
                jax.ShapeDtypeStruct((Np, L), jnp.float32),  # du_rcv
                jax.ShapeDtypeStruct((Np, L), jnp.float32),  # dv_rcv
                jax.ShapeDtypeStruct((2 * L + 8, L), jnp.float32),
            ),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )
        de, dpre1, dpre2, du_rcv, dv_rcv, dwb = call(
            meta, proj_u, proj_v, proj_u, proj_v, e, z_upd, dz_upd, dr,
            dm, rcv2d, snd2d, gid2d, w_e, b0.reshape(1, L), w2,
            b2.reshape(1, L),
        )
    # sender-side scatters: pre-permuted MXU scatter (fast) or XLA fallback
    if snd_perm is not None:
        from p_div_gnn_tpu.ops.scatter_pallas import pallas_segment_sum

        def snd_scatter(stream):
            s = stream.astype(jnp.float32).at[snd_perm].get(
                mode="promise_in_bounds"
            )
            return pallas_segment_sum(s, snd_sorted, snd_block_tile, Np)
    else:
        from p_div_gnn_tpu.ops.segment import segment_sum

        def snd_scatter(stream):
            return segment_sum(stream.astype(jnp.float32), senders, Np,
                               indices_are_sorted=False)

    du = du_rcv + snd_scatter(dpre2)  # u appears at snd in the UPDATE path
    dv = dv_rcv + snd_scatter(dpre1)  # v appears at snd in the MESSAGE path
    dw2, db2, db0, dwe = _unpack_wgrads(dwb, L)
    return (
        du.astype(proj_u.dtype),
        dv.astype(proj_v.dtype),
        de,
        dwe.astype(w_e.dtype),
        db0.astype(b0.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b2.dtype),
        None,
        None,
        None,
    )


fused_edge_step2.defvjp(_step2_fwd, _step2_bwd)
