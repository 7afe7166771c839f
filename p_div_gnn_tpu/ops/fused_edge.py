"""Fused edge-MLP pipeline kernel (Pallas, TPU).

Computes one edge-net evaluation of the Processor in a single pass over the
edge stream:

    z = relu( relu( A[rcv] + S ) @ W2 + b2 ) · mask

where ``A`` is a hoisted node projection (tile-resident: receivers of an
edge block live in ONE 128-node tile by the block-aligned CSR layout, so
the per-edge gather A[rcv] becomes an MXU one-hot contraction against the
streamed A tile — no random access), ``S`` is the precomputed per-edge sum
(other-endpoint gather + e-projection + first-layer bias, one XLA fusion),
and ``mask`` zeroes padding edges (their graph-LN output is exactly zero in
the reference formulation, so masking here preserves semantics).

The graph-LN that follows in the reference is applied lazily: its masked
moments are one XLA reduction over z, and consumers fold the resulting
per-lane affine into their own reads (the scatter kernel for messages, one
elementwise fusion for the edge-residual update) — the (E, L) pre-LN
tensor is never re-materialized.

Backward is a custom VJP in XLA ops (gather + matmuls): under per-step
rematerialization the forward replay uses this fused kernel, so the
savings apply to the backward pass's recompute as well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK

NODE_TILE = 128
_PREC = jax.lax.Precision.HIGHEST


def _kernel(block_tile_ref, a_ref, s_ref, rcv_ref, gid_ref, w2_ref, b2_ref,
            z_ref, *, n_graphs: int):
    b = pl.program_id(0)
    tile = block_tile_ref[b]
    base = tile * NODE_TILE
    rcv_local = rcv_ref[:, :] - base  # (EB, 1)
    col_ids = jax.lax.broadcasted_iota(
        jnp.int32, (EDGE_BLOCK, NODE_TILE), 1
    )
    onehot = (col_ids == rcv_local).astype(jnp.float32)
    a_rows = jax.lax.dot_general(
        onehot, a_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PREC,
    )
    h = jnp.maximum(a_rows + s_ref[:, :], 0.0)
    y = (
        jax.lax.dot_general(
            h, w2_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PREC,
        )
        + b2_ref[0, :]
    )
    mask = (gid_ref[:, :] < n_graphs).astype(jnp.float32)
    z_ref[:, :] = jnp.maximum(y, 0.0) * mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_edge_mlp(
    a: jax.Array,  # (Np, L) tile-addressed node projection (receiver slot)
    s: jax.Array,  # (Ep, L) precomputed per-edge sum (incl. first bias)
    w2: jax.Array,  # (L, L)
    b2: jax.Array,  # (L,)
    receivers: jax.Array,  # (Ep,) i32, block-aligned CSR
    aux: tuple,  # (edge_gid (Ep,) i32, block_tile (NB,) i32)
    n_graphs: int,
) -> jax.Array:
    return _forward(a, s, w2, b2, receivers, aux, n_graphs)


def _forward(a, s, w2, b2, receivers, aux, n_graphs):
    edge_gid, block_tile = aux
    Ep, L = s.shape
    assert Ep % EDGE_BLOCK == 0
    n_blocks = Ep // EDGE_BLOCK
    rcv2d = receivers.astype(jnp.int32).reshape(Ep, 1)
    gid2d = edge_gid.astype(jnp.int32).reshape(Ep, 1)
    b2_2d = b2.reshape(1, L)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((NODE_TILE, L), lambda b, bt: (bt[b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_BLOCK, L), lambda b, bt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_BLOCK, 1), lambda b, bt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_BLOCK, 1), lambda b, bt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EDGE_BLOCK, L), lambda b, bt: (b, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, n_graphs=n_graphs)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Ep, L), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Ep * L * (NODE_TILE + L),
            bytes_accessed=Ep * L * 8 + Ep * 8 + n_blocks * NODE_TILE * L * 4,
            transcendentals=0,
        ),
    )(
        block_tile.astype(jnp.int32), a, s, rcv2d, gid2d,
        w2, b2_2d,
    )


def _bwd_kernel(block_tile_ref, a_ref, s_ref, z_ref, dz_ref, rcv_ref, w2_ref,
                dpre_ref, da_ref, dw2_ref):
    """Backward: recompute h from streamed inputs, then emit dpre (stream),
    per-tile dA accumulation (revisited output, blocks of a tile are grid-
    consecutive) and the global dW2 accumulation (single revisited block —
    the TPU grid is sequential, so read-modify-write is safe)."""
    b = pl.program_id(0)
    tile = block_tile_ref[b]
    prev = block_tile_ref[jnp.maximum(b - 1, 0)]
    tile_first = jnp.logical_or(b == 0, tile != prev)

    base = tile * NODE_TILE
    rcv_local = rcv_ref[:, :] - base
    col_ids = jax.lax.broadcasted_iota(
        jnp.int32, (EDGE_BLOCK, NODE_TILE), 1
    )
    onehot = (col_ids == rcv_local).astype(jnp.float32)
    a_rows = jax.lax.dot_general(
        onehot, a_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PREC,
    )
    h = jnp.maximum(a_rows + s_ref[:, :], 0.0)
    dy = dz_ref[:, :] * (z_ref[:, :] > 0)  # z>0 ⟺ y>0 ∧ real edge
    dh = jax.lax.dot_general(
        dy, w2_ref[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PREC,
    )
    dpre = dh * (h > 0)
    dpre_ref[:, :] = dpre

    da_contrib = jax.lax.dot_general(
        onehot, dpre,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PREC,
    )

    @pl.when(tile_first)
    def _():
        da_ref[:, :] = da_contrib

    @pl.when(jnp.logical_not(tile_first))
    def _():
        da_ref[:, :] = da_ref[:, :] + da_contrib

    dw2_contrib = jax.lax.dot_general(
        h, dy, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PREC,
    )

    @pl.when(b == 0)
    def _():
        dw2_ref[:, :] = dw2_contrib

    @pl.when(b != 0)
    def _():
        dw2_ref[:, :] = dw2_ref[:, :] + dw2_contrib


def _backward_pallas(a, s, w2, receivers, block_tile, z, dz):
    Ep, L = s.shape
    Np = a.shape[0]
    n_blocks = Ep // EDGE_BLOCK
    rcv2d = receivers.astype(jnp.int32).reshape(Ep, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
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
            pl.BlockSpec((L, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((EDGE_BLOCK, L), lambda b, bt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NODE_TILE, L), lambda b, bt: (bt[b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Ep, L), jnp.float32),
            jax.ShapeDtypeStruct((Np, L), jnp.float32),
            jax.ShapeDtypeStruct((L, L), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(block_tile.astype(jnp.int32), a, s, z, dz, rcv2d, w2)


def _fwd(a, s, w2, b2, receivers, aux, n_graphs):
    z = _forward(a, s, w2, b2, receivers, aux, n_graphs)
    return z, (a, s, w2, receivers, aux, z)


def _bwd(n_graphs, res, dz):
    a, s, w2, receivers, aux, z = res
    _, block_tile = aux
    dpre, da_raw, dw2 = _backward_pallas(
        a, s, w2, receivers, block_tile, z, dz
    )
    # Tiles that own NO edge block never write their dA rows — impossible
    # here by construction (blockify guarantees >=1 block per tile).
    db2 = jnp.sum(dz * (z > 0), axis=0)
    return da_raw, dpre, dw2, db2, None, None


fused_edge_mlp.defvjp(_fwd, _bwd)


def masked_moments(z: jax.Array, edge_mask: jax.Array) -> tuple:
    """Masked whole-tensor mean/std of a pre-zeroed tensor (padding rows of
    z are exactly 0, so Σ and Σ² need no re-masking)."""
    count = jnp.maximum(
        jnp.sum(edge_mask.astype(z.dtype)) * z.shape[-1], 1.0
    )
    total = jnp.sum(z)
    mean = total / count
    var = jnp.maximum(jnp.sum(z * z) / count - mean * mean, 0.0)
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
