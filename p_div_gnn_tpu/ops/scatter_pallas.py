"""Pallas TPU kernel: block-aligned CSR segment-sum (edge→node scatter-add)
via MXU one-hot contraction.

The hot aggregation op of the model (reference counterpart: PyG's CUDA
scatter-add, `models.py:191,215-217`).

Contract (produced by graphs/batching.blockify_edges):
- ``messages`` (Ep, L) sorted by receiver, with every 128-node tile's edge
  run padded to a multiple of EDGE_BLOCK (padding messages are exactly zero
  downstream of the masked edge-LN, so they are no-ops);
- ``block_tile`` (Ep / EDGE_BLOCK,) — the node tile each block feeds.

Design (TPU-first):
- 1-D grid over edge blocks; the scalar-prefetched ``block_tile`` drives the
  OUTPUT BlockSpec index map, so consecutive blocks of the same node tile
  revisit one VMEM output buffer (zeroed on first visit, accumulated after);
  the Pallas pipeline double-buffers the streamed message/receiver blocks
  automatically;
- the scatter itself is an MXU contraction: a (EB, 128) one-hot of local
  receiver ids (VPU iota-compare) contracted against the (EB, L) message
  block in fp32 — scatter-as-matmul keeps the reduction on the systolic
  array instead of scalar stores.

Backward: d(messages) = cotangent gathered at receivers (transpose of
scatter is gather), via XLA's native gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK  # single source of truth

NODE_TILE = 128


def _kernel(block_tile_ref, msg_ref, rcv_ref, out_ref):
    b = pl.program_id(0)
    tile = block_tile_ref[b]
    prev = block_tile_ref[jnp.maximum(b - 1, 0)]
    is_first = jnp.logical_or(b == 0, tile != prev)

    base = tile * NODE_TILE
    rcv_local = rcv_ref[:, :] - base  # (EB, 1)
    col_ids = jax.lax.broadcasted_iota(
        jnp.int32, (EDGE_BLOCK, NODE_TILE), 1
    )
    onehot = (col_ids == rcv_local).astype(jnp.float32)
    # HIGHEST precision: the one-hot is exact in bf16, but the messages
    # must not be rounded — default MXU precision loses ~1e-3 per element.
    contrib = jax.lax.dot_general(
        onehot,
        msg_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(is_first)
    def _():
        out_ref[:, :] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:, :] = out_ref[:, :] + contrib


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_segment_sum(
    messages: jax.Array,
    receivers: jax.Array,
    block_tile: jax.Array,
    num_nodes: int,
) -> jax.Array:
    """Scatter-add ``messages`` into ``num_nodes`` rows by ``receivers``."""
    return _forward(messages, receivers, block_tile, num_nodes)


def _forward(messages, receivers, block_tile, num_nodes):
    Ep, L = messages.shape
    assert num_nodes % NODE_TILE == 0, "num_nodes must be a tile multiple"
    assert Ep % EDGE_BLOCK == 0, "edge capacity must be EDGE_BLOCK-aligned"
    n_blocks = Ep // EDGE_BLOCK
    # (EB, 1) receiver blocks: sublane dim EB is 8-aligned and the lane dim
    # equals the full array dim, satisfying the TPU BlockSpec tiling rules.
    rcv2d = receivers.astype(jnp.int32).reshape(Ep, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (EDGE_BLOCK, L), lambda b, bt: (b, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (EDGE_BLOCK, 1), lambda b, bt: (b, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (NODE_TILE, L), lambda b, bt: (bt[b], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((num_nodes, L), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Ep * NODE_TILE * L,
            bytes_accessed=Ep * L * 4 + Ep * 4 + num_nodes * L * 4,
            transcendentals=0,
        ),
    )(block_tile.astype(jnp.int32), messages.astype(jnp.float32), rcv2d)


def _fwd(messages, receivers, block_tile, num_nodes):
    out = _forward(messages, receivers, block_tile, num_nodes)
    return out, receivers


def _bwd(num_nodes, receivers, g):
    # transpose of scatter-add is gather
    return jnp.take(g, receivers, axis=0), None, None


pallas_segment_sum.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Affine scatter: out = scatter_add((z·alpha + beta)·mask) — folds the lazy
# graph-LN affine (ops/fused_edge.lazy_layernorm_affine) into the message
# scatter so the normalized (E, L) message tensor is never materialized.
# ---------------------------------------------------------------------------


def _affine_kernel(block_tile_ref, z_ref, rcv_ref, gid_ref, ab_ref, out_ref,
                   *, n_graphs: int):
    b = pl.program_id(0)
    tile = block_tile_ref[b]
    prev = block_tile_ref[jnp.maximum(b - 1, 0)]
    is_first = jnp.logical_or(b == 0, tile != prev)

    base = tile * NODE_TILE
    rcv_local = rcv_ref[:, :] - base
    col_ids = jax.lax.broadcasted_iota(
        jnp.int32, (EDGE_BLOCK, NODE_TILE), 1
    )
    onehot = (col_ids == rcv_local).astype(jnp.float32)
    mask = (gid_ref[:, :] < n_graphs).astype(jnp.float32)
    w = (z_ref[:, :] * ab_ref[0, :] + ab_ref[1, :]) * mask
    contrib = jax.lax.dot_general(
        onehot, w,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(is_first)
    def _():
        out_ref[:, :] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_ref[:, :] = out_ref[:, :] + contrib


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def pallas_affine_scatter(
    z: jax.Array,  # (Ep, L)
    alpha: jax.Array,  # (L,)
    beta: jax.Array,  # (L,)
    receivers: jax.Array,  # (Ep,)
    edge_gid: jax.Array,  # (Ep,)
    block_tile: jax.Array,  # (NB,)
    num_nodes: int,
    n_graphs: int,
) -> jax.Array:
    return _affine_forward(
        z, alpha, beta, receivers, edge_gid, block_tile, num_nodes, n_graphs
    )


def _affine_forward(z, alpha, beta, receivers, edge_gid, block_tile,
                    num_nodes, n_graphs):
    Ep, L = z.shape
    assert num_nodes % NODE_TILE == 0 and Ep % EDGE_BLOCK == 0
    n_blocks = Ep // EDGE_BLOCK
    rcv2d = receivers.astype(jnp.int32).reshape(Ep, 1)
    gid2d = edge_gid.astype(jnp.int32).reshape(Ep, 1)
    ab = jnp.stack([alpha, beta]).astype(jnp.float32)  # (2, L)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((EDGE_BLOCK, L), lambda b, bt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_BLOCK, 1), lambda b, bt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EDGE_BLOCK, 1), lambda b, bt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NODE_TILE, L), lambda b, bt: (bt[b], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_affine_kernel, n_graphs=n_graphs),
        out_shape=jax.ShapeDtypeStruct((num_nodes, L), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(block_tile.astype(jnp.int32), z, rcv2d, gid2d, ab)


def _affine_bwd_kernel(block_tile_ref, g_ref, z_ref, rcv_ref, gid_ref,
                       al_ref, dz_ref, dab_ref, *, n_graphs: int):
    """Backward of the affine scatter: the cotangent gather g[rcv] is the
    same tile-one-hot contraction as the forward scatter (transposed);
    per-lane dalpha/dbeta partials accumulate in one revisited block."""
    b = pl.program_id(0)
    tile = block_tile_ref[b]
    base = tile * NODE_TILE
    rcv_local = rcv_ref[:, :] - base
    col_ids = jax.lax.broadcasted_iota(
        jnp.int32, (EDGE_BLOCK, NODE_TILE), 1
    )
    onehot = (col_ids == rcv_local).astype(jnp.float32)
    ge = jax.lax.dot_general(  # g gathered at receivers: (EB, L)
        onehot, g_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    mask = (gid_ref[:, :] < n_graphs).astype(jnp.float32)
    gm = ge * mask
    dz_ref[:, :] = gm * al_ref[0, :]
    dal = jnp.sum(gm * z_ref[:, :], axis=0, keepdims=True)  # (1, L)
    dbe = jnp.sum(gm, axis=0, keepdims=True)
    contrib = jnp.concatenate([dal, dbe], axis=0)  # (2, L)

    @pl.when(b == 0)
    def _():
        dab_ref[:, :] = contrib

    @pl.when(b != 0)
    def _():
        dab_ref[:, :] = dab_ref[:, :] + contrib


def _affine_fwd(z, alpha, beta, receivers, edge_gid, block_tile, num_nodes,
                n_graphs):
    out = _affine_forward(
        z, alpha, beta, receivers, edge_gid, block_tile, num_nodes, n_graphs
    )
    return out, (z, alpha, receivers, edge_gid, block_tile)


def _affine_bwd(num_nodes, n_graphs, res, g):
    z, alpha, receivers, edge_gid, block_tile = res
    Ep, L = z.shape
    n_blocks = Ep // EDGE_BLOCK
    rcv2d = receivers.astype(jnp.int32).reshape(Ep, 1)
    gid2d = edge_gid.astype(jnp.int32).reshape(Ep, 1)
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
            pl.BlockSpec((1, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((EDGE_BLOCK, L), lambda b, bt: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, L), lambda b, bt: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    dz, dab = pl.pallas_call(
        functools.partial(_affine_bwd_kernel, n_graphs=n_graphs),
        out_shape=(
            jax.ShapeDtypeStruct((Ep, L), jnp.float32),
            jax.ShapeDtypeStruct((2, L), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        block_tile.astype(jnp.int32), g, z, rcv2d, gid2d,
        alpha.reshape(1, L).astype(jnp.float32),
    )
    return dz, dab[0], dab[1], None, None, None


pallas_affine_scatter.defvjp(_affine_fwd, _affine_bwd)
