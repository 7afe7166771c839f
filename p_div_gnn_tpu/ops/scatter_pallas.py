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

# single source of truth for the layout constants (env-tunable). The
# scatter BLOCK size is inferred per call from the view shapes
# (Ep / len(block_tile)) — round-5 decoupled the sender-view block
# (SND_BLOCK) from the edge-kernel block (EDGE_BLOCK): sender-tile runs
# pad to a block multiple, so the scatter wants smaller blocks than the
# RCM-clustered receiver layout tolerates.
from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK, NODE_TILE  # noqa: F401


def _maybe_interpret():
    """On a genuine CPU backend, run in TPU-interpret mode (tests/dev);
    production CPU runs should prefer the XLA segment-sum path."""
    import contextlib

    if jax.default_backend() == "cpu":
        return pltpu.force_tpu_interpret_mode()
    return contextlib.nullcontext()


def _kernel(block_tile_ref, msg_ref, rcv_ref, out_ref, *, block: int):
    b = pl.program_id(0)
    tile = block_tile_ref[b]
    prev = block_tile_ref[jnp.maximum(b - 1, 0)]
    is_first = jnp.logical_or(b == 0, tile != prev)

    base = tile * NODE_TILE
    rcv_local = rcv_ref[:, :] - base  # (EB, 1)
    col_ids = jax.lax.broadcasted_iota(
        jnp.int32, (block, NODE_TILE), 1
    )
    # fp32 messages: the one-hot is exact in bf16, but the messages must
    # not be rounded to a single bf16 pass (~1e-3/element). Splitting the
    # fp32 messages into three bf16 terms reproduces the fp32 scatter to
    # ~2^-24 in THREE single-pass dots — half the MXU passes of Mosaic's
    # 6-pass HIGHEST (ops/fused_edge.py header; microbench.json).
    # bf16 messages (v3 stream mode): ONE DEFAULT pass, fp32 accumulation
    # — the inputs are already bf16-rounded so the split buys nothing.
    from p_div_gnn_tpu.ops.fused_edge import _dot_default, _mm_onehot

    if msg_ref.dtype == jnp.float32:
        onehot = (col_ids == rcv_local).astype(jnp.bfloat16)
        contrib = _mm_onehot(onehot, msg_ref[:, :], ((0,), (0,)))
    else:
        onehot = (col_ids == rcv_local).astype(msg_ref.dtype)
        contrib = _dot_default(onehot, msg_ref[:, :], ((0,), (0,)))

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
    n_blocks = int(block_tile.shape[0])
    block = Ep // n_blocks
    assert block * n_blocks == Ep and block % 8 == 0, (
        f"edge capacity {Ep} not divisible into {n_blocks} sublane-aligned "
        "blocks (view built with a different block size?)"
    )
    # (EB, 1) receiver blocks: sublane dim EB is 8-aligned and the lane dim
    # equals the full array dim, satisfying the TPU BlockSpec tiling rules.
    rcv2d = receivers.astype(jnp.int32).reshape(Ep, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (block, L), lambda b, bt: (b, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block, 1), lambda b, bt: (b, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (NODE_TILE, L), lambda b, bt: (bt[b], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    with _maybe_interpret():
        call = pl.pallas_call(
            functools.partial(_kernel, block=block),
            out_shape=jax.ShapeDtypeStruct((num_nodes, L), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Ep * NODE_TILE * L,
                bytes_accessed=Ep * L * messages.dtype.itemsize + Ep * 4
                + num_nodes * L * 4,
                transcendentals=0,
            ),
        )
        # dtype-generic: bf16 message streams stay bf16 on the wire (the
        # kernel accumulates fp32 either way); anything else goes fp32
        msgs = (
            messages if messages.dtype == jnp.bfloat16
            else messages.astype(jnp.float32)
        )
        return call(block_tile.astype(jnp.int32), msgs, rcv2d)


def _fwd(messages, receivers, block_tile, num_nodes):
    out = _forward(messages, receivers, block_tile, num_nodes)
    return out, receivers


def _bwd(num_nodes, receivers, g):
    # transpose of scatter-add is gather
    return jnp.take(g, receivers, axis=0), None, None


pallas_segment_sum.defvjp(_fwd, _bwd)


def _kernel_pair(block_tile_ref, a_ref, b_ref, rcv_ref, out_a_ref,
                 out_b_ref, *, block: int):
    """Two streams scattered by ONE receiver layout in one kernel pass:
    one one-hot + one grid traversal instead of two (per-block fixed cost
    — DMA issue + pipeline bookkeeping — is the dominant kernel cost at
    ~1 µs/block; docs/evidence/microbench.json)."""
    bi = pl.program_id(0)
    tile = block_tile_ref[bi]
    prev = block_tile_ref[jnp.maximum(bi - 1, 0)]
    is_first = jnp.logical_or(bi == 0, tile != prev)

    base = tile * NODE_TILE
    rcv_local = rcv_ref[:, :] - base
    col_ids = jax.lax.broadcasted_iota(
        jnp.int32, (block, NODE_TILE), 1
    )
    from p_div_gnn_tpu.ops.fused_edge import _mm_onehot

    onehot = (col_ids == rcv_local).astype(jnp.bfloat16)
    ca = _mm_onehot(onehot, a_ref[:, :], ((0,), (0,)))
    cb = _mm_onehot(onehot, b_ref[:, :], ((0,), (0,)))

    @pl.when(is_first)
    def _():
        out_a_ref[:, :] = ca
        out_b_ref[:, :] = cb

    @pl.when(jnp.logical_not(is_first))
    def _():
        out_a_ref[:, :] = out_a_ref[:, :] + ca
        out_b_ref[:, :] = out_b_ref[:, :] + cb


def pallas_segment_sum_pair(
    a: jax.Array,
    b: jax.Array,
    receivers: jax.Array,
    block_tile: jax.Array,
    num_nodes: int,
) -> tuple[jax.Array, jax.Array]:
    """Scatter-add TWO (Ep, L) streams over one receiver layout in a
    single kernel traversal. Used by the merged sender-gather VJP
    (ops/gather.sender_gather_pair)."""
    Ep, L = a.shape
    assert b.shape == a.shape
    assert num_nodes % NODE_TILE == 0
    n_blocks = int(block_tile.shape[0])
    block = Ep // n_blocks
    assert block * n_blocks == Ep and block % 8 == 0
    rcv2d = receivers.astype(jnp.int32).reshape(Ep, 1)
    edge = pl.BlockSpec((block, L), lambda bi, bt: (bi, 0),
                        memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((NODE_TILE, L), lambda bi, bt: (bt[bi], 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            edge, edge,
            pl.BlockSpec((block, 1), lambda bi, bt: (bi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(tile, tile),
    )
    with _maybe_interpret():
        call = pl.pallas_call(
            functools.partial(_kernel_pair, block=block),
            out_shape=(
                jax.ShapeDtypeStruct((num_nodes, L), jnp.float32),
                jax.ShapeDtypeStruct((num_nodes, L), jnp.float32),
            ),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * Ep * NODE_TILE * L * 3,
                bytes_accessed=Ep * L * 8 + Ep * 4 + num_nodes * L * 8,
                transcendentals=0,
            ),
        )
        return call(
            block_tile.astype(jnp.int32), a.astype(jnp.float32),
            b.astype(jnp.float32), rcv2d,
        )
