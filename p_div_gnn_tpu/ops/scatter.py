"""Scatter-add dispatch: the edge→node aggregation hot op.

Implementations share one contract: ``messages`` is (Ep, L) sorted by
``receivers`` (CSR order, guaranteed by the batcher), output is (Np, L)
per-node sums. ``impl='xla'`` lowers to XLA's sorted scatter;
``impl='pallas'`` uses the MXU one-hot-matmul kernel
(ops/scatter_pallas.py). The reference's counterpart is PyG's CUDA
scatter-add (`/root/reference/gnn_local_stress/models.py:191,215-217`).
"""

from __future__ import annotations

import jax

from p_div_gnn_tpu.ops.segment import segment_sum


def scatter_add(
    messages: jax.Array,
    receivers: jax.Array,
    num_nodes: int,
    block_tile: jax.Array | None = None,
    impl: str = "xla",
    sorted_receivers: bool = True,
) -> jax.Array:
    if impl == "xla":
        return segment_sum(
            messages, receivers, num_nodes,
            indices_are_sorted=sorted_receivers,
        )
    if impl == "pallas":
        from p_div_gnn_tpu.ops.scatter_pallas import pallas_segment_sum

        assert block_tile is not None, "pallas scatter needs edge_block_tile"
        return pallas_segment_sum(messages, receivers, block_tile, num_nodes)
    raise ValueError(f"unknown scatter impl {impl!r}")
