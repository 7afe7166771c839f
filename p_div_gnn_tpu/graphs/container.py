"""Static-shape padded graph batch — the device-facing data structure.

The reference batches graphs as PyG disjoint unions with a dynamic `batch`
index vector (`gnn_train.py:387-394`) and slices them back in Python loops
(`data_utils.py:25-43`). On TPU everything under jit must be static-shape,
so the TPU-native design packs a list of mesh graphs into fixed-capacity
arrays with masks and segment ids:

- nodes of graph g occupy a contiguous range; padding nodes carry
  ``node_gid == n_graphs`` (an extra, always-empty segment);
- edges are sorted by receiver (CSR order) so the Pallas scatter kernel can
  process per-node-tile contiguous edge ranges; padding edges self-loop on
  the last (padding) node;
- the per-mesh FEM divergence operator is a padded COO whose column index is
  pre-split into (node, is_y_component) so the penalty is two gathers + a
  segment-sum — never densified (unlike `gnn_train.py:73-76`).
"""

from __future__ import annotations

import os
from typing import Any

import flax.struct
import jax.numpy as jnp
import numpy as np

Array = Any  # np.ndarray on host, jnp.ndarray on device

# Layout constants (single source of truth; re-exported by
# graphs/batching.py which historically owned them). They live here so
# GraphBatch.tile can default to the ACTIVE layout tile — a batch packed
# at one tile fed to kernels compiled for another is silently
# misaddressed (advisor round-4 finding).
#
# Pallas edge-stream block size (ops/scatter_pallas.py, ops/fused_edge.py,
# ops/fused_edge3.py). Round-5 default 768×256 (block × tile), from the
# fused3 on-chip layout sweep (bf16 85.5 ms at 768×256 vs 90.2 at
# 512×256, 111.7 at 1024×256 — padding blowup, 92.1 at 768×512 — wider
# one-hot): larger blocks cut per-grid-step fixed cost; RCM keeps the
# tile-run round-up waste small. CAVEAT: the LEGACY v2 "fused" impl's
# fp32 backward kernel exceeds the 16 MB VMEM limit at 768-row blocks —
# EVERY fp32 fused backward (v2 AND fused3 — the 3-pass-split
# temporaries dominate the scoped allocation) needs PDG_EDGE_BLOCK<=512;
# bf16 fits at 768 (verified on-chip). bench.py, pdg-train and the
# measurement scripts drop the block automatically for fp32 fused cases.
# Env-tunable for experiments; layouts and kernels share these constants.
EDGE_BLOCK = int(os.environ.get("PDG_EDGE_BLOCK", "768"))
# Node tile size for the block-aligned CSR layout and the one-hot MXU
# gather/scatter kernels. Larger tiles cut padding at a given EDGE_BLOCK
# (a tile's edge run is padded to a block multiple, so more edges per tile
# → relatively less round-up waste) at the cost of wider one-hot
# contractions (per-edge gather/scatter FLOPs scale with NODE_TILE).
NODE_TILE = int(os.environ.get("PDG_NODE_TILE", "256"))
# Sender-VIEW block size (the sender-major scatter layout used by the
# gather VJPs). Decoupled from EDGE_BLOCK in round 5 as an experiment
# knob — the scatter kernels infer their block from the view shapes, so
# this only affects packing. The on-chip train-step sweep found the
# shared default is already optimal (bf16 fused3: 85.5 ms at 768 vs
# 87.0 at 512, 88.6 at 256 — sender-view round-up padding is tiny on
# RCM-ordered flagship meshes: 272.6k slots at 768 vs 271.4k at 256),
# so SND_BLOCK follows EDGE_BLOCK unless overridden.
SND_BLOCK = int(os.environ.get("PDG_SND_BLOCK", str(EDGE_BLOCK)))


class GraphBatch(flax.struct.PyTreeNode):
    # --- nodes (capacity Np; graphs contiguous; >=1 trailing padding node)
    pos: Array  # (Np, 2) f32
    mean_stress: Array  # (Np, 3) f32  (macroscopic stress broadcast per node)
    node_type: Array  # (Np, 1) f32  in {-1, 0, 1}
    local_stress: Array  # (Np, 3) f32  (target field; zeros at inference)
    node_gid: Array  # (Np,) i32  graph id; == n_graphs for padding

    # --- edges (capacity Ep; sorted by receiver; padding self-loops on Np-1)
    senders: Array  # (Ep,) i32
    receivers: Array  # (Ep,) i32
    edge_weight: Array  # (Ep, 1) f32  (0 on periodic + padding edges)
    edge_gid: Array  # (Ep,) i32  == n_graphs for padding
    tile_ptr: Array  # (Np // tile + 1,) i32  CSR offsets per node tile
    # (block-aligned: every tile's range is a multiple of EDGE_BLOCK)
    edge_block_tile: Array  # (Ep // EDGE_BLOCK,) i32  node tile per block

    # --- divergence operator, padded COO (capacity Kp)
    div_data: Array  # (Kp,) f32  (0 for padding entries)
    div_row: Array  # (Kp,) i32  global padded node index (padding → Np-1)
    div_col_node: Array  # (Kp,) i32  global padded node index of source dof
    div_col_is_y: Array  # (Kp,) i32  0 → x-dof (σxx/σxy), 1 → y-dof

    # --- per-graph metadata (capacity G = n_graphs)
    graph_node_count: Array  # (G,) i32  (0 for padding graphs)
    graph_node_offset: Array  # (G,) i32

    # --- optional sender-major edge view (capacity Ep2): lets the VJP of
    # the per-edge sender gathers run as the MXU one-hot scatter kernel
    # instead of XLA's per-element generic scatter (see
    # batching.build_sender_view). None when a producer doesn't build it
    # (e.g. edge-partitioned shards) — consumers fall back to XLA.
    # padding slots: snd_perm points at edge slot 0 (valid → unguarded
    # gather) and snd_sorted carries -1 (dead one-hot row in the kernel)
    snd_perm: Array | None = None  # (Ep2,) i32 source edge slot
    snd_sorted: Array | None = None  # (Ep2,) i32 sender node per slot
    snd_block_tile: Array | None = None  # (Ep2/EDGE_BLOCK,) i32

    # --- optional gather-only (ELL) divergence views
    # (batching.build_div_ell): fixed fan-in tables that make the
    # divergence operator AND its transpose pure gathers + lane reductions
    # — no scatter in either direction (the COO path's unsorted scatters
    # cost ~54 ms/step; docs/evidence/microbench.json). None when a
    # producer opts out (e.g. edge-partitioned shards use the COO path
    # with halo-extended addressing).
    div_src: Array | None = None  # (Np, W) i32 source node (pad → Np−1)
    div_val: Array | None = None  # (Np, W) f32 (pad → 0)
    div_isy: Array | None = None  # (Np, W) i8  0 → x-dof, 1 → y-dof
    divT_row: Array | None = None  # (Np, Wt) i32 row node (pad → Np−1)
    divT_val: Array | None = None  # (Np, Wt) f32
    divT_isy: Array | None = None  # (Np, Wt) i8

    # --- optional node-reordering record (pack_batch(reorder="rcm")):
    # node_order[off+i] = ORIGINAL local index (within its graph) of the
    # node stored at packed row off+i. RCM reordering shrinks the
    # sender-vs-receiver tile distance to <=2 tiles (measured: 100% of the
    # flagship workload's edges; 97% within +-1), which makes the
    # sender-view permutation near-local (fast HBM gathers) and enables
    # banded in-kernel scatter designs. Predictions are mapped back to the
    # original mesh order by unpack_predictions. None = identity order.
    node_order: Array | None = None  # (Np,) i32

    # --- optional pair-blocked layout marker (batching.blockify_edges_pair,
    # scatter_impl="fused2"): sender tile per edge block. When set, the
    # edge arrays are (rcv_tile, snd_tile)-grouped — receivers are NOT
    # globally sorted, so XLA segment-sums must not assume sortedness.
    edge_block_snd_tile: Array | None = None  # (Ep/EDGE_BLOCK,) i32

    # --- static
    n_graphs: int = flax.struct.field(pytree_node=False, default=1)
    tile: int = flax.struct.field(pytree_node=False, default=NODE_TILE)

    # Derived masks -------------------------------------------------------
    @property
    def node_mask(self) -> Array:
        return self.node_gid < self.n_graphs

    @property
    def edge_mask(self) -> Array:
        return self.edge_gid < self.n_graphs

    @property
    def graph_mask(self) -> Array:
        return self.graph_node_count > 0

    @property
    def n_real_graphs(self) -> Array:
        return jnp.sum(self.graph_mask.astype(jnp.int32))

    @property
    def num_nodes_padded(self) -> int:
        return int(self.pos.shape[0])

    @property
    def num_edges_padded(self) -> int:
        return int(self.senders.shape[0])


class NormStats(flax.struct.PyTreeNode):
    """The 8 scalar normalization statistics the reference model carries as
    attributes and checkpoints (`models.py:98-179,44-63`)."""

    mean_pos: Array
    std_pos: Array
    mean_mean_stress: Array
    std_mean_stress: Array
    mean_local_stress: Array
    std_local_stress: Array
    mean_edge_weight: Array
    std_edge_weight: Array

    @classmethod
    def ones(cls) -> "NormStats":
        return cls(*(jnp.float32(v) for v in (0, 1, 0, 1, 0, 1, 0, 1)))

    def to_dict(self) -> dict[str, float]:
        return {k: float(getattr(self, k)) for k in self.__dataclass_fields__}

    @classmethod
    def from_dict(cls, d: dict[str, float]) -> "NormStats":
        return cls(
            **{k: jnp.float32(d[k]) for k in cls.__dataclass_fields__}
        )


def batch_shape_key(batch: GraphBatch) -> tuple[int, int, int, int]:
    """Compile-cache key: one XLA program per distinct padded shape."""
    return (
        batch.num_nodes_padded,
        batch.num_edges_padded,
        int(batch.div_data.shape[0]),
        batch.n_graphs,
        # ELL fan-in widths (None-safe): distinct W/Wt recompile
        int(batch.div_src.shape[1]) if batch.div_src is not None else 0,
        int(batch.divT_row.shape[1]) if batch.divT_row is not None else 0,
    )


def to_numpy(batch: GraphBatch) -> GraphBatch:
    import jax

    return jax.tree.map(np.asarray, batch)
