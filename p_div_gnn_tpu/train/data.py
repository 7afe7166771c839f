"""Bucketed-padding dataloader over GraphSamples.

Replaces PyG's dynamic disjoint-union DataLoader (`gnn_train.py:387-394`)
with a static-shape loader: each epoch, samples are (optionally) shuffled,
grouped into batches of `batch_size`, and packed into padded GraphBatches
whose capacities come from a shared bucket ladder — so the number of
distinct compiled programs stays small across epochs.
"""

from __future__ import annotations

from typing import Any

import queue
import threading
from typing import Iterator

import numpy as np

from p_div_gnn_tpu.graphs.batching import (
    NODE_TILE,
    GraphSample,
    default_node_buckets,
    pack_batch,
)
from p_div_gnn_tpu.graphs.container import GraphBatch


class GraphLoader:
    def __init__(
        self,
        samples: list[GraphSample],
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        tile: int = NODE_TILE,
        edges_per_node: int = 8,
        div_per_node: int = 16,
        cache_device_batches: bool | None = None,
        cache_groups: bool = False,
        pair_blocks: bool = False,
        sender_view: bool = True,
        reorder: str | None = "rcm",
    ):
        self.samples = samples
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.tile = tile
        # Deterministic loaders (eval) re-produce identical batches every
        # epoch; cache them device-resident so the host→device transfer
        # happens once per run instead of once per epoch.
        self.cache_device_batches = (
            (not shuffle) if cache_device_batches is None
            else cache_device_batches
        )
        # cache_groups: fix the batch COMPOSITIONS once (one shuffled
        # grouping), keep every packed batch device-resident, and reshuffle
        # only the batch ORDER per epoch. Trades the reference's per-epoch
        # regrouping for zero per-epoch host→device traffic — decisive when
        # the host link is slow (remote-TPU tunnels). Off by default.
        self.cache_groups = cache_groups
        self.pair_blocks = pair_blocks
        # sender-major view: only consumed by the fused/hybrid sender VJP;
        # callers on the xla/pallas paths pass False to skip its host
        # build + per-step transfer
        self.sender_view = sender_view
        # RCM node reordering (default): shrinks sender-receiver tile
        # distance so the sender-view permutation gathers stay HBM-local.
        # Semantically a no-op (permutation-equivariant model; predictions
        # are unpermuted by unpack_predictions).
        self.reorder = reorder
        self._device_cache: list[GraphBatch] | None = None
        self.node_buckets = default_node_buckets()
        # Edge/div capacities are TIED to the node bucket, so the number of
        # distinct compiled programs is bounded by the node-bucket count
        # alone (mesh-graph density is bounded: ~5.4 edges and ~12.5 div
        # entries per node, plus block-alignment overhead).
        # Pair-blocked layouts pad each (receiver-tile × sender-tile) run
        # separately — measured blow-up ~1.9x at EDGE_BLOCK=128 on the
        # flagship mesh family — so the edge capacity tied to the node
        # bucket needs matching headroom or every batch composition gets
        # its own capacity (and its own XLA compile).
        self.edges_per_node = (
            edges_per_node * 2 if pair_blocks else edges_per_node
        )
        self.div_per_node = div_per_node
        self._capacity_overflow_warned = False

    def __len__(self) -> int:
        return (len(self.samples) + self.batch_size - 1) // self.batch_size

    def _capacities(self, batch_samples) -> tuple[int, int, int]:
        tot_nodes = sum(s.num_nodes for s in batch_samples) + 1
        from p_div_gnn_tpu.graphs.batching import _bucket

        pad_nodes = _bucket(tot_nodes, self.tile, self.node_buckets)
        from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK, _round_up

        # EDGE_BLOCK-align so the ladder capacity matches what pack_batch
        # will actually allocate (it rounds Ep up to whole blocks)
        pad_edges = _round_up(self.edges_per_node * pad_nodes, EDGE_BLOCK)
        pad_div = self.div_per_node * pad_nodes
        # safety: densities above the cap fall back to content-driven pads
        tot_edges = sum(s.num_edges for s in batch_samples)
        tot_div = sum(s.num_div_entries for s in batch_samples)
        if tot_edges > pad_edges:
            pad_edges = ((tot_edges + 4095) // 4096) * 4096
        if tot_div > pad_div:
            pad_div = ((tot_div + 4095) // 4096) * 4096
        return pad_nodes, pad_edges, pad_div

    def _check_capacity(self, batch: GraphBatch, pad_edges: int) -> None:
        """Warn once if the packed layout outgrew the bucket capacity —
        every such batch composition compiles its own XLA program."""
        if (
            not self._capacity_overflow_warned
            and batch.num_edges_padded > pad_edges
        ):
            self._capacity_overflow_warned = True
            print(
                f"GraphLoader: packed edge layout ({batch.num_edges_padded}"
                f" slots) exceeded the bucket capacity ({pad_edges}); "
                "recompiles per batch composition likely — raise "
                "edges_per_node",
                flush=True,
            )

    def __iter__(self) -> Iterator[GraphBatch]:
        if self._device_cache is not None:
            if self.cache_groups and self.shuffle:
                for i in self.rng.permutation(len(self._device_cache)):
                    yield self._device_cache[i]
            else:
                yield from self._device_cache
            return
        if self.cache_groups:
            import jax

            order = np.arange(len(self.samples))
            if self.shuffle:
                self.rng.shuffle(order)
            cache = []
            for start in range(0, len(order), self.batch_size):
                idx = order[start : start + self.batch_size]
                bs = [self.samples[i] for i in idx]
                pn, pe, pd = self._capacities(bs)
                host_batch = pack_batch(
                    bs, n_graphs=self.batch_size, tile=self.tile,
                    pad_nodes=pn, pad_edges=pe, pad_div=pd,
                    pair_blocks=self.pair_blocks,
                    sender_view=self.sender_view,
                    reorder=self.reorder,
                )
                self._check_capacity(host_batch, pe)
                cache.append(jax.tree.map(jax.device_put, host_batch))
            self._device_cache = cache
            yield from cache
            return
        order = np.arange(len(self.samples))
        if self.shuffle:
            self.rng.shuffle(order)
        batches = []
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            batch_samples = [self.samples[i] for i in idx]
            pad_nodes, pad_edges, pad_div = self._capacities(batch_samples)
            batch = pack_batch(
                batch_samples,
                n_graphs=self.batch_size,
                tile=self.tile,
                pad_nodes=pad_nodes,
                pad_edges=pad_edges,
                pad_div=pad_div,
                pair_blocks=self.pair_blocks,
                sender_view=self.sender_view,
                reorder=self.reorder,
            )
            self._check_capacity(batch, pad_edges)
            if self.cache_device_batches:
                import jax

                batch = jax.tree.map(jax.device_put, batch)
                batches.append(batch)
            yield batch
        if self.cache_device_batches:
            self._device_cache = batches


def prefetch(loader: Any, depth: int = 2) -> Iterator[GraphBatch]:
    """Overlap host packing + host→device transfer with device compute by
    producing batches on a background thread (depth-bounded queue). The
    device-side transfer is issued from the worker via jax.device_put, so
    steps dequeue already-resident arrays."""
    import jax

    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for batch in loader:
                q.put(jax.tree.map(jax.device_put, batch))
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
