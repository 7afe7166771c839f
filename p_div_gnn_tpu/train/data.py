"""Bucketed-padding dataloader over GraphSamples.

Replaces PyG's dynamic disjoint-union DataLoader (`gnn_train.py:387-394`)
with a static-shape loader: each epoch, samples are (optionally) shuffled,
grouped into batches of `batch_size`, and packed into padded GraphBatches
whose capacities come from a shared bucket ladder — so the number of
distinct compiled programs stays small across epochs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from p_div_gnn_tpu.graphs.batching import (
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
        tile: int = 128,
    ):
        self.samples = samples
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.tile = tile
        self.node_buckets = default_node_buckets()
        self.edge_buckets = tuple(8 * b for b in default_node_buckets())
        self._div_buckets = tuple(4 * b for b in default_node_buckets())

    def __len__(self) -> int:
        return (len(self.samples) + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[GraphBatch]:
        order = np.arange(len(self.samples))
        if self.shuffle:
            self.rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            batch_samples = [self.samples[i] for i in idx]
            yield pack_batch(
                batch_samples,
                n_graphs=self.batch_size,
                tile=self.tile,
                node_buckets=self.node_buckets,
                edge_buckets=self.edge_buckets,
            )
