"""Data-parallel training loop: Trainer semantics over a device mesh.

Drop-in multi-chip variant of train.loop.Trainer — which itself twins the
reference `train()` (`/root/reference/scripts/gnn_train.py:95-305`); the
reference has no distributed counterpart (SURVEY §2). Enabled by the
``data_parallel: true`` config key: batches are packed per-device with
uniform capacities, the step runs under shard_map with collective-aware
LN/loss/grad handling (parallel/dp.py), and the checkpoint/early-stopping
policy is identical to the single-chip loop.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import jax
import numpy as np
import optax
from jax.sharding import Mesh

from p_div_gnn_tpu.graphs.batching import GraphSample
from p_div_gnn_tpu.graphs.container import NormStats
from p_div_gnn_tpu.models.epd import EncodeProcessDecode
from p_div_gnn_tpu.parallel.dp import (
    device_put_sharded_batch,
    make_dp_train_step,
    pack_sharded_batch,
)
from p_div_gnn_tpu.train.checkpoint import (
    BEST_CHECKPOINT,
    LAST_CHECKPOINT,
    save_checkpoint,
)
from p_div_gnn_tpu.train.logging import MetricsWriter


class DPGraphLoader:
    """Shuffled loader yielding device-sharded stacked batches."""

    def __init__(
        self,
        samples: list[GraphSample],
        batch_size: int,
        mesh: Mesh,
        shuffle: bool = False,
        seed: int = 0,
    ):
        self.samples = samples
        self.batch_size = batch_size
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        assert batch_size % self.n_shards == 0, (
            f"batch_size {batch_size} must divide across {self.n_shards} "
            "devices"
        )
        self.graphs_per_shard = batch_size // self.n_shards
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return (len(self.samples) + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.samples))
        if self.shuffle:
            self.rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            stacked = pack_sharded_batch(
                [self.samples[i] for i in idx],
                n_shards=self.n_shards,
                graphs_per_shard=self.graphs_per_shard,
            )
            yield device_put_sharded_batch(stacked, self.mesh)


@dataclass
class DPTrainer:
    model: EncodeProcessDecode
    stats: NormStats
    mesh: Mesh
    learning_rate: float = 1e-3
    divergence_penalty: float = 1.0
    optimize_divergence: bool = True

    def __post_init__(self):
        self.optimizer = optax.adam(self.learning_rate)
        self._train_step = make_dp_train_step(
            self.model,
            self.stats,
            self.optimizer,
            self.mesh,
            divergence_penalty=self.divergence_penalty,
            optimize_divergence=self.optimize_divergence,
        )
        # eval reuses the train-step loss (divergence off) — build a
        # second step with zero LR to avoid mutating params? cheaper: a
        # dedicated eval step via the same collectives
        from p_div_gnn_tpu.losses import batch_loss
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def eval_shard(params, local_batch):
            local_batch = jax.tree.map(lambda x: x[0], local_batch)
            pred = self.model.apply(
                params, local_batch, self.stats,
                scale_input=True, scale_output=False, axis_name="data",
            )
            gt = (
                local_batch.local_stress - self.stats.mean_local_stress
            ) / self.stats.std_local_stress
            total, aux = batch_loss(
                local_batch, pred, gt, 0.0, False, axis_name="data"
            )
            aux["total"] = total
            return aux

        self._eval_step = jax.jit(
            shard_map(
                eval_shard,
                mesh=self.mesh,
                in_specs=(P(), P("data")),
                out_specs=P(),
                check_vma=False,
            )
        )

    def init(self, rng: jax.Array, stacked_batch):
        local = jax.tree.map(
            lambda x: np.asarray(x)[0] if getattr(x, "ndim", 0) else x,
            stacked_batch,
        )
        params = self.model.init(rng, local, self.stats)
        opt_state = self.optimizer.init(params)
        return params, opt_state

    def fit(
        self,
        params: Any,
        opt_state: Any,
        train_loader: DPGraphLoader,
        test_loader: DPGraphLoader,
        epochs: int,
        weights_folder: str | Path,
        writer: MetricsWriter | None = None,
        early_stopping_limit: int = 10,
        train_all_epochs: bool = False,
        verbose: bool = True,
    ):
        weights_folder = Path(weights_folder)
        weights_folder.mkdir(parents=True, exist_ok=False)
        best_loss = sys.float_info.max
        train_losses: list[float] = []
        test_losses: list[float] = []
        early_stopping_counter = 0
        epoch = 0
        for epoch in range(epochs):
            if (
                not train_all_epochs
                and early_stopping_counter >= early_stopping_limit
            ):
                break
            tr_total = 0.0
            n_tr = 0
            for batch in train_loader:
                params, opt_state, aux = self._train_step(
                    params, opt_state, batch
                )
                tr_total += float(aux["total"])
                n_tr += 1
            te_total = 0.0
            n_te = 0
            for batch in test_loader:
                aux = self._eval_step(params, batch)
                te_total += float(aux["total"])
                n_te += 1
            train_loss = tr_total / max(n_tr, 1)
            test_loss = te_total / max(n_te, 1)
            if writer is not None:
                writer.add_scalar("Loss/Loss Train", train_loss, epoch + 1)
                writer.add_scalar("Loss/MSE Test", test_loss, epoch + 1)
                writer.flush()
            if test_loss < best_loss:
                save_checkpoint(
                    weights_folder / BEST_CHECKPOINT, params, opt_state,
                    epoch + 1, self.stats,
                )
                best_loss = test_loss
                early_stopping_counter = 0
            else:
                early_stopping_counter += 1
            if verbose:
                print(
                    f"[DP x{self.mesh.devices.size}] epoch {epoch + 1}/"
                    f"{epochs}: train {train_loss:.5f} test {test_loss:.5f}"
                )
            train_losses.append(train_loss)
            test_losses.append(test_loss)
        save_checkpoint(
            weights_folder / LAST_CHECKPOINT, params, opt_state, epoch + 1,
            self.stats,
        )
        return params, opt_state, train_losses, test_losses
