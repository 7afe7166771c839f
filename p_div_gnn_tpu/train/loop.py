"""Training loop: jit'd fused step, eval, checkpoints, early stopping.

Behavioral twin of the reference `train()` (`gnn_train.py:95-305`):
Adam(lr), per-epoch train + eval passes, TensorBoard-style scalar logging,
best-on-test + last-epoch checkpoints, early-stopping counter (disabled by
``train_all_epochs``). The per-graph Python loss loop is replaced by the
fused segment-reduction loss; the whole step (forward + loss + backward +
Adam) is ONE jit region with donated parameter/optimizer buffers. XLA
retraces once per padded-shape bucket and caches thereafter.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import optax

from p_div_gnn_tpu.graphs.container import GraphBatch, NormStats
from p_div_gnn_tpu.losses import batch_loss, per_graph_divergence
from p_div_gnn_tpu.models.epd import EncodeProcessDecode
from p_div_gnn_tpu.train.checkpoint import (
    BEST_CHECKPOINT,
    LAST_CHECKPOINT,
    save_checkpoint,
)
from p_div_gnn_tpu.train.data import GraphLoader
from p_div_gnn_tpu.train.logging import MetricsWriter


@dataclass
class Trainer:
    """Single-chip trainer; pass ``mesh`` for data-parallel execution with
    identical semantics (collective-aware LN/loss/grads via parallel/dp.py)
    — same checkpoint policy, metric accumulation, resume, and divergence
    monitoring in both modes."""

    model: EncodeProcessDecode
    stats: NormStats
    learning_rate: float = 1e-3
    divergence_penalty: float = 1.0
    optimize_divergence: bool = True
    monitor_divergence_in_test: bool = False
    mesh: Any | None = None  # jax.sharding.Mesh → DP over its 'data' axis
    # Opt-in fault tolerance (an extension over the reference, which has
    # none — SURVEY §5 "failure detection"): wrap the optimizer in
    # optax.apply_if_finite so a step whose gradients contain inf/NaN is
    # SKIPPED (params/opt-state unchanged) instead of poisoning the run —
    # observed once on the no-div hyperelastic config, where a single
    # spiking step NaN'd an otherwise-converged run at epoch 71. Off by
    # default (exact reference semantics). NOTE: changes the opt-state
    # pytree structure, so checkpoints are not interchangeable across the
    # two settings (load_checkpoint falls back to a params-only restore on
    # structure mismatch). GIVE-UP SEMANTICS: apply_if_finite stops
    # skipping after ``max_consecutive_errors`` consecutive nonfinite
    # steps and would apply the NaN update — fit() therefore aborts the
    # run with a RuntimeError BEFORE that happens (a persistently diverged
    # run must fail loudly, not train on NaNs); per-epoch skip counters go
    # to the metrics writer ("Steps skipped (nonfinite)").
    skip_nonfinite_updates: bool = False
    _max_consecutive_nonfinite: int = 100
    # optax.flatten(adam): run the Adam update over ONE concatenated
    # parameter vector instead of ~30 small per-leaf fusions — fewer
    # kernel launches in the glue tail of the train step. Numerically
    # identical updates (pinned by tests); opt-in because it changes the
    # opt-state pytree, making checkpoints non-interchangeable with the
    # unflattened layout.
    flatten_optimizer: bool = False

    def _nonfinite_abort_check(
        self, params, opt_state, weights_folder: Path, epoch: int
    ) -> None:
        """Abort the run if the consecutive-nonfinite counter crossed half
        the give-up budget. apply_if_finite APPLIES the NaN update once
        ``notfinite_count > max_consecutive_errors`` (optax source), so the
        abort must fire strictly before the counter can get there. Called
        every ``max//2`` train steps AND at epoch end: between two checks
        the counter grows by at most ``max//2``, so it is observed (and the
        run aborted) while still ``< max`` — params are therefore still
        finite here (every nonfinite step so far was skipped), making the
        saved checkpoint safe to resume from. Forces one device sync; the
        feature is opt-in."""
        threshold = self._max_consecutive_nonfinite // 2
        nf_run = int(opt_state.notfinite_count)
        if nf_run >= threshold:
            save_checkpoint(
                weights_folder / LAST_CHECKPOINT,
                params, opt_state, epoch + 1, self.stats,
            )
            raise RuntimeError(
                f"training diverged: {nf_run} consecutive nonfinite "
                "updates — aborting before apply_if_finite gives up and "
                "applies a NaN update"
            )

    def __post_init__(self):
        # torch.optim.Adam defaults: betas (0.9, 0.999), eps 1e-8
        # (`gnn_train.py:118`); optax.adam matches bias correction + eps
        # placement (outside the sqrt).
        self.optimizer = optax.adam(self.learning_rate)
        if self.flatten_optimizer:
            self.optimizer = optax.flatten(self.optimizer)
        if self.skip_nonfinite_updates:
            self.optimizer = optax.apply_if_finite(
                self.optimizer,
                max_consecutive_errors=self._max_consecutive_nonfinite,
            )
        if self.mesh is None:
            self._train_step = jax.jit(
                self._train_step_impl, donate_argnums=(0, 1)
            )
            self._eval_step = jax.jit(self._eval_step_impl)
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from p_div_gnn_tpu.parallel.dp import make_dp_train_step

            self._train_step = make_dp_train_step(
                self.model,
                self.stats,
                self.optimizer,
                self.mesh,
                divergence_penalty=self.divergence_penalty,
                optimize_divergence=self.optimize_divergence,
            )

            def eval_shard(params, stacked):
                local = jax.tree.map(lambda x: x[0], stacked)
                return self._eval_metrics(params, local, axis_name="data")

            self._eval_step = jax.jit(
                shard_map(
                    eval_shard,
                    mesh=self.mesh,
                    in_specs=(P(), P("data")),
                    out_specs=P(),
                    check_vma=False,
                )
            )

    def init(self, rng: jax.Array, batch: GraphBatch) -> tuple:
        if self.mesh is not None:
            # DP batches carry a leading shard axis; init on one shard
            import numpy as np

            batch = jax.tree.map(
                lambda x: np.asarray(x)[0] if getattr(x, "ndim", 0) else x,
                batch,
            )
        params = self.model.init(rng, batch, self.stats)
        opt_state = self.optimizer.init(params)
        return params, opt_state

    def _loss_fn(self, params, batch: GraphBatch):
        pred = self.model.apply(
            params, batch, self.stats, scale_input=True, scale_output=False
        )
        # GT standardized instead of un-scaling predictions
        # (`gnn_train.py:162-167`).
        gt = (
            batch.local_stress - self.stats.mean_local_stress
        ) / self.stats.std_local_stress
        total, aux = batch_loss(
            batch,
            pred,
            gt,
            divergence_penalty=self.divergence_penalty,
            optimize_divergence=self.optimize_divergence,
        )
        return total, aux

    def _train_step_impl(self, params, opt_state, batch: GraphBatch):
        (total, aux), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            params, batch
        )
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux["total"] = total
        return params, opt_state, aux

    def _eval_metrics(self, params, batch: GraphBatch, axis_name=None):
        pred = self.model.apply(
            params, batch, self.stats,
            scale_input=True, scale_output=False, axis_name=axis_name,
        )
        gt = (
            batch.local_stress - self.stats.mean_local_stress
        ) / self.stats.std_local_stress
        total, aux = batch_loss(batch, pred, gt, 0.0, False,
                                axis_name=axis_name)
        if self.monitor_divergence_in_test:
            gmask = batch.graph_mask.astype(pred.dtype)
            div_sum = jnp.sum(per_graph_divergence(batch, pred) * gmask)
            n_real = jnp.sum(gmask)
            if axis_name is not None:
                div_sum = jax.lax.psum(div_sum, axis_name)
                n_real = jax.lax.psum(n_real, axis_name)
            aux["divergence"] = div_sum / jnp.maximum(n_real, 1.0)
            total = total + aux["divergence"]
        aux["total"] = total
        return aux

    def _eval_step_impl(self, params, batch: GraphBatch):
        return self._eval_metrics(params, batch)

    # ------------------------------------------------------------------
    def fit(
        self,
        params: Any,
        opt_state: Any,
        train_loader: GraphLoader,
        test_loader: GraphLoader,
        epochs: int,
        weights_folder: str | Path,
        writer: MetricsWriter | None = None,
        early_stopping_limit: int = 10,
        train_all_epochs: bool = False,
        verbose: bool = True,
        start_epoch: int = 0,
    ) -> tuple[Any, Any, list[float], list[float]]:
        """Train. ``start_epoch > 0`` resumes into an EXISTING weights
        folder (fresh runs fail fast on an existing folder, like the
        reference's mkdir(exist_ok=False), `gnn_train.py:113`)."""
        weights_folder = Path(weights_folder)
        weights_folder.mkdir(parents=True, exist_ok=start_epoch > 0)
        best_loss = sys.float_info.max
        train_losses: list[float] = []
        test_losses: list[float] = []
        early_stopping_counter = 0
        epoch = start_epoch
        for epoch in range(start_epoch, epochs):
            if (
                not train_all_epochs
                and early_stopping_counter >= early_stopping_limit
            ):
                if verbose:
                    print("Training early stopped")
                break
            # Accumulate metrics as DEVICE scalars and sync once per epoch:
            # a per-step float() would serialize host round-trips (fatal
            # over remote-TPU links) and stall the dispatch pipeline.
            tr_nmse = tr_div = tr_total = jnp.float32(0)
            n_tr = 0
            from p_div_gnn_tpu.train.data import prefetch

            for batch in prefetch(train_loader):
                params, opt_state, aux = self._train_step(
                    params, opt_state, batch
                )
                tr_nmse = tr_nmse + aux["nmse"]
                tr_total = tr_total + aux["total"]
                if self.optimize_divergence:
                    tr_div = tr_div + aux["divergence"]
                n_tr += 1
                # Liveness heartbeat for the stall watchdog: counts DISPATCH
                # (no device sync — reading a metric here would serialize
                # host round-trips). A wedged tunnel still stops this loop
                # once the dispatch queue fills, so silence remains a
                # reliable stall signal.
                if verbose and n_tr % 100 == 0:
                    print(f"  epoch {epoch + 1}: {n_tr} steps dispatched",
                          flush=True)
                # In-loop divergence guard: without this, an epoch longer
                # than max_consecutive_errors steps lets apply_if_finite
                # give up and apply the NaN update mid-epoch (ADVICE r3).
                if (
                    self.skip_nonfinite_updates
                    and n_tr % (self._max_consecutive_nonfinite // 2) == 0
                ):
                    self._nonfinite_abort_check(
                        params, opt_state, weights_folder, epoch
                    )
            te_nmse = te_div = te_total = jnp.float32(0)
            n_te = 0
            for batch in test_loader:
                aux = self._eval_step(params, batch)
                te_nmse = te_nmse + aux["nmse"]
                te_total = te_total + aux["total"]
                if self.monitor_divergence_in_test:
                    te_div = te_div + aux["divergence"]
                n_te += 1
            tr_nmse, tr_div, tr_total, te_div, te_total = (
                float(tr_nmse), float(tr_div), float(tr_total),
                float(te_div), float(te_total),
            )
            if self.skip_nonfinite_updates:
                # ApplyIfFiniteState sits at the root of the wrapped
                # opt_state; surface its skip counters so a diverged run is
                # visible, and abort BEFORE apply_if_finite "gives up" and
                # applies a nonfinite update (see class docstring).
                nf_run = int(opt_state.notfinite_count)
                nf_total = int(opt_state.total_notfinite)
                if nf_total and verbose:
                    print(
                        f"  nonfinite updates skipped: {nf_total} total, "
                        f"{nf_run} consecutive", flush=True,
                    )
                if writer is not None and nf_total:
                    writer.add_scalar(
                        "Steps skipped (nonfinite)", nf_total, epoch + 1
                    )
                self._nonfinite_abort_check(
                    params, opt_state, weights_folder, epoch
                )

            train_loss = tr_total / max(n_tr, 1)
            test_loss = te_total / max(n_te, 1)
            if writer is not None:
                writer.add_scalar("Loss/MSE Train", tr_nmse / max(n_tr, 1), epoch + 1)
                writer.add_scalar("Loss/Loss Train", train_loss, epoch + 1)
                writer.add_scalar("Loss/MSE Test", test_loss, epoch + 1)
                if self.optimize_divergence:
                    writer.add_scalar(
                        "Loss/Divergence Train", tr_div / max(n_tr, 1), epoch + 1
                    )
                if self.monitor_divergence_in_test:
                    writer.add_scalar(
                        "Loss/Divergence test value",
                        te_div / max(n_te, 1),
                        epoch + 1,
                    )
                writer.flush()
            if test_loss < best_loss:
                save_checkpoint(
                    weights_folder / BEST_CHECKPOINT,
                    params,
                    opt_state,
                    epoch + 1,
                    self.stats,
                )
                best_loss = test_loss
                early_stopping_counter = 0
                if verbose:
                    print(f"Checkpoint saved at {weights_folder / BEST_CHECKPOINT}")
            else:
                early_stopping_counter += 1
            if verbose:
                print(
                    f"Epoch: {epoch + 1} / {epochs}, "
                    f"\nTotal train Loss : {train_loss}"
                    f"\nMSE train Loss : {tr_nmse / max(n_tr, 1)} "
                    f"\nTest Loss : {test_loss}",
                    flush=True,
                )
            train_losses.append(train_loss)
            test_losses.append(test_loss)
            # keep the last-epoch checkpoint fresh each epoch (the
            # reference writes it only at the very end, gnn_train.py:299;
            # per-epoch saves make long runs resumable after interruption)
            save_checkpoint(
                weights_folder / LAST_CHECKPOINT,
                params,
                opt_state,
                epoch + 1,
                self.stats,
            )
        save_checkpoint(
            weights_folder / LAST_CHECKPOINT,
            params,
            opt_state,
            epoch + 1,
            self.stats,
        )
        return params, opt_state, train_losses, test_losses
