"""Experiment runner: YAML config → datasets → model → training.

Behavioral twin of `run_experience` (`/root/reference/scripts/gnn_train.py:
331-435`) with the same config keys (the reference YAML files work as-is):
dataset_train_csv, dataset_test_csv, results_folder, epochs, batch_size,
learning_rate, early_stopping_limit, divergence, divergence_penalty,
latent_size, message_passing_steps, train_all_epochs,
monitor_divergence_in_test, periodic_graph. `device` is accepted and
ignored (JAX targets whatever backend is active).
"""

from __future__ import annotations

import random
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import pandas as pd
import yaml

from p_div_gnn_tpu.graphs.dataset import MeshStressFieldDataset
from p_div_gnn_tpu.models.epd import EncodeProcessDecode
from p_div_gnn_tpu.train.data import GraphLoader
from p_div_gnn_tpu.train.logging import MetricsWriter
from p_div_gnn_tpu.train.loop import Trainer

SEED = 69  # `gnn_train.py:38`


def count_params(params: Any) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def _write_dataset_histograms(
    df: pd.DataFrame, writer: MetricsWriter, tag: str
) -> None:
    for col, name in [
        ("hole_plate_radius", "Hole plate radius"),
        ("mean_stress_x", "Mean stress X"),
        ("mean_stress_y", "Mean stress Y"),
        ("mean_stress_xy", "Mean stress XY"),
    ]:
        if col in df:
            writer.add_histogram(f"{tag}/{name}", df[col].to_numpy())


def run_experience(
    dataset_train_csv: str,
    dataset_test_csv: str,
    results_folder: str,
    epochs: int,
    batch_size: int,
    divergence: bool,
    latent_size: int,
    divergence_penalty: float,
    early_stopping_limit: int,
    learning_rate: float,
    message_passing_steps: int,
    train_all_epochs: bool = False,
    device: str = "tpu",  # accepted for config compat; backend is JAX's
    periodic_graph: bool = True,
    monitor_divergence_in_test: bool = False,
    config_path: Path | str | None = None,
    scatter_impl: str = "xla",
    stream_dtype: str = "float32",
    data_parallel: bool = False,
    resume: bool = False,
    cache_train_batches: bool = False,
    skip_nonfinite_updates: bool = False,
    seed: int = SEED,  # reference default (gnn_train.py:38); override for
    # multi-seed studies (e.g. the bf16-stream A/B)
    **_ignored: Any,
) -> tuple[list[float], list[float]]:
    random.seed(seed)
    np.random.seed(seed)
    rng = jax.random.PRNGKey(seed)

    train_df = pd.read_csv(dataset_train_csv)
    test_df = pd.read_csv(dataset_test_csv)
    results = Path(results_folder)
    with MetricsWriter(results / "Dataset stats") as w:
        _write_dataset_histograms(train_df, w, "Train Dataset")
        _write_dataset_histograms(test_df, w, "Test Dataset")
        w.add_text("Dataset train csv", dataset_train_csv)
        w.add_text("Dataset test csv", dataset_test_csv)

    print(f"Size train dataset {len(train_df)}")
    print(f"Size test dataset {len(test_df)}")
    print("Loading datasets...")
    train_ds = MeshStressFieldDataset(train_df, periodic_graph=periodic_graph)
    # NB: the reference builds the test dataset with the default
    # periodic_graph=True even for no-periodic runs (`gnn_train.py:386`);
    # reproduced deliberately.
    test_ds = MeshStressFieldDataset(test_df)
    if scatter_impl != "xla" and jax.default_backend() == "cpu":
        # Pallas kernels only run interpreted on CPU, and interpret mode's
        # IO effects are incompatible with per-step remat — fall back to
        # the numerically-matching XLA path.
        print(
            f"scatter_impl={scatter_impl!r} needs a TPU backend; "
            "using 'xla' on CPU"
        )
        scatter_impl = "xla"
    if (
        scatter_impl in ("fused", "fused2", "fused3")
        and stream_dtype == "float32"
        and jax.default_backend() != "cpu"
    ):
        from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK

        if EDGE_BLOCK > 512:
            # the fp32 fused backward kernels' scoped VMEM (inputs +
            # 3-pass-split temporaries) exceeds the 16 MB limit above
            # 512-row blocks; fail NOW with the fix instead of after the
            # dataset load + a long compile (ROOFLINE.md round-5 note)
            raise RuntimeError(
                f"scatter_impl={scatter_impl!r} with float32 streams "
                f"needs EDGE_BLOCK<=512 on TPU (current {EDGE_BLOCK}); "
                "set PDG_EDGE_BLOCK=512 before launching, or use "
                "stream_dtype: bfloat16 (the evidence-cleared "
                "production dtype)"
            )
    pair_blocks = scatter_impl == "fused2"
    # the sender-major view feeds the fused/hybrid sender-gather VJP and
    # the fused2 kernel's in-kernel sender gathers; only the xla/pallas
    # paths never read it
    sender_view = scatter_impl not in ("xla", "pallas")
    train_loader = GraphLoader(
        train_ds.samples, batch_size, shuffle=True, seed=seed,
        cache_groups=cache_train_batches, pair_blocks=pair_blocks,
        sender_view=sender_view,
    )
    test_loader = GraphLoader(test_ds.samples, batch_size, shuffle=False,
                              pair_blocks=pair_blocks,
                              sender_view=sender_view)

    model = EncodeProcessDecode(
        latent_size=latent_size,
        message_passing_steps=message_passing_steps,
        input_nodes_features_size=6,
        input_edges_features_size=1,
        output_nodes_features_size=3,
        scatter_impl=scatter_impl,
        stream_dtype=stream_dtype,
    )
    mesh = None
    if data_parallel and len(jax.devices()) > 1:
        if scatter_impl == "fused2":
            raise ValueError(
                "scatter_impl='fused2' is single-shard for now — use "
                "'fused' or 'hybrid' with data_parallel"
            )
        from jax.sharding import Mesh

        from p_div_gnn_tpu.parallel.dp import DPGraphLoader

        mesh = Mesh(np.array(jax.devices()), ("data",))
        print(f"Data-parallel training over {mesh.devices.size} devices")
        train_loader = DPGraphLoader(
            train_ds.samples, batch_size, mesh, shuffle=True, seed=seed
        )
        test_loader = DPGraphLoader(test_ds.samples, batch_size, mesh)
    trainer = Trainer(
        model=model,
        stats=train_ds.stats,  # TRAIN-set stats (`gnn_train.py:397-411`)
        learning_rate=learning_rate,
        divergence_penalty=divergence_penalty,
        optimize_divergence=divergence,
        monitor_divergence_in_test=monitor_divergence_in_test,
        mesh=mesh,
        skip_nonfinite_updates=skip_nonfinite_updates,
    )
    first_batch = next(iter(test_loader))
    params, opt_state = trainer.init(rng, first_batch)
    # run-start model summary, the reference's `print_model` analog
    # (`gnn_train.py:413`, `models.py:33-41`): per-parameter table +
    # total count, printed AND logged below as run provenance.
    from p_div_gnn_tpu.models.summary import model_summary

    summary = model_summary(model, params)
    print(summary)
    print(f"EncodeProcessDecode params: {count_params(params)}")

    start_epoch = 0
    if resume:
        from p_div_gnn_tpu.train.checkpoint import LAST_CHECKPOINT, load_checkpoint

        ckpt_path = results / "weights" / LAST_CHECKPOINT
        if ckpt_path.exists():
            params, restored_opt, start_epoch, restored_stats = (
                load_checkpoint(ckpt_path, params, opt_state)
            )
            if restored_opt is not None:
                opt_state = restored_opt
            # else: structure mismatch (e.g. skip_nonfinite_updates toggled
            # since the checkpoint was written) — keep the fresh opt_state
            trainer.stats = restored_stats
            print(f"Resumed from {ckpt_path} at epoch {start_epoch}")

    # NB: `Path("")` stringifies to "." (a directory) — only copy when a
    # real config file was passed (programmatic callers pass none).
    if config_path is not None and Path(config_path).is_file():
        results.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(config_path, results / Path(config_path).name)
    with MetricsWriter(results / "train_logs") as writer:
        # reference logs the model summary blob first (`gnn_train.py:419`)
        writer.add_text("Model summary", summary)
        writer.add_text(
            "Train parameters",
            f"Batch size = {batch_size}; Learning rate = {learning_rate}; "
            f"Epochs = {epochs}; Divergence = {divergence}; "
            f"Divergence lambda = {divergence_penalty}; "
            f"Early stopping limit = {early_stopping_limit};",
        )
        _, _, train_losses, test_losses = trainer.fit(
            params,
            opt_state,
            train_loader,
            test_loader,
            epochs=epochs,
            weights_folder=results / "weights",
            writer=writer,
            early_stopping_limit=early_stopping_limit,
            train_all_epochs=train_all_epochs,
            start_epoch=start_epoch,
        )
    return train_losses, test_losses


def main(config_path: str, resume_override: bool | None = None) -> None:
    from p_div_gnn_tpu.utils.cache import enable_persistent_cache
    from p_div_gnn_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    enable_persistent_cache()
    with open(config_path) as fh:
        params = yaml.safe_load(fh)
    params["config_path"] = Path(config_path)
    if resume_override is not None:
        params["resume"] = resume_override
    if params.pop("multihost", False):
        # must run before the first backend-initializing JAX call; with
        # multihost on, jax.devices() is the GLOBAL device list and the
        # data_parallel mesh spans hosts (collectives ride ICI + DCN)
        from p_div_gnn_tpu.parallel.multihost import ensure_distributed

        ensure_distributed()
    run_experience(**params)
