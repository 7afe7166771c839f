"""Inference pipeline (reference C15, `scripts/gnn_inference.py:34-149`):
load checkpoint (weights + normalization stats), run jit'd batched forward
with output un-standardization, write each prediction as a copy of the
original sample npz with ``stress_field`` replaced, emit an updated
``dataset.csv`` and ``normalize_params.json``.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import jax
import numpy as np
import pandas as pd
import yaml

from p_div_gnn_tpu.graphs.batching import unpack_predictions
from p_div_gnn_tpu.graphs.container import NormStats
from p_div_gnn_tpu.graphs.dataset import MeshStressFieldDataset
from p_div_gnn_tpu.models.epd import EncodeProcessDecode
from p_div_gnn_tpu.train.checkpoint import load_checkpoint
from p_div_gnn_tpu.train.data import GraphLoader


def copy_data_file_and_replace_local_stress_field(
    original_data_path: str, target_data_path: str, local_stress_field: np.ndarray
) -> None:
    shutil.copyfile(original_data_path, target_data_path)
    org_data = dict(np.load(original_data_path))
    org_data["stress_field"] = np.asarray(local_stress_field)
    np.savez(target_data_path, **org_data)


def run_inference(
    dataset_csv: str | Path,
    results_folder: str | Path,
    model_weights_path: str | Path,
    periodic_graph: bool,
    batch_size: int,
    latent_size: int,
    message_passing_steps: int,
    device: str = "tpu",  # config compat; ignored
    config_path: Path | str | None = None,
    scatter_impl: str = "xla",
) -> list[str]:
    dataframe = pd.read_csv(dataset_csv)
    results_folder = Path(results_folder)
    results_folder.mkdir(parents=True, exist_ok=True)
    if config_path:
        shutil.copyfile(config_path, results_folder / Path(config_path).name)
    print("Loading datasets...")
    dataset = MeshStressFieldDataset(dataframe, periodic_graph=periodic_graph)
    loader = GraphLoader(dataset.samples, batch_size, shuffle=False)

    model = EncodeProcessDecode(
        latent_size=latent_size,
        message_passing_steps=message_passing_steps,
        scatter_impl=scatter_impl,
    )
    first = next(iter(loader))
    template = model.init(jax.random.PRNGKey(0), first, NormStats.ones())
    params, _, _, stats = load_checkpoint(model_weights_path, template)

    apply_fn = jax.jit(
        lambda p, b: model.apply(p, b, stats, scale_input=True, scale_output=True)
    )

    fields_folder = results_folder / "fields"
    fields_folder.mkdir(exist_ok=True, parents=True)
    mesh_id = 0
    predicted_data_filenames: list[str] = []
    print("Running inferences...")
    for batch in loader:
        pred = np.asarray(apply_fn(params, batch))
        for stress in unpack_predictions(batch, pred):
            field_filename = f"hole_plate_mesh_{mesh_id}.npz"
            predicted_data_path = (fields_folder / field_filename).as_posix()
            original = dataframe["data_filename"][mesh_id]
            copy_data_file_and_replace_local_stress_field(
                original, predicted_data_path, stress
            )
            predicted_data_filenames.append(predicted_data_path)
            mesh_id += 1

    out_df = dataframe.copy()
    out_df["data_filename"] = predicted_data_filenames
    out_df.to_csv((results_folder / "dataset.csv").as_posix(), index=False)
    with open(results_folder / "normalize_params.json", "w") as fh:
        json.dump(
            {
                "mean_local_stress": float(stats.mean_local_stress),
                "std_local_stress": float(stats.std_local_stress),
            },
            fh,
        )
    return predicted_data_filenames


def main(config_path: str) -> None:
    with open(config_path) as fh:
        params = yaml.safe_load(fh)
    params["config_path"] = Path(config_path)
    run_inference(**params)
