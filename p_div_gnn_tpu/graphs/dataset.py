"""Dataset loading: CSV rows → GraphSamples + dataset normalization stats.

Behavioral twin of `MeshStressFieldDatasetInMemory`
(`/root/reference/gnn_local_stress/datasets.py:232-311`): per CSV row, read
the mesh, build the (optionally periodic) graph with distance edge weights,
attach the macroscopic mean stress, target stress field, divergence-operator
COO and node labels, then compute dataset-wide *scalar* mean/std statistics
over pos, mean_stress, local_stress and edge_weight (`datasets.py:284-291` —
`.mean()`/`.std()` over whole tensors; torch `.std()` is the unbiased/ddof=1
estimator, reproduced here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from p_div_gnn_tpu.graphs.batching import GraphSample
from p_div_gnn_tpu.graphs.build import mesh_to_graph
from p_div_gnn_tpu.graphs.container import NormStats
from p_div_gnn_tpu.graphs.labels import von_mises_stress
from p_div_gnn_tpu.graphs.meshio import load_sample_npz, read_vtk
from p_div_gnn_tpu.graphs.periodic import compute_periodic_graph


def load_sample(
    mesh_filename: str,
    data_filename: str,
    periodic_graph: bool = True,
    mesh_id: int = -1,
) -> GraphSample:
    mesh = read_vtk(mesh_filename)
    graph = mesh_to_graph(mesh)
    if periodic_graph:
        graph = compute_periodic_graph(graph)
    data = load_sample_npz(data_filename)
    stress_field = np.asarray(data["stress_field"], np.float32)
    mean_stress = np.asarray(data["mean_stress"], np.float32)
    labels = np.asarray(data["node_labels"], np.int64)
    return GraphSample(
        graph=graph,
        mean_stress=mean_stress,
        local_stress=stress_field,
        node_labels=labels,
        div_data=np.asarray(data["op_div_matrix_data"], np.float32),
        div_row=np.asarray(data["op_div_matrix_row_indices"], np.int64),
        div_col=np.asarray(data["op_div_matrix_col_indices"], np.int64),
        von_mises=float(von_mises_stress(*mean_stress)),
        mesh_id=mesh_id,
    )


def _load_sample_job(args: tuple) -> GraphSample:
    mesh_fn, data_fn, periodic, i = args
    return load_sample(mesh_fn, data_fn, periodic, mesh_id=i)


class MeshStressFieldDataset:
    """In-memory dataset over a metadata dataframe (C6).

    Loading parallelizes across processes (the host analog of the
    reference's `process_map` generation parallelism) — VTK parse + graph
    build + periodic-edge construction per sample are CPU-bound; order is
    preserved. Set ``PDG_LOAD_WORKERS=0`` to force the serial path.
    """

    def __init__(self, dataframe: pd.DataFrame, periodic_graph: bool = True):
        import os

        self.dataframe = dataframe
        self.periodic_graph = periodic_graph
        jobs = list(
            zip(dataframe["mesh_filename"], dataframe["data_filename"])
        )
        workers = int(
            os.environ.get("PDG_LOAD_WORKERS", os.cpu_count() or 1)
        )
        if workers > 1 and len(jobs) >= 64:
            from concurrent.futures import ProcessPoolExecutor

            with ProcessPoolExecutor(max_workers=workers) as pool:
                self.samples = list(
                    pool.map(
                        _load_sample_job,
                        [
                            (m, d, periodic_graph, i)
                            for i, (m, d) in enumerate(jobs)
                        ],
                        chunksize=64,
                    )
                )
        else:
            self.samples = [
                load_sample(m, d, periodic_graph, mesh_id=i)
                for i, (m, d) in enumerate(jobs)
            ]
        self.stats = compute_norm_stats(self.samples)

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, i: int) -> GraphSample:
        return self.samples[i]


def compute_norm_stats(samples: list[GraphSample]) -> NormStats:
    """Scalar mean/std over concatenated tensors (`datasets.py:284-291`).

    mean_stress statistics are over the per-node broadcast tensor, i.e.
    weighted by node count, exactly like the reference (which stores
    mean_stress as a (N,3) broadcast before collation, `datasets.py:262-270`).
    pos statistics are over the Z-trimmed (N,2) coordinates
    (`datasets.py:267-269` trims before collation).
    """
    pos = np.concatenate([s.graph.pos[:, :2].astype(np.float32) for s in samples])
    n_per = np.array([s.num_nodes for s in samples])
    ms = np.concatenate(
        [
            np.broadcast_to(s.mean_stress.astype(np.float32), (n, 3))
            for s, n in zip(samples, n_per)
        ]
    )
    ls = np.concatenate([s.local_stress.astype(np.float32) for s in samples])
    ew = np.concatenate([s.graph.edge_weight.astype(np.float32) for s in samples])

    def _std(x: np.ndarray) -> float:
        return float(np.std(x, ddof=1))  # torch .std() default (unbiased)

    return NormStats(
        mean_pos=np.float32(pos.mean()),
        std_pos=np.float32(_std(pos)),
        mean_mean_stress=np.float32(ms.mean()),
        std_mean_stress=np.float32(_std(ms)),
        mean_local_stress=np.float32(ls.mean()),
        std_local_stress=np.float32(_std(ls)),
        mean_edge_weight=np.float32(ew.mean()),
        std_edge_weight=np.float32(_std(ew)),
    )
