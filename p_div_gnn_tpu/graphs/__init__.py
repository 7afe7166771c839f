from p_div_gnn_tpu.graphs.batching import (
    GraphSample,
    pack_batch,
    unpack_predictions,
)
from p_div_gnn_tpu.graphs.build import (
    MeshGraph,
    coalesce_edges,
    edge_distances,
    faces_to_edge_index,
    graph_to_mesh,
    mesh_to_graph,
)
from p_div_gnn_tpu.graphs.container import GraphBatch, NormStats
from p_div_gnn_tpu.graphs.dataset import (
    MeshStressFieldDataset,
    compute_norm_stats,
    load_sample,
)
from p_div_gnn_tpu.graphs.labels import NodeType, compute_node_labels
from p_div_gnn_tpu.graphs.meshio import SurfaceMesh, read_vtk, write_vtk
from p_div_gnn_tpu.graphs.periodic import compute_periodic_graph

__all__ = [
    "GraphSample",
    "GraphBatch",
    "MeshGraph",
    "MeshStressFieldDataset",
    "NodeType",
    "NormStats",
    "SurfaceMesh",
    "coalesce_edges",
    "compute_node_labels",
    "compute_norm_stats",
    "compute_periodic_graph",
    "edge_distances",
    "faces_to_edge_index",
    "graph_to_mesh",
    "load_sample",
    "mesh_to_graph",
    "pack_batch",
    "read_vtk",
    "unpack_predictions",
    "write_vtk",
]
