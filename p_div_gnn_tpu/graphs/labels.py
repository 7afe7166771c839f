"""Node labeling: INTERNAL / EXTERNAL_BOUNDARY / INTERNAL_BOUNDARY (C3).

Behavioral twin of `compute_node_labels`
(`/root/reference/gnn_local_stress/datasets.py:122-179`), built without VTK:
boundary edges are mesh edges incident to exactly one cell; connected
components of the boundary-edge graph give the regions; the region touching
the bounding box is the external boundary (the reference swaps region ids
with `_regions_must_be_inverted` when VTK's ordering disagrees —
functionally the same rule).
"""

from __future__ import annotations

from enum import IntEnum

import numpy as np

from p_div_gnn_tpu.graphs.meshio import SurfaceMesh


class NodeType(IntEnum):
    INTERNAL_BOUNDARY = -1
    INTERNAL = 0
    EXTERNAL_BOUNDARY = 1


def boundary_edges(faces: np.ndarray) -> np.ndarray:
    """Undirected edges belonging to exactly one cell, shape (B, 2)."""
    faces = np.asarray(faces, dtype=np.int64)
    k = faces.shape[1]
    slots = [(i, (i + 1) % k) for i in range(k)]
    pairs = np.concatenate(
        [np.stack([faces[:, a], faces[:, b]], axis=1) for a, b in slots]
    )
    pairs.sort(axis=1)
    uniq, counts = np.unique(pairs, axis=0, return_counts=True)
    return uniq[counts == 1]


def _connected_components(edges: np.ndarray, num_nodes: int) -> np.ndarray:
    """Union-find over an edge list; returns component id per node (-1 for
    nodes not in any edge)."""
    parent = np.arange(num_nodes)

    def find(a: int) -> int:
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[rb] = ra
    comp = np.full(num_nodes, -1, dtype=np.int64)
    touched = np.unique(edges)
    roots = {}
    for n in touched:
        r = find(int(n))
        comp[n] = roots.setdefault(r, len(roots))
    return comp


def compute_node_labels(mesh: SurfaceMesh) -> np.ndarray:
    """Label each node per NodeType; asserts exactly 2 boundary regions
    (plate outline + hole), as the reference does (`datasets.py:153-156`)."""
    from p_div_gnn_tpu.graphs import native

    fast = native.compute_node_labels(mesh.faces, mesh.points[:, :2])
    if fast is not None:
        return fast

    b_edges = boundary_edges(mesh.faces)
    comp = _connected_components(b_edges, mesh.n_points)
    region_ids = [r for r in np.unique(comp) if r >= 0]
    n_regions = len(region_ids)
    assert (
        n_regions == 2
    ), f"Expected 2 regions, found {n_regions} for the given mesh"

    min_x, max_x, min_y, max_y = mesh.bounds2d()
    bounds = (min_x, max_x, min_y, max_y)
    pts = mesh.points[:, :2]

    def touches_bounds(region: int) -> bool:
        nodes = np.where(comp == region)[0]
        p = pts[nodes]
        return bool(
            np.any(
                (p[:, 0] == min_x)
                | (p[:, 0] == max_x)
                | (p[:, 1] == min_y)
                | (p[:, 1] == max_y)
            )
        )

    del bounds
    external = region_ids[0] if touches_bounds(region_ids[0]) else region_ids[1]
    internal = region_ids[1] if external == region_ids[0] else region_ids[0]

    labels = np.full(mesh.n_points, int(NodeType.INTERNAL), dtype=np.int64)
    labels[comp == external] = int(NodeType.EXTERNAL_BOUNDARY)
    labels[comp == internal] = int(NodeType.INTERNAL_BOUNDARY)
    return labels


def von_mises_stress(sx: np.ndarray, sy: np.ndarray, sxy: np.ndarray) -> np.ndarray:
    """Von Mises from 2D components (`datasets.py:216-229`)."""
    return np.sqrt(0.5 * ((sx - sy) ** 2 + sx**2 + sy**2 + 6 * sxy**2))
