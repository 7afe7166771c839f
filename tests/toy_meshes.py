"""Synthetic toy meshes for tests (no gmsh/pyvista needed)."""

from __future__ import annotations

import numpy as np

from p_div_gnn_tpu.graphs.meshio import SurfaceMesh


def grid_mesh(nx: int = 5, ny: int = 5, width: float = 1.0) -> SurfaceMesh:
    """Structured triangulated square grid, (nx+1)*(ny+1) nodes."""
    xs = np.linspace(0.0, width, nx + 1)
    ys = np.linspace(0.0, width, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    points = np.stack([X.ravel(), Y.ravel(), np.zeros(X.size)], axis=1)

    def nid(ix, iy):
        return iy * (nx + 1) + ix

    faces = []
    for iy in range(ny):
        for ix in range(nx):
            a, b = nid(ix, iy), nid(ix + 1, iy)
            c, d = nid(ix + 1, iy + 1), nid(ix, iy + 1)
            faces.append([a, b, c])
            faces.append([a, c, d])
    return SurfaceMesh(points=points, faces=np.array(faces, dtype=np.int64))


def grid_mesh_with_hole(
    nx: int = 6, ny: int = 6, width: float = 1.0, hole_cell: tuple[int, int] = (2, 2)
) -> SurfaceMesh:
    """Grid mesh with one square cell removed → inner boundary ring.

    The removed cell's 4 corner nodes form the internal boundary region;
    the plate outline forms the external region.
    """
    mesh = grid_mesh(nx, ny, width)
    hx, hy = hole_cell
    cell_idx = 2 * (hy * nx + hx)
    keep = np.ones(mesh.faces.shape[0], dtype=bool)
    keep[cell_idx] = keep[cell_idx + 1] = False
    return SurfaceMesh(points=mesh.points, faces=mesh.faces[keep])


def hole_corner_nodes(nx: int, ny: int, hole_cell: tuple[int, int]) -> np.ndarray:
    hx, hy = hole_cell

    def nid(ix, iy):
        return iy * (nx + 1) + ix

    return np.array(
        sorted(
            [
                nid(hx, hy),
                nid(hx + 1, hy),
                nid(hx + 1, hy + 1),
                nid(hx, hy + 1),
            ]
        )
    )
