"""Divergence operator assembly (reference `_compute_op_div_matrix`,
`/root/reference/scripts/generate_dataset.py:85-105`).

D = gausspoint2node @ div_operator: for a nodal vector field v with
component-major dofs (all v_x then all v_y), the per-element (1 gauss
point, P1) divergence is ``Σ_i (∂N_i/∂x v_x,i + ∂N_i/∂y v_y,i)``; the
area-weighted node projection then yields a (N, 2N) sparse matrix. Applied
columnwise to [(σxx;σxy), (σxy;σyy)] it produces the nodal div(σ) vectors
used by the physics loss (`gnn_train.py:60-92`).

Exactness: constant fields have zero divergence exactly (rows sum to 0 per
component block); linear fields reproduce their constant divergence exactly
away from projection boundaries.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from p_div_gnn_tpu.datagen.fem import (
    gausspoint_to_node_matrix,
    triangle_geometry,
)


def compute_op_div_matrix(
    points2d: np.ndarray, tris: np.ndarray
) -> sp.coo_matrix:
    n = len(points2d)
    f = len(tris)
    grads, _ = triangle_geometry(points2d, tris)
    # element-divergence operator: (F, 2N)
    rows = np.repeat(np.arange(f), 3)
    data_x = grads[:, :, 0].ravel()
    data_y = grads[:, :, 1].ravel()
    cols_x = tris.ravel()
    cols_y = tris.ravel() + n
    Bdiv = sp.coo_matrix(
        (
            np.concatenate([data_x, data_y]),
            (np.concatenate([rows, rows]), np.concatenate([cols_x, cols_y])),
        ),
        shape=(f, 2 * n),
    ).tocsr()
    g2n = gausspoint_to_node_matrix(points2d, tris)
    return (g2n @ Bdiv).tocoo()
