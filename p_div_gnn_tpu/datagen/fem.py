"""Linear-elastic periodic-homogenization FEM (plane stress, P1 triangles).

Standalone replacement for the fedoo/pypardiso solve pipeline of the
reference generator (`/root/reference/scripts/generate_dataset.py:195-303`):
solves the RVE problem under a prescribed macroscopic displacement gradient
with periodic boundary conditions, and produces the same artifacts — nodal
stress/strain fields, bounding-box / material-volume mean stresses, and the
node-projected divergence operator (COO).

Conventions match the reference exactly where observable:
- prescribed gradient G = [[eps_xx, 0], [gamma_xy, eps_yy]]: the reference
  drives EpsXX/EpsYY via the two virtual strain nodes, puts the full shear
  gamma into u_y(x+W)-u_y(x) and pins u_x(y+H)-u_x(y)=0
  (`generate_dataset.py:225-262`);
- dof layout is component-major (all u_x then all u_y), the layout the
  divergence operator's columns assume (`gnn_train.py:68-76`);
- field integrals use nodal quadrature ∫f ≈ Σ_e A_e·mean(f_nodes) like
  fedoo's integrate_field over node fields (`generate_dataset.py:279-289`).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def plane_stress_D(young: float, poisson: float) -> np.ndarray:
    f = young / (1.0 - poisson**2)
    return f * np.array(
        [
            [1.0, poisson, 0.0],
            [poisson, 1.0, 0.0],
            [0.0, 0.0, (1.0 - poisson) / 2.0],
        ]
    )


def triangle_geometry(
    points: np.ndarray, tris: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-element shape-function gradients and areas.

    Returns (grads, areas): grads (F, 3, 2) with grads[e, i] = ∇N_i on
    element e; areas (F,).
    """
    p = points[tris]  # (F, 3, 2)
    v1 = p[:, 1] - p[:, 0]
    v2 = p[:, 2] - p[:, 0]
    det = v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]  # 2·area (signed)
    areas = det / 2.0
    # ∇N_i from the linear map inverse
    b = np.empty((len(tris), 3, 2))
    b[:, 0, 0] = p[:, 1, 1] - p[:, 2, 1]
    b[:, 1, 0] = p[:, 2, 1] - p[:, 0, 1]
    b[:, 2, 0] = p[:, 0, 1] - p[:, 1, 1]
    b[:, 0, 1] = p[:, 2, 0] - p[:, 1, 0]
    b[:, 1, 1] = p[:, 0, 0] - p[:, 2, 0]
    b[:, 2, 1] = p[:, 1, 0] - p[:, 0, 0]
    grads = b / det[:, None, None]
    return grads, areas


def assemble_stiffness(
    points: np.ndarray, tris: np.ndarray, D: np.ndarray
) -> sp.csr_matrix:
    """Global stiffness, component-major dofs (x-dofs 0..N-1, y-dofs N..2N-1)."""
    n = len(points)
    grads, areas = triangle_geometry(points, tris)
    F = len(tris)
    # B matrix per element: strain [exx, eyy, gxy] from local dofs
    # [ux1,ux2,ux3, uy1,uy2,uy3]
    B = np.zeros((F, 3, 6))
    B[:, 0, 0:3] = grads[:, :, 0]
    B[:, 1, 3:6] = grads[:, :, 1]
    B[:, 2, 0:3] = grads[:, :, 1]
    B[:, 2, 3:6] = grads[:, :, 0]
    Ke = np.einsum("fki,kl,flj,f->fij", B, D, B, areas)  # (F, 6, 6)
    dofs = np.concatenate([tris, tris + n], axis=1)  # (F, 6)
    rows = np.repeat(dofs, 6, axis=1).ravel()
    cols = np.tile(dofs, (1, 6)).ravel()
    K = sp.coo_matrix((Ke.ravel(), (rows, cols)), shape=(2 * n, 2 * n))
    return K.tocsr()


@dataclasses.dataclass
class PeriodicPairs:
    masters: np.ndarray  # (P,) node ids
    slaves: np.ndarray  # (P,) node ids
    shifts: np.ndarray  # (P, 2) x_slave - x_master


def periodic_node_pairs(points: np.ndarray, tol: float = 1e-9) -> PeriodicPairs:
    """Right→left, top→bottom, and the three non-origin corners→LL corner."""
    min_x, min_y = points.min(0)
    max_x, max_y = points.max(0)
    is_l = points[:, 0] == min_x
    is_r = points[:, 0] == max_x
    is_b = points[:, 1] == min_y
    is_t = points[:, 1] == max_y
    idx = np.arange(len(points))

    def match(slave_mask, master_mask, axis):
        s = idx[slave_mask]
        m = idx[master_mask]
        s = s[np.argsort(points[s, axis])]
        m = m[np.argsort(points[m, axis])]
        assert len(s) == len(m), "non-periodic mesh"
        assert np.allclose(points[s, axis], points[m, axis], atol=tol)
        return s, m

    # sides without corners
    r_s, r_m = match(is_r & ~is_b & ~is_t, is_l & ~is_b & ~is_t, axis=1)
    t_s, t_m = match(is_t & ~is_l & ~is_r, is_b & ~is_l & ~is_r, axis=0)
    ll = idx[is_l & is_b]
    lr = idx[is_r & is_b]
    ul = idx[is_l & is_t]
    ur = idx[is_r & is_t]
    assert len(ll) == len(lr) == len(ul) == len(ur) == 1
    c_s = np.array([lr[0], ul[0], ur[0]])
    c_m = np.array([ll[0], ll[0], ll[0]])
    slaves = np.concatenate([r_s, t_s, c_s])
    masters = np.concatenate([r_m, t_m, c_m])
    shifts = points[slaves] - points[masters]
    return PeriodicPairs(masters=masters, slaves=slaves, shifts=shifts)


@dataclasses.dataclass
class FEMResult:
    displacement: np.ndarray  # (N, 2)
    stress_nodes: np.ndarray  # (N, 3) [xx, yy, xy]
    strain_nodes: np.ndarray  # (N, 3) [exx, eyy, gxy]
    stress_elems: np.ndarray  # (F, 3)
    mean_stress: np.ndarray  # (3,) over bounding-box volume
    mean_stress_material: np.ndarray  # (3,) over material volume


def gausspoint_to_node_matrix(
    points: np.ndarray, tris: np.ndarray
) -> sp.csr_matrix:
    """Area-weighted projection of per-element (1 gauss pt) values to nodes:
    node value = Σ_e A_e v_e / Σ_e A_e over incident elements — the
    node-field projection fedoo's _get_gausspoint2node_mat performs."""
    n = len(points)
    _, areas = triangle_geometry(points, tris)
    rows = tris.ravel()
    cols = np.repeat(np.arange(len(tris)), 3)
    w = np.repeat(areas, 3)
    M = sp.coo_matrix((w, (rows, cols)), shape=(n, len(tris))).tocsr()
    norm = np.asarray(M.sum(axis=1)).ravel()
    inv = sp.diags(1.0 / np.maximum(norm, 1e-300))
    return inv @ M


def solve_periodic_rve(
    points2d: np.ndarray,
    tris: np.ndarray,
    eps_xx: float,
    eps_yy: float,
    gamma_xy: float,
    young_modulus: float = 1e5,
    poisson_ratio: float = 0.3,
) -> FEMResult:
    """Dirichlet-controlled macroscopic strain with periodic fluctuations
    (`compute_mechanical_fields_dirichlet`, generate_dataset.py:195-303)."""
    n = len(points2d)
    D = plane_stress_D(young_modulus, poisson_ratio)
    K = assemble_stiffness(points2d, tris, D)

    G = np.array([[eps_xx, 0.0], [gamma_xy, eps_yy]])  # du_i/dx_j
    pairs = periodic_node_pairs(points2d)

    # Reduction u = P u_red + c: slave dof = master dof + (G·shift)_comp.
    master_of = np.arange(n)
    master_of[pairs.slaves] = pairs.masters
    # chains are length 1 (corners map directly to LL), no transitivity needed
    const = np.zeros((n, 2))
    const[pairs.slaves] = pairs.shifts @ G.T

    keep = np.ones(n, dtype=bool)
    keep[pairs.slaves] = False
    red_of = -np.ones(n, dtype=np.int64)
    red_of[keep] = np.arange(keep.sum())
    nr = int(keep.sum())

    # center node pinned (rigid translation), `generate_dataset.py:233`
    bbox_center = (points2d.min(0) + points2d.max(0)) / 2.0
    center_node = int(np.argmin(np.linalg.norm(points2d - bbox_center, axis=1)))
    center_red = red_of[master_of[center_node]]
    assert center_red >= 0

    rows, cols, vals = [], [], []
    c_full = np.zeros(2 * n)
    for comp in range(2):
        for node in range(n):
            dof = comp * n + node
            m = master_of[node]
            rows.append(dof)
            cols.append(comp * nr + red_of[m])
            vals.append(1.0)
            c_full[dof] = const[node, comp]
    P = sp.coo_matrix((vals, (rows, cols)), shape=(2 * n, 2 * nr)).tocsr()

    K_red = (P.T @ K @ P).tocsr()
    rhs = -P.T @ (K @ c_full)

    # pin the center node's two reduced dofs
    pinned = np.array([center_red, nr + center_red])
    free = np.setdiff1d(np.arange(2 * nr), pinned)
    K_ff = K_red[free][:, free]
    u_red = np.zeros(2 * nr)
    u_red[free] = spla.spsolve(K_ff.tocsc(), rhs[free])

    u_full = P @ u_red + c_full
    u = np.stack([u_full[:n], u_full[n:]], axis=1)

    # element strains/stresses
    grads, areas = triangle_geometry(points2d, tris)
    ue = u[tris]  # (F, 3, 2)
    dudx = np.einsum("fid,fig->fdg", ue, grads)  # (F, 2, 2) du_d/dx_g
    exx = dudx[:, 0, 0]
    eyy = dudx[:, 1, 1]
    gxy = dudx[:, 0, 1] + dudx[:, 1, 0]
    strain_e = np.stack([exx, eyy, gxy], axis=1)
    stress_e = strain_e @ D.T

    g2n = gausspoint_to_node_matrix(points2d, tris)
    stress_n = g2n @ stress_e
    strain_n = g2n @ strain_e

    # nodal-quadrature integrals (fedoo integrate_field over node fields)
    def integrate_nodal(f: np.ndarray) -> np.ndarray:
        elem_mean = f[tris].mean(axis=1)
        return np.einsum("f,f...->...", areas, elem_mean)

    box = points2d.max(0) - points2d.min(0)
    v_box = float(box[0] * box[1])
    v_mat = float(integrate_nodal(np.ones(n)))
    mean_stress = integrate_nodal(stress_n) / v_box
    mean_stress_mat = integrate_nodal(stress_n) / v_mat

    return FEMResult(
        displacement=u,
        stress_nodes=stress_n,
        strain_nodes=strain_n,
        stress_elems=stress_e,
        mean_stress=np.asarray(mean_stress),
        mean_stress_material=np.asarray(mean_stress_mat),
    )
