"""Native (C++) graph builder vs numpy reference parity (no JAX)."""

import numpy as np
import pytest

from p_div_gnn_tpu.graphs import native
from toy_meshes import grid_mesh, grid_mesh_with_hole


requires_native = pytest.mark.skipif(
    not native.available(), reason="g++ toolchain unavailable"
)


def _numpy_edges(faces, n):
    expected = set()
    k = faces.shape[1]
    for f in faces:
        for i in range(k):
            a, b = int(f[i]), int(f[(i + 1) % k])
            expected.add((a, b))
            expected.add((b, a))
    return expected


@requires_native
def test_native_faces_to_edges_matches():
    mesh = grid_mesh_with_hole(6, 6)
    ei = native.faces_to_edge_index(mesh.faces, mesh.n_points)
    got = set(zip(ei[0].tolist(), ei[1].tolist()))
    assert got == _numpy_edges(mesh.faces, mesh.n_points)
    keys = ei[0] * mesh.n_points + ei[1]
    assert np.all(np.diff(keys) > 0)  # canonical coalesced order


@requires_native
def test_native_labels_match_numpy():
    import os

    from p_div_gnn_tpu.graphs.labels import compute_node_labels

    mesh = grid_mesh_with_hole(7, 7, hole_cell=(3, 3))
    fast = native.compute_node_labels(mesh.faces, mesh.points[:, :2])
    os.environ["PDG_NO_NATIVE"] = "1"
    try:
        # force a fresh fallback path via module-level state reset
        native._TRIED, native._LIB = True, None
        slow = compute_node_labels(mesh)
    finally:
        del os.environ["PDG_NO_NATIVE"]
        native._TRIED = False
    np.testing.assert_array_equal(fast, slow)


@requires_native
def test_native_periodic_pairs_match_numpy():
    from p_div_gnn_tpu.graphs.periodic import periodic_boundary_pairs

    mesh = grid_mesh(5, 5)
    pts = mesh.points[:, :2]
    snd_f, rcv_f = native.periodic_pairs(pts)
    native._TRIED, native._LIB = True, None
    try:
        snd_n, rcv_n = periodic_boundary_pairs(pts)
    finally:
        native._TRIED = False
    np.testing.assert_array_equal(snd_f, snd_n)
    np.testing.assert_array_equal(rcv_f, rcv_n)


@requires_native
def test_native_label_assert_on_one_region():
    mesh = grid_mesh(4, 4)
    with pytest.raises(AssertionError):
        native.compute_node_labels(mesh.faces, mesh.points[:, :2])
