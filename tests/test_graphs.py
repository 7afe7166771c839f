"""Graph-layer unit tests: mesh I/O, face→edge, periodic edges, labels,
padded batching. Models the reference's round-trip test strategy
(`/root/reference/test/test_graph_utils.py`) and extends it per SURVEY §4."""

import numpy as np
import pytest

from p_div_gnn_tpu.graphs import (
    NodeType,
    compute_node_labels,
    compute_periodic_graph,
    faces_to_edge_index,
    graph_to_mesh,
    mesh_to_graph,
    pack_batch,
    read_vtk,
    unpack_predictions,
    write_vtk,
)
from p_div_gnn_tpu.graphs.batching import GraphSample

from toy_meshes import grid_mesh, grid_mesh_with_hole, hole_corner_nodes


# ---------------------------------------------------------------- VTK I/O
@pytest.mark.parametrize("binary", [True, False])
def test_vtk_roundtrip(tmp_path, binary):
    mesh = grid_mesh(3, 3)
    path = tmp_path / "m.vtk"
    write_vtk(path, mesh, binary=binary)
    back = read_vtk(path)
    np.testing.assert_allclose(back.points, mesh.points)
    np.testing.assert_array_equal(back.faces, mesh.faces)


def test_vtk_51_offsets_layout(tmp_path):
    # VTK >= 5.1 writes OFFSETS/CONNECTIVITY sub-arrays; pyvista meshes from
    # the reference generator use this layout.
    mesh = grid_mesh(2, 2)
    path = tmp_path / "m51.vtk"
    conn = mesh.faces.ravel()
    offsets = np.arange(0, conn.size + 1, 3)
    with open(path, "wb") as fh:
        fh.write(b"# vtk DataFile Version 5.1\nmesh\nBINARY\nDATASET POLYDATA\n")
        fh.write(f"POINTS {mesh.n_points} float\n".encode())
        fh.write(mesh.points.astype(">f4").tobytes() + b"\n")
        fh.write(f"POLYGONS {offsets.size} {conn.size}\n".encode())
        fh.write(b"OFFSETS vtktypeint64\n")
        fh.write(offsets.astype(">i8").tobytes() + b"\n")
        fh.write(b"CONNECTIVITY vtktypeint64\n")
        fh.write(conn.astype(">i8").tobytes() + b"\n")
    back = read_vtk(path)
    np.testing.assert_allclose(back.points, mesh.points, atol=1e-6)
    np.testing.assert_array_equal(back.faces, mesh.faces)


# ------------------------------------------------------------- mesh→graph
def test_faces_to_edge_index_matches_bruteforce():
    mesh = grid_mesh(4, 3)
    ei = faces_to_edge_index(mesh.faces, mesh.n_points)
    expected = set()
    for f in mesh.faces:
        for a, b in [(f[0], f[1]), (f[1], f[2]), (f[2], f[0])]:
            expected.add((int(a), int(b)))
            expected.add((int(b), int(a)))
    got = set(zip(ei[0].tolist(), ei[1].tolist()))
    assert got == expected
    # canonical (sender, receiver) lexicographic order
    keys = ei[0] * mesh.n_points + ei[1]
    assert np.all(np.diff(keys) > 0)


def test_mesh_graph_roundtrip():
    mesh = grid_mesh(3, 4)
    graph = mesh_to_graph(mesh)
    assert graph.num_nodes == mesh.n_points
    back = graph_to_mesh(graph)
    np.testing.assert_allclose(back.points, mesh.points)
    np.testing.assert_array_equal(back.faces, mesh.faces)
    # edge weights are symmetric distances
    d = np.linalg.norm(
        mesh.points[graph.edge_index[0]] - mesh.points[graph.edge_index[1]], axis=1
    )
    np.testing.assert_allclose(graph.edge_weight, d.astype(np.float32))


# ---------------------------------------------------------- periodic edges
def test_periodic_graph_structure():
    nx = ny = 4
    mesh = grid_mesh(nx, ny)
    g = mesh_to_graph(mesh)
    pg = compute_periodic_graph(g)
    assert pg.is_periodic and pg.org_num_edges == g.num_edges

    # Expected new links: left/right pairs both directions, lower/upper
    # pairs both directions, plus crossed corner links.
    n_side = ny + 1
    expected_new = 2 * n_side + 2 * (nx + 1) + 4  # per direction sets summed
    assert pg.num_edges == g.num_edges + expected_new

    # All original edges kept with original weights.
    org = {
        (int(a), int(b)): w
        for a, b, w in zip(g.edge_index[0], g.edge_index[1], g.edge_weight)
    }
    new = {
        (int(a), int(b)): w
        for a, b, w in zip(pg.edge_index[0], pg.edge_index[1], pg.edge_weight)
    }
    for k, w in org.items():
        assert new[k] == pytest.approx(w)
    # Periodic edges have zero weight and connect opposite sides.
    pts = mesh.points[:, :2]
    for (a, b), w in new.items():
        if (a, b) not in org:
            assert w == 0.0
            pa, pb = pts[a], pts[b]
            on_bound = lambda p: (
                p[0] in (0.0, 1.0) or p[1] in (0.0, 1.0)
            )
            assert on_bound(pa) and on_bound(pb)
    # i-th left node pairs with i-th right node at same y.
    left = np.where(pts[:, 0] == 0.0)[0]
    for a in left:
        partners = [b for (x, b) in new if x == a and (a, b) not in org]
        ys = {round(float(pts[b][1] - pts[a][1]), 9) for b in partners
              if pts[b][0] == 1.0 and pts[a][1] not in (0.0, 1.0)}
        if pts[a][1] not in (0.0, 1.0):  # non-corner: unique same-y partner
            assert ys == {0.0}


# ----------------------------------------------------------------- labels
def test_node_labels_hole_plate():
    nx = ny = 6
    mesh = grid_mesh_with_hole(nx, ny, hole_cell=(2, 2))
    labels = compute_node_labels(mesh)
    hole_nodes = hole_corner_nodes(nx, ny, (2, 2))
    np.testing.assert_array_equal(
        np.sort(np.where(labels == NodeType.INTERNAL_BOUNDARY)[0]), hole_nodes
    )
    pts = mesh.points[:, :2]
    outer = (
        (pts[:, 0] == 0.0)
        | (pts[:, 0] == 1.0)
        | (pts[:, 1] == 0.0)
        | (pts[:, 1] == 1.0)
    )
    np.testing.assert_array_equal(labels == NodeType.EXTERNAL_BOUNDARY, outer)
    assert np.all(labels[~outer & ~np.isin(np.arange(len(pts)), hole_nodes)] == 0)


def test_node_labels_requires_two_regions():
    mesh = grid_mesh(3, 3)  # no hole → 1 region
    with pytest.raises(AssertionError):
        compute_node_labels(mesh)


# --------------------------------------------------------------- batching
def _toy_sample(seed: int, periodic: bool = True) -> GraphSample:
    rng = np.random.default_rng(seed)
    nx = int(rng.integers(3, 6))
    mesh = grid_mesh_with_hole(nx + 1, nx + 1, hole_cell=(1, 1))
    g = mesh_to_graph(mesh)
    if periodic:
        g = compute_periodic_graph(g)
    n = g.num_nodes
    labels = compute_node_labels(mesh)
    nnz = 3 * n
    return GraphSample(
        graph=g,
        mean_stress=rng.normal(size=3).astype(np.float32),
        local_stress=rng.normal(size=(n, 3)).astype(np.float32),
        node_labels=labels,
        div_data=rng.normal(size=nnz).astype(np.float32),
        div_row=rng.integers(0, n, size=nnz),
        div_col=rng.integers(0, 2 * n, size=nnz),
        mesh_id=seed,
    )


def test_pack_batch_shapes_and_masks():
    samples = [_toy_sample(s) for s in range(3)]
    batch = pack_batch(samples, n_graphs=4)
    Np = batch.num_nodes_padded
    assert Np % 128 == 0 and Np > sum(s.num_nodes for s in samples)
    nm = np.asarray(batch.node_mask)
    assert nm.sum() == sum(s.num_nodes for s in samples)
    em = np.asarray(batch.edge_mask)
    assert em.sum() == sum(s.num_edges for s in samples)
    # padding edges send from the padding node (messages masked to zero)
    pad_e = ~em
    assert np.all(np.asarray(batch.senders)[pad_e] == Np - 1)
    # edges sorted by receiver; tile_ptr consistent and EDGE_BLOCK-aligned
    rcv = np.asarray(batch.receivers)
    assert np.all(np.diff(rcv) >= 0)
    tp = np.asarray(batch.tile_ptr)
    from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK
    assert np.all(tp % EDGE_BLOCK == 0)
    for t in range(len(tp) - 1):
        seg = rcv[tp[t] : tp[t + 1]]
        assert np.all(
            (seg >= t * batch.tile) & (seg < (t + 1) * batch.tile)
        )
        assert (tp[t + 1] - tp[t]) >= EDGE_BLOCK  # every tile covered
    # block→tile map consistent with tile_ptr
    bt = np.asarray(batch.edge_block_tile)
    assert len(bt) == batch.num_edges_padded // EDGE_BLOCK
    for b, t in enumerate(bt):
        assert tp[t] <= b * EDGE_BLOCK < tp[t + 1]
    # graph ids contiguous
    gid = np.asarray(batch.node_gid)
    counts = np.asarray(batch.graph_node_count)
    off = 0
    for g, s in enumerate(samples):
        assert counts[g] == s.num_nodes
        assert np.all(gid[off : off + s.num_nodes] == g)
        off += s.num_nodes
    assert counts[3] == 0  # padding graph slot


def test_unpack_roundtrip():
    samples = [_toy_sample(s) for s in range(2)]
    batch = pack_batch(samples, n_graphs=2)
    preds = unpack_predictions(batch, np.asarray(batch.local_stress))
    assert len(preds) == 2
    for p, s in zip(preds, samples):
        np.testing.assert_allclose(p, s.local_stress)


def test_div_entries_remapped():
    s = _toy_sample(0)
    batch = pack_batch([s], n_graphs=1)
    k = s.num_div_entries
    n = s.num_nodes
    np.testing.assert_array_equal(np.asarray(batch.div_row)[:k], s.div_row)
    np.testing.assert_array_equal(
        np.asarray(batch.div_col_node)[:k], s.div_col % n
    )
    np.testing.assert_array_equal(
        np.asarray(batch.div_col_is_y)[:k], s.div_col // n
    )
    assert np.all(np.asarray(batch.div_data)[k:] == 0)


def test_rcm_reorder_equivalence():
    """pack_batch(reorder='rcm') is semantically a no-op: the model is
    permutation-equivariant over nodes, so the loss and the UNPACKED
    predictions must match the identity-order pack (up to float reduction
    order)."""
    import jax

    from p_div_gnn_tpu.graphs.container import NormStats
    from p_div_gnn_tpu.models import EncodeProcessDecode

    samples = [_toy_sample(s) for s in range(2)]
    plain = pack_batch(samples, n_graphs=2)
    rcm = pack_batch(samples, n_graphs=2, reorder="rcm")

    # unpack inverts the reordering exactly (targets travel with the nodes)
    for a, b in zip(
        unpack_predictions(plain, np.asarray(plain.local_stress)),
        unpack_predictions(rcm, np.asarray(rcm.local_stress)),
    ):
        np.testing.assert_array_equal(a, b)

    model = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    stats = NormStats.ones()
    params = model.init(jax.random.PRNGKey(0), plain, stats)
    out_plain = unpack_predictions(
        plain, np.asarray(model.apply(params, plain, stats))
    )
    out_rcm = unpack_predictions(
        rcm, np.asarray(model.apply(params, rcm, stats))
    )
    for a, b in zip(out_plain, out_rcm):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

    # the reordering actually tightened locality: senders of every real
    # edge stay within +-2 tiles of their receivers on a mesh this small
    em = np.asarray(rcm.edge_mask)
    rt = np.asarray(rcm.receivers)[em] // 128
    st = np.asarray(rcm.senders)[em] // 128
    assert np.abs(rt - st).max() <= 2
