"""Property-based tests (hypothesis) for the graph data layer: periodic
edge construction invariants on randomized rectangular grid meshes, and
pack/unpack round-trip invariants (reference behavior contracts,
`/root/reference/gnn_local_stress/datasets.py:39-119`,
`data_utils.py:25-43`)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from p_div_gnn_tpu.graphs import (
    compute_periodic_graph,
    mesh_to_graph,
    pack_batch,
)
from p_div_gnn_tpu.graphs.batching import GraphSample, unpack_predictions
from p_div_gnn_tpu.graphs.meshio import SurfaceMesh


def _grid_mesh(nx: int, ny: int, w: float, h: float, jitter_seed: int):
    """Rectangular triangulated grid mesh; interior nodes jittered so
    coordinates are irregular but the boundary stays exactly rectangular
    (the reference matches boundary nodes by exact bbox equality)."""
    xs, ys = np.meshgrid(
        np.linspace(0.0, w, nx + 1), np.linspace(0.0, h, ny + 1)
    )
    pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], axis=1)
    rng = np.random.default_rng(jitter_seed)
    interior = (
        (pts[:, 0] > 0) & (pts[:, 0] < w) & (pts[:, 1] > 0) & (pts[:, 1] < h)
    )
    pts[interior, :2] += rng.uniform(
        -0.2, 0.2, size=(interior.sum(), 2)
    ) * min(w / nx, h / ny)
    faces = []
    for j in range(ny):
        for i in range(nx):
            a = j * (nx + 1) + i
            faces.append([a, a + 1, a + nx + 2])
            faces.append([a, a + nx + 2, a + nx + 1])
    return SurfaceMesh(
        points=pts.astype(np.float64), faces=np.array(faces, np.int64)
    )


@settings(max_examples=20, deadline=None)
@given(
    nx=st.integers(2, 7),
    ny=st.integers(2, 7),
    w=st.floats(0.5, 100.0),
    h=st.floats(0.5, 100.0),
    seed=st.integers(0, 2**31 - 1),
)
def test_periodic_graph_invariants(nx, ny, w, h, seed):
    mesh = _grid_mesh(nx, ny, w, h, seed)
    g0 = mesh_to_graph(mesh)
    g = compute_periodic_graph(g0)
    pts = mesh.points[:, :2]

    # original mesh edges all survive augmentation
    orig = set(map(tuple, g0.edge_index.T.tolist()))
    aug = set(map(tuple, g.edge_index.T.tolist()))
    assert orig <= aug

    # no duplicate edges after coalescing
    assert len(aug) == g.num_edges

    # every added edge links exactly-opposite boundary nodes (same y for
    # left↔right, same x for lower↔upper) or two corners; weight 0
    new_edges = aug - orig
    eps = 1e-9
    on_x = lambda i: pts[i, 0] in (0.0, w)
    on_y = lambda i: pts[i, 1] in (0.0, h)
    is_corner = lambda i: on_x(i) and on_y(i)
    for s, r in new_edges:
        assert on_x(s) or on_y(s), (s, pts[s])
        assert on_x(r) or on_y(r), (r, pts[r])
        if is_corner(s) and is_corner(r):
            continue
        same_y = abs(pts[s, 1] - pts[r, 1]) < eps and on_x(s) and on_x(r)
        same_x = abs(pts[s, 0] - pts[r, 0]) < eps and on_y(s) and on_y(r)
        assert same_y or same_x, (pts[s], pts[r])

    # weights: periodic edges 0, original edges = node distance
    ei = g.edge_index
    for k in range(g.num_edges):
        e = (int(ei[0, k]), int(ei[1, k]))
        d = float(np.linalg.norm(mesh.points[e[0]] - mesh.points[e[1]]))
        if e in orig:
            np.testing.assert_allclose(g.edge_weight[k], d, rtol=1e-5)
        else:
            assert g.edge_weight[k] == 0.0

    # symmetry: augmented graph remains bidirectional
    assert all((r, s) in aug for s, r in aug)


@settings(max_examples=10, deadline=None)
@given(
    sizes=st.lists(st.integers(2, 5), min_size=1, max_size=4),
    seed=st.integers(0, 2**31 - 1),
)
def test_pack_unpack_round_trip(sizes, seed):
    rng = np.random.default_rng(seed)
    samples = []
    for i, nx in enumerate(sizes):
        mesh = _grid_mesh(nx, nx, 1.0, 1.0, seed + i)
        g = compute_periodic_graph(mesh_to_graph(mesh))
        n = g.num_nodes
        samples.append(
            GraphSample(
                graph=g,
                mean_stress=rng.normal(size=3).astype(np.float32),
                local_stress=rng.normal(size=(n, 3)).astype(np.float32),
                node_labels=np.zeros(n, np.int64),
                div_data=np.zeros(1, np.float32),
                div_row=np.zeros(1, np.int64),
                div_col=np.zeros(1, np.int64),
            )
        )
    batch = pack_batch(samples, n_graphs=len(samples))
    # fake per-node predictions = the packed local_stress; unpack must
    # return each graph's rows exactly, in sample order
    preds = unpack_predictions(batch, np.asarray(batch.local_stress))
    assert len(preds) == len(samples)
    for p, s in zip(preds, samples):
        np.testing.assert_array_equal(p, s.local_stress)
