"""Analysis metrics: golden formulas and the folder-evaluation pipeline
(no JAX needed — keeps this module fast)."""

import json

import numpy as np
import pytest
import pandas as pd

from p_div_gnn_tpu.analysis.compare import (
    build_div_matrix,
    divergence_norm_field,
    divergence_scalar,
    evaluate_model_folder,
    nmse,
    r2_score,
    topk_indices,
)
from p_div_gnn_tpu.graphs.labels import NodeType


def test_nmse_and_r2():
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(50, 3))
    pred = gt.copy()
    assert nmse(gt, pred) == 0.0
    assert r2_score(gt, pred) == 1.0
    pred2 = np.tile(gt.mean(axis=0), (50, 1))
    np.testing.assert_allclose(nmse(gt, pred2), 1.0)
    np.testing.assert_allclose(r2_score(gt, pred2), 0.0, atol=1e-12)


def test_divergence_scalar_and_field():
    rng = np.random.default_rng(1)
    n, nnz = 20, 80
    data = {
        "op_div_matrix_data": rng.normal(size=nnz),
        "op_div_matrix_row_indices": rng.integers(0, n, nnz),
        "op_div_matrix_col_indices": rng.integers(0, 2 * n, nnz),
        "op_div_matrix_shape": np.array([n, 2 * n]),
    }
    D = build_div_matrix(data)
    stress = rng.normal(size=(n, 3))
    labels = rng.choice([-1, 0, 1], size=n)
    scalar = divergence_scalar(stress, D, labels)
    # brute force
    Dd = D.toarray()
    S = np.stack(
        [
            np.concatenate([stress[:, 0], stress[:, 2]]),
            np.concatenate([stress[:, 2], stress[:, 1]]),
        ],
        axis=1,
    )
    div = Dd @ S
    div[labels != 0] = 0
    np.testing.assert_allclose(scalar, np.sum(np.mean(div**2, axis=0)))
    field = divergence_norm_field(stress, D, labels)
    div2 = Dd @ S
    div2[labels == NodeType.EXTERNAL_BOUNDARY] = 0
    np.testing.assert_allclose(field, np.linalg.norm(div2, axis=1))
    # field variant zeroes ONLY the external boundary
    internal_b = labels == NodeType.INTERNAL_BOUNDARY
    if internal_b.any():
        assert np.any(field[internal_b] != 0) or np.allclose(
            div2[internal_b], 0
        )


def test_topk():
    v = np.array([5.0, 1.0, 3.0, 2.0])
    np.testing.assert_array_equal(topk_indices(v, 2, largest=True), [0, 2])
    np.testing.assert_array_equal(topk_indices(v, 2, largest=False), [1, 3])


def test_evaluate_model_folder(tmp_path):
    rng = np.random.default_rng(2)
    gt_files, pred_files = [], []
    (tmp_path / "gt").mkdir()
    inf = tmp_path / "inf"
    (inf / "fields").mkdir(parents=True)
    for i in range(3):
        n, nnz = 15 + i, 60
        gt = rng.normal(size=(n, 3))
        payload = dict(
            stress_field=gt,
            node_labels=rng.choice([-1, 0, 1], size=n),
            op_div_matrix_data=rng.normal(size=nnz),
            op_div_matrix_row_indices=rng.integers(0, n, nnz),
            op_div_matrix_col_indices=rng.integers(0, 2 * n, nnz),
            op_div_matrix_shape=np.array([n, 2 * n]),
        )
        g = tmp_path / "gt" / f"s{i}.npz"
        np.savez(g, **payload)
        gt_files.append(str(g))
        payload["stress_field"] = gt * 0.9
        p = inf / "fields" / f"s{i}.npz"
        np.savez(p, **payload)
        pred_files.append(str(p))
    gt_df = pd.DataFrame({"data_filename": gt_files})
    pd.DataFrame({"data_filename": pred_files}).to_csv(
        inf / "dataset.csv", index=False
    )
    (inf / "normalize_params.json").write_text(
        json.dumps({"mean_local_stress": 0.1, "std_local_stress": 2.0})
    )
    metrics = evaluate_model_folder(gt_df, inf)
    assert len(metrics) == 3
    assert (metrics["nmse"] > 0).all() and (metrics["r2"] < 1).all()
    assert np.isfinite(metrics).all().all()


@pytest.mark.slow
def test_render_cross_model_figures(tmp_path):
    """Figure fan-out runs end-to-end on two synthetic inference folders
    with DIFFERENT normalize_params (pins the per-model standardization:
    each model's divergence/distribution panels use its own params)."""
    from p_div_gnn_tpu.analysis.compare import render_cross_model_figures
    from p_div_gnn_tpu.graphs.meshio import write_vtk
    from toy_meshes import grid_mesh

    rng = np.random.default_rng(3)
    gt_mesh_files, gt_files = [], []
    (tmp_path / "gt").mkdir()
    folders = {}
    names = ("Base", "DivProp")  # "Div" in proposed triggers best_divergence
    for name, norm in zip(names, (1.5, 3.0)):
        inf = tmp_path / name / "fields"
        inf.mkdir(parents=True)
        folders[name] = tmp_path / name
        (tmp_path / name / "normalize_params.json").write_text(
            json.dumps({"mean_local_stress": 0.0, "std_local_stress": norm})
        )
    pred_files = {n: [] for n in names}
    for i in range(4):
        mesh = grid_mesh(4 + i, 4)
        n = mesh.points.shape[0]
        mf = tmp_path / "gt" / f"m{i}.vtk"
        write_vtk(mf, mesh)
        gt_mesh_files.append(str(mf))
        nnz = 4 * n
        gt = rng.normal(size=(n, 3))
        payload = dict(
            stress_field=gt,
            node_labels=rng.choice([-1, 0, 1], size=n),
            op_div_matrix_data=rng.normal(size=nnz),
            op_div_matrix_row_indices=rng.integers(0, n, nnz),
            op_div_matrix_col_indices=rng.integers(0, 2 * n, nnz),
            op_div_matrix_shape=np.array([n, 2 * n]),
        )
        g = tmp_path / "gt" / f"s{i}.npz"
        np.savez(g, **payload)
        gt_files.append(str(g))
        for k, name in enumerate(names):
            payload["stress_field"] = gt * (0.8 + 0.1 * k) + 0.05 * i
            p = tmp_path / name / "fields" / f"s{i}.npz"
            np.savez(p, **payload)
            pred_files[name].append(str(p))
    gt_df = pd.DataFrame(
        {"mesh_filename": gt_mesh_files, "data_filename": gt_files}
    )
    results = {}
    for name in names:
        pd.DataFrame({"data_filename": pred_files[name]}).to_csv(
            folders[name] / "dataset.csv", index=False
        )
        results[name] = evaluate_model_folder(gt_df, folders[name])
    figs = tmp_path / "figs"
    index = render_cross_model_figures(
        gt_df, results, folders, "Base", "DivProp", figs, topk=2,
        figures_per_kind=1,
    )
    assert set(index) >= {
        "worst_k_predictions", "best_k_predictions", "highest_k_differences",
        "best_divergence",
    }
    assert (figs / "cross_model_topk.json").exists()
    for kind, idxs in index.items():
        if not idxs:
            continue
        for sub in ("stress_fields", "nmse", "divergence_fields"):
            assert list((figs / kind / sub).glob("*.pdf")), (kind, sub)
        assert len(list((figs / kind / "distributions").glob("*.pdf"))) == 6
