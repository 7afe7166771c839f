from p_div_gnn_tpu.analysis.compare import (
    divergence_norm_field,
    divergence_scalar,
    evaluate_model_folder,
    nmse,
    r2_score,
    topk_indices,
)

__all__ = [
    "divergence_norm_field",
    "divergence_scalar",
    "evaluate_model_folder",
    "nmse",
    "r2_score",
    "topk_indices",
]
