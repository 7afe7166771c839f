from p_div_gnn_tpu.train.checkpoint import (
    BEST_CHECKPOINT,
    LAST_CHECKPOINT,
    load_checkpoint,
    save_checkpoint,
)
from p_div_gnn_tpu.train.data import GraphLoader
from p_div_gnn_tpu.train.logging import MetricsWriter
from p_div_gnn_tpu.train.loop import Trainer
from p_div_gnn_tpu.train.runner import run_experience

__all__ = [
    "BEST_CHECKPOINT",
    "LAST_CHECKPOINT",
    "GraphLoader",
    "MetricsWriter",
    "Trainer",
    "load_checkpoint",
    "run_experience",
    "save_checkpoint",
]
