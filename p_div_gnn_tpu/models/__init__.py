from p_div_gnn_tpu.models.blocks import (
    GraphLayerNorm,
    MLPBlock,
    TorchDense,
)
from p_div_gnn_tpu.models.epd import EncodeProcessDecode, Processor

__all__ = [
    "EncodeProcessDecode",
    "GraphLayerNorm",
    "MLPBlock",
    "Processor",
    "TorchDense",
]
