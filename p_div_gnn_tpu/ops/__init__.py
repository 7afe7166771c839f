from p_div_gnn_tpu.ops.layernorm import masked_graph_layernorm
from p_div_gnn_tpu.ops.segment import gather_nodes, segment_mean, segment_sum

__all__ = [
    "gather_nodes",
    "masked_graph_layernorm",
    "segment_mean",
    "segment_sum",
]
