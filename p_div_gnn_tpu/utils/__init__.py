from p_div_gnn_tpu.utils.precision import matmul_precision

__all__ = ["matmul_precision"]
