"""TPU search kernels: dense top-k, BM25, fusion, quantization, IVF."""

from super_rag_tpu.ops.topk import blockwise_topk
from super_rag_tpu.ops.dense import dense_search, Metric
from super_rag_tpu.ops.quant import quantize_int8, dequantize_int8

__all__ = [
    "blockwise_topk",
    "dense_search",
    "Metric",
    "quantize_int8",
    "dequantize_int8",
]
