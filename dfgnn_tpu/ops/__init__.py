"""Attention-aggregate operators.

``reference``   — unfused XLA oracle (segment ops); CPU-runnable; the
                  correctness bar every fused path is checked against
                  (role of the reference's DGL-sparse ``forward_dglsp``).
``bucket``      — degree-bucketed padded-CSR fused path for full graphs.
``dense_block`` — batched dense masked flash-attention for small graphs.
``pallas``      — hand-written TPU kernels behind the above.
"""

from dfgnn_tpu.ops.reference import (
    sddmm_dot,
    sddmm_add,
    edge_softmax,
    spmm,
    graph_attention_reference,
)
from dfgnn_tpu.ops.dispatch import graph_attention
