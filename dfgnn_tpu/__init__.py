"""dfgnn-tpu: a TPU-native graph-attention message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of DF-GNN
(zli96/DF-GNN, LOG 2024): fused SDDMM -> edge-softmax -> SpMM attention
convolutions (GT / GAT / AGNN / DotGAT) over sparse graphs, batched small
graphs, and super-node full graphs, plus multi-chip scaling over a TPU mesh.

Layer map (TPU-first; compare reference layer map in SURVEY.md section 1):

    scripts/               benchmark + training drivers (ref: DFGNN/script/*)
    dfgnn_tpu/models/      conv layers + model assembly   (ref: DFGNN/layers/*)
    dfgnn_tpu/formats.py   format registry / preprocessing (ref: layers/util.py)
    dfgnn_tpu/ops/         attention-aggregate operators:
        reference.py       unfused XLA oracle (ref: forward_dglsp paths)
        bucket.py          degree-bucketed padded-CSR path (ref: csr/softmax fmts)
        dense_block.py     batched dense masked flash-attention (ref: hyper fmt)
        pallas/            hand-written TPU kernels (ref: DFGNN/src/*.cu)
    dfgnn_tpu/parallel/    mesh partitioning + collectives (new scope; no ref)
    dfgnn_tpu/data/        datasets, synthetic generators, collation
    dfgnn_tpu/utils/       benchmarking, config, profiling (ref: DFGNN/utils)
"""

from dfgnn_tpu.graph import Graph, CSCAux, DenseBatch
from dfgnn_tpu import ops
from dfgnn_tpu import formats

__version__ = "0.1.0"
