from dfgnn_tpu.data.synthetic import (
    constant_degree_graph,
    sbm_graph,
    pattern_like_batch,
    power_law_graph,
)
