from dfgnn_tpu.models.conv import GTConv, GATConv, AGNNConv, DotGATConv, make_conv
from dfgnn_tpu.models.model import (
    Model,
    GTModel,
    FullGraphNet,
    GATNet,
    choose_inproj,
    graph_pool,
)
