from dfgnn_tpu.parallel.dist import make_mesh, shard_dense_batch, replicate
