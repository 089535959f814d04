"""Hand-written Pallas TPU kernels (the role of DFGNN/src/*.cu)."""
