from dfgnn_tpu.utils.benchmark import Timer, benchmark, benchmark_chained, check_correct
