from openea_tpu.eval.evaluation import greedy_alignment, valid, test, early_stop
