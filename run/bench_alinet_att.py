"""AliNet epoch timing on chip: Pallas dyn_csr_spmm attention vs XLA
segment-sum path, 15K-shaped synthetic data, preset dims [500,400,300]."""
import os, time, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_scratch")  # keep repo cache bench-only
import jax
import jax.numpy as jnp
from openea_tpu.config import Args
from openea_tpu.data.synthetic import synthesize_kg_pair
from openea_tpu.registry import get_model

mode = sys.argv[1] if len(sys.argv) > 1 else "pallas"
print("backend:", jax.default_backend(), "mode:", mode, flush=True)

kgs = synthesize_kg_pair(num_entities=15000, num_relations=250,
                         num_triples=50000, mode="mapping",
                         edge_keep_prob=0.9, noise_edge_frac=0.1,
                         train_frac=0.2, valid_frac=0.1, seed=42)
args = Args(dict(embedding_module="AliNet", alignment_module="mapping",
    init="xavier", layer_dims=[500, 400, 300], learning_rate=0.001,
    optimizer="Adam", neg_margin=1.5, neg_margin_balance=0.1,
    neg_triple_num=10, truncated_epsilon=0.98, truncated_freq=10,
    batch_size=3000, min_rel_win=15, rel_param=0.0, sim_th=0.0,
    start_augment=1000, k=25, csls=0, eval_metric="inner", seed=3,
    max_epoch=3, start_valid=10000, eval_freq=10000, top_k=[1],
    two_hop_max_pairs=20_000_000, is_save=False))
model = get_model("AliNet")()
model.set_args(args)
model.set_kgs(kgs)
t0 = time.time()
model.init()
print(f"init {time.time()-t0:.1f}s adj2 nnz={model.adj2.row.shape[0]:,} "
      f"metas={'yes' if model._att_metas is not None else 'no'}", flush=True)
if mode == "xla":
    model._att_metas = None
t0 = time.time()
model.run()
print(f"3-epoch run {time.time()-t0:.1f}s", flush=True)
