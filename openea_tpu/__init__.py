"""openea_tpu — a TPU-native entity-alignment framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
nju-websoft/OpenEA (VLDB 2020): embedding-based entity alignment between two
knowledge graphs, with translational scorers (MTransE/AlignE/BootEA/...),
GNN aligners (GCN-Align/RDGCN/AliNet), a shared KG data layer, on-device
negative sampling, and on-device greedy/CSLS/stable alignment evaluation.

Unlike the reference (TF1 graph mode + multiprocessing batch queues + numpy
eval pools), every hot path here is a jit-compiled XLA program: a whole
training epoch is one `lax.scan`, negative sampling uses `jax.random` on
device, truncated-neighbor caches are blocked device top-k, and evaluation
is a blocked similarity + exact-rank kernel that never materializes an
argsort.  Multi-chip scaling uses `jax.sharding.Mesh` + collectives.
"""

__version__ = "0.1.0"
