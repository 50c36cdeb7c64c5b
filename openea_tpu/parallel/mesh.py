"""Device mesh construction + sharding specs.

The scaling design (SURVEY.md §2.6 / §7.1 step 8): a 2-D mesh
('data', 'model').  Embedding tables are sharded row-wise over 'model'
(entity axis — the only axis that grows with KG size); triple batches are
sharded over 'data'.  XLA's SPMD partitioner turns table gathers from a
row-sharded table into local gathers + psum over 'model', and scatter-add
gradients stay shard-local, so the per-step collective volume is
O(batch*dim), riding ICI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def factor_mesh(n: int) -> Tuple[int, int]:
    """(data, model) factors: prefer model parallelism up to 4-wide."""
    for tp in (4, 2, 1):
        if n % tp == 0 and n >= tp:
            return n // tp, tp
    return n, 1


def make_mesh(n_devices: Optional[int] = None,
              axis_names=("data", "model")) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    dp, tp = factor_mesh(len(devs))
    return Mesh(np.asarray(devs).reshape(dp, tp), axis_names)


def param_shardings(mesh: Mesh, params: dict) -> dict:
    """Row-shard the big tables over 'model'; replicate small params."""
    out = {}
    for name, value in params.items():
        if value.ndim == 2 and name in ("ent_embeds", "rel_embeds"):
            out[name] = NamedSharding(mesh, P("model", None))
        else:
            out[name] = NamedSharding(mesh, P())
    return out


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
