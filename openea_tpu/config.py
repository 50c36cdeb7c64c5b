"""Configuration system.

JSON-preset-compatible attribute bag: the reference's 64 presets under
``run/args/*.json`` (see /root/reference/run/args/) load unchanged.  The
reference implements this as a bare attribute object with zero validation
(modules/args/args_hander.py:4-21); we add typed defaults and unknown-key
passthrough so presets from either project work.
"""

from __future__ import annotations

import copy
import json
from typing import Any, Dict, List, Optional


# Defaults cover every key used by the shipped presets; per-model asserts
# (reference style, e.g. approaches/aligne.py:21-38) live in each model's
# ``check_args``.
_DEFAULTS: Dict[str, Any] = {
    "training_data": "data/",
    "output": "output/results/",
    "dataset_division": "721_5fold/1/",
    "embedding_module": "MTransE",
    "alignment_module": "mapping",       # sharing | mapping | swapping
    "search_module": "greedy",
    "dim": 100,
    "init": "unit",                      # xavier | normal | uniform | unit
    "ent_l2_norm": True,
    "rel_l2_norm": True,
    "loss": "margin-based",              # margin-based | logistic | limited
    "loss_norm": "L2",
    "learning_rate": 0.01,
    "optimizer": "Adagrad",              # Adagrad | Adadelta | Adam | SGD
    "max_epoch": 1000,
    "batch_size": 5000,
    "margin": 1.5,
    "pos_margin": 0.01,
    "neg_margin": 2.0,
    "neg_margin_balance": 0.2,
    "alpha": 5,
    "beta": 0.9,
    "neg_sampling": "uniform",           # uniform | truncated
    "neg_triple_num": 1,
    "truncated_epsilon": 0.9,
    "truncated_freq": 10,
    "batch_threads_num": 2,              # accepted for preset compat; unused
    "test_threads_num": 4,               # accepted for preset compat; unused
    "ordered": True,
    "start_valid": 100,
    "eval_freq": 10,
    "stop_metric": "hits1",              # hits1 | mrr
    "eval_metric": "inner",              # inner | cosine | euclidean | manhattan
    "eval_norm": False,
    "csls": 10,
    "top_k": [1, 5, 10, 50],
    "is_save": True,
    # BootEA / bootstrapping family
    "sim_th": 0.7,
    "k": 10,
    "likelihood_slice": 10,
    "sub_epoch": 10,
    # GNN family (GCN-Align / RDGCN / AliNet)
    "num_layers": 2,
    "hidden_dim": 300,
    "dropout": 0.0,
    "gamma": 1.0,
    "neg_alignment_num": 25,
    # runtime
    "seed": 0,
    "compute_dtype": "float32",          # float32 | bfloat16 (sim/topk blocks)
    "eval_block_size": 4096,             # row-block for blocked sim/rank
}


class Args:
    """Attribute-style config with defaults + unknown-key passthrough."""

    def __init__(self, values: Optional[Dict[str, Any]] = None, **kw: Any):
        self._values: Dict[str, Any] = copy.deepcopy(_DEFAULTS)
        if values:
            self._values.update(values)
        self._values.update(kw)

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            return self._values[name]
        except KeyError as e:
            raise AttributeError(f"config key {name!r} not set") from e

    def __setattr__(self, name: str, value: Any) -> None:
        if name.startswith("_"):
            object.__setattr__(self, name, value)
        else:
            self._values[name] = value

    def __contains__(self, name: str) -> bool:
        return name in self._values

    def get(self, name: str, default: Any = None) -> Any:
        return self._values.get(name, default)

    def to_dict(self) -> Dict[str, Any]:
        return dict(self._values)

    def __repr__(self) -> str:  # pragma: no cover
        keys = ", ".join(sorted(self._values))
        return f"Args({keys})"


def load_args(path: str, **overrides: Any) -> Args:
    """Load a JSON preset (reference format, modules/args/args_hander.py:4)."""
    with open(path, "r", encoding="utf8") as f:
        values = json.load(f)
    values.update(overrides)
    return Args(values)


def check_args(args: Args, required: List[str]) -> None:
    missing = [k for k in required if k not in args]
    if missing:
        raise ValueError(f"missing required config keys: {missing}")
