"""Model registry (reference run/main_from_args.py:38-76 ModelFamily).

Models are registered lazily so importing the registry doesn't pull every
model module (and its compile-time deps).
"""

from __future__ import annotations

import importlib
from typing import Dict, Tuple

# name -> (module, class)
_REGISTRY: Dict[str, Tuple[str, str]] = {
    "BasicModel": ("openea_tpu.models.base", "BasicModel"),
    "MTransE": ("openea_tpu.models.mtranse", "MTransE"),
    "AlignE": ("openea_tpu.models.aligne", "AlignE"),
    "BootEA": ("openea_tpu.models.bootea", "BootEA"),
    # KGE model zoo (reference src/openea/models/)
    "TransE": ("openea_tpu.models.trans", "TransE"),
    "TransH": ("openea_tpu.models.trans", "TransH"),
    "TransR": ("openea_tpu.models.trans", "TransR"),
    "TransD": ("openea_tpu.models.trans", "TransD"),
    "DistMult": ("openea_tpu.models.semantic", "DistMult"),
    "HolE": ("openea_tpu.models.semantic", "HolE"),
    "SimplE": ("openea_tpu.models.semantic", "SimplE"),
    "RotatE": ("openea_tpu.models.semantic", "RotatE"),
    "ProjE": ("openea_tpu.models.neural", "ProjE"),
    "ConvE": ("openea_tpu.models.neural", "ConvE"),
    # GNN family
    "GCN_Align": ("openea_tpu.models.gcn_align", "GCN_Align"),
    # further EA approaches
    "SEA": ("openea_tpu.models.sea", "SEA"),
    "IPTransE": ("openea_tpu.models.iptranse", "IPTransE"),
    "BootEA_TransH": ("openea_tpu.models.bootea_variants", "BootEA_TransH"),
    "BootEA_RotatE": ("openea_tpu.models.bootea_variants", "BootEA_RotatE"),
    # attribute-enhanced approaches
    "JAPE": ("openea_tpu.models.jape", "JAPE"),
    "Attr2Vec": ("openea_tpu.models.attr2vec", "Attr2Vec"),
    "AttrE": ("openea_tpu.models.attre", "AttrE"),
    "IMUSE": ("openea_tpu.models.imuse", "IMUSE"),
    "AliNet": ("openea_tpu.models.alinet", "AliNet"),
    "RDGCN": ("openea_tpu.models.rdgcn", "RDGCN"),
    "RSN4EA": ("openea_tpu.models.rsn4ea", "RSN4EA"),
    "KDCoE": ("openea_tpu.models.kdcoe", "KDCoE"),
    "KDCoE_wo_desc": ("openea_tpu.models.kdcoe", "KDCoE_wo_desc"),
    "MultiKE": ("openea_tpu.models.multi_ke", "MultiKE"),
    "GMNN": ("openea_tpu.models.gmnn", "GMNN"),
    "MTransEV2": ("openea_tpu.dbp2.mtranse_v2", "MTransEV2"),
    # reference stubs, kept for 1:1 inventory parity
    "R_GCN": ("openea_tpu.models.stubs", "R_GCN"),
    "Label2Vec": ("openea_tpu.models.stubs", "Label2Vec"),
}


def register(name: str, module: str, cls: str) -> None:
    _REGISTRY[name] = (module, cls)


def get_model(name: str):
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {sorted(_REGISTRY)}")
    module, cls = _REGISTRY[name]
    return getattr(importlib.import_module(module), cls)


def available_models():
    return sorted(_REGISTRY)
