"""Stub models mirroring the reference's shipped placeholders.

The reference ships two unimplemented classes: R-GCN
(models/neural/r-gcn.py:10-11 — literally `class R_GCN(BasicModel): pass`)
and Label2Vec (models/attr/label2vec.py:10-23 — a word-vector file loader
shell with no model).  They are kept here so the model inventory matches
1:1; instantiating them raises with a clear message instead of silently
training nothing.
"""

from __future__ import annotations

from openea_tpu.models.base import BasicModel


class R_GCN(BasicModel):
    """Unimplemented upstream (reference models/neural/r-gcn.py)."""

    def init(self):
        raise NotImplementedError(
            "R-GCN is an empty stub in the reference (r-gcn.py:10-11); "
            "use GCN_Align / AliNet / RDGCN for GNN-based alignment")


class Label2Vec(BasicModel):
    """Word-vector loader shell upstream (reference models/attr/label2vec.py);
    the functionality it gestures at lives in data/name_vectors.py."""

    def init(self):
        raise NotImplementedError(
            "Label2Vec is a loader stub in the reference; entity-name "
            "vectors are provided by openea_tpu.data.name_vectors")
