"""Dependency-free RDF/XML parsing for the ontology-matching lab.

The reference lab parses ``onto.rdf`` with rdflib and ``refalign.rdf``
with xml.dom.minidom (tutorial/ontology_matching/src/data_input.py:1-27,
test/test.py:6-21).  rdflib is not in this image, so both parsers here
are stdlib-only (minidom handles the OAEI files' internal DTD entities);
behavior matches the reference on the OAEI benchmark datasets: same
class/attribute/relation URI sets, same labels, same alignment tuples.
"""

from __future__ import annotations

import xml.dom.minidom as minidom
from typing import Dict, List, Optional, Tuple

_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_RDFS = "http://www.w3.org/2000/01/rdf-schema#"
_OWL = "http://www.w3.org/2002/07/owl#"


def parse_alignment(align_file: str) -> List[Tuple[str, str, str, str]]:
    """refalign.rdf -> [(entity1, entity2, measure, relation)] — same
    output as the reference's align_parser (test/test.py:6-21)."""
    dom = minidom.parse(align_file)
    pairs = []
    for item in dom.getElementsByTagName("map"):
        e1 = item.getElementsByTagName("entity1")[0].getAttribute(
            "rdf:resource")
        e2 = item.getElementsByTagName("entity2")[0].getAttribute(
            "rdf:resource")
        measure = item.getElementsByTagName("measure")[0].firstChild.data
        relation = item.getElementsByTagName("relation")[0].firstChild.data
        pairs.append((e1, e2, measure, relation))
    return pairs


def _local(el) -> Tuple[Optional[str], str]:
    """(namespace URI, local tag) of an element, resolving prefixes via
    the in-scope xmlns declarations (minidom level-2 namespaces)."""
    return el.namespaceURI, el.localName


def _subject_uri(el, base: str) -> Optional[str]:
    about = (el.getAttributeNS(_RDF, "about")
             or el.getAttribute("rdf:about"))
    if about == "" and not (el.hasAttributeNS(_RDF, "about")
                            or el.hasAttribute("rdf:about")):
        rid = (el.getAttributeNS(_RDF, "ID")
               or el.getAttribute("rdf:ID"))
        if not rid:
            return None
        return base + "#" + rid
    if about.startswith("#"):
        return base + about
    if about == "":
        return base
    return about


class RdfParser:
    """Parse an OWL ontology file: class / datatype-property /
    object-property URIs within ``namespace``, plus their rdfs:labels
    (reference data_input.py:4-27).

    Subjects are recognized both as typed elements (``<owl:Class
    rdf:about=...>``) and as ``rdf:Description`` nodes carrying an
    ``rdf:type`` arc — the two spellings rdflib unifies."""

    _WANT = {(_OWL, "Class"): "class",
             (_OWL, "DatatypeProperty"): "attribute",
             (_OWL, "ObjectProperty"): "relation"}

    def __init__(self, rdf_file: str, namespace: str,
                 verbose: bool = True):
        dom = minidom.parse(rdf_file)
        root = dom.documentElement
        base = (root.getAttribute("xml:base") or "").rstrip("#")
        uris: Dict[str, List[str]] = {"class": [], "attribute": [],
                                      "relation": []}
        labels: Dict[str, Optional[str]] = {}

        def label_of(el) -> Optional[str]:
            for ch in el.childNodes:
                if ch.nodeType == ch.ELEMENT_NODE and \
                        _local(ch) == (_RDFS, "label"):
                    return ch.firstChild.data if ch.firstChild else ""
            return None

        def visit(el):
            kind = self._WANT.get(_local(el))
            if kind is None and _local(el) == (_RDF, "Description"):
                for ch in el.childNodes:
                    if ch.nodeType == ch.ELEMENT_NODE and \
                            _local(ch) == (_RDF, "type"):
                        res = (ch.getAttributeNS(_RDF, "resource")
                               or ch.getAttribute("rdf:resource"))
                        for (ns, tag), k in self._WANT.items():
                            if res == ns + tag:
                                kind = k
            if kind is not None:
                uri = _subject_uri(el, base)
                if uri is not None and namespace in uri \
                        and uri not in labels:
                    uris[kind].append(uri)
                    labels[uri] = label_of(el)
            for ch in el.childNodes:
                if ch.nodeType == ch.ELEMENT_NODE:
                    visit(ch)

        visit(root)
        self.class_uris = uris["class"]
        self.attribute_uris = uris["attribute"]
        self.relation_uris = uris["relation"]
        self.class_labels = [labels[u] for u in self.class_uris]
        self.attribute_labels = [labels[u] for u in self.attribute_uris]
        self.relation_labels = [labels[u] for u in self.relation_uris]
        if verbose:
            print("----------- {} -----------".format(rdf_file))
            print("The number of classes is {}.".format(
                len(self.class_uris)))
            print("The number of attributes is {}.".format(
                len(self.attribute_uris)))
            print("The number of relationships is {}.".format(
                len(self.relation_uris)))

    def names(self) -> Dict[str, str]:
        """uri -> matchable name (label if present, else the URI local
        part) across classes + attributes + relations — the input shape
        labs.match_by_name_similarity expects."""
        out = {}
        for uri, label in zip(
                self.class_uris + self.attribute_uris + self.relation_uris,
                self.class_labels + self.attribute_labels
                + self.relation_labels):
            name = label or uri.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
            out[uri] = name
        return out


def match_ontologies(onto1: str, ns1: str, onto2: str, ns2: str,
                     threshold: float = 0.9
                     ) -> List[Tuple[str, str, str, str]]:
    """End-to-end lab pipeline: parse both ontologies, match by name
    similarity, and emit (uri1, uri2, measure, '=') rows in the
    refalign.rdf tuple format the grader consumes."""
    from openea_tpu.tutorial.labs import match_by_name_similarity
    p1 = RdfParser(onto1, ns1)
    p2 = RdfParser(onto2, ns2)
    matches = match_by_name_similarity(p1.names(), p2.names(), threshold)
    return [(u1, u2, "%.1f" % s, "=") for u1, u2, s in matches]


# Namespaces of the OAEI benchmark ontologies, as hard-coded in the
# reference lab driver (tutorial/ontology_matching/src/main.py:8-12).
OAEI_SRC_NS = "http://oaei.ontologymatching.org/2007/benchmarks/101/onto.rdf#"
OAEI_TARGET_NS = {
    "301": "http://oaei.ontologymatching.org/2007/benchmarks/301/onto.rdf#",
    "302": "http://ebiquity.umbc.edu/v2.1/ontology/publication.owl#",
    "303": "http://www.aifb.uni-karlsruhe.de/ontology#",
    "304": "http://oaei.ontologymatching.org/2007/benchmarks/304/onto.rdf#",
}


def run_oaei_benchmark(data_dir: str, threshold: float = 0.9,
                       datasets=("301", "302", "303", "304"),
                       verbose: bool = True):
    """End-to-end reference-lab pipeline on the real OAEI benchmark dirs
    (main.py:20-35 + demo.py baseline + test.py grader): parse 101 and
    each target ontology, run the all-pairs label-similarity baseline
    matcher, grade against refalign.rdf.  Returns
    {dataset: (tp, n_pred, n_true, precision, recall, f1)}.

    With the shipped datasets this reproduces the README baseline table
    exactly (301: 1.00/0.217/0.356, 302: 0.900/0.191/0.316,
    303: 0.875/0.429/0.575, 304: 0.918/0.592/0.720)."""
    import os
    from openea_tpu.tutorial.labs import matching_by_similarity_threshold
    src = RdfParser(os.path.join(data_dir, "101", "onto.rdf"),
                    OAEI_SRC_NS, verbose=verbose)
    results = {}
    for ds in datasets:
        tgt = RdfParser(os.path.join(data_dir, ds, "onto.rdf"),
                        OAEI_TARGET_NS[ds], verbose=verbose)
        pred = matching_by_similarity_threshold(src, tgt, threshold)
        gold = parse_alignment(os.path.join(data_dir, ds, "refalign.rdf"))
        n_pred, n_true = len(pred), len(gold)
        tp = 0
        for p in pred:
            for j, g in enumerate(gold):
                if p[0] == g[0] and p[1] == g[1] and p[3] == g[3]:
                    tp += 1
                    gold.pop(j)
                    break
        precision = tp / max(n_pred, 1)
        recall = tp / max(n_true, 1)
        f1 = 2 * precision * recall / max(precision + recall, 1e-12)
        if verbose:
            print("----------- {} -----------".format(ds))
            print("Precision: {}/{} = {}".format(tp, n_pred, precision))
            print("Recall: {}/{} = {}".format(tp, n_true, recall))
            print("F1: {}".format(f1))
        results[ds] = (tp, n_pred, n_true, precision, recall, f1)
    return results


def grade_against_refalign(pred: List[Tuple], align_file: str):
    """P/R/F1 against a refalign.rdf gold file, comparing entity pair AND
    relation like the reference grader (test/test.py:47-58)."""
    gold = parse_alignment(align_file)
    n_pred, n_true = len(pred), len(gold)
    tp = 0
    for p in pred:
        for j, g in enumerate(gold):
            if p[0] == g[0] and p[1] == g[1] and p[3] == g[3]:
                tp += 1
                gold.pop(j)
                break
    precision = tp / max(n_pred, 1)
    recall = tp / max(n_true, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    print("Precision: {}/{} = {:.4f}".format(tp, n_pred, precision))
    print("Recall: {}/{} = {:.4f}".format(tp, n_true, recall))
    print("F1: {:.4f}".format(f1))
    return precision, recall, f1
