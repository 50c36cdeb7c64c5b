"""LSH candidate blocking (reference modules/blocking/lshash.py).

Random-hyperplane LSH for candidate generation at scale: each table hashes
an embedding to a `hash_size`-bit code via sign(X @ planes); entities in
the same bucket of any table are candidates.

TPU design: hashing is one [N, d] @ [d, tables*bits] matmul + sign +
bit-packing on device (the reference hashes per-row in python,
lshash.py:27-100); only the bucket dictionaries live on host.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Set, Tuple

import jax.numpy as jnp
import numpy as np

# pluggable candidate-ranking distances (reference lshash.py:86-99 +
# :125-153's d_func table), vectorized over the candidate axis
DISTANCE_FUNCS = {
    "euclidean": lambda q, c: ((c - q) ** 2).sum(axis=-1),
    "true_euclidean": lambda q, c: np.sqrt(((c - q) ** 2).sum(axis=-1)),
    "centred_euclidean": lambda q, c: (c.mean(axis=-1) - q.mean()) ** 2,
    "l1norm": lambda q, c: np.abs(c - q).sum(axis=-1),
    "cosine": lambda q, c: 1.0 - (c @ q) / np.maximum(
        np.sqrt((c * c).sum(axis=-1) * (q @ q)), 1e-12),
}


class LSHBlocker:

    def __init__(self, hash_size: int, input_dim: int, num_hashtables: int = 1,
                 seed: int = 0):
        assert hash_size <= 63
        self.hash_size = hash_size
        self.input_dim = input_dim
        self.num_hashtables = num_hashtables
        rng = np.random.RandomState(seed)
        self._planes = jnp.asarray(
            rng.randn(input_dim, num_hashtables * hash_size).astype(np.float32))
        self._tables: List[Dict[int, List[int]]] = [
            {} for _ in range(num_hashtables)]
        # indexed embeddings stay as the per-index() [N, d] blocks with a
        # per-entity (block, row) locator — a per-row dict of copies
        # doubled host memory for callers that never rank queries
        self._vec_blocks: List[np.ndarray] = []
        self._vec_loc: Dict[int, Tuple[int, int]] = {}
        self._extras: Dict[int, Any] = {}

    def _codes(self, x) -> np.ndarray:
        """[N] x num_hashtables integer bucket codes."""
        bits = (jnp.asarray(x) @ self._planes) > 0          # [N, T*B]
        bits = np.asarray(bits).reshape(-1, self.num_hashtables, self.hash_size)
        weights = (1 << np.arange(self.hash_size, dtype=np.int64))
        return (bits.astype(np.int64) * weights).sum(axis=2)  # [N, T]

    def index(self, embeds, ids: Sequence[int],
              extras: Optional[Sequence[Any]] = None) -> None:
        """Index embedding rows under ids.  ``extras``: optional per-row
        payloads returned by ranked queries (the reference's extra_data,
        lshash.py:101-110)."""
        codes = self._codes(embeds)
        bi = len(self._vec_blocks)
        self._vec_blocks.append(np.asarray(embeds))
        for row, ent in enumerate(ids):
            self._vec_loc[int(ent)] = (bi, row)
            if extras is not None:
                self._extras[int(ent)] = extras[row]
            for t in range(self.num_hashtables):
                self._tables[t].setdefault(int(codes[row, t]), []).append(ent)

    def query(self, embeds) -> List[Set[int]]:
        """Candidate id set per query row (union over tables)."""
        codes = self._codes(embeds)
        out = []
        for row in range(codes.shape[0]):
            cands: Set[int] = set()
            for t in range(self.num_hashtables):
                cands.update(self._tables[t].get(int(codes[row, t]), ()))
            out.append(cands)
        return out

    def query_ranked(self, embeds, num_results: int = 1,
                     distance_func: str = "euclidean"
                     ) -> List[List[Tuple[int, float, Any]]]:
        """Per query row: bucket candidates ranked by a pluggable distance
        (reference lshash.py:77-121 query).  Returns, per row, up to
        ``num_results`` (id, distance, extra) tuples, nearest first.  The
        per-candidate distances vectorize over each row's candidate set —
        the sets are small by construction (that is the point of
        blocking), so this stays on host like the reference."""
        if distance_func not in DISTANCE_FUNCS:
            raise ValueError("The distance function name is invalid.")
        d_func = DISTANCE_FUNCS[distance_func]
        queries = np.asarray(embeds)
        out: List[List[Tuple[int, float, Any]]] = []
        for row, cands in enumerate(self.query(embeds)):
            if not cands:
                out.append([])
                continue
            ids = np.asarray(sorted(cands))
            cvecs = np.stack([self._vec_blocks[b][r] for b, r in
                              (self._vec_loc[int(i)] for i in ids)])
            dist = np.asarray(d_func(queries[row], cvecs))
            order = np.argsort(dist, kind="stable")[:num_results]
            out.append([(int(ids[j]), float(dist[j]),
                         self._extras.get(int(ids[j]))) for j in order])
        return out
