"""LSH candidate blocking (reference modules/blocking/lshash.py).

Random-hyperplane LSH for candidate generation at scale: each table hashes
an embedding to a `hash_size`-bit code via sign(X @ planes); entities in
the same bucket of any table are candidates.

TPU design: hashing is one [N, d] @ [d, tables*bits] matmul + sign +
bit-packing on device (the reference hashes per-row in python,
lshash.py:27-100); only the bucket dictionaries live on host.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Set

import jax.numpy as jnp
import numpy as np


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

    def _codes(self, x) -> np.ndarray:
        """[N] x num_hashtables integer bucket codes."""
        bits = (jnp.asarray(x) @ self._planes) > 0          # [N, T*B]
        bits = np.asarray(bits).reshape(-1, self.num_hashtables, self.hash_size)
        weights = (1 << np.arange(self.hash_size, dtype=np.int64))
        return (bits.astype(np.int64) * weights).sum(axis=2)  # [N, T]

    def index(self, embeds, ids: Sequence[int]) -> None:
        codes = self._codes(embeds)
        for row, ent in enumerate(ids):
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
