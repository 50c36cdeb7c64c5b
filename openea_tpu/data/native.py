"""ctypes bindings for the native TSV loader (native/openea_native.cpp).

Builds the shared library on first use with g++ (no pybind11 in the
image; plain C ABI + ctypes + zero-copy numpy wraps).  Falls back to the
pure-Python reader transparently when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Set, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "openea_native.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libopenea_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.exists(_SRC) and
                                       os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.openea_load_triples.restype = ctypes.c_void_p
        lib.openea_load_triples.argtypes = [ctypes.c_char_p]
        for name in ("openea_num_triples", "openea_num_uris",
                     "openea_blob_size"):
            getattr(lib, name).restype = ctypes.c_int64
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.openea_triples_ptr.restype = ctypes.POINTER(ctypes.c_int32)
        lib.openea_triples_ptr.argtypes = [ctypes.c_void_p]
        lib.openea_offsets_ptr.restype = ctypes.POINTER(ctypes.c_int64)
        lib.openea_offsets_ptr.argtypes = [ctypes.c_void_p]
        lib.openea_ent_freq_ptr.restype = ctypes.POINTER(ctypes.c_int64)
        lib.openea_ent_freq_ptr.argtypes = [ctypes.c_void_p]
        lib.openea_blob_ptr.restype = ctypes.POINTER(ctypes.c_char)
        lib.openea_blob_ptr.argtypes = [ctypes.c_void_p]
        lib.openea_free.argtypes = [ctypes.c_void_p]
        try:
            p64 = ctypes.POINTER(ctypes.c_int64)
            lib.openea_mine2hop_unique.restype = p64
            lib.openea_mine2hop_unique.argtypes = [
                p64, p64, p64, ctypes.c_int64, p64, ctypes.c_int64, p64]
            lib.openea_buf_free.argtypes = [ctypes.c_void_p]
        except AttributeError:
            pass                      # stale .so without the mining symbols
        try:
            p32 = ctypes.POINTER(ctypes.c_int32)
            p64 = ctypes.POINTER(ctypes.c_int64)
            lib.openea_counting_argsort.restype = ctypes.c_int32
            lib.openea_counting_argsort.argtypes = [
                p32, ctypes.c_int64, ctypes.c_int64, p64]
            lib.openea_sort_unique_i64.restype = p64
            lib.openea_sort_unique_i64.argtypes = [
                p64, ctypes.c_int64, p64]
        except AttributeError:
            pass
        try:
            p64 = ctypes.POINTER(ctypes.c_int64)
            pf32 = ctypes.POINTER(ctypes.c_float)
            lib.openea_lev_ratio_matrix.restype = None
            lib.openea_lev_ratio_matrix.argtypes = [
                ctypes.c_char_p, p64, ctypes.c_int64,
                ctypes.c_char_p, p64, ctypes.c_int64, pf32]
            lib.openea_imuse_accumulate.restype = None
            lib.openea_imuse_accumulate.argtypes = [
                pf32, ctypes.c_int64, p64, p64, ctypes.c_int64,
                p64, p64, ctypes.c_int64, pf32,
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64]
            lib.openea_imuse_best.restype = None
            lib.openea_imuse_best.argtypes = [
                pf32, ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
                ctypes.c_int64, p64, pf32]
        except AttributeError:
            pass
        _lib = lib
        return _lib


def mine2hop_unique(a_key: np.ndarray, base: np.ndarray, c: np.ndarray,
                    b_key: np.ndarray, stride: int) -> Optional[np.ndarray]:
    """Sorted unique join keys a_key[i] | b_key[base[i] + j*stride]
    (j < c[i]) — the AliNet 2-hop mining hot loop (models/alinet.py
    generate_2hop_pairs) fused into one native emission pass + parallel
    sort.  Returns None when the native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "openea_mine2hop_unique"):
        return None
    a_key = np.ascontiguousarray(a_key, np.int64)
    base = np.ascontiguousarray(base, np.int64)
    c = np.ascontiguousarray(c, np.int64)
    b_key = np.ascontiguousarray(b_key, np.int64)
    p64 = ctypes.POINTER(ctypes.c_int64)
    out_n = ctypes.c_int64(0)
    ptr = lib.openea_mine2hop_unique(
        a_key.ctypes.data_as(p64), base.ctypes.data_as(p64),
        c.ctypes.data_as(p64), ctypes.c_int64(len(a_key)),
        b_key.ctypes.data_as(p64), ctypes.c_int64(int(stride)),
        ctypes.byref(out_n))
    if not ptr or out_n.value < 0:
        return None
    try:
        uq = np.ctypeslib.as_array(ptr, shape=(out_n.value,)).copy()
    finally:
        lib.openea_buf_free(ptr)
    return uq


def counting_argsort(keys: np.ndarray, n_keys: int) -> Optional[np.ndarray]:
    """Stable argsort of int32 keys in [0, n_keys) via the native parallel
    counting sort — ~2 passes vs np.argsort's ~20 s at 80M random keys
    (index-write bound).  Returns None when the native library (or the
    symbol) is unavailable or a key is out of range."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "openea_counting_argsort"):
        return None
    keys = np.ascontiguousarray(keys, np.int32)
    out = np.empty(len(keys), np.int64)
    rc = lib.openea_counting_argsort(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(keys)), ctypes.c_int64(int(n_keys)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out if rc == 0 else None


def lev_ratio_matrix(strs1, strs2) -> Optional[np.ndarray]:
    """[m1, m2] float32 of Levenshtein.ratio(a, b) for every pair, via
    the threaded native LCS kernel (ratio == 2*LCS/(|a|+|b|), exactly
    python-Levenshtein's value).  None when the native lib is absent —
    callers fall back to per-pair python ratios."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "openea_lev_ratio_matrix"):
        return None

    def pack(strs):
        bs = [s.encode("utf-8") for s in strs]
        off = np.zeros(len(bs) + 1, np.int64)
        np.cumsum([len(b) for b in bs], out=off[1:])
        return b"".join(bs), off

    blob1, off1 = pack(strs1)
    blob2, off2 = pack(strs2)
    m1, m2 = len(strs1), len(strs2)
    out = np.empty((m1, m2), np.float32)
    p64 = ctypes.POINTER(ctypes.c_int64)
    pf32 = ctypes.POINTER(ctypes.c_float)
    lib.openea_lev_ratio_matrix(
        ctypes.c_char_p(blob1), off1.ctypes.data_as(p64),
        ctypes.c_int64(m1), ctypes.c_char_p(blob2),
        off2.ctypes.data_as(p64), ctypes.c_int64(m2),
        out.ctypes.data_as(pf32))
    return out


def imuse_accumulate(M: np.ndarray, rowpos, rowval, colpos, colval,
                     S: np.ndarray, C: np.ndarray) -> bool:
    """S[rowpos[i], colpos[j]] += M[rowval[i], colval[j]]; C += 1 —
    threaded native scatter-accumulate for the IMUSE bootstrap blocks
    (numpy's np.ix_ formulation re-gathers/re-scatters multi-GB temps).
    Returns False when the native lib is absent."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "openea_imuse_accumulate"):
        return False
    M = np.ascontiguousarray(M, np.float32)
    assert S.dtype == np.float32 and C.dtype == np.int16
    assert S.flags.c_contiguous and C.flags.c_contiguous
    p64 = ctypes.POINTER(ctypes.c_int64)
    pf32 = ctypes.POINTER(ctypes.c_float)
    p16 = ctypes.POINTER(ctypes.c_int16)
    a = [np.ascontiguousarray(x, np.int64)
         for x in (rowpos, rowval, colpos, colval)]
    lib.openea_imuse_accumulate(
        M.ctypes.data_as(pf32), ctypes.c_int64(M.shape[1]),
        a[0].ctypes.data_as(p64), a[1].ctypes.data_as(p64),
        ctypes.c_int64(len(a[0])), a[2].ctypes.data_as(p64),
        a[3].ctypes.data_as(p64), ctypes.c_int64(len(a[2])),
        S.ctypes.data_as(pf32), C.ctypes.data_as(p16),
        ctypes.c_int64(S.shape[1]))
    return True


def imuse_best(S: np.ndarray, C: np.ndarray):
    """(best_j [n], best_sim [n]): per-row argmax of S/C over C>0 in one
    threaded pass (ties -> lowest j; rows with no candidates -> (-1,
    -1.0)).  None when the native lib is absent."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "openea_imuse_best"):
        return None
    assert S.dtype == np.float32 and C.dtype == np.int16
    assert S.flags.c_contiguous and C.flags.c_contiguous
    n, n2a = S.shape
    best_j = np.empty(n, np.int64)
    best_sim = np.empty(n, np.float32)
    p64 = ctypes.POINTER(ctypes.c_int64)
    pf32 = ctypes.POINTER(ctypes.c_float)
    p16 = ctypes.POINTER(ctypes.c_int16)
    lib.openea_imuse_best(S.ctypes.data_as(pf32), C.ctypes.data_as(p16),
                          ctypes.c_int64(n), ctypes.c_int64(n2a),
                          best_j.ctypes.data_as(p64),
                          best_sim.ctypes.data_as(pf32))
    return best_j, best_sim


def sort_unique_i64(keys: np.ndarray) -> Optional[np.ndarray]:
    """Sorted unique of an int64 array via the native parallel sort
    (np.unique is a single-threaded ~20 s sort at the 80M-key 100K
    2-hop adjacency shape).  None when the native library is absent."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "openea_sort_unique_i64"):
        return None
    keys = np.ascontiguousarray(keys, np.int64)
    p64 = ctypes.POINTER(ctypes.c_int64)
    out_n = ctypes.c_int64(0)
    ptr = lib.openea_sort_unique_i64(keys.ctypes.data_as(p64),
                                     ctypes.c_int64(len(keys)),
                                     ctypes.byref(out_n))
    if not ptr or out_n.value < 0:
        return None
    try:
        uq = np.ctypeslib.as_array(ptr, shape=(out_n.value,)).copy()
    finally:
        lib.openea_buf_free(ptr)
    return uq


class InternedTriples:
    """Parsed triple file: interned int triples + URI vocabulary."""

    def __init__(self, triples: np.ndarray, uris: list,
                 ent_freq: np.ndarray):
        self.triples = triples          # [n, 3] int32 (vocab ids)
        self.uris = uris                # vocab id -> uri string
        self.ent_freq = ent_freq        # [n_vocab] int64 head+tail counts


def load_triples_native(path: str) -> Optional[InternedTriples]:
    lib = get_lib()
    if lib is None or not os.path.exists(path):
        return None
    h = lib.openea_load_triples(path.encode("utf8"))
    if not h:
        return None
    try:
        n = lib.openea_num_triples(h)
        nv = lib.openea_num_uris(h)
        nb = lib.openea_blob_size(h)
        triples = np.ctypeslib.as_array(lib.openea_triples_ptr(h),
                                        shape=(n, 3)).copy()
        offsets = np.ctypeslib.as_array(lib.openea_offsets_ptr(h),
                                        shape=(nv + 1,)).copy()
        freq = np.ctypeslib.as_array(lib.openea_ent_freq_ptr(h),
                                     shape=(nv,)).copy()
        blob = ctypes.string_at(lib.openea_blob_ptr(h), nb)
        uris = [blob[offsets[i]:offsets[i + 1]].decode("utf8")
                for i in range(nv)]
        return InternedTriples(triples, uris, freq)
    finally:
        lib.openea_free(h)


def read_relation_triples_fast(path: str
                               ) -> Optional[Tuple[Set, Set, Set]]:
    """Drop-in fast path for read.read_relation_triples (same outputs)."""
    it = load_triples_native(path)
    if it is None:
        return None
    uris = it.uris
    triples = {(uris[h], uris[r], uris[t]) for h, r, t in it.triples}
    ents = {uris[i] for i in
            np.unique(it.triples[:, [0, 2]])}
    rels = {uris[i] for i in np.unique(it.triples[:, 1])}
    return triples, ents, rels
