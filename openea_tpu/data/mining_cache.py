"""Disk cache for expensive host-side mined artifacts.

The reference caches exactly these artifacts next to the dataset —
AliNet pickles its preprocessed adjacency (reference
approaches/alinet.py:711-725) and RSN4EA writes its sampled paths to CSV
(rsn4ea.py:225-233) — so a second run skips minutes of host mining.
Here the cache is shared by every miner (AliNet 2-hop pairs, IPTransE
2-step paths, RSN4EA walks) and is keyed on a CONTENT digest of the
mining inputs + parameters rather than on the folder name alone: a
changed dataset, division, or mining knob can never serve a stale
artifact, and in-memory synthetic KGs (benches, tests) are cacheable
too.

Layout: ``<cache_dir>/<tag>_<digest>.npz`` holding named numpy arrays.
``cache_dir`` resolution order:
1. ``OPENEA_CACHE_DIR`` env var;
2. ``<args.training_data>/.openea_tpu_cache/`` when that folder exists
   (the reference's convention of caching beside the dataset);
3. ``/tmp/openea_tpu_cache/``.

Loads validate the digest by construction (it is in the file name) and
the array-name set; any failure falls back to fresh mining.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import Dict, Iterable, Optional

import numpy as np


def resolve_cache_dir(args=None) -> str:
    env = os.environ.get("OPENEA_CACHE_DIR")
    if env:
        return env
    td = getattr(args, "training_data", None) if args is not None else None
    if td and os.path.isdir(str(td)):
        return os.path.join(str(td), ".openea_tpu_cache")
    return os.path.join(tempfile.gettempdir(), "openea_tpu_cache")


def content_digest(*parts) -> str:
    """blake2b digest over a heterogeneous key: numpy arrays hash their
    dtype+shape+bytes; everything else hashes its repr.  Arrays are
    hashed as given — canonicalize (sort) set-derived inputs first."""
    h = hashlib.blake2b(digest_size=16)
    for p in parts:
        if isinstance(p, np.ndarray):
            h.update(str(p.dtype).encode())
            h.update(str(p.shape).encode())
            h.update(np.ascontiguousarray(p).tobytes())
        else:
            h.update(repr(p).encode())
        h.update(b"|")
    return h.hexdigest()


def triples_key(triples: Iterable) -> np.ndarray:
    """Canonical array for a triple set/list: sorted [n, 3] int64 —
    mining outputs below are pure functions of the triple SET, so the
    digest must not depend on iteration order."""
    arr = np.asarray(sorted((int(h), int(r), int(t)) for h, r, t in triples),
                     np.int64).reshape(-1, 3)
    return arr


def load(tag: str, dig: str, cache_dir: str,
         names: Iterable[str]) -> Optional[Dict[str, np.ndarray]]:
    """Entries are DIRECTORIES of one .npy per array, loaded with
    mmap_mode='r': np.load on a .npz streams through zipfile at
    ~85 MB/s on this class of VM (10.9 s for AliNet's 900 MB metas
    bundle), where mmap is instant and the bytes fault in at page-cache
    speed when the consumer (usually a device upload) touches them.
    A legacy single-file .npz under the same name is still honored."""
    d = os.path.join(cache_dir, "%s_%s" % (tag, dig))
    if os.path.isdir(d):
        try:
            out = {}
            for k in names:
                out[k] = np.load(os.path.join(d, k + ".npy"),
                                 mmap_mode="r")
            print("loaded cached %s from %s" % (tag, d))
            return out
        except Exception as e:                    # torn dir -> re-mine
            print("mining cache load failed (%s): %s" % (d, e))
            return None
    path = d + ".npz"
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            if set(z.files) != set(names):
                return None
            out = {k: z[k] for k in z.files}
        print("loaded cached %s from %s" % (tag, path))
        return out
    except Exception as e:                        # corrupt file -> re-mine
        print("mining cache load failed (%s): %s" % (path, e))
        return None


def save(tag: str, dig: str, cache_dir: str,
         arrays: Dict[str, np.ndarray]) -> Optional[str]:
    path = os.path.join(cache_dir, "%s_%s" % (tag, dig))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # one uncompressed .npy per array in a directory (mmap-loadable,
        # see load); write to a tmp dir + atomic rename so a crashed
        # writer can't leave a torn entry under the final name
        tmp = path + ".%d.tmp" % os.getpid()
        os.makedirs(tmp, exist_ok=True)
        for k, v in arrays.items():
            np.save(os.path.join(tmp, k + ".npy"), v)
        try:
            os.replace(tmp, path)
        except OSError:
            # an entry already exists (corrupt, or a concurrent writer):
            # swap it out for the fresh one
            import shutil
            try:
                old = path + ".%d.old" % os.getpid()
                os.replace(path, old)
                os.replace(tmp, path)
                shutil.rmtree(old, ignore_errors=True)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)
        return path
    except OSError as e:                          # read-only dir etc.
        print("mining cache save skipped (%s): %s" % (cache_dir, e))
        return None


def cached(tag: str, key_parts, builder, args=None,
           names: Optional[Iterable[str]] = None):
    """Memoize ``builder() -> {name: array}`` on disk.  ``names`` guards
    the load against a stale schema (defaults to whatever the builder
    returns on a miss)."""
    cache_dir = resolve_cache_dir(args)
    dig = content_digest(tag, *key_parts)
    if names is not None:
        hit = load(tag, dig, cache_dir, names)
        if hit is not None:
            return hit
    out = builder()
    if names is not None:
        assert set(out) == set(names), (set(out), set(names))
    save(tag, dig, cache_dir, out)
    return out
