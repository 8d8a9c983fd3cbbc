"""Query-result cache — reference CacheManage parity.

The reference ships a CacheManager with pluggable backends (memory / disk /
hybrid), context-aware keys (md5 of query + conversation context) and a
vector-similarity matcher that returns a cached answer when a new query's
embedding is close enough to a cached one (/root/reference/CacheManage/
manager.py:12-110, strategies/context_aware.py:5-112, backends/*). This is
the deterministic Ray-side equivalent: hash embeddings replace the embedding
API, the disk backend is a directory of JSON blobs keyed by the context hash,
and the hybrid backend is memory-over-disk write-through.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections import OrderedDict
from typing import Any, Dict, List, Optional

import numpy as np

from ..functions.embed import embed_texts


def context_key(query: str, context: Optional[List[str]] = None) -> str:
    """md5 of query + context window (context_aware.py:51 semantics)."""
    h = hashlib.md5(query.encode("utf-8"))
    for turn in context or []:
        h.update(b"\x1f")
        h.update(turn.encode("utf-8"))
    return h.hexdigest()


class MemoryBackend:
    def __init__(self, max_items: int = 1024) -> None:
        self.max_items = max_items
        self._store: "OrderedDict[str, Any]" = OrderedDict()

    def get(self, key: str) -> Optional[Any]:
        if key in self._store:
            self._store.move_to_end(key)
            return self._store[key]
        return None

    def set(self, key: str, value: Any) -> None:
        self._store[key] = value
        self._store.move_to_end(key)
        while len(self._store) > self.max_items:
            self._store.popitem(last=False)

    def keys(self) -> List[str]:
        return list(self._store)


class DiskBackend:
    def __init__(self, cache_dir: str) -> None:
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.cache_dir, f"{key}.json")

    def get(self, key: str) -> Optional[Any]:
        p = self._path(key)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)["value"]

    def set(self, key: str, value: Any) -> None:
        tmp = self._path(key) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"value": value, "ts": time.time()}, f)
        os.replace(tmp, self._path(key))

    def keys(self) -> List[str]:
        return [f[:-5] for f in os.listdir(self.cache_dir) if f.endswith(".json")]


class HybridBackend:
    """Memory-over-disk write-through (backends/hybrid semantics)."""

    def __init__(self, cache_dir: str, max_items: int = 1024) -> None:
        self.mem = MemoryBackend(max_items)
        self.disk = DiskBackend(cache_dir)

    def get(self, key: str) -> Optional[Any]:
        v = self.mem.get(key)
        if v is None:
            v = self.disk.get(key)
            if v is not None:
                self.mem.set(key, v)
        return v

    def set(self, key: str, value: Any) -> None:
        self.mem.set(key, value)
        self.disk.set(key, value)

    def keys(self) -> List[str]:
        return self.disk.keys()


class CacheManager:
    """get/set with exact context keys plus optional vector-similarity
    fallback (manager.py:12-80): a miss probes cached query embeddings and
    returns the nearest cached result above ``similarity_threshold``."""

    def __init__(self, backend=None, similarity_threshold: float = 0.92,
                 embed_dim: int = 64) -> None:
        self.backend = backend or MemoryBackend()
        self.similarity_threshold = similarity_threshold
        self.embed_dim = embed_dim
        self._embeddings: Dict[str, np.ndarray] = {}
        self.hits = 0
        self.misses = 0
        self.similarity_hits = 0

    def set(self, query: str, value: Any, context: Optional[List[str]] = None) -> str:
        key = context_key(query, context)
        self.backend.set(key, value)
        self._embeddings[key] = embed_texts([query], dim=self.embed_dim)[0]
        return key

    def get(self, query: str, context: Optional[List[str]] = None) -> Optional[Any]:
        key = context_key(query, context)
        v = self.backend.get(key)
        if v is not None:
            self.hits += 1
            return v
        # vector-similarity fallback
        if self._embeddings:
            qv = embed_texts([query], dim=self.embed_dim)[0]
            best_key, best_sim = None, -1.0
            for k, vec in self._embeddings.items():
                sim = float(qv @ vec)
                if sim > best_sim:
                    best_key, best_sim = k, sim
            if best_key is not None and best_sim >= self.similarity_threshold:
                cached = self.backend.get(best_key)
                if cached is not None:
                    self.similarity_hits += 1
                    return cached
        self.misses += 1
        return None

    def stats(self) -> Dict[str, int]:
        return {"hits": self.hits, "misses": self.misses,
                "similarity_hits": self.similarity_hits}
