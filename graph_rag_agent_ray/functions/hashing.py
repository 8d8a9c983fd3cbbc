"""Content hashing utilities.

``sha1_hex`` replaces the reference's chunk-id scheme
(/root/reference/graph/core/utils.py:24-34: chunk_id = sha1(text)); the
vectorized variant hashes a whole Arrow column per batch.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, List

import numpy as np
import pyarrow as pa


def sha1_hex(text: str) -> str:
    return hashlib.sha1(text.encode("utf-8")).hexdigest()


def sha1_column(col: Iterable[str]) -> List[str]:
    """Hash every string of a column. hashlib releases the GIL per call and the
    loop is bound by digest throughput, not interpreter overhead."""
    sha1 = hashlib.sha1
    return [sha1(s.encode("utf-8")).hexdigest() for s in col]


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def stable_bucket(col: Iterable[str], n_buckets: int) -> np.ndarray:
    """Deterministic (process-independent) hash bucket per string — used to
    salt skewed shuffle keys. Python's builtin hash() is seed-randomized, so
    use the first 8 bytes of sha1."""
    sha1 = hashlib.sha1
    vals = [int.from_bytes(sha1(s.encode("utf-8")).digest()[:8], "big") % n_buckets
            for s in col]
    return np.asarray(vals, dtype=np.int64)


def content_hash_table(table: pa.Table) -> str:
    """Order-insensitive hash of a small Arrow table (lineage fingerprints)."""
    h = hashlib.sha1()
    for digest in sorted(
        hashlib.sha1(str(row).encode("utf-8")).hexdigest()
        for row in table.to_pylist()
    ):
        h.update(digest.encode("ascii"))
    return h.hexdigest()
