"""SQL-reproducible hashing primitives.

Every hash here has an exact DuckDB equivalent (emitted by the matching
``sql_*`` builder), so the operators built on them — MinHash+LSH, SimHash,
winnowing — are verifiable END-TO-END by the driver's DuckDB oracle instead
of a rows-only check. The price is pinning the hash spec:

- character k-gram hash: polynomial rolling hash over Unicode code points,
  base 1000003, wrapping mod 2**64 (numpy uint64 wraparound ≡ explicit
  ``% 2^64`` on DuckDB HUGEINT). Character-based (not byte-based) because
  DuckDB ``substr``/``unicode`` are character-addressed.
- token hash: first 8 bytes of md5(utf-8), big-endian, as uint64
  (≡ ``('0x' || substr(md5(t), 1, 16))::UBIGINT``). Memoized per process —
  corpus vocabularies repeat heavily, so the md5 cost is paid once per
  distinct token, not per occurrence.
- MinHash permutations: ``(a*h + b) mod 2**64`` with a < 2**32 so the
  product fits DuckDB's HUGEINT (a*h < 2**96 < 2**127) while numpy's
  uint64 multiply wraps to the identical value.
"""

from __future__ import annotations

import hashlib
from typing import Dict

import numpy as np

BASE = 1000003
U64 = 1 << 64
I64_BIAS = 1 << 63


def codepoints(text: str) -> np.ndarray:
    """Unicode code points as uint64 (vectorized via utf-32 decode)."""
    if not text:
        return np.zeros(0, dtype=np.uint64)
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)


def gram_hashes(text: str, k: int) -> np.ndarray:
    """Rolling polynomial hash of every character k-gram, mod 2**64.

    h(g) = fold(h*BASE + codepoint) — one value per position 0..len-k.
    Texts shorter than k characters yield an empty array (the SQL side
    generates no gram rows for them either)."""
    cp = codepoints(text)
    n = len(cp) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    h = np.zeros(n, dtype=np.uint64)
    base = np.uint64(BASE)
    with np.errstate(over="ignore"):
        for i in range(k):
            h = h * base + cp[i : n + i]
    return h


def sql_gram_hash(text_expr: str, pos_expr: str, k: int) -> str:
    """DuckDB expression equal to :func:`gram_hashes` for the k-gram starting
    at 1-based character position ``pos_expr`` of ``text_expr``."""
    e = "0::HUGEINT"
    for j in range(k):
        e = (f"(({e}) * {BASE} + unicode(substr({text_expr}, ({pos_expr})+{j}, 1)))"
             f" % {U64}")
    return e


_MD5_MEMO: Dict[str, int] = {}


def md5_u64(token: str) -> int:
    """First 8 bytes of md5, big-endian uint64 — per-process memoized."""
    v = _MD5_MEMO.get(token)
    if v is None:
        v = int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")
        if len(_MD5_MEMO) < 4_000_000:  # bound worker memory on open vocabularies
            _MD5_MEMO[token] = v
    return v


def sql_md5_u64(tok_expr: str) -> str:
    return f"('0x' || substr(md5({tok_expr}), 1, 16))::UBIGINT"


def to_signed64(v: int) -> int:
    """Two's-complement reinterpretation uint64 → int64 (Arrow carrier)."""
    return v - U64 if v >= I64_BIAS else v


def sql_to_signed64(expr: str) -> str:
    return (f"CASE WHEN ({expr}) >= {I64_BIAS} THEN ({expr}) - {U64} "
            f"ELSE ({expr}) END")


def minhash_perm_params(num_perm: int, seed: int) -> tuple:
    """(a, b) arrays for v = (a*h + b) mod 2**64; a < 2**32 (see module doc)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 32, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, U64 - 1, size=num_perm, dtype=np.uint64)
    return a, b


def sql_minhash_params_values(num_perm: int, seed: int) -> str:
    """Inline VALUES list ``(perm_id, pa, pb)`` matching minhash_perm_params."""
    a, b = minhash_perm_params(num_perm, seed)
    rows = ", ".join(f"({i}, {int(a[i])}::HUGEINT, {int(b[i])}::HUGEINT)"
                     for i in range(num_perm))
    return f"(VALUES {rows})"
