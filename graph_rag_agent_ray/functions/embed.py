"""Deterministic hash embeddings (stand-in for OpenAIEmbeddings).

The reference embeds ``id + description`` text with an OpenAI-compatible model
(/root/reference/graph/indexing/entity_indexer.py:34,170-206). For a sealed,
deterministic engine we use character-3-gram feature hashing with a signed
random-projection flavour: each n-gram's sha1 picks a dimension and a sign.
Near-identical surfaces (case/punctuation/suffix variants) land close in
cosine space, which is exactly the property the KNN(0.9) blocking stage needs
(similar_entity.py:147-222). Any embedding-API client can replace this behind
the same ``embed_texts`` protocol.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import numpy as np


def list_column_to_matrix(col, dim: int | None = None) -> np.ndarray:
    """Arrow list<float> column → (n, dim) numpy matrix without a Python-list
    round trip (zero-copy where Arrow allows). Accepts Array or ChunkedArray."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.zeros((0, dim or 0), dtype=np.float32)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    if dim is None:
        dim = len(col[0])
    return np.ascontiguousarray(flat).reshape(len(col), dim)


def _ngrams(text: str, n: int) -> List[str]:
    t = f"  {text.lower()}  "  # pad so short strings still produce grams
    return [t[i : i + n] for i in range(len(t) - n + 1)]


NGRAM_SIZES = (2, 3, 4)


def embed_texts(texts: Sequence[str], dim: int = 64) -> np.ndarray:
    """(len(texts), dim) float32, L2-normalized rows. Pure function of input.

    Multi-width character n-grams (2/3/4) — wider grams separate distinct
    surfaces, narrow grams keep typo/suffix variants close, which is the
    property the cosine-0.9 blocking gate needs. Fully vectorized: n-gram
    hashes via the code-point rolling hash (functions/sqlhash.py) and a
    bincount scatter-add per row — no per-gram Python (this stage is the
    model-inference stand-in and dominates build wall-clock at scale)."""
    from .sqlhash import gram_hashes

    out = np.empty((len(texts), dim), dtype=np.float64)
    for row, text in enumerate(texts):
        t = f"  {text.lower()}  "
        acc = np.zeros(dim, dtype=np.float64)
        for n in NGRAM_SIZES:
            h = gram_hashes(t, n)
            if len(h) == 0:
                continue
            idx = (h % np.uint64(dim)).astype(np.int64)
            sign = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
            acc += np.bincount(idx, weights=sign, minlength=dim)
        out[row] = acc
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return (out / norms).astype(np.float32)


def lsh_bucket(vectors: np.ndarray, n_bits: int, seed: int) -> np.ndarray:
    """Random-hyperplane LSH bucket id per row (int64).

    This is the similarity-blocking key: vectors in the same bucket are
    candidates for the within-block exact KNN. At scale this replaces the
    reference's global GDS KNN (similar_entity.py:147-222) with a
    groupby(bucket) shuffle instead of an all-pairs pass.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((vectors.shape[1], n_bits))
    bits = (vectors @ planes) > 0
    weights = (1 << np.arange(n_bits, dtype=np.int64))
    return bits.astype(np.int64) @ weights


def cosine_topk(
    vectors: np.ndarray, k: int, cutoff: float
) -> List[List[tuple]]:
    """All-pairs cosine within one block: per row, up to k neighbours with
    similarity >= cutoff, as (other_index, score). Rows must be L2-normalized.
    Mirrors GDS knn(topK, similarityCutoff) — similar_entity.py:169-180."""
    sims = vectors @ vectors.T
    np.fill_diagonal(sims, -1.0)
    n = sims.shape[0]
    result: List[List[tuple]] = []
    for i in range(n):
        row = sims[i]
        if k < n - 1:
            cand = np.argpartition(-row, k)[: k]
        else:
            cand = np.arange(n)
        cand = cand[row[cand] >= cutoff]
        cand = cand[np.argsort(-row[cand], kind="stable")]
        result.append([(int(j), float(row[j])) for j in cand if j != i])
    return result


def cosine_topk_pairs(
    vectors: np.ndarray, k: int, cutoff: float
) -> tuple:
    """The same neighbour SET as :func:`cosine_topk`, returned as two flat
    index arrays ``(rows, cols)`` with no per-row Python loop — for callers
    that only need candidate pairs, not ranked scores."""
    sims = vectors @ vectors.T
    np.fill_diagonal(sims, -1.0)
    n = sims.shape[0]
    if k < n - 1:
        cand = np.argpartition(-sims, k, axis=1)[:, :k]
    else:
        cand = np.broadcast_to(np.arange(n), (n, n))
    rows = np.repeat(np.arange(n), cand.shape[1])
    cols = cand.reshape(-1)
    keep = sims[rows, cols] >= cutoff
    return rows[keep], cols[keep]
