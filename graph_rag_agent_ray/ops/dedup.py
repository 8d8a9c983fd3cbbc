"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (the 100 TB design, tested at sf scale):
- exact: hash column added vectorized per batch, then a two-phase
  min-aggregate (per-batch partial → groupby(hash)) — no full-row shuffle,
  only (hash, doc_id, count) partials move.
- MinHash: signatures per batch (numpy, one pass per doc), exploded to
  (band_id, band_hash, doc_id) rows, candidate pairs from a
  groupby(band_id, band_hash) shuffle — the standard shingle→minhash→band
  pipeline; verification estimates Jaccard from signature agreement.
- SimHash: 64-bit signatures, banded into 4×16-bit keys, Hamming-verified.
- embedding near-dup: exact variant broadcasts the (small) matrix via
  ray.put once and scans batches against it (the brute-force baseline with
  an exact SQL oracle); the LSH-blocked variant is the scale path.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.embed import list_column_to_matrix
from ..functions.shuffle import hash_partitioned_groupby

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------- exact ----

def exact_dedup(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(text_hash, keep_doc_id, n_dups): md5-grouped, keep the minimum doc_id
    (deterministic winner, matching `GROUP BY md5(text)` semantics)."""

    def partial(batch: pa.Table) -> pa.Table:
        md5 = hashlib.md5
        hashes = [md5(t.encode("utf-8")).hexdigest() for t in batch.column("text").to_pylist()]
        df = pd.DataFrame({"text_hash": hashes, "doc_id": batch.column("doc_id").to_pylist()})
        agg = df.groupby("text_hash", sort=False).agg(
            keep_doc_id=("doc_id", "min"), n_dups=("doc_id", "size")
        ).reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
    return hash_partitioned_groupby(
        partials, ["text_hash"],
        lambda df: df.groupby("text_hash", sort=False)
        .agg(keep_doc_id=("keep_doc_id", "min"), n_dups=("n_dups", "sum"))
        .reset_index(),
        n_buckets=32,
    )


# -------------------------------------------------------------- minhash ----

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    b = text.encode("utf-8", "ignore")
    if len(b) < k:
        b = b + b" " * (k - len(b))
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    n = len(arr) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    base = np.uint64(1000003)
    for i in range(k):
        h = h * base + arr[i : n + i]
    return np.unique(h)


def _perm_params(num_perm: int, seed: int) -> tuple:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, num_perm: int, k: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) signature. Multiply-add hash with natural uint64 wraparound
    (mod 2^64) — same minwise-independence behaviour as the Mersenne modulo
    at a fraction of the cost; deterministic."""
    sh = _shingle_hashes(text, k)
    with np.errstate(over="ignore"):
        vals = a[:, None] * sh[None, :] + b[:, None]
    return vals.min(axis=1)


class MinHashBands:
    """Stage: text → exploded (doc_id, band_id, band_hash, signature) rows.
    Permutation parameters are built once per worker (STATELESS_OK)."""

    STATELESS_OK = True

    def __init__(self, num_perm: int = 64, shingle_k: int = 5,
                 n_bands: int = 8, seed: int = 42) -> None:
        assert num_perm % n_bands == 0
        self.num_perm, self.k, self.n_bands = num_perm, shingle_k, n_bands
        self.rows_per_band = num_perm // n_bands
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: List[int] = []
        band_ids: List[int] = []
        band_hashes: List[int] = []
        sigs: List[list] = []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            sig = minhash_signature(text or "", self.num_perm, self.k, self.a, self.b)
            sig_list = [int(x) for x in sig]
            for band in range(self.n_bands):
                seg = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                bh = int.from_bytes(
                    hashlib.sha1(seg.tobytes()).digest()[:8], "big", signed=False
                ) >> 1
                doc_ids.append(doc_id)
                band_ids.append(band)
                band_hashes.append(bh)
                sigs.append(sig_list)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.int64()),
            "signature": pa.array(sigs, pa.list_(pa.int64())),
        })


def minhash_duplicate_pairs(
    ds: "ray.data.Dataset", threshold: float = 0.8,
    num_perm: int = 64, shingle_k: int = 5, n_bands: int = 8, seed: int = 42,
) -> "ray.data.Dataset":
    """(a, b, est_jaccard) near-duplicate pairs: LSH-banded candidates
    verified by signature-agreement Jaccard estimate >= threshold."""
    from ..stages.pool import stage_map_batches
    bands = stage_map_batches(
        ds, MinHashBands,
        {"num_perm": num_perm, "shingle_k": shingle_k,
         "n_bands": n_bands, "seed": seed},
        batch_size=256, max_pool=8,
    )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        docs = group.drop_duplicates("doc_id").sort_values("doc_id")
        if len(docs) < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "est_jaccard": pd.Series(dtype="float64")})
        ids = docs["doc_id"].tolist()
        sigs = np.array(docs["signature"].tolist(), dtype=np.int64)
        rows = []
        for i in range(len(ids)):
            agree = (sigs[i] == sigs[i + 1:]).mean(axis=1)
            for off, est in enumerate(agree):
                if est >= threshold:
                    rows.append((ids[i], ids[i + 1 + off], float(est)))
        if not rows:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "est_jaccard": pd.Series(dtype="float64")})
        return pd.DataFrame(rows, columns=["a", "b", "est_jaccard"])

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # almost every (band_id, band_hash) key is a singleton — drop those
        # vectorized before paying per-group python cost on the rest
        dup_mask = df.duplicated(["band_id", "band_hash"], keep=False)
        cand = df[dup_mask]
        if not len(cand):
            return verify(df.iloc[:0])
        frames = [verify(g) for _, g in cand.groupby(["band_id", "band_hash"], sort=False)]
        frames = [f for f in frames if len(f)]
        if not frames:
            return verify(df.iloc[:0])
        return pd.concat(frames, ignore_index=True)

    pairs = hash_partitioned_groupby(bands, ["band_id", "band_hash"],
                                     verify_bucket, n_buckets=32)
    # candidate pairs can surface from several bands — dedup on (a, b)
    return hash_partitioned_groupby(
        pairs, ["a", "b"],
        lambda df: df.sort_values(["a", "b"], kind="stable").drop_duplicates(["a", "b"]),
        n_buckets=16,
    )


# --------------------------------------------------------------- simhash ----

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (Charikar 2002). Vectorized:
    token hashes via pandas' stable 64-bit hash, bit matrix via shifts."""
    toks = text.split()
    if not toks:
        return 0
    h = pd.util.hash_array(np.asarray(toks, dtype=object))  # uint64, stable
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    return int((acc > 0).astype(np.uint64) @ weights)


def simhash_table(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    def fn(batch: pa.Table) -> pa.Table:
        vals = [simhash64(t or "") for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array([v - (1 << 63) for v in vals], pa.int64()),  # signed carrier
        })
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def simhash_duplicate_pairs(ds: "ray.data.Dataset", max_hamming: int = 3) -> "ray.data.Dataset":
    """(a, b, hamming) pairs with Hamming distance <= max_hamming, blocked on
    4×16-bit bands (pigeonhole: distance<=3 ⇒ at least one identical band)."""
    sims = simhash_table(ds)

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, bands, keys, hashes = [], [], [], []
        for doc_id, s in zip(batch.column("doc_id").to_pylist(),
                             batch.column("simhash").to_pylist()):
            u = s + (1 << 63)
            for band in range(4):
                doc_ids.append(doc_id)
                bands.append(band)
                keys.append((u >> (band * 16)) & 0xFFFF)
                hashes.append(s)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "band_id": pa.array(bands, pa.int32()),
            "band_key": pa.array(keys, pa.int32()),
            "simhash": pa.array(hashes, pa.int64()),
        })

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        docs = group.drop_duplicates("doc_id").sort_values("doc_id")
        rows = []
        ids = docs["doc_id"].tolist()
        hs = [s + (1 << 63) for s in docs["simhash"].tolist()]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(hs[i] ^ hs[j]).count("1")
                if d <= max_hamming:
                    rows.append((ids[i], ids[j], d))
        return pd.DataFrame(rows, columns=["a", "b", "hamming"]) if rows else \
            pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                          "hamming": pd.Series(dtype="int64")})

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        dup_mask = df.duplicated(["band_id", "band_key"], keep=False)
        cand = df[dup_mask]
        if not len(cand):
            return verify(df.iloc[:0])
        frames = [verify(g) for _, g in cand.groupby(["band_id", "band_key"], sort=False)]
        frames = [f for f in frames if len(f)]
        if not frames:
            return verify(df.iloc[:0])
        return pd.concat(frames, ignore_index=True)

    exploded = sims.map_batches(explode, batch_format="pyarrow", batch_size=4096)
    pairs = hash_partitioned_groupby(exploded, ["band_id", "band_key"],
                                     verify_bucket, n_buckets=32)
    return hash_partitioned_groupby(
        pairs, ["a", "b"],
        lambda df: df.sort_values(["a", "b"], kind="stable").drop_duplicates(["a", "b"]),
        n_buckets=16,
    )


# ------------------------------------------------------ n-gram jaccard ----

def ngram_jaccard_pairs(
    ds: "ray.data.Dataset", n: int = 3, threshold: float = 0.5,
) -> "ray.data.Dataset":
    """(a, b, jaccard) over word n-gram sets, candidates from MinHash LSH at a
    permissive threshold, verified with the EXACT n-gram Jaccard."""
    cand = minhash_duplicate_pairs(ds, threshold=max(0.3, threshold - 0.2),
                                   shingle_k=4)
    cand_pdf = cand.to_pandas()
    if len(cand_pdf) == 0:
        return ray.data.from_pandas(pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}))
    wanted = set(cand_pdf["a"]) | set(cand_pdf["b"])
    wanted_ref = ray.put(wanted)

    def keep(batch: pa.Table) -> pa.Table:
        ids = ray.get(wanted_ref)
        mask = pa.array([d in ids for d in batch.column("doc_id").to_pylist()])
        return batch.filter(mask)

    texts = {r["doc_id"]: r["text"]
             for r in ds.map_batches(keep, batch_format="pyarrow").take_all()}

    def grams(t: str) -> set:
        toks = t.split()
        return {tuple(toks[i:i + n]) for i in range(max(0, len(toks) - n + 1))}

    rows = []
    for a, b in cand_pdf[["a", "b"]].itertuples(index=False):
        ga, gb = grams(texts.get(a, "")), grams(texts.get(b, ""))
        if not ga and not gb:
            continue
        j = len(ga & gb) / len(ga | gb)
        if j >= threshold:
            rows.append((a, b, j))
    return ray.data.from_pandas(pd.DataFrame(rows, columns=["a", "b", "jaccard"]) if rows else
                                pd.DataFrame({"a": pd.Series(dtype="int64"),
                                              "b": pd.Series(dtype="int64"),
                                              "jaccard": pd.Series(dtype="float64")}))


# ------------------------------------------- embedding-cosine near-dup ----

def embedding_neardup_pairs(
    emb: "ray.data.Dataset", threshold: float = 0.95, round_digits: int = 6,
) -> "ray.data.Dataset":
    """Exact all-pairs cosine near-dup: (a, b) with round(cos,6) >= threshold,
    a < b. The full matrix is broadcast ONCE via ray.put and each batch scans
    against it — O(n·n/B) matmuls, the documented brute-force baseline with an
    exact SQL oracle. The LSH-blocked scale path is
    similarity.knn_ivf / candidate blocking in this module."""
    pdf = emb.select_columns(["vec_id", "embedding"]).to_pandas()
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    ids = pdf["vec_id"].to_numpy()
    mat_ref = ray.put((ids, mat, norms))

    def scan(batch: pa.Table) -> pa.Table:
        all_ids, all_mat, all_norms = ray.get(mat_ref)
        rows_a, rows_b = [], []
        b_ids = batch.column("vec_id").to_pylist()
        if not b_ids:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        b_mat = list_column_to_matrix(batch.column("embedding")).astype(np.float64)
        b_norms = np.linalg.norm(b_mat, axis=1)
        b_norms[b_norms == 0] = 1.0
        sims = (b_mat @ all_mat.T) / np.outer(b_norms, all_norms)
        sims = np.round(sims, round_digits)
        for i, vid in enumerate(b_ids):
            hits = np.where((sims[i] >= threshold) & (all_ids > vid))[0]
            for j in hits:
                rows_a.append(int(vid))
                rows_b.append(int(all_ids[j]))
        return pa.table({
            "a": pa.array(rows_a, pa.int64()),
            "b": pa.array(rows_b, pa.int64()),
        })

    return emb.select_columns(["vec_id", "embedding"]).map_batches(
        scan, batch_format="pyarrow", batch_size=2048
    )
