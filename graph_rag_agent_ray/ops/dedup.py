"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (the 100 TB design, tested at sf scale):
- exact: hash column added vectorized per batch, then a two-phase
  min-aggregate (per-batch partial → groupby(hash)) — no full-row shuffle,
  only (hash, doc_id, count) partials move.
- MinHash: signatures per batch (numpy, one pass per doc), exploded to
  (band_id, band_key, doc_id) rows, candidate pairs from a
  groupby(band_id, band_key) shuffle — the standard shingle→minhash→band
  pipeline; verification counts signature agreement. Hashing is the
  SQL-reproducible spec in functions/sqlhash.py, so the WHOLE operator has
  an exact DuckDB oracle (see __ray_entry__.oracle_sql).
- SimHash: 64-bit signatures over md5 token hashes, banded into 4×16-bit
  keys, Hamming-verified — also SQL-exact end-to-end.
- n-gram Jaccard: EXACT distributed set-similarity join (prefix filtering à
  la Bayardo/PPJoin): grams → global-frequency ranking → per-doc prefix →
  groupby(prefix gram) candidates with length filter → distributed
  intersection counting restricted to candidate pairs. No doc text ever
  reaches the driver; only the (output-sized) candidate pair set does.
- embedding near-dup: exact variant broadcasts the (small) matrix via
  ray.put once and scans batches against it (the brute-force baseline with
  an exact SQL oracle); ``embedding_neardup_blocked`` is the LSH-bucketed
  scale path (groupby(table, bucket) instead of the all-pairs scan, recall
  measured against the exact baseline in tests/bench).
"""

from __future__ import annotations

import hashlib
import math
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.embed import list_column_to_matrix, lsh_bucket
from ..functions.shuffle import hash_join, hash_partitioned_groupby
from ..functions.sqlhash import (
    gram_hashes,
    md5_u64,
    minhash_perm_params,
    to_signed64,
)

# broadcast the gram-frequency dict below this many distinct grams;
# beyond it the prefix ranking falls back to a distributed hash_join
_FREQ_BROADCAST_LIMIT = 2_000_000

# refuse to collect more candidate pairs than this to the driver
MAX_DRIVER_CANDIDATE_PAIRS = 20_000_000


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
        n_buckets=32, map_format="pyarrow",
    )


# -------------------------------------------------------------- minhash ----

# re-exported for callers/tests; the spec lives in functions/sqlhash.py
_perm_params = minhash_perm_params


def minhash_signature(text: str, num_perm: int, k: int,
                      a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) uint64 signature: min over distinct character-k-gram
    hashes of (a*h + b) mod 2**64 — the SQL-reproducible spec (sqlhash.py).
    Texts with no k-gram (len < k) return an empty signature and are excluded
    from LSH (the SQL side generates no rows for them either)."""
    sh = np.unique(gram_hashes(text, k))
    if len(sh) == 0:
        return np.zeros(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = a[:, None] * sh[None, :] + b[:, None]
    return vals.min(axis=1)


class MinHashBands:
    """Stage: text → exploded (doc_id, band_id, band_key, signature) rows.
    Permutation parameters are built once per worker (STATELESS_OK)."""

    STATELESS_OK = True

    def __init__(self, num_perm: int = 64, shingle_k: int = 5,
                 n_bands: int = 8, seed: int = 42) -> None:
        assert num_perm % n_bands == 0
        self.num_perm, self.k, self.n_bands = num_perm, shingle_k, n_bands
        self.rows_per_band = num_perm // n_bands
        self.a, self.b = minhash_perm_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: List[int] = []
        band_ids: List[int] = []
        band_keys: List[str] = []
        sigs: List[list] = []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            sig = minhash_signature(text or "", self.num_perm, self.k, self.a, self.b)
            if len(sig) == 0:
                continue
            sig_list = [to_signed64(int(x)) for x in sig]
            for band in range(self.n_bands):
                seg = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                doc_ids.append(doc_id)
                band_ids.append(band)
                band_keys.append("-".join(str(int(v)) for v in seg))
                sigs.append(sig_list)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "band_id": pa.array(band_ids, pa.int32()),
            "band_key": pa.array(band_keys, pa.string()),
            "signature": pa.array(sigs, pa.list_(pa.int64())),
        })


def minhash_duplicate_pairs(
    ds: "ray.data.Dataset", threshold: float = 0.8,
    num_perm: int = 64, shingle_k: int = 5, n_bands: int = 8, seed: int = 42,
) -> "ray.data.Dataset":
    """(a, b, n_agree) near-duplicate pairs: LSH-banded candidates verified by
    signature agreement count n_agree >= ceil(threshold * num_perm). Integer
    output so the DuckDB oracle hash-compares without float formatting drift."""
    from ..stages.pool import stage_map_batches
    min_agree = int(math.ceil(threshold * num_perm - 1e-9))
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
                                 "n_agree": pd.Series(dtype="int64")})
        ids = docs["doc_id"].tolist()
        sigs = np.array(docs["signature"].tolist(), dtype=np.int64)
        rows = []
        for i in range(len(ids)):
            agree = (sigs[i] == sigs[i + 1:]).sum(axis=1)
            for off, n in enumerate(agree):
                if n >= min_agree:
                    rows.append((ids[i], ids[i + 1 + off], int(n)))
        if not rows:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "n_agree": pd.Series(dtype="int64")})
        return pd.DataFrame(rows, columns=["a", "b", "n_agree"])

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # almost every (band_id, band_key) key is a singleton — drop those
        # vectorized before paying per-group python cost on the rest
        dup_mask = df.duplicated(["band_id", "band_key"], keep=False)
        cand = df[dup_mask]
        if not len(cand):
            return verify(df.iloc[:0])
        frames = [verify(g) for _, g in cand.groupby(["band_id", "band_key"], sort=False)]
        frames = [f for f in frames if len(f)]
        if not frames:
            return verify(df.iloc[:0])
        return pd.concat(frames, ignore_index=True)

    pairs = hash_partitioned_groupby(bands, ["band_id", "band_key"],
                                     verify_bucket, n_buckets=32,
                                     map_format="pyarrow")
    # candidate pairs can surface from several bands — dedup on (a, b)
    return hash_partitioned_groupby(
        pairs, ["a", "b"],
        lambda df: df.sort_values(["a", "b"], kind="stable").drop_duplicates(["a", "b"]),
        n_buckets=16,
    )


# --------------------------------------------------------------- simhash ----

def simhash64(text: str) -> int | None:
    """64-bit SimHash over whitespace tokens (Charikar 2002), weighted by
    token count. Token hash = md5_u64 (SQL-reproducible; memoized). Returns
    None for token-less text (excluded, matching the SQL side)."""
    toks = text.split()
    if not toks:
        return None
    uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    h = np.fromiter((md5_u64(t) for t in uniq), dtype=np.uint64, count=len(uniq))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    acc = ((2 * bits - 1) * counts[:, None]).sum(axis=0)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    return int((acc > 0).astype(np.uint64) @ weights)


def simhash_table(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, out = [], []
        for doc_id, t in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            v = simhash64(t or "")
            if v is None:
                continue
            doc_ids.append(doc_id)
            out.append(to_signed64(v))  # signed int64 carrier
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "simhash": pa.array(out, pa.int64()),
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
            u = s % (1 << 64)  # true inverse of to_signed64 (two's-complement)
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
        hs = [s % (1 << 64) for s in docs["simhash"].tolist()]
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
                                     verify_bucket, n_buckets=32,
                                     map_format="pyarrow")
    return hash_partitioned_groupby(
        pairs, ["a", "b"],
        lambda df: df.sort_values(["a", "b"], kind="stable").drop_duplicates(["a", "b"]),
        n_buckets=16,
    )


# ------------------------------------------------------ n-gram jaccard ----

try:  # Rust gram generation when available (pandas/python fallback kept)
    import polars as _pl_probe  # noqa: F401
    _HAVE_POLARS = True
except ImportError:  # pragma: no cover
    _HAVE_POLARS = False

_GRAM_SCHEMA = pa.schema([("doc_id", pa.int64()), ("gram", pa.string()),
                          ("sz", pa.int64())])

# the oracle's token class, pinned EXACTLY: the DuckDB oracle tokenizes
# with RE2 ``\S+``, whose ``\s`` is the ASCII set [\t\n\f\r ] — narrower
# than Python str.split() (which adds \v, \x1c-\x1f, \x85, \xa0 and the
# Unicode spaces) and than the Rust regex crate's Unicode ``\s``. All three
# gram kernels (polars, python fallback, SQL) use this one class so the
# output is identical regardless of which engine runs and what control
# characters the corpus contains.
_TOKEN_RE = r"[^\t\n\f\r ]+"


def _gram_rows_pl(batch: pa.Table, n: int) -> pa.Table:
    """Polars variant of :func:`_gram_rows` — value-identical (tokens =
    ``_TOKEN_RE`` runs, exactly the DuckDB oracle's RE2 ``\\S+``; grams
    joined by a single space; one row per DISTINCT gram per doc; ``sz`` =
    the doc's gram-set size). Explode + windowed shift + concat_str, all
    in Rust — no per-doc Python loop over the corpus."""
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    toks = (df.with_columns(pl.col("text").fill_null("")
                            .str.extract_all(_TOKEN_RE).alias("tok"))
            .select(["doc_id", "tok"])
            .explode("tok")
            .drop_nulls("tok"))
    parts = [pl.col("tok")] + [pl.col("tok").shift(-i).over("doc_id")
                               for i in range(1, n)]
    grams = (toks.with_columns(
        pl.concat_str(parts, separator=" ").alias("gram"))
        .drop_nulls("gram")       # windows running off the doc tail
        .unique(subset=["doc_id", "gram"]))
    sizes = grams.group_by("doc_id").agg(pl.len().cast(pl.Int64).alias("sz"))
    out = grams.join(sizes, on="doc_id").select(["doc_id", "gram", "sz"])
    return out.to_arrow().cast(_GRAM_SCHEMA)


def _gram_rows(batch: pa.Table, n: int) -> pa.Table:
    """(doc_id, gram, sz): distinct word n-grams per doc, with the doc's
    gram-set size carried on every row (computed in-map — no size join).
    Tokenization = ``_TOKEN_RE`` (the oracle's RE2 ``\\S+``), NOT
    ``str.split()`` — the two differ on \\v, \\x1c-\\x1f, \\x85, \\xa0 and
    Unicode spaces."""
    import re as _re

    tok_re = _re.compile(_TOKEN_RE)
    doc_ids, grams, sizes = [], [], []
    join = " ".join
    for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
        toks = tok_re.findall(text or "")
        gs = set(map(join, zip(*(toks[i:] for i in range(n)))))
        if not gs:
            continue
        grams.extend(gs)
        doc_ids.extend([doc_id] * len(gs))
        sizes.extend([len(gs)] * len(gs))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "gram": pa.array(grams, pa.string()),
        "sz": pa.array(sizes, pa.int64()),
    })


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset", n: int = 3, threshold: float = 0.5,
    freq_sample_rate: float = 1.0,
) -> "ray.data.Dataset":
    """EXACT (a, b, n_common, n_union, jaccard) over word n-gram sets with
    jaccard >= threshold — a distributed prefix-filtered set-similarity join
    (Bayardo et al. "Scaling Up All Pairs", PPJoin prefix lemma):

    1. gram rows (doc_id, gram, sz) — distinct n-grams per doc;
    2. global gram frequencies (two-phase count) and a rarest-first ranking
       joined back onto the gram rows (hash_join);
    3. per-doc prefix of the (freq, gram)-sorted grams, length
       sz - ceil(t*sz) + 1 — any pair with J >= t must share a prefix gram;
    4. candidates: per-gram pairs over prefix rows with the |A|>=t|B| length
       filter, deduped;
    5. exact verification: intersection sizes counted distributedly over the
       gram rows of candidate docs only (docs filtered BEFORE gram
       generation; the candidate pair set is broadcast via ray.put — it is
       output-sized, never the corpus).

    ``freq_sample_rate < 1`` estimates the step-2 ranking from a
    deterministic hash-sample of docs (multiplicative hash of doc_id), which
    shrinks the one corpus-sized shuffle by that factor. The prefix lemma
    needs only a CONSISTENT global gram order — any deterministic ranking
    yields the identical verified output; frequency order is purely a
    candidate-count heuristic, so sampling trades a few extra candidates for
    a much smaller shuffle (the 100 TB configuration; tested equivalent).

    Matches the DuckDB oracle exactly (same tokenization: ``_TOKEN_RE``,
    the oracle's RE2 ``\\S+`` — see the constant's note on why this is NOT
    ``str.split()``)."""
    gram_fn = _gram_rows_pl if _HAVE_POLARS else _gram_rows
    grams = ds.map_batches(lambda b: gram_fn(b, n),
                           batch_format="pyarrow", batch_size=2048)

    # 2. global frequencies: map-side combine then bucket reduce
    def partial_freq(batch: pa.Table) -> pa.Table:
        # native Arrow hash-aggregate; the gram strings never touch pandas
        agg = batch.group_by("gram").aggregate([("gram", "count")])
        return agg.rename_columns(["gram", "freq"])

    freq_in = grams
    if freq_sample_rate < 1.0:
        keep_below = np.uint64(int(freq_sample_rate * 0xFFFFFFFF))

        def doc_sample(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.uint64)
            h = (ids * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
            return batch.filter(pa.array(h <= keep_below))

        freq_in = grams.map_batches(doc_sample, batch_format="pyarrow",
                                    batch_size=16384)

    freq = hash_partitioned_groupby(
        freq_in.map_batches(partial_freq, batch_format="pyarrow", batch_size=16384),
        ["gram"],
        lambda df: df.groupby("gram", sort=False)["freq"].sum().reset_index(),
        n_buckets=32, map_format="pyarrow",
    ).materialize()

    # 3. per-doc prefix under the (freq, gram) global order. Two physical
    # plans, auto-selected (the alias-remap pattern): when the distinct-gram
    # table fits a broadcast, recompute grams per doc IN-MAP with the freq
    # dict at hand — zero shuffles; otherwise hash_join + a doc_id shuffle
    # (the 100 TB fallback; any consistent global order keeps exactness).
    freq_broadcast = freq.count() <= _FREQ_BROADCAST_LIMIT
    if freq_broadcast:
        freq_pdf = freq.to_pandas()
        if _HAVE_POLARS:
            # broadcast the ranking as an Arrow table (zero-copy ray.get in
            # every task) instead of a python dict
            freq_ref = ray.put(pa.table({
                "gram": pa.array(freq_pdf["gram"], pa.string()),
                "freq": pa.array(freq_pdf["freq"], pa.int64())}))

            def prefix_in_map(batch: pa.Table) -> pa.Table:
                import polars as pl
                g = pl.from_arrow(_gram_rows_pl(batch, n))
                fr = pl.from_arrow(ray.get(freq_ref))
                g = (g.join(fr, on="gram", how="left")
                     .with_columns(pl.col("freq").fill_null(0))
                     .sort(["doc_id", "freq", "gram"])
                     .with_columns(
                         pl.int_range(pl.len()).over("doc_id").alias("rk"),
                         ((pl.col("sz").cast(pl.Float64) * threshold - 1e-9)
                          .ceil().cast(pl.Int64)).alias("_c"))
                     .filter(pl.col("rk") < pl.col("sz") - pl.col("_c") + 1)
                     .select(["doc_id", "gram", "sz"]))
                return g.to_arrow().cast(_GRAM_SCHEMA)
        else:
            freq_ref = ray.put(dict(zip(freq_pdf["gram"], freq_pdf["freq"])))

            def prefix_in_map(batch: pa.Table) -> pa.Table:
                import re as _re
                tok_re = _re.compile(_TOKEN_RE)
                fr = ray.get(freq_ref)
                join = " ".join
                doc_ids, grams_out, sizes = [], [], []
                for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                        batch.column("text").to_pylist()):
                    toks = tok_re.findall(text or "")
                    gs = set(map(join, zip(*(toks[i:] for i in range(n)))))
                    if not gs:
                        continue
                    sz = len(gs)
                    plen = sz - math.ceil(threshold * sz - 1e-9) + 1
                    pref = sorted(gs, key=lambda g: (fr.get(g, 0), g))[:plen]
                    doc_ids.extend([doc_id] * len(pref))
                    grams_out.extend(pref)
                    sizes.extend([sz] * len(pref))
                return pa.table({
                    "doc_id": pa.array(doc_ids, pa.int64()),
                    "gram": pa.array(grams_out, pa.string()),
                    "sz": pa.array(sizes, pa.int64()),
                })

        prefixes = ds.map_batches(prefix_in_map, batch_format="pyarrow",
                                  batch_size=2048)
    else:
        ranked = hash_join(grams, freq, on=["gram"], n_buckets=32)

        def prefix_of_doc(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["doc_id", "freq", "gram"], kind="stable")
            plen = (df["sz"] - np.ceil(threshold * df["sz"] - 1e-9).astype(int) + 1)
            keep = df.groupby("doc_id", sort=False).cumcount() < plen
            return df.loc[keep, ["doc_id", "gram", "sz"]]

        prefixes = hash_partitioned_groupby(ranked, ["doc_id"], prefix_of_doc,
                                            n_buckets=32)

    # 4. candidate pairs from shared prefix grams (+ length filter)
    def pairs_in_gram(df: pd.DataFrame) -> pd.DataFrame:
        """One self-merge over the NON-singleton grams of the bucket —
        almost every prefix gram appears once; dropping those vectorized
        first avoids a per-gram Python loop."""
        empty_c = pd.DataFrame({"a": pd.Series(dtype="int64"),
                                "b": pd.Series(dtype="int64"),
                                "sz_a": pd.Series(dtype="int64"),
                                "sz_b": pd.Series(dtype="int64")})
        df = df.drop_duplicates(["gram", "doc_id"])
        shared = df[df.duplicated("gram", keep=False)]
        if not len(shared):
            return empty_c
        m = shared.merge(shared, on="gram", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        if not len(m):
            return empty_c
        # length filter: J >= t needs t*|B| <= |A| (A smaller)
        lo = m[["sz_a", "sz_b"]].min(axis=1)
        hi = m[["sz_a", "sz_b"]].max(axis=1)
        m = m[lo >= threshold * hi]
        if not len(m):
            return empty_c
        return (m[["doc_id_a", "doc_id_b", "sz_a", "sz_b"]]
                .rename(columns={"doc_id_a": "a", "doc_id_b": "b"})
                .drop_duplicates(["a", "b"]))

    cand = hash_partitioned_groupby(prefixes, ["gram"], pairs_in_gram,
                                    n_buckets=32,
                                    map_format="pyarrow" if freq_broadcast
                                    else "pandas").materialize()
    # candidate pairs are output-sized by the prefix+length filters; guard the
    # driver collect anyway (a pathologically dup-heavy corpus could exceed it
    # — the fix there is raising the threshold or sharding the verify pass).
    # materialize() above makes the guard count + the collect read the same
    # computed blocks instead of re-executing the candidate pipeline.
    n_cand = cand.count()
    if n_cand > MAX_DRIVER_CANDIDATE_PAIRS:
        raise RuntimeError(
            f"ngram_jaccard_pairs: {n_cand} candidate pairs exceed the driver "
            f"guard ({MAX_DRIVER_CANDIDATE_PAIRS}); corpus is duplicate-heavy "
            "— raise the threshold or shard the verification pass")
    cand_pdf = cand.to_pandas().drop_duplicates(["a", "b"])  # output-sized
    empty = pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                          "n_common": pd.Series(dtype="int64"),
                          "n_union": pd.Series(dtype="int64"),
                          "jaccard": pd.Series(dtype="float64")})
    if len(cand_pdf) == 0 or "a" not in cand_pdf.columns:
        return ray.data.from_pandas(empty)

    cand_docs = set(cand_pdf["a"]) | set(cand_pdf["b"])
    pair_key = set(zip(cand_pdf["a"], cand_pdf["b"]))
    bcast = ray.put((cand_docs, pair_key))

    def filter_docs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        docs, _ = ray.get(bcast)
        value_set = pa.array(list(docs), pa.int64())
        return batch.filter(_pc.is_in(batch.column("doc_id"), value_set=value_set))

    # filter the candidate DOCS first, regenerate grams only for them —
    # the verification scan never tokenizes the non-candidate corpus
    cand_grams = ds.map_batches(filter_docs, batch_format="pyarrow",
                                batch_size=16384) \
        .map_batches(lambda b: gram_fn(b, n),
                     batch_format="pyarrow", batch_size=2048)

    # 5. intersection counts: per-gram pair emission restricted to candidate
    # pairs, then a (a, b) count reduce — exact |A ∩ B|
    def common_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        _, pairs_ok = ray.get(bcast)
        m = df.merge(df, on="gram", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        if not len(m):
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        keep = [(x, y) in pairs_ok
                for x, y in zip(m["doc_id_a"], m["doc_id_b"])]
        m = m[np.asarray(keep, dtype=bool)]
        agg = (m.groupby(["doc_id_a", "doc_id_b"], sort=False).size()
               .reset_index(name="c")
               .rename(columns={"doc_id_a": "a", "doc_id_b": "b"}))
        return agg

    partial_common = hash_partitioned_groupby(cand_grams, ["gram"],
                                              common_in_bucket, n_buckets=32,
                                              map_format="pyarrow")
    # final reduce is OUTPUT-sized (≤ candidate pairs × buckets partial rows)
    # — a driver groupby, not another full shuffle
    pc_pdf = partial_common.to_pandas()
    if len(pc_pdf) == 0 or "a" not in pc_pdf.columns:
        return ray.data.from_pandas(empty)
    common = pc_pdf.groupby(["a", "b"], sort=False)["c"].sum().reset_index()

    sizes = dict(zip(cand_pdf["a"], cand_pdf["sz_a"]))
    sizes.update(zip(cand_pdf["b"], cand_pdf["sz_b"]))
    common["n_common"] = common["c"].astype("int64")
    common["n_union"] = (common["a"].map(sizes) + common["b"].map(sizes)
                         - common["c"]).astype("int64")
    common["jaccard"] = common["n_common"] / common["n_union"]
    out = common[common["jaccard"] >= threshold]
    out = out[["a", "b", "n_common", "n_union", "jaccard"]].reset_index(drop=True)
    if len(out) == 0:
        return ray.data.from_pandas(empty)
    return ray.data.from_pandas(out)


# ------------------------------------------- embedding-cosine near-dup ----

def embedding_neardup_pairs(
    emb: "ray.data.Dataset", threshold: float = 0.95, round_digits: int = 6,
) -> "ray.data.Dataset":
    """Exact all-pairs cosine near-dup: (a, b) with round(cos,6) >= threshold,
    a < b. The full matrix is broadcast ONCE via ray.put and each batch scans
    against it — O(n·n/B) matmuls, the documented brute-force baseline with an
    exact SQL oracle. ``embedding_neardup_blocked`` is the LSH-bucketed scale
    path; this exact variant doubles as its recall oracle."""
    pdf = emb.select_columns(["vec_id", "embedding"]).to_pandas()
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    ids = pdf["vec_id"].to_numpy()
    mat_ref = ray.put((ids, mat, norms))

    def scan(batch: pa.Table) -> pa.Table:
        all_ids, all_mat, all_norms = ray.get(mat_ref)
        b_ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(b_ids):
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        b_mat = list_column_to_matrix(batch.column("embedding")).astype(np.float64)
        b_norms = np.linalg.norm(b_mat, axis=1)
        b_norms[b_norms == 0] = 1.0
        sims = (b_mat @ all_mat.T) / np.outer(b_norms, all_norms)
        sims = np.round(sims, round_digits)
        # one 2-D mask + nonzero instead of a per-row Python append loop;
        # row-major nonzero preserves the (i asc, j asc) emission order
        mask = (sims >= threshold) & (all_ids[None, :] > b_ids[:, None])
        ii, jj = np.nonzero(mask)
        return pa.table({
            "a": pa.array(b_ids[ii], pa.int64()),
            "b": pa.array(all_ids[jj].astype(np.int64), pa.int64()),
        })

    return emb.select_columns(["vec_id", "embedding"]).map_batches(
        scan, batch_format="pyarrow", batch_size=2048
    )


def auto_lsh_tables(threshold: float, n_bits: int,
                    target_recall: float = 1 - 1e-6, cap: int = 64) -> int:
    """OR-construction size for random-hyperplane LSH at a cosine threshold:
    a pair AT the threshold collides in one table with probability
    p = (1 - arccos(threshold)/π)^n_bits (Charikar 2002), so ``L`` tables
    give recall 1-(1-p)^L and L = ceil(ln(1-target)/ln(1-p)). Pairs above
    the threshold collide more often, so this is the worst-case pair — the
    computed knob replaces the hand-tuned table count (at the driver's
    threshold=0.35, n_bits=2 config this yields 30, matching the 32 that was
    empirically exact through sf0.1)."""
    import math
    p = (1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi) ** n_bits
    if p >= 1.0:
        return 1
    if p <= 0.0:
        return cap
    return int(min(cap, max(1, math.ceil(
        math.log(1.0 - target_recall) / math.log(1.0 - p)))))


def auto_neardup_bits(n: int, target_bucket: int = 2048) -> int:
    """Corpus-size rule for the blocked-neardup hyperplane count: enough
    bits that an average (table, bucket) group holds ~``target_bucket``
    vectors (n / 2^bits ≤ target), clamped to [2, 20] — bucket size stays
    bounded as the corpus grows instead of being a corpus-calibrated
    constant."""
    import math
    return int(min(20, max(2, math.ceil(math.log2(max(2.0, n / target_bucket))))))


def embedding_neardup_blocked(
    emb: "ray.data.Dataset", threshold: float = 0.95,
    n_bits: int | None = 6, n_tables: int | None = 8, seed: int = 42,
    round_digits: int = 6,
) -> "ray.data.Dataset":
    """LSH-blocked near-dup — the 100 TB path. Each vector is exploded to
    ``n_tables`` random-hyperplane bucket keys; pairs are found by exact
    cosine inside each (table, bucket) group and deduped across tables. The
    all-pairs scan becomes a groupby; recall vs the exact baseline depends on
    (threshold, n_bits, n_tables) and is measured in tests/bench (recall→1 as
    n_tables grows; collision prob per table = (1 - θ/π)^n_bits).
    ``n_bits=None`` applies the :func:`auto_neardup_bits` corpus-size rule
    and ``n_tables=None`` the :func:`auto_lsh_tables` recall rule — the
    knobs are then computed from (corpus size, threshold, target recall)
    instead of hand-tuned."""
    if n_bits is None:
        n_bits = auto_neardup_bits(emb.count())
    if n_tables is None:
        n_tables = auto_lsh_tables(threshold, n_bits)

    def explode(batch: pa.Table) -> pa.Table:
        mat = list_column_to_matrix(batch.column("embedding")).astype(np.float32)
        if len(mat) == 0:
            return pa.table({"table_id": pa.array([], pa.int32()),
                             "bucket": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "embedding": batch.column("embedding")})
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        vec_ids = batch.column("vec_id")
        tables, buckets, ids_out, emb_idx = [], [], [], []
        for t in range(n_tables):
            bk = lsh_bucket(unit, n_bits, seed + t)
            tables.extend([t] * len(bk))
            buckets.extend(int(x) for x in bk)
            ids_out.extend(vec_ids.to_pylist())
            emb_idx.extend(range(len(bk)))
        dim = mat.shape[1]
        sel = mat[np.asarray(emb_idx, dtype=np.int64)]
        offsets = pa.array(np.arange(0, (len(sel) + 1) * dim, dim, dtype=np.int32))
        emb_col = pa.ListArray.from_arrays(offsets, pa.array(sel.ravel(), pa.float32()))
        return pa.table({
            "table_id": pa.array(tables, pa.int32()),
            "bucket": pa.array(buckets, pa.int64()),
            "vec_id": pa.array(ids_out, pa.int64()),
            "embedding": emb_col,
        })

    exploded = emb.select_columns(["vec_id", "embedding"]).map_batches(
        explode, batch_format="pyarrow", batch_size=4096)

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, g in df.groupby(["table_id", "bucket"], sort=False):
            g = g.drop_duplicates("vec_id").sort_values("vec_id")
            if len(g) < 2:
                continue
            ids = g["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(g["embedding"].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            unit = mat / norms[:, None]
            sims = np.round(unit @ unit.T, round_digits)
            iu = np.triu_indices(len(ids), k=1)
            hit = sims[iu] >= threshold
            if hit.any():
                frames.append(pd.DataFrame({
                    "a": ids[iu[0][hit]], "b": ids[iu[1][hit]],
                }))
        if not frames:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    # Arrow map side: the embedding list column crosses the bucket shuffle
    # as zero-copy Arrow instead of tensor-extension pandas blocks
    pairs = hash_partitioned_groupby(exploded, ["table_id", "bucket"],
                                     pairs_in_bucket, n_buckets=32,
                                     map_format="pyarrow")
    return hash_partitioned_groupby(
        pairs, ["a", "b"],
        lambda df: df.sort_values(["a", "b"], kind="stable").drop_duplicates(["a", "b"]),
        n_buckets=16,
    )


# ------------------------------------------------- winnowing shared pairs ----

def winnow_shared_pairs(
    ds: "ray.data.Dataset", k: int = 8, window: int = 16,
    min_shared: int = 2, max_df: int = 64,
) -> "ray.data.Dataset":
    """(a, b, n_shared): document pairs sharing >= ``min_shared`` winnowing
    fingerprints — substring-granular near-duplicate detection (the MOSS
    shape: shared fingerprints ≈ shared passages, robust to reordering that
    defeats whole-document MinHash). Fingerprints appearing in more than
    ``max_df`` docs are dropped BEFORE pairing — ubiquitous substrings are
    boilerplate, carry no pair signal, and would make the per-fingerprint
    pair emission quadratic in the hottest group; the SQL oracle applies the
    identical df filter, so the operator stays exactly verifiable.

    Scale shape: fingerprints shuffle once by fp (pair emission bounded by
    max_df² per group), pair counts shuffle once by (a, b) — both rounds are
    map-side-combined; no driver collection."""
    from .textstats import winnow_fingerprints

    fps = winnow_fingerprints(ds, k=k, window=window)

    empty_p = pd.DataFrame({"a": pd.Series(dtype="int64"),
                            "b": pd.Series(dtype="int64"),
                            "n": pd.Series(dtype="int64")})

    def pairs_in_fp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["fp", "doc_id"])
        sizes = df.groupby("fp", sort=False)["doc_id"].transform("size")
        df = df[(sizes >= 2) & (sizes <= max_df)]
        if not len(df):
            return empty_p
        m = df.merge(df, on="fp")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if not len(m):
            return empty_p
        agg = (m.groupby(["doc_id_x", "doc_id_y"], sort=False).size()
               .reset_index(name="n")
               .rename(columns={"doc_id_x": "a", "doc_id_y": "b"}))
        return agg

    partial = hash_partitioned_groupby(fps, ["fp"], pairs_in_fp, n_buckets=32)

    def reduce_pairs(df: pd.DataFrame) -> pd.DataFrame:
        agg = (df.groupby(["a", "b"], sort=False)["n"].sum()
               .reset_index(name="n_shared"))
        return agg[agg["n_shared"] >= min_shared]

    return hash_partitioned_groupby(partial, ["a", "b"], reduce_pairs,
                                    n_buckets=32)


# ----------------------------------------------- duplicate resolution ------

def duplicate_components(
    pairs: "ray.data.Dataset", max_rounds: int = 20, n_buckets: int = 32,
) -> "ray.data.Dataset":
    """Resolve a near-duplicate PAIR list (``a``, ``b`` int64 doc ids — the
    output shape of minhash/simhash/ngram/embedding pair ops) into duplicate
    GROUPS: ``(doc_id, component)`` where ``component`` is the smallest doc
    id in the connected component. This is the resolution step every dedup
    policy needs after pair generation (keep ``doc_id == component``, drop
    the rest — the SemDeDup/NearDup "one representative per cluster" rule).

    Distributed min-label propagation with pointer jumping
    (functions/components.py) — no driver union-find, so the pair set can be
    corpus-sized. Ids travel zero-padded so lexicographic min == numeric min.
    """
    from ..functions.components import connected_components

    def enc(batch: pa.Table) -> pa.Table:
        a = [f"{int(x):020d}" for x in batch.column("a").to_pylist()]
        b = [f"{int(x):020d}" for x in batch.column("b").to_pylist()]
        return pa.table({"a": pa.array(a, pa.string()),
                         "b": pa.array(b, pa.string())})

    comp = connected_components(
        pairs.map_batches(enc, batch_format="pyarrow"),
        max_rounds=max_rounds, n_buckets=n_buckets)

    def dec(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pa.array([int(x) for x in batch.column("node").to_pylist()],
                               pa.int64()),
            "component": pa.array(
                [int(x) for x in batch.column("component").to_pylist()],
                pa.int64()),
        })

    return comp.map_batches(dec, batch_format="pyarrow")


def resolve_duplicates(
    docs: "ray.data.Dataset", pairs: "ray.data.Dataset",
    max_rounds: int = 20, n_buckets: int = 32,
    broadcast_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """Drop every document dominated by a smaller-id near-duplicate: keep a
    doc iff it is not a non-representative member of a duplicate component.

    The dominated-id set is duplicate-count-sized, not corpus-sized, but a
    duplicate-heavy corpus (50% dups) makes it corpus/2 — so the exclusion
    strategy auto-selects: ``ray.put`` + vectorized ``pc.is_in`` below
    ``broadcast_limit`` ids, distributed hash anti-join above (same
    broadcast-vs-shuffle rule as the canonicalization alias remap,
    pipelines/build.py)."""
    import pyarrow.compute as pc

    from ..functions.shuffle import hash_anti_join

    comp = duplicate_components(pairs, max_rounds=max_rounds, n_buckets=n_buckets)

    def dominated_only(batch: pa.Table) -> pa.Table:
        mask = pc.not_equal(batch.column("doc_id"), batch.column("component"))
        return batch.filter(mask).select(["doc_id"])

    dominated = comp.map_batches(
        dominated_only, batch_format="pyarrow").materialize()
    if dominated.count() == 0:
        return docs
    if dominated.count() > broadcast_limit:
        return hash_anti_join(docs, dominated, on=["doc_id"],
                              n_buckets=n_buckets)
    dom_ids = pa.array(dominated.to_pandas()["doc_id"], pa.int64())
    dom_ref = ray.put(dom_ids)

    def keep(batch: pa.Table) -> pa.Table:
        dom = ray.get(dom_ref)
        return batch.filter(
            pc.invert(pc.is_in(batch.column("doc_id"), value_set=dom)))

    return docs.map_batches(keep, batch_format="pyarrow", batch_size=8192)


def duplicate_components_sql(pairs_sql: str) -> str:
    """DuckDB oracle for :func:`duplicate_components`: recursive-CTE
    transitive closure over the pair query (exact for the driver's
    test-scale pair sets; the Ray path is the scale implementation)."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT a, b FROM ({pairs_sql}) AS p
),
edges AS (
  SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
),
reach(src, node) AS (
  SELECT a, a FROM edges
  UNION
  SELECT reach.src, e.b FROM reach JOIN edges e ON e.a = reach.node
)
SELECT node AS doc_id, MIN(src) AS component
FROM reach GROUP BY node
"""


def resolve_duplicates_sql(pairs_sql: str, columns: str = "doc_id",
                           table: str = "documents") -> str:
    """DuckDB oracle for :func:`resolve_duplicates` (projected columns)."""
    return f"""
SELECT {columns} FROM {table}
WHERE doc_id NOT IN (
  SELECT doc_id FROM ({duplicate_components_sql(pairs_sql)}) AS comp
  WHERE doc_id <> component
)
"""
