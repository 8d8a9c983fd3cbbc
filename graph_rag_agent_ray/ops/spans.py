"""Exact duplicated-substring spans — the ExactSubstr dedup protocol of
Lee et al. 2022 ("Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499), re-expressed as Ray Data dataflow.

A character ``length``-gram is *duplicated* when the identical substring
occurs at >= ``min_count`` distinct (doc, offset) positions corpus-wide
(within-doc repeats count); per doc, duplicated positions merge into maximal
[start, end) character spans. The reference protocol builds one giant suffix
array — a single-machine structure; the corpus-wide question it answers
("which length-L windows repeat?") is a groupby, so here it is two shuffles:

1. CANDIDATES — one corpus pass emits the SQL-reproducible rolling hash
   (functions/sqlhash.gram_hashes, vectorized per doc) of every position;
   a (hash)-keyed shuffle keeps positions whose hash repeats. Everything
   downstream is duplicated-text-sized, not corpus-sized.
2. VERIFY — candidate positions regroup per doc, join back to the text
   (distributed hash join), slice the actual substrings, and a
   (gram-string)-keyed shuffle re-applies the >= min_count test on true
   substrings — 64-bit hash collisions (certain at 100 TB: ~1e12 grams)
   can only create candidates, never output rows, so the result is EXACT
   and the DuckDB oracle groups by substr() directly.
3. MERGE — per-doc sort + lag-gap scan folds positions into maximal spans
   (all windows share one length, so interval ends are monotone in start
   and the single-lag scan is exact).

``strip_duplicate_spans`` removes every duplicated span from every doc (the
aggressive variant: no canonical occurrence is kept — callers wanting
keep-one semantics route the spans table into a policy of their own).

Positions are Unicode CHARACTER offsets, 0-based, end-exclusive on both the
Ray and SQL sides (DuckDB substr/length are character-addressed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.shuffle import hash_join_arrow, hash_partitioned_groupby
from ..functions.sqlhash import gram_hashes

_EMPTY_POS = pa.table({
    "doc_id": pa.array([], pa.int64()),
    "h": pa.array([], pa.int64()),
    "pos": pa.array([], pa.int64()),
})


def _candidate_positions(ds: "ray.data.Dataset", length: int,
                         min_count: int, n_buckets: int) -> "ray.data.Dataset":
    """(doc_id, pos) rows whose rolling gram hash repeats >= min_count
    times corpus-wide — a strict superset of the true duplicated positions."""

    def hash_rows(batch: pa.Table) -> pa.Table:
        ids, hs, ps = [], [], []
        for doc_id, t in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            h = gram_hashes(t or "", length)
            if len(h) == 0:
                continue
            ids.append(np.full(len(h), doc_id, dtype=np.int64))
            hs.append(h.view(np.int64))  # two's-complement Arrow carrier
            ps.append(np.arange(len(h), dtype=np.int64))
        if not ids:
            return _EMPTY_POS
        return pa.table({
            "doc_id": pa.array(np.concatenate(ids)),
            "h": pa.array(np.concatenate(hs)),
            "pos": pa.array(np.concatenate(ps)),
        })

    rows = ds.map_batches(hash_rows, batch_format="pyarrow", batch_size=512)

    def keep_repeated(df: pd.DataFrame) -> pd.DataFrame:
        counts = df.groupby("h", sort=False)["h"].transform("size")
        return df.loc[counts >= min_count, ["doc_id", "pos"]]

    return hash_partitioned_groupby(rows, ["h"], keep_repeated,
                                    n_buckets=n_buckets,
                                    map_format="pyarrow")


def _verified_positions(ds: "ray.data.Dataset", cand: "ray.data.Dataset",
                        length: int, min_count: int,
                        n_buckets: int) -> "ray.data.Dataset":
    """Re-test candidates on the actual substrings (collision-exact)."""

    def pos_lists(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("doc_id", sort=False)["pos"]
                .agg(lambda s: sorted(set(s))).reset_index(name="cand_pos"))

    per_doc = hash_partitioned_groupby(cand, ["doc_id"], pos_lists,
                                       n_buckets=32)
    # Arrow join: the corpus text column never round-trips through pandas
    # NA-tagging (hash_join_arrow moves zero-copy Arrow blocks)
    joined = hash_join_arrow(
        per_doc, ds.select_columns(["doc_id", "text"]), on=["doc_id"],
        lschema={"doc_id": pa.int64(), "cand_pos": pa.list_(pa.int64())},
        rschema={"doc_id": pa.int64(), "text": pa.string()}, n_buckets=32)

    def slice_grams(df: pd.DataFrame) -> pd.DataFrame:
        ids, poss, grams = [], [], []
        for doc_id, cand_pos, t in zip(df["doc_id"], df["cand_pos"],
                                       df["text"]):
            t = t or ""
            for p in cand_pos:
                ids.append(doc_id)
                poss.append(p)
                grams.append(t[p:p + length])
        return pd.DataFrame({"gram": grams,
                             "doc_id": pd.array(ids, dtype="int64"),
                             "pos": pd.array(poss, dtype="int64")})

    grams = joined.map_batches(slice_grams, batch_format="pandas",
                               batch_size=256)

    def keep_repeated(df: pd.DataFrame) -> pd.DataFrame:
        counts = df.groupby("gram", sort=False)["gram"].transform("size")
        return df.loc[counts >= min_count, ["doc_id", "pos"]]

    return hash_partitioned_groupby(grams, ["gram"], keep_repeated,
                                    n_buckets=n_buckets)


def _merge_positions(verified: "ray.data.Dataset",
                     length: int) -> "ray.data.Dataset":
    """Fold duplicated positions into maximal per-doc spans — vectorized
    across all docs of a bucket (one sort + one lag-gap scan)."""

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "span_start": pd.Series(dtype="int64"),
                                 "span_end": pd.Series(dtype="int64")})
        d = df.drop_duplicates().sort_values(["doc_id", "pos"])
        doc = d["doc_id"].to_numpy()
        pos = d["pos"].to_numpy()
        brk = np.ones(len(d), dtype=bool)
        brk[1:] = (doc[1:] != doc[:-1]) | ((pos[1:] - pos[:-1]) > length)
        island = np.cumsum(brk)
        g = pd.DataFrame({"doc_id": doc, "pos": pos, "island": island})
        agg = g.groupby("island", sort=False).agg(
            doc_id=("doc_id", "first"), span_start=("pos", "min"),
            span_end=("pos", "max"))
        agg["span_end"] = agg["span_end"] + length
        return agg.reset_index(drop=True).astype(
            {"doc_id": "int64", "span_start": "int64", "span_end": "int64"})

    return hash_partitioned_groupby(verified, ["doc_id"], merge_bucket,
                                    n_buckets=32)


def duplicate_spans(
    ds: "ray.data.Dataset", length: int = 20, min_count: int = 2,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """(doc_id, span_start, span_end) — maximal character spans covered by
    substrings of ``length`` chars occurring >= ``min_count`` times
    corpus-wide. See module docstring for the candidates→verify→merge shape."""
    cand = _candidate_positions(ds, length, min_count, n_buckets)
    verified = _verified_positions(ds, cand, length, min_count, n_buckets)
    return _merge_positions(verified, length)


def strip_duplicate_spans(
    ds: "ray.data.Dataset", length: int = 20, min_count: int = 2,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """(doc_id, text) with every duplicated span removed (remaining segments
    concatenated in order); docs with no duplicated span pass through
    verbatim. One extra doc-keyed join over :func:`duplicate_spans`."""
    spans = duplicate_spans(ds, length, min_count, n_buckets)

    def span_lists(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "span_start"])
        g = (df.groupby("doc_id", sort=False)
             .agg(starts=("span_start", list), ends=("span_end", list))
             .reset_index())
        g["spans"] = [[[int(a), int(b)] for a, b in zip(s, e)]
                      for s, e in zip(g["starts"], g["ends"])]
        return g[["doc_id", "spans"]]

    per_doc = hash_partitioned_groupby(spans, ["doc_id"], span_lists,
                                       n_buckets=32)
    joined = hash_join_arrow(
        ds.select_columns(["doc_id", "text"]), per_doc,
        on=["doc_id"], how="left", n_buckets=32,
        lschema={"doc_id": pa.int64(), "text": pa.string()},
        rschema={"doc_id": pa.int64(),
                 "spans": pa.list_(pa.list_(pa.int64()))})

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t, sp in zip(df["text"], df["spans"]):
            t = t or ""
            if not isinstance(sp, (list, np.ndarray)) or len(sp) == 0:
                out.append(t)
                continue
            kept, prev_end = [], 0
            for s, e in sp:
                kept.append(t[prev_end:s])
                prev_end = e
            kept.append(t[prev_end:])
            out.append("".join(kept))
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                             "text": out})

    return joined.map_batches(cut, batch_format="pandas", batch_size=1024)


def _spans_cte(length: int, min_count: int) -> str:
    return f"""
pos AS (
  SELECT doc_id, i - 1 AS pos, substr(text, i, {length}) AS gram
  FROM documents,
       LATERAL (SELECT unnest(range(1, length(text) - {length} + 2)) AS i) r
  WHERE length(text) >= {length}
), dup AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS c FROM pos
  ) WHERE c >= {min_count}
), isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {length} THEN 0 ELSE 1 END AS brk
  FROM dup
), grp AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl
), spans AS (
  SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         CAST(max(pos) + {length} AS BIGINT) AS span_end
  FROM grp GROUP BY doc_id, island
)"""


def duplicate_spans_sql(length: int = 20, min_count: int = 2) -> str:
    """DuckDB oracle for :func:`duplicate_spans` — groups by the literal
    substring (no hashing), then the same lag-gap island merge."""
    return f"WITH {_spans_cte(length, min_count)} SELECT * FROM spans"


def strip_duplicate_spans_sql(length: int = 20, min_count: int = 2) -> str:
    """DuckDB oracle for :func:`strip_duplicate_spans` — kept text is the
    ordered concatenation of the gap segments (span_start(i-1)..span_start(i))
    plus the tail after the last span; zero-length segments contribute ''."""
    return f"""
WITH {_spans_cte(length, min_count)}, segs AS (
  SELECT doc_id, span_start AS seg_end,
         lag(span_end, 1, 0) OVER (PARTITION BY doc_id
                                   ORDER BY span_start) AS seg_start
  FROM spans
  UNION ALL
  SELECT s.doc_id, length(d.text) AS seg_end, max(s.span_end) AS seg_start
  FROM spans s JOIN documents d USING (doc_id)
  GROUP BY s.doc_id, length(d.text)
), agg AS (
  SELECT s.doc_id,
         string_agg(substr(d.text, s.seg_start + 1, s.seg_end - s.seg_start),
                    '' ORDER BY s.seg_start) AS text
  FROM segs s JOIN documents d USING (doc_id)
  GROUP BY s.doc_id
)
SELECT d.doc_id, coalesce(a.text, d.text) AS text
FROM documents d LEFT JOIN agg a USING (doc_id)
"""
