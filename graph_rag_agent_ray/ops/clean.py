"""Corpus cleaning operators: boilerplate-line detection/removal and PII
masking — the C4-style preprocessing a training-data pipeline runs before
dedup (Raffel et al. 2020 strip repeated boilerplate lines; public corpus
pipelines mask emails/phones).

Scale shapes:
- boilerplate: lines explode to (doc_id, line_idx, line) rows; ONE shuffle
  by line computes global document frequency AND emits per-doc boilerplate
  occurrence partials in the same reducer (all rows of a line share a
  bucket, so the df is exact); a second doc-keyed reduce merges counts.
  No driver collection, no broadcast of the line table.
- pii masking: stateless vectorized map — compiled-regex substitution per
  batch; counts are exact and SQL-reproducible (RE2-compatible patterns).
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.shuffle import hash_partitioned_groupby


def _line_rows(batch: pa.Table) -> pa.Table:
    doc_ids, idxs, lines = [], [], []
    for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
        for i, line in enumerate((text or "").split("\n")):
            doc_ids.append(doc_id)
            idxs.append(i)
            lines.append(line)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "line_idx": pa.array(idxs, pa.int64()),
        "line": pa.array(lines, pa.string()),
    })


def boilerplate_stats(ds: "ray.data.Dataset", min_df: int = 2) -> "ray.data.Dataset":
    """(doc_id, n_lines, n_boilerplate): per document, total line count and
    the count of line OCCURRENCES whose line text appears in >= ``min_df``
    DISTINCT documents. Exactly mirrors the DuckDB string_split/unnest
    oracle (ops.oracles.boilerplate_sql)."""
    occ = ds.map_batches(_line_rows, batch_format="pyarrow", batch_size=2048)

    def per_line(df: pd.DataFrame) -> pd.DataFrame:
        """One bucket holds every occurrence of its lines corpus-wide."""
        dfreq = df.groupby("line", sort=False)["doc_id"].nunique()
        boiler = set(dfreq[dfreq >= min_df].index)
        out = df.assign(is_b=df["line"].isin(boiler).astype("int64"))
        agg = (out.groupby("doc_id", sort=False)
               .agg(n_lines=("line", "size"), n_boilerplate=("is_b", "sum"))
               .reset_index())
        return agg

    partial = hash_partitioned_groupby(occ, ["line"], per_line, n_buckets=32)
    return hash_partitioned_groupby(
        partial, ["doc_id"],
        lambda df: df.groupby("doc_id", sort=False)
        .agg(n_lines=("n_lines", "sum"), n_boilerplate=("n_boilerplate", "sum"))
        .reset_index(),
        n_buckets=32,
    )


def strip_boilerplate(ds: "ray.data.Dataset", min_df: int = 2) -> "ray.data.Dataset":
    """(doc_id, text): documents with boilerplate lines removed (df >=
    min_df), remaining lines rejoined in original order. Same line-bucket
    shuffle as :func:`boilerplate_stats` followed by a doc-keyed regroup
    that restores line order — text never touches the driver."""
    occ = ds.map_batches(_line_rows, batch_format="pyarrow", batch_size=2048)

    def keep_lines(df: pd.DataFrame) -> pd.DataFrame:
        dfreq = df.groupby("line", sort=False)["doc_id"].nunique()
        boiler = set(dfreq[dfreq >= min_df].index)
        return df[~df["line"].isin(boiler)][["doc_id", "line_idx", "line"]]

    kept = hash_partitioned_groupby(occ, ["line"], keep_lines, n_buckets=32)

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "line_idx"], kind="stable")
        agg = df.groupby("doc_id", sort=False)["line"].agg("\n".join)
        return agg.reset_index().rename(columns={"line": "text"})

    return hash_partitioned_groupby(kept, ["doc_id"], rebuild, n_buckets=32)


# RE2-compatible (no backrefs/lookaround) so DuckDB regexp_extract_all
# counts the identical matches — keep in sync with ops.oracles.pii_sql
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"

_EMAIL = re.compile(EMAIL_RE)
_PHONE = re.compile(PHONE_RE)


def mask_pii(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, text, n_emails, n_phones): emails → ``[EMAIL]``, phone-like
    digit runs → ``[PHONE]`` (emails masked first so phone patterns cannot
    eat into them), with exact match counts. Stateless vectorized map; the
    patterns are RE2-compatible, so the counts verify against DuckDB's
    regexp_extract_all."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out, n_e, n_p = [], [], []
        for t in texts:
            t = t or ""
            t1, ne = _EMAIL.subn("[EMAIL]", t)
            t2, np_ = _PHONE.subn("[PHONE]", t1)
            out.append(t2)
            n_e.append(ne)
            n_p.append(np_)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": pa.array(out, pa.string()),
            "n_emails": pa.array(n_e, pa.int64()),
            "n_phones": pa.array(n_p, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)
