"""Relational / stream operators Ray Data lacks natively: as-of join,
per-key top-k, deterministic hash sampling, and a distributed prefix-sum
(fixed-token-budget shard assignment).

These are the order- and key-sensitive operators a training-data pipeline
needs around the per-row transforms: align two event streams in time
(as-of), cap per-key cardinality (top-k), carve a corpus into
reproducible subsamples (hash sample) and fixed-token training shards
(prefix sum). Reference analog: the evaluator/scheduler side of
ss7lyb/graph-rag-agent consumes ordered event logs and sharded corpora
but delegates both to the database; here each is a first-class
distributed op with an exact DuckDB oracle.

Scale notes:
* ``asof_join`` / ``group_topk`` shuffle by key once
  (``hash_partitioned_groupby``) and do vectorized pandas work per
  BUCKET (``pd.merge_asof`` with ``by=``, ``groupby().head``) — never
  per key. Top-k additionally combines map-side (per-batch top-k) so
  only ≤ k rows per (batch, key) enter the shuffle.
* ``token_shards`` is the classic two-phase distributed scan: per-range
  partial sums (driver sees one number per range), exclusive-prefix the
  range totals, then a per-range cumsum with the broadcast offset. The
  driver never holds more than ``n_ranges`` scalars.
* ``hash_sample`` is embarrassingly parallel (stateless filter).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.shuffle import hash_partitioned_groupby

__all__ = [
    "asof_join",
    "group_topk",
    "hash_sample",
    "interval_join",
    "token_shards",
]


# ------------------------------------------------------------- as-of join --

def asof_join(
    events: "ray.data.Dataset",
    left_type: str,
    right_type: str,
    key: str = "user_id",
    ts_col: str = "ts",
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """For every ``left_type`` event, attach the most recent ``right_type``
    event of the same ``key`` with ``r.ts <= l.ts`` (backward as-of, exact
    matches allowed). Right rows are first reduced to one per (key, ts) —
    greatest ``event_id`` wins — so the match is deterministic.

    Output: ``(event_id, user_id, ts, value, matched_ts, matched_value)``
    with NULL match columns when no prior right event exists.

    One hash shuffle on ``key``; each bucket holds complete key groups, so
    a single vectorized ``pd.merge_asof(by=key)`` per bucket is exact.
    """

    def split(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin([left_type, right_type])]
        return df[["event_id", key, ts_col, "value", "event_type"]]

    slim = events.map_batches(split, batch_format="pandas")

    def bucket_asof(df: pd.DataFrame) -> pd.DataFrame:
        left = (df[df["event_type"] == left_type]
                .sort_values([ts_col, "event_id"], kind="stable"))
        right = (df[df["event_type"] == right_type]
                 .sort_values([ts_col, "event_id"], kind="stable")
                 .drop_duplicates([key, ts_col], keep="last")
                 .rename(columns={ts_col: "matched_ts", "value": "matched_value"}))
        if left.empty:
            return pd.DataFrame({
                "event_id": pd.Series(dtype="int64"),
                key: pd.Series(dtype="int64"),
                ts_col: pd.Series(dtype="datetime64[us]"),
                "value": pd.Series(dtype="float64"),
                "matched_ts": pd.Series(dtype="datetime64[us]"),
                "matched_value": pd.Series(dtype="float64"),
            })
        out = pd.merge_asof(
            left, right[[key, "matched_ts", "matched_value"]],
            left_on=ts_col, right_on="matched_ts", by=key,
            direction="backward", allow_exact_matches=True)
        return out[["event_id", key, ts_col, "value", "matched_ts", "matched_value"]]

    return hash_partitioned_groupby(slim, [key], bucket_asof, n_buckets=n_buckets)


def asof_join_sql(left_type: str, right_type: str) -> str:
    """DuckDB oracle for :func:`asof_join` (ASOF LEFT JOIN)."""
    return f"""
WITH r AS (
  SELECT user_id, ts AS matched_ts, value AS matched_value
  FROM (
    SELECT user_id, ts, value,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = '{right_type}')
  WHERE rn = 1
),
l AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = '{left_type}'
)
SELECT l.event_id, l.user_id, l.ts, l.value, r.matched_ts, r.matched_value
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.matched_ts
"""


# ------------------------------------------------------ interval/band join --

def interval_join(
    events: "ray.data.Dataset",
    anchor_type: str = "error",
    window_s: int = 600,
    key: str = "user_id",
    ts_col: str = "ts",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Range (band) join: every ``anchor_type`` event opens a half-open
    incident window ``[ts, ts + window_s)``; return each (incident, event)
    pair of the same ``key`` whose event timestamp falls in the window (the
    anchor matches its own window).

    The join Ray Data lacks natively: an inequality predicate, so no single
    equi-join key exists. Distribution: time-bucket co-partitioning with
    bucket width = window length. Each EVENT lands in exactly one
    ``(key, time_bucket)`` partition; each INTERVAL is replicated to every
    bucket it overlaps (≤ 2, since the window is one bucket wide). A matched
    pair meets in the event's bucket exactly once, so no dedup shuffle is
    needed — output rows are emitted exactly once. One hash shuffle total;
    the per-bucket work is a vectorized pandas equi-merge on ``key`` plus a
    range filter.

    Output: ``(incident_id, event_id)`` — incident_id is the anchor's
    event_id. At 100 TB the pair volume is bounded by (events per key per
    window) × (anchors); skewed keys shard across buckets by time, not by
    key alone.
    """
    window_us = window_s * 1_000_000

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        keys = df[key].to_numpy()
        eids = df["event_id"].to_numpy()
        ev_bucket = ts_us // window_us
        out = [pd.DataFrame({
            key: keys, "tb": ev_bucket, "role": 0,
            "event_id": eids, "ts_us": ts_us, "end_us": np.int64(0),
        })]
        anchor = (df["event_type"] == anchor_type).to_numpy()
        if anchor.any():
            a_ts = ts_us[anchor]
            a_key = keys[anchor]
            a_id = eids[anchor]
            end_us = a_ts + window_us
            # replicate to each overlapped bucket: start's bucket, plus the
            # next one when the window crosses the boundary (end exclusive)
            last_b = (end_us - 1) // window_us
            first_b = a_ts // window_us
            for shift in (0, 1):
                sel = (first_b + shift) <= last_b if shift else np.ones(
                    len(a_ts), dtype=bool)
                out.append(pd.DataFrame({
                    key: a_key[sel], "tb": first_b[sel] + shift, "role": 1,
                    "event_id": a_id[sel], "ts_us": a_ts[sel],
                    "end_us": end_us[sel],
                }))
        return pd.concat(out, ignore_index=True)

    tagged = events.select_columns(
        ["event_id", key, ts_col, "event_type"]
    ).map_batches(explode, batch_format="pandas")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ev = df[df["role"] == 0]
        iv = df[df["role"] == 1].rename(
            columns={"event_id": "incident_id", "ts_us": "start_us"})
        if ev.empty or iv.empty:
            return pd.DataFrame({"incident_id": pd.Series(dtype="int64"),
                                 "event_id": pd.Series(dtype="int64")})
        m = ev[[key, "tb", "event_id", "ts_us"]].merge(
            iv[[key, "tb", "incident_id", "start_us", "end_us"]],
            on=[key, "tb"])
        m = m[(m["ts_us"] >= m["start_us"]) & (m["ts_us"] < m["end_us"])]
        return m[["incident_id", "event_id"]].astype("int64")

    return hash_partitioned_groupby(tagged, [key, "tb"], per_bucket,
                                    n_buckets=n_buckets)


def interval_join_sql(anchor_type: str = "error", window_s: int = 600) -> str:
    """DuckDB oracle for :func:`interval_join` (inequality join)."""
    w_us = window_s * 1_000_000
    return f"""
WITH i AS (
  SELECT user_id, event_id AS incident_id, epoch_us(ts) AS start_us
  FROM events WHERE event_type = '{anchor_type}'
)
SELECT i.incident_id, e.event_id
FROM events e JOIN i
  ON e.user_id = i.user_id
 AND epoch_us(e.ts) >= i.start_us
 AND epoch_us(e.ts) < i.start_us + {w_us}
"""


# ---------------------------------------------------------- per-key top-k --

def group_topk(
    events: "ray.data.Dataset",
    k: int = 3,
    key: str = "user_id",
    order_col: str = "value",
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """Top-``k`` rows per ``key`` by descending ``order_col`` (ties broken by
    ascending ``event_id``), with their 1-based rank.

    Map-side combine: each batch keeps at most k rows per key before the one
    key shuffle, so a hot key contributes O(k × n_blocks) rows to its
    bucket, never its full row count.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["event_id", key, order_col]].sort_values(
            [key, order_col, "event_id"], ascending=[True, False, True],
            kind="stable")
        return df.groupby(key, sort=False).head(k)

    slim = events.map_batches(partial, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, order_col, "event_id"],
                            ascending=[True, False, True], kind="stable")
        out = df.groupby(key, sort=False).head(k).copy()
        out["rank"] = out.groupby(key, sort=False).cumcount() + 1
        return out[["event_id", key, order_col, "rank"]]

    return hash_partitioned_groupby(slim, [key], final, n_buckets=n_buckets)


def group_topk_sql(k: int = 3) -> str:
    """DuckDB oracle for :func:`group_topk`."""
    return f"""
SELECT event_id, user_id, value, CAST(rank AS BIGINT) AS rank FROM (
  SELECT event_id, user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rank
  FROM events)
WHERE rank <= {k}
"""


# ------------------------------------------------------------ hash sample --

SAMPLE_HASH_BITS = 32  # first 8 hex chars of md5


def hash_sample(
    ds: "ray.data.Dataset", rate: float, key: str = "doc_id",
) -> "ray.data.Dataset":
    """Deterministic, key-stable Bernoulli(rate) sample: keep rows whose
    ``md5(str(key))`` 32-bit prefix falls below ``rate``. The same key is
    kept or dropped identically across runs, machines and scales — the
    reproducible-subsample primitive (train/dev carving, ablation corpora).
    Stateless per-batch filter; no shuffle, no driver state."""
    threshold = format(
        min(int(rate * (1 << SAMPLE_HASH_BITS)), 1 << SAMPLE_HASH_BITS), "09x")

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(key).to_pylist()
        mask = pa.array(
            [hashlib.md5(str(i).encode()).hexdigest()[:8].rjust(9, "0")
             < threshold for i in ids],
            pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def hash_sample_sql(rate: float, key: str = "doc_id",
                    table: str = "documents") -> str:
    """DuckDB oracle: the identical md5-prefix comparison (9-char zero-padded
    hex strings compare exactly like the 36-bit integers they encode)."""
    threshold = format(
        min(int(rate * (1 << SAMPLE_HASH_BITS)), 1 << SAMPLE_HASH_BITS), "09x")
    return f"""
SELECT * FROM {table}
WHERE lpad(substr(md5(CAST({key} AS VARCHAR)), 1, 8), 9, '0') < '{threshold}'
"""


# -------------------------------------------- prefix sum → token shards ----

def token_shards(
    ds: "ray.data.Dataset",
    budget: int,
    n_tokens_expr=None,
    n_ranges: int = 64,
) -> "ray.data.Dataset":
    """Assign every document a global token ``start_offset`` (exclusive
    prefix sum of token counts in ``doc_id`` order) and the fixed-budget
    training ``shard`` it starts in: ``shard = start_offset // budget``.

    Distributed two-phase scan — the only global state is one partial sum
    per ``doc_id`` range:

    1. per-doc token counts (vectorized), range-partitioned on ``doc_id``
       (ranges are ordered, unlike hash buckets — a prefix sum needs order);
    2. per-range totals → driver (``n_ranges`` scalars), exclusive prefix →
       broadcast offsets;
    3. per-range sort + cumsum + offset, emitted in one vectorized pass.

    ``doc_id`` must be integer-typed. Range boundaries are equal-width over
    [min, max]; a skewed id space only skews task sizes, never correctness
    (per-range work is a sort + cumsum over that range's rows).
    """
    from .textstats import _token_count_arr

    def counts(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": _token_count_arr(batch.column("text")),
        })

    toks = ds.map_batches(counts, batch_format="pyarrow").materialize()
    return prefix_shards(toks, budget, n_ranges)


def prefix_shards(
    toks: "ray.data.Dataset", budget: int, n_ranges: int = 64,
) -> "ray.data.Dataset":
    """The distributed prefix-sum tail of :func:`token_shards` over an
    already-counted ``(doc_id, n_tokens)`` dataset — reusable by composed
    pipelines (e.g. ops/export.training_export) that filter docs first."""
    lo = toks.min("doc_id")
    hi = toks.max("doc_id")
    if lo is None:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "start_offset": pa.array([], pa.int64()),
            "shard": pa.array([], pa.int64()),
        }))
    width = max(1, (int(hi) - int(lo) + n_ranges) // n_ranges)

    def add_range(batch: pa.Table) -> pa.Table:
        rng = ((np.asarray(batch.column("doc_id")) - int(lo)) // width)
        return batch.append_column("_range", pa.array(rng, pa.int64()))

    ranged = toks.map_batches(add_range, batch_format="pyarrow").materialize()

    # phase 1: one total per range, collected (n_ranges scalars)
    totals = {int(r["_range"]): int(r["sum(n_tokens)"])
              for r in ranged.groupby("_range").sum("n_tokens").take_all()}
    offsets, acc = {}, 0
    for r in sorted(totals):
        offsets[r] = acc
        acc += totals[r]
    offsets_ref = ray.put(offsets)

    # phase 2: in-range exclusive cumsum + broadcast range offset
    def scan(df: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(offsets_ref)[int(df["_range"].iloc[0])]
        df = df.sort_values("doc_id", kind="stable")
        csum = df["n_tokens"].cumsum().shift(fill_value=0)
        start = (csum + base).astype("int64")
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": df["n_tokens"],
            "start_offset": start,
            "shard": (start // budget).astype("int64"),
        })

    return ranged.groupby("_range").map_groups(scan, batch_format="pandas")


def token_shards_sql(budget: int, n_tokens_expr: str) -> str:
    """DuckDB oracle: window-function exclusive prefix sum in doc_id order.
    ``n_tokens_expr`` must be the same token-count expression the
    ``token_count`` oracle uses."""
    return f"""
WITH t AS (
  SELECT doc_id, CAST({n_tokens_expr} AS BIGINT) AS n_tokens FROM documents
)
SELECT doc_id, n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_offset,
       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // {budget}
            AS BIGINT) AS shard
FROM t
"""
