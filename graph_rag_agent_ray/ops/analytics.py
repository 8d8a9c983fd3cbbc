"""Distributed analytical operators over the relational side tables:
multi-aggregate rollups with map-side combine, large⋈large and broadcast
joins, exact per-group quantiles, and deterministic stratified / exact-k
sampling.

The KG build is the flagship, but a data-processing engine also has to run
the classic warehouse shapes (the reference delegates these to its database;
SURVEY §2.8's scalar-function surface implies them). Each op here is the
canonical Ray Data expression of one shape, with an exact DuckDB oracle.

Exactness note: monetary aggregates are computed in INTEGER CENTS
(``round(x*100)`` per row, then int64 sums). Float summation is not
associative, so a distributed float SUM and DuckDB's sequential SUM can
differ in the last bits and fail a value-hash compare; integer sums are
order-independent and exact in any partitioning (values stay < 2^63 through
sf well beyond the driver's scales — per-row charge ≤ ~2e11 cents·pct²,
so overflow needs > 4e7 rows PER GROUP × max price).

Scale notes:
* every rollup pre-aggregates per batch (map-side combine), so only
  O(n_blocks × n_groups) partial rows enter the one key shuffle;
* ``order_revenue_rollup`` is the partitioned large⋈large hash join
  (functions/shuffle.hash_join) — both sides bucketed once by the join key;
* ``segment_sales`` broadcasts the small dimension side via ``ray.put``
  (read once per actor, never re-shipped per batch) — the broadcast-join
  pattern for dimension⋈fact;
* ``group_quantiles`` is exact, so one key's rows must co-locate (inherent
  to exact order statistics); keys are bucketed, never one-task-per-key.
  At corpus scale with huge single keys, switch to a mergeable sketch
  (t-digest) — exact discrete quantiles are the oracle-checkable baseline;
* the samplers are stateless filters / bounded partial top-k (driver never
  sees more than ``n_blocks × k`` rows).
"""

from __future__ import annotations

import hashlib
import math
from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.shuffle import hash_partitioned_groupby, hash_join

__all__ = [
    "pricing_summary",
    "order_revenue_rollup",
    "segment_sales",
    "group_quantiles",
    "stratified_sample",
    "sample_exact_k",
    "distinct_per_group",
    "user_windows",
    "running_total",
]


# ------------------------------------------------- pricing summary (Q1) ----

def pricing_summary(lineitem: "ray.data.Dataset",
                    n_buckets: int = 8) -> "ray.data.Dataset":
    """TPC-H-Q1-shaped rollup: per (l_returnflag, l_linestatus) — row count,
    total quantity, and the three classic money sums (base price, discounted
    price, charge) in exact integer cents (see module exactness note).

    Map-side combine: each batch collapses to ≤ |groups| partial rows before
    the shuffle, so the exchange is O(n_blocks × 6) regardless of corpus
    size — the pre-aggregation pattern every Zipf-skewed groupby needs.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        base = np.rint(df["l_extendedprice"].to_numpy() * 100).astype("int64")
        disc = np.rint(df["l_discount"].to_numpy() * 100).astype("int64")
        tax = np.rint(df["l_tax"].to_numpy() * 100).astype("int64")
        work = pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "sum_qty": np.rint(df["l_quantity"].to_numpy()).astype("int64"),
            "sum_base_cents": base,
            "sum_disc_price": base * (100 - disc),
            "sum_charge": base * (100 - disc) * (100 + tax),
            "n_rows": np.ones(len(df), dtype="int64"),
        })
        return (work.groupby(["l_returnflag", "l_linestatus"], sort=False)
                .sum().reset_index())

    partials = lineitem.map_batches(partial, batch_format="pandas")

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["l_returnflag", "l_linestatus"], sort=False)
                .sum().reset_index())

    return hash_partitioned_groupby(
        partials, ["l_returnflag", "l_linestatus"], reduce, n_buckets=n_buckets)


def pricing_summary_sql() -> str:
    """DuckDB oracle: identical integer-cents arithmetic."""
    base = "CAST(ROUND(l_extendedprice*100) AS BIGINT)"
    disc = "CAST(ROUND(l_discount*100) AS BIGINT)"
    tax = "CAST(ROUND(l_tax*100) AS BIGINT)"
    return f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM({base}) AS BIGINT) AS sum_base_cents,
       CAST(SUM({base} * (100 - {disc})) AS BIGINT) AS sum_disc_price,
       CAST(SUM({base} * (100 - {disc}) * (100 + {tax})) AS BIGINT) AS sum_charge,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------- fact⋈fact join + rollup (Q3-ish) ----

def order_revenue_rollup(lineitem: "ray.data.Dataset",
                         orders: "ray.data.Dataset",
                         n_buckets: int = 32) -> "ray.data.Dataset":
    """Large⋈large: join lineitem to orders on the order key (partitioned
    hash join — both sides shuffled ONCE by ``o_orderkey``), then roll up
    revenue per (o_orderpriority, l_returnflag). Both inputs are projected
    to the needed columns before the exchange (prune-at-the-read applies
    upstream; this bounds what crosses the wire)."""

    def slim_li(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["l_orderkey"],
            "l_returnflag": df["l_returnflag"],
            "revenue_cents": (
                np.rint(df["l_extendedprice"].to_numpy() * 100).astype("int64")
                * (100 - np.rint(df["l_discount"].to_numpy() * 100).astype("int64"))),
        })

    li = lineitem.map_batches(slim_li, batch_format="pandas")
    od = orders.map_batches(
        lambda df: df[["o_orderkey", "o_orderpriority"]], batch_format="pandas")
    joined = hash_join(li, od, on=["o_orderkey"], n_buckets=n_buckets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        work = pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "l_returnflag": df["l_returnflag"],
            "sum_revenue_cents": df["revenue_cents"],
            "n_items": np.ones(len(df), dtype="int64"),
        })
        return (work.groupby(["o_orderpriority", "l_returnflag"], sort=False)
                .sum().reset_index())

    partials = joined.map_batches(partial, batch_format="pandas")
    return hash_partitioned_groupby(
        partials, ["o_orderpriority", "l_returnflag"],
        lambda df: (df.groupby(["o_orderpriority", "l_returnflag"], sort=False)
                    .sum().reset_index()),
        n_buckets=8)


def order_revenue_rollup_sql() -> str:
    return """
SELECT o_orderpriority, l_returnflag,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_revenue_cents,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority, l_returnflag
"""


# ------------------------------------- dimension⋈fact broadcast join -------

def segment_sales(orders: "ray.data.Dataset",
                  customer: "ray.data.Dataset") -> "ray.data.Dataset":
    """Broadcast join: the customer DIMENSION table (aggregated-entity scale)
    is put in the object store once and read inside every map task — no
    shuffle of the fact side at all. Rollup: per (c_mktsegment,
    o_orderpriority) order count + total price in cents.

    This is the dimension⋈fact pattern: at 100 TB the fact side streams,
    the dimension side is one ``ray.put`` (zero-copy reads on every node);
    only O(n_blocks × n_groups) partial rows shuffle."""
    cust = customer.to_pandas()  # dimension side: small by construction
    seg_ref = ray.put(pd.Series(
        cust["c_mktsegment"].to_numpy(), index=cust["c_custkey"].to_numpy()))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        seg = ray.get(seg_ref)
        work = pd.DataFrame({
            "c_mktsegment": seg.reindex(df["o_custkey"].to_numpy()).to_numpy(),
            "o_orderpriority": df["o_orderpriority"],
            "sum_total_cents": np.rint(
                df["o_totalprice"].to_numpy() * 100).astype("int64"),
            "n_orders": np.ones(len(df), dtype="int64"),
        })
        work = work[work["c_mktsegment"].notna()]
        return (work.groupby(["c_mktsegment", "o_orderpriority"], sort=False)
                .sum().reset_index())

    partials = orders.map_batches(partial, batch_format="pandas")
    return hash_partitioned_groupby(
        partials, ["c_mktsegment", "o_orderpriority"],
        lambda df: (df.groupby(["c_mktsegment", "o_orderpriority"], sort=False)
                    .sum().reset_index()),
        n_buckets=8)


def segment_sales_sql() -> str:
    return """
SELECT c_mktsegment, o_orderpriority,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_total_cents,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderpriority
"""


# ---------------------------------------------- exact per-group quantiles --

def group_quantiles(events: "ray.data.Dataset",
                    key: str = "event_type",
                    col: str = "value",
                    qs: Sequence[float] = (0.25, 0.5, 0.75),
                    n_buckets: int = 16) -> "ray.data.Dataset":
    """Exact discrete quantiles of ``col`` per ``key``: the sorted group
    element at rank ``ceil(q·n)`` (DuckDB ``quantile_disc`` semantics —
    always an actual data value, so float-exact under any partitioning).

    Exact order statistics require a key's rows to co-locate (one hash
    shuffle; vectorized per bucket, never per key). For keys too hot to
    co-locate, use a mergeable sketch instead — this op is the exact,
    oracle-checkable baseline."""
    qs = list(qs)

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, col]]

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, grp in df.groupby(key, sort=False):
            v = np.sort(grp[col].to_numpy())
            n = len(v)
            row = {key: k, "n": np.int64(n)}
            for q in qs:
                row[f"q{int(q*100)}"] = v[max(0, math.ceil(q * n) - 1)]
            rows.append(row)
        return pd.DataFrame(rows)

    return hash_partitioned_groupby(
        events.map_batches(slim, batch_format="pandas"), [key], bucket,
        n_buckets=n_buckets)


def group_quantiles_sql(key: str = "event_type", col: str = "value",
                        qs: Sequence[float] = (0.25, 0.5, 0.75),
                        table: str = "events") -> str:
    cols = ",\n       ".join(
        f"quantile_disc({col}, {q}) AS q{int(q*100)}" for q in qs)
    return f"""
SELECT {key}, COUNT(*) AS n,
       {cols}
FROM {table}
GROUP BY {key}
"""


# ------------------------------------------------------- samplers ----------

SAMPLE_HASH_BITS = 32


def _md5_prefix_key(ids) -> list:
    return [hashlib.md5(str(i).encode()).hexdigest()[:8].rjust(9, "0")
            for i in ids]


def _threshold_hex(rate: float) -> str:
    return format(
        min(int(rate * (1 << SAMPLE_HASH_BITS)), 1 << SAMPLE_HASH_BITS), "09x")


def stratified_sample(ds: "ray.data.Dataset",
                      rates: Dict[str, float],
                      strata_col: str,
                      key: str,
                      default_rate: float = 0.0) -> "ray.data.Dataset":
    """Deterministic per-stratum Bernoulli sample: row kept iff the 32-bit
    md5 prefix of its ``key`` falls below its stratum's rate threshold.
    Key-stable across runs/machines/scales (same guarantee as
    relational.hash_sample, with a per-stratum rate) — the class-balancing
    primitive for training-corpus mixture control. Stateless filter: no
    shuffle, no driver state."""
    thresholds = {s: _threshold_hex(r) for s, r in rates.items()}
    default_t = _threshold_hex(default_rate)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = np.array(_md5_prefix_key(df[key].to_numpy()))
        t = df[strata_col].map(thresholds).fillna(default_t).to_numpy()
        return df[h < t]

    return ds.map_batches(fn, batch_format="pandas")


def stratified_sample_sql(rates: Dict[str, float], strata_col: str, key: str,
                          table: str, columns: str = "*",
                          default_rate: float = 0.0) -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN '{_threshold_hex(r)}'" for s, r in rates.items())
    return f"""
SELECT {columns} FROM {table}
WHERE lpad(substr(md5(CAST({key} AS VARCHAR)), 1, 8), 9, '0')
      < CASE {strata_col} {cases} ELSE '{_threshold_hex(default_rate)}' END
"""


def sample_exact_k(ds: "ray.data.Dataset", k: int,
                   key: str = "doc_id") -> "ray.data.Dataset":
    """Deterministic uniform sample of EXACTLY ``k`` rows: the k smallest
    md5(key) values (a fixed random-but-reproducible total order). Partial
    top-k per block, then one merge over ≤ n_blocks × k rows — the driver
    and the merge task never see corpus-sized data."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = _md5_prefix_key(df[key].to_numpy())
        return df.sort_values("_h", kind="stable").head(k)

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values("_h", kind="stable").head(k)
                .drop(columns=["_h"]))

    # single bounded merge task: repartition the (≤ n_blocks × k)-row
    # partials to one block
    return partials.repartition(1).map_batches(
        merge, batch_format="pandas", batch_size=None)


def sample_exact_k_sql(k: int, key: str = "doc_id", table: str = "documents",
                       columns: str = "*") -> str:
    return f"""
SELECT {columns} FROM {table}
ORDER BY lpad(substr(md5(CAST({key} AS VARCHAR)), 1, 8), 9, '0')
LIMIT {k}
"""


def quota_sample(ds: "ray.data.Dataset", quotas: Dict[str, int],
                 group_col: str = "lang", key: str = "doc_id",
                 default_quota: int = 0,
                 n_buckets: int = 16) -> "ray.data.Dataset":
    """Exact per-group quotas — the mixture-recipe primitive: a training-mix
    spec says "50k docs of en, 30k of zh, …" and this draws EXACTLY that many
    per group (or the whole group when smaller), deterministically (the
    quota_g smallest (md5(key), key) pairs per group — key-stable across
    runs, machines, and block layout; the composite order makes md5-prefix
    ties harmless). Per-batch per-group partial top-k bounds the shuffle to
    <= blocks x quota rows per group; the group-keyed merge re-applies the
    same rank cut inside complete groups."""
    from ..functions.shuffle import hash_partitioned_groupby

    def cut(df: pd.DataFrame, keep_h: bool) -> pd.DataFrame:
        df = df.sort_values(["_h", key], kind="stable")
        r = df.groupby(group_col, sort=False).cumcount().to_numpy()
        q = df[group_col].map(quotas).fillna(default_quota).to_numpy()
        out = df[r < q]
        return out if keep_h else out.drop(columns=["_h"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = _md5_prefix_key(df[key].to_numpy())
        return cut(df, keep_h=True)

    partials = ds.map_batches(partial, batch_format="pandas")
    return hash_partitioned_groupby(
        partials, [group_col], lambda df: cut(df, keep_h=False),
        n_buckets=n_buckets)


def token_budget_sample(ds: "ray.data.Dataset", budgets: Dict[str, int],
                        group_col: str = "lang", key: str = "doc_id",
                        default_budget: int = 0,
                        n_buckets: int = 16,
                        batch_size: int = 8192) -> "ray.data.Dataset":
    """Per-group TOKEN budgets — mixture recipes are usually specified in
    tokens, not documents ("20M tokens of zh"): walk each group in the
    deterministic (md5(key), key) order and keep documents while the
    group's running token total stays within budget.

    Scale shape: only (key, group, n_tokens, h) SCALAR rows move — text
    never shuffles — and the map side prunes every doc past its group's
    LOCAL budget overflow, keeping the FIRST overflowing row per (group,
    batch) as a weight-carrying sentinel. The sentinel is what makes the
    prune sound for variable-weight cuts (unlike the count-based
    quota_sample, where rank alone suffices): the first GLOBAL overflow row
    m is, within its own batch, either locally live or that batch's first
    local overflow — so m always reaches the reducer, the reducer's
    recomputed prefix sums are exact up to m, and everything at or after m
    overflows and is dropped. Without the sentinel a doc after m can
    falsely survive because a pruned row's tokens vanish from the prefix
    sum (caught by the sf0.001 oracle gate). Surviving volume per block is
    still budget-bounded plus one row per group. The group-keyed reducer
    re-runs the exact sort + cumsum + cut on complete groups. Output
    (key, group, n_tokens, cum_tokens); join back on ``key`` for payloads.
    Tokenization is the token_count whitespace spec."""
    import pyarrow.compute as pc_

    from ..functions.shuffle import hash_partitioned_groupby

    def cut(df: pd.DataFrame, keep_h: bool) -> pd.DataFrame:
        df = df.sort_values(["_h", key], kind="stable")
        cum = df.groupby(group_col, sort=False)["n_tokens"].cumsum()
        budget = df[group_col].map(budgets).fillna(default_budget)
        over = cum.to_numpy() > budget.to_numpy()
        if keep_h:
            # keep live rows + the first overflowing row per group (sentinel
            # carrying the overflow weight — see docstring proof sketch)
            n_over_so_far = (pd.Series(over.astype("int64"), index=df.index)
                             .groupby(df[group_col], sort=False).cumsum())
            first_over = over & (n_over_so_far.to_numpy() == 1)
            return df[~over | first_over].copy()
        out = df[~over].copy()
        out["cum_tokens"] = (out.groupby(group_col, sort=False)["n_tokens"]
                             .cumsum().astype("int64"))
        return out[[key, group_col, "n_tokens", "cum_tokens"]]

    def partial(batch: pa.Table) -> pd.DataFrame:
        trimmed = pc_.utf8_trim_whitespace(batch.column("text"))
        counts = pc_.list_value_length(
            pc_.split_pattern_regex(trimmed, pattern=r"\s+"))
        empty = pc_.equal(pc_.utf8_length(trimmed), 0)
        n_tokens = pc_.if_else(empty, pa.scalar(0, pa.int32()), counts)
        df = pd.DataFrame({
            key: batch.column(key).to_pandas(),
            group_col: batch.column(group_col).to_pandas(),
            "n_tokens": n_tokens.to_pandas().astype("int64"),
        })
        df["_h"] = _md5_prefix_key(df[key].to_numpy())
        return cut(df, keep_h=True)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size)
    return hash_partitioned_groupby(
        partials, [group_col], lambda df: cut(df, keep_h=False),
        n_buckets=n_buckets)


def token_budget_sample_sql(budgets: Dict[str, int], group_col: str = "lang",
                            key: str = "doc_id", table: str = "documents",
                            default_budget: int = 0) -> str:
    ws = r"'\s+'"
    n_tokens = (
        "CASE WHEN trim(text, ' \t\n\r') = '' THEN 0 "
        f"ELSE array_length(regexp_split_to_array(trim(text, ' \t\n\r'), {ws})) END"
    )
    cases = " ".join(f"WHEN '{s}' THEN {int(b)}" for s, b in budgets.items())
    return f"""
SELECT {key}, {group_col}, n_tokens, cum_tokens FROM (
  SELECT {key}, {group_col}, n_tokens,
         CAST(sum(n_tokens) OVER (
           PARTITION BY {group_col}
           ORDER BY lpad(substr(md5(CAST({key} AS VARCHAR)), 1, 8), 9, '0'),
                    {key}
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM (SELECT {key}, {group_col},
               CAST({n_tokens} AS BIGINT) AS n_tokens FROM {table})
) WHERE cum_tokens <= CASE {group_col} {cases} ELSE {int(default_budget)} END
"""


def quota_sample_sql(quotas: Dict[str, int], group_col: str = "lang",
                     key: str = "doc_id", table: str = "documents",
                     columns: str = "*", default_quota: int = 0) -> str:
    cases = " ".join(f"WHEN '{s}' THEN {int(q)}" for s, q in quotas.items())
    return f"""
SELECT {columns} FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {group_col}
    ORDER BY lpad(substr(md5(CAST({key} AS VARCHAR)), 1, 8), 9, '0'), {key}
  ) AS _r
  FROM {table}
) WHERE _r <= CASE {group_col} {cases} ELSE {int(default_quota)} END
"""


# ------------------------------------------------ distinct-count rollup ----

def distinct_per_group(events: "ray.data.Dataset",
                       key: str = "event_type",
                       distinct_col: str = "user_id",
                       n_buckets: int = 32) -> "ray.data.Dataset":
    """Exact COUNT(DISTINCT distinct_col) per ``key`` without ever
    co-locating a whole key: per-batch pair dedup (map-side), one shuffle on
    the (key, value) PAIR — so a hot key spreads over all buckets — then
    per-bucket dedup + count partials, and a final tiny rollup per key.
    The classic two-phase exact distinct; swap in HLL partials when ±2%
    error is acceptable."""

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, distinct_col]].drop_duplicates()

    deduped_pairs = events.map_batches(pairs, batch_format="pandas")

    def bucket_count(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        out = d.groupby(key, sort=False).size().reset_index(name="n_distinct")
        out["n_distinct"] = out["n_distinct"].astype("int64")
        return out

    partials = hash_partitioned_groupby(
        deduped_pairs, [key, distinct_col], bucket_count, n_buckets=n_buckets)
    return hash_partitioned_groupby(
        partials, [key],
        lambda df: df.groupby(key, sort=False).sum().reset_index(),
        n_buckets=4)


def distinct_per_group_sql(key: str = "event_type",
                           distinct_col: str = "user_id",
                           table: str = "events") -> str:
    return f"""
SELECT {key}, COUNT(DISTINCT {distinct_col}) AS n_distinct
FROM {table} GROUP BY {key}
"""


# --------------------------------------------- partitioned window family ----

def user_windows(events: "ray.data.Dataset",
                 n_buckets: int = 32) -> "ray.data.Dataset":
    """Per-user event windows — the SQL window-function family
    ``PARTITION BY user_id ORDER BY ts, event_id``:

      row_num        ROW_NUMBER()
      running_cents  SUM(cents) OVER (... ROWS UNBOUNDED PRECEDING)
      prev_cents     LAG(cents), 0 for the first event

    Ray Data has no window operator; the scale shape is ONE hash shuffle on
    the partition key (all rows of a user land in one bucket, many users per
    bucket) and a vectorized per-bucket sort + grouped cumsum/shift — no
    per-key tasks, no driver state. Running sums are computed in integer
    cents so any partitioning matches DuckDB's sequential window scan
    bit-for-bit (module exactness note)."""

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "ts": df["ts"],
            "cents": np.rint(df["value"].to_numpy() * 100).astype("int64"),
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        g = df.groupby("user_id", sort=False)
        return pd.DataFrame({
            "event_id": df["event_id"],
            "user_id": df["user_id"],
            "row_num": g.cumcount().to_numpy() + 1,
            "running_cents": g["cents"].cumsum().to_numpy(),
            "prev_cents": g["cents"].shift(fill_value=0).to_numpy(),
        })

    slimmed = events.map_batches(slim, batch_format="pandas")
    return hash_partitioned_groupby(
        slimmed, ["user_id"], per_bucket, n_buckets=n_buckets)


def user_windows_sql(table: str = "events") -> str:
    return f"""
WITH c AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM {table}
)
SELECT event_id, user_id,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS row_num,
       CAST(SUM(cents) OVER w AS BIGINT) AS running_cents,
       CAST(COALESCE(LAG(cents) OVER w, 0) AS BIGINT) AS prev_cents
FROM c
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def running_total(events: "ray.data.Dataset",
                  n_ranges: int = 64) -> "ray.data.Dataset":
    """GLOBAL running sum — ``SUM(cents) OVER (ORDER BY ts, event_id)`` with
    no partition key: the distributed two-phase prefix scan (same shape as
    relational.prefix_shards).

      1. rows range-partitioned on ts (equal-width over [min, max]; ranges
         are ORDERED, unlike hash buckets — a prefix needs order, and equal
         ts values share a range so the event_id tie-break stays local);
      2. one cents total per range → driver (n_ranges scalars), exclusive
         prefix → broadcast offsets via ray.put;
      3. per-range sort + cumsum + range offset, one vectorized pass.

    Driver state is O(n_ranges), never O(rows); skewed timestamps only skew
    task sizes, never correctness."""

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "ts_us": df["ts"].astype("int64"),
            "cents": np.rint(df["value"].to_numpy() * 100).astype("int64"),
        })

    slimmed = events.map_batches(slim, batch_format="pandas").materialize()
    lo, hi = slimmed.min("ts_us"), slimmed.max("ts_us")
    if lo is None:
        return ray.data.from_arrow(pa.table({
            "event_id": pa.array([], pa.int64()),
            "running_cents": pa.array([], pa.int64()),
        }))
    width = max(1, (int(hi) - int(lo) + n_ranges) // n_ranges)

    def add_range(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_range"] = ((df["ts_us"].to_numpy() - int(lo)) // width).astype("int64")
        return df

    ranged = slimmed.map_batches(add_range, batch_format="pandas").materialize()
    totals = {int(r["_range"]): int(r["sum(cents)"])
              for r in ranged.groupby("_range").sum("cents").take_all()}
    offsets, acc = {}, 0
    for r in sorted(totals):
        offsets[r] = acc
        acc += totals[r]
    offsets_ref = ray.put(offsets)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(offsets_ref)[int(df["_range"].iloc[0])]
        df = df.sort_values(["ts_us", "event_id"], kind="stable")
        return pd.DataFrame({
            "event_id": df["event_id"],
            "running_cents": (df["cents"].cumsum() + base).astype("int64"),
        })

    return ranged.groupby("_range").map_groups(scan, batch_format="pandas")


def running_total_sql(table: str = "events") -> str:
    return f"""
WITH c AS (
  SELECT event_id, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM {table}
)
SELECT event_id,
       CAST(SUM(cents) OVER (ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS running_cents
FROM c
"""
