"""Sketch operators — bounded-memory approximations of corpus-wide
aggregates, the scale path where exact counterparts shuffle too much.

First member: HyperLogLog distinct-count registers (Flajolet et al. 2007,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm"). The exact companion is ``ops/analytics.distinct_per_group``,
whose shuffle volume is O(distinct pairs); the HLL sketch shuffles at most
``groups x m`` register rows regardless of corpus size — the documented
"swap in HLL partials" option of that op.

Determinism/oracle design: the register index is the first ``prefix_chars``
HEX characters of md5(key) (kept as a STRING so the SQL oracle never parses
hex into integers), the rank is 1 + the number of leading zero BITS of the
remaining 56-bit hex suffix — both integer/string-exact, so the full
register table hash-compares against a DuckDB oracle even though the
*estimate* is approximate. The estimate itself is a driver-side fold over
the (tiny) register table.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd

import ray.data

from ..functions.shuffle import hash_partitioned_groupby


def _register_rank(hexdigest: str, prefix_chars: int) -> tuple[str, int]:
    """(register, rank) of one md5 hex digest. Rank counts leading zero bits
    of the hex suffix chars [prefix_chars, 16) — 4*(16-prefix_chars) bits —
    plus one; an all-zero suffix ranks bits+1 (the HLL convention for the
    max observable rank at this hash width)."""
    bits = 4 * (16 - prefix_chars)
    suffix = int(hexdigest[prefix_chars:16], 16)
    rank = bits + 1 if suffix == 0 else bits - suffix.bit_length() + 1
    return hexdigest[:prefix_chars], rank


def hll_registers(
    ds: "ray.data.Dataset",
    key: str = "event_type",
    distinct_col: str = "user_id",
    prefix_chars: int = 2,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Per-group HyperLogLog registers: (key, register, max_rank), one row
    per non-empty register (m = 16^prefix_chars registers per group; absent
    rows are rank-0 by convention).

    Shape: per-batch map-side fold to register partials (a batch emits at
    most groups x m rows no matter how many input rows it held), then ONE
    max-combine shuffle over (key, register) — the sketch property is
    precisely that this shuffle is corpus-size-independent. max is
    associative/commutative, so the result is layout- and order-exact:
    the whole table hash-compares against the DuckDB oracle."""

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, distinct_col]].drop_duplicates()
        regs = []
        ranks = []
        for v in d[distinct_col].astype(str):
            hx = hashlib.md5(v.encode("utf-8")).hexdigest()
            r, rk = _register_rank(hx, prefix_chars)
            regs.append(r)
            ranks.append(rk)
        part = pd.DataFrame({key: d[key].to_numpy(), "register": regs,
                             "max_rank": pd.array(ranks, dtype="int64")})
        return (part.groupby([key, "register"], sort=False)["max_rank"]
                .max().reset_index())

    parts = ds.map_batches(partials, batch_format="pandas", batch_size=16384)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby([key, "register"], sort=False)["max_rank"]
               .max().reset_index())
        out["max_rank"] = out["max_rank"].astype("int64")
        return out

    return hash_partitioned_groupby(parts, [key, "register"], combine,
                                    n_buckets=n_buckets)


def hll_registers_sql(key: str = "event_type", distinct_col: str = "user_id",
                      prefix_chars: int = 2, table: str = "events") -> str:
    """DuckDB oracle for :func:`hll_registers` — same md5/string-register/
    leading-zero-bit spec, computed without any hex→int conversion: z leading
    '0' hex chars contribute 4z zero bits and the first nonzero hex char c
    contributes clz(c) more (c in 1→3, 2-3→2, 4-7→1, 8-f→0)."""
    bits = 4 * (16 - prefix_chars)
    suf_start = prefix_chars + 1  # substr is 1-based
    suf_len = 16 - prefix_chars
    return f"""
WITH h AS (
  SELECT DISTINCT {key}, md5(CAST({distinct_col} AS VARCHAR)) AS hx
  FROM {table}
), z AS (
  SELECT {key}, substr(hx, 1, {prefix_chars}) AS register,
         length(regexp_extract(substr(hx, {suf_start}, {suf_len}), '^0*')) AS nz,
         substr(hx, {suf_start}, {suf_len}) AS suffix
  FROM h
), r AS (
  SELECT {key}, register,
         CASE WHEN nz = {suf_len} THEN {bits + 1}
              ELSE 4 * nz
                   + CASE substr(suffix, nz + 1, 1)
                       WHEN '1' THEN 3
                       WHEN '2' THEN 2 WHEN '3' THEN 2
                       WHEN '4' THEN 1 WHEN '5' THEN 1
                       WHEN '6' THEN 1 WHEN '7' THEN 1
                       ELSE 0 END
                   + 1 END AS rank
  FROM z
)
SELECT {key}, register, CAST(max(rank) AS BIGINT) AS max_rank
FROM r GROUP BY {key}, register
"""


def hll_estimate(registers: pd.DataFrame, key: str = "event_type",
                 prefix_chars: int = 2) -> pd.DataFrame:
    """Fold a register table into per-group cardinality estimates
    (key, estimate) — the standard HLL estimator with the small-range
    linear-counting correction. The register table is groups x m rows at
    most, so this is a driver-side scalar fold, never a data-sized one."""
    m = 16 ** prefix_chars
    alpha = 0.7213 / (1.0 + 1.079 / m)
    rows = []
    for g, sub in registers.groupby(key, sort=False):
        ranks = sub["max_rank"].to_numpy()
        zero_registers = m - len(ranks)
        denom = zero_registers * 1.0 + float((2.0 ** (-ranks.astype(float))).sum())
        est = alpha * m * m / denom
        if est <= 2.5 * m and zero_registers > 0:
            est = m * math.log(m / zero_registers)
        rows.append((g, est))
    return pd.DataFrame(rows, columns=[key, "estimate"])


# ----------------------------------------------------- count-min sketch ----

def cms_registers(
    ds: "ray.data.Dataset",
    key: str = "event_type",
    depth: int = 4,
    prefix_chars: int = 2,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Count-Min sketch registers (Cormode & Muthukrishnan 2005): the
    bounded-memory FREQUENCY companion to ``hll_registers``'s cardinality
    sketch. (row, register, count) with register(row i, value v) =
    first ``prefix_chars`` hex chars of md5("{i}:{v}") — width m =
    16^prefix_chars per row; count = total occurrences of all values
    colliding into the cell. The exact companion is a plain
    groupby(key).count(); the sketch shuffles at most depth x m register
    rows regardless of corpus size.

    Sums are integer and associative, so the register table is layout- and
    order-exact and hash-compares against the DuckDB oracle even though
    point ESTIMATES (``cms_estimate`` = min over rows) are approximate
    (one-sided: never under the true count)."""

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        counts = df.groupby(key, sort=False).size()
        rows_, regs, cnts = [], [], []
        for v, c in counts.items():
            for i in range(depth):
                hx = hashlib.md5(f"{i}:{v}".encode("utf-8")).hexdigest()
                rows_.append(i)
                regs.append(hx[:prefix_chars])
                cnts.append(int(c))
        part = pd.DataFrame({"row": pd.array(rows_, dtype="int64"),
                             "register": regs,
                             "count": pd.array(cnts, dtype="int64")})
        return (part.groupby(["row", "register"], sort=False)["count"]
                .sum().reset_index())

    parts = ds.map_batches(partials, batch_format="pandas", batch_size=16384)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["row", "register"], sort=False)["count"]
               .sum().reset_index())
        out["row"] = out["row"].astype("int64")
        out["count"] = out["count"].astype("int64")
        return out

    return hash_partitioned_groupby(parts, ["row", "register"], combine,
                                    n_buckets=n_buckets)


def cms_registers_sql(key: str = "event_type", depth: int = 4,
                      prefix_chars: int = 2, table: str = "events") -> str:
    """DuckDB oracle for :func:`cms_registers` — identical md5 register spec
    over the exact per-value counts."""
    rows = ", ".join(f"({i})" for i in range(depth))
    return f"""
WITH c AS (
  SELECT CAST({key} AS VARCHAR) AS v, count(*) AS cnt FROM {table} GROUP BY 1
), d AS (
  SELECT * FROM (VALUES {rows}) AS t("row")
), r AS (
  SELECT d."row" AS "row",
         substr(md5(CAST(d."row" AS VARCHAR) || ':' || c.v), 1, {prefix_chars})
           AS register,
         c.cnt
  FROM c CROSS JOIN d
)
SELECT "row", register, CAST(SUM(cnt) AS BIGINT) AS count
FROM r GROUP BY "row", register
"""


def cms_estimate(registers: pd.DataFrame, values, depth: int = 4,
                 prefix_chars: int = 2) -> pd.DataFrame:
    """(value, estimate): Count-Min point queries over a collected register
    table — min over the depth rows of each value's cell. One-sided error:
    estimate >= true count, with overshoot bounded by collisions per cell.
    The register table is depth x 16^prefix_chars rows at most, so this is
    a driver-side fold."""
    cell = {(int(r), reg): int(c) for r, reg, c in
            zip(registers["row"], registers["register"], registers["count"])}
    out = []
    for v in values:
        est = min(
            cell.get((i, hashlib.md5(f"{i}:{v}".encode()).hexdigest()[:prefix_chars]), 0)
            for i in range(depth))
        out.append((v, est))
    return pd.DataFrame(out, columns=["value", "estimate"])


# ------------------------------------------------------ histogram sketch ----

def hist_registers(
    ds: "ray.data.Dataset",
    key: str = "event_type",
    value_col: str = "value",
    n_bins: int = 64,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Fixed-grid histogram registers — the DISTRIBUTION companion to the
    HLL (cardinality) and Count-Min (frequency) sketches, and the mergeable
    stand-in ``ops/analytics.group_quantiles`` documents for corpus-scale
    order statistics (exact quantiles must co-locate a key; a histogram
    shuffles at most groups x n_bins register rows).

    (key, bin, count) with bin = (cents - lo) * n_bins // (hi - lo + 1)
    over INTEGER CENTS and the global [lo, hi] — integer arithmetic end to
    end, so the register table is layout-exact and hash-compares against
    the DuckDB oracle (float bin edges would round differently at the
    boundaries). The [lo, hi] scan is two scalar aggregates, the same
    driver state as running_total's range pass."""
    import numpy as np

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key: df[key],
            "c": np.rint(df[value_col].to_numpy() * 100).astype("int64"),
        })

    slim = ds.map_batches(cents, batch_format="pandas").materialize()
    lo, hi = slim.min("c"), slim.max("c")
    if lo is None:
        import pyarrow as pa
        return ray.data.from_arrow(pa.table({
            key: pa.array([], pa.string()),
            "bin": pa.array([], pa.int64()),
            "count": pa.array([], pa.int64())}))
    span = int(hi) - int(lo) + 1

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        b = (df["c"].to_numpy() - int(lo)) * n_bins // span
        part = pd.DataFrame({key: df[key],
                             "bin": pd.array(b, dtype="int64")})
        return (part.groupby([key, "bin"], sort=False).size()
                .rename("count").reset_index())

    parts = slim.map_batches(partials, batch_format="pandas",
                             batch_size=65536)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby([key, "bin"], sort=False)["count"]
               .sum().reset_index())
        out["bin"] = out["bin"].astype("int64")
        out["count"] = out["count"].astype("int64")
        return out

    return hash_partitioned_groupby(parts, [key, "bin"], combine,
                                    n_buckets=n_buckets)


def hist_registers_sql(key: str = "event_type", value_col: str = "value",
                       n_bins: int = 64, table: str = "events") -> str:
    """DuckDB oracle for :func:`hist_registers`: identical integer-cents
    bin arithmetic over the same global [lo, hi]."""
    return f"""
WITH c AS (
  SELECT {key}, CAST(ROUND({value_col} * 100) AS BIGINT) AS c FROM {table}
), b AS (
  SELECT min(c) AS lo, max(c) AS hi FROM c
), r AS (
  SELECT c.{key}, (c.c - b.lo) * {n_bins} // (b.hi - b.lo + 1) AS bin
  FROM c, b
)
SELECT {key}, CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS count
FROM r GROUP BY {key}, bin
"""


def hist_quantile(registers: pd.DataFrame, q: float, lo_cents: int,
                  hi_cents: int, key: str = "event_type",
                  n_bins: int = 64) -> pd.DataFrame:
    """(key, estimate): per-group quantile estimates from a collected
    register table — cumulative counts to the q-crossing bin, estimate =
    the bin's midpoint in original units. Error is bounded by one bin
    width; the register table is groups x n_bins rows, a driver-side
    fold."""
    span = hi_cents - lo_cents + 1
    out = []
    for g, sub in registers.groupby(key, sort=False):
        sub = sub.sort_values("bin")
        total = sub["count"].sum()
        cum = sub["count"].cumsum()
        b = int(sub.loc[cum >= q * total, "bin"].iloc[0])
        mid_c = lo_cents + (b + 0.5) * span / n_bins
        out.append((g, mid_c / 100.0))
    return pd.DataFrame(out, columns=[key, "estimate"])
