"""Graph-metric operators over the materialized KG edge table.

The reference's GDS usage (KNN / WCC / Leiden / SLLPA, community/detector/*)
reads node-degree projections before detection; these are the corresponding
whole-graph statistics as Ray dataflow, with exact DuckDB oracles over the
planted-truth edge table.

- ``degree_distribution``: distinct-neighbour degree histogram — two scalar
  shuffles ((node, neighbour) dedup, then per-node count → histogram).
- ``triangle_count``: exact triangle count via DEGREE ORIENTATION (the
  standard skew guard: orient every undirected edge from its lower-degree
  endpoint — ties by node id — so wedges are enumerated at the low-degree
  centre, bounding per-node wedge fan-out by min-degree; a Zipf hub stops
  being a wedge centre). Wedge candidates then semi-join the oriented edge
  set (hash_join) and the survivors are counted. Three scalar shuffles,
  no driver-side graph.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.shuffle import hash_join, hash_partitioned_groupby


def _undirected_edges(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct undirected simple edges (a < b, self-loops dropped) from a
    (src, dst, ...) edge table — multi-predicates collapse."""

    def per_batch(batch: pa.Table) -> pd.DataFrame:
        src = batch.column("src").to_pylist()
        dst = batch.column("dst").to_pylist()
        df = pd.DataFrame({"a": src, "b": dst})
        lo = df.min(axis=1)
        hi = df.max(axis=1)
        out = pd.DataFrame({"a": lo, "b": hi})
        return out[out["a"] != out["b"]].drop_duplicates()

    dedup = edges.select_columns(["src", "dst"]).map_batches(
        per_batch, batch_format="pyarrow", batch_size=16384)
    return hash_partitioned_groupby(
        dedup, ["a", "b"],
        lambda df: df.drop_duplicates(["a", "b"]),
        n_buckets=32,
    )


def degree_distribution(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(degree, n_nodes): histogram of distinct-neighbour degrees over the
    undirected simple graph."""
    und = _undirected_edges(edges)

    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"node": pd.Series(dtype="object"),
                                 "deg": pd.Series(dtype="int64")})
        nodes = pd.concat([df["a"], df["b"]], ignore_index=True)
        return nodes.groupby(nodes, sort=False).size().rename(
            "deg").rename_axis("node").reset_index()

    partials = und.map_batches(node_rows, batch_format="pandas",
                               batch_size=16384)
    degrees = hash_partitioned_groupby(
        partials, ["node"],
        lambda df: df.groupby("node", sort=False)["deg"].sum().reset_index(),
        n_buckets=32,
    )

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "deg" not in df.columns:
            return pd.DataFrame({"degree": pd.Series(dtype="int64"),
                                 "n_nodes": pd.Series(dtype="int64")})
        return (df.groupby("deg", sort=False).size().rename("n_nodes")
                .rename_axis("degree").reset_index())

    hist = degrees.map_batches(hist_partial, batch_format="pandas",
                               batch_size=65536)
    return hash_partitioned_groupby(
        hist, ["degree"],
        lambda df: (df.groupby("degree", sort=False)["n_nodes"].sum()
                    .reset_index().astype({"degree": "int64",
                                           "n_nodes": "int64"})),
        n_buckets=8,
    )


def triangle_count(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """One row (n_triangles,) — exact count over the undirected simple
    graph. Degree orientation bounds wedge fan-out on skewed graphs."""
    und = _undirected_edges(edges).materialize()

    # degrees (for the orientation order) — same shuffle shape as above
    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"node": pd.Series(dtype="object"),
                                 "deg": pd.Series(dtype="int64")})
        nodes = pd.concat([df["a"], df["b"]], ignore_index=True)
        return nodes.groupby(nodes, sort=False).size().rename(
            "deg").rename_axis("node").reset_index()

    degrees = hash_partitioned_groupby(
        und.map_batches(node_rows, batch_format="pandas"),
        ["node"],
        lambda df: df.groupby("node", sort=False)["deg"].sum().reset_index(),
        n_buckets=32,
    )

    # orient each edge lower-degree -> higher-degree (ties by node id):
    # join degree onto both endpoints (two hash joins on scalar rows;
    # hash_join matches on shared column names, so rename node per side)
    deg_a = degrees.map_batches(
        lambda df: df.rename(columns={"node": "a", "deg": "deg_a"}),
        batch_format="pandas")
    deg_b = degrees.map_batches(
        lambda df: df.rename(columns={"node": "b", "deg": "deg_b"}),
        batch_format="pandas")
    j1 = hash_join(und, deg_a, on=["a"], lcols=["a", "b"],
                   rcols=["a", "deg_a"], n_buckets=32)
    j2 = hash_join(j1, deg_b, on=["b"], lcols=["a", "b", "deg_a"],
                   rcols=["b", "deg_b"], n_buckets=32)

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"lo": pd.Series(dtype="object"),
                                 "hi": pd.Series(dtype="object")})
        a_first = (df["deg_a"] < df["deg_b"]) | (
            (df["deg_a"] == df["deg_b"]) & (df["a"] < df["b"]))
        return pd.DataFrame({
            "lo": np.where(a_first, df["a"], df["b"]),
            "hi": np.where(a_first, df["b"], df["a"]),
        })

    oriented = j2.map_batches(orient, batch_format="pandas",
                              batch_size=65536).materialize()

    # wedges at the oriented centre: for each lo, all (hi_i, hi_j) pairs
    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "lo" not in df.columns:
            return pd.DataFrame({"a": pd.Series(dtype="object"),
                                 "b": pd.Series(dtype="object")})
        frames = []
        for _, g in df.groupby("lo", sort=False):
            hs = np.sort(g["hi"].to_numpy())
            n = len(hs)
            if n < 2:
                continue
            iu = np.triu_indices(n, k=1)
            frames.append(pd.DataFrame({"a": hs[iu[0]], "b": hs[iu[1]]}))
        if not frames:
            return pd.DataFrame({"a": pd.Series(dtype="object"),
                                 "b": pd.Series(dtype="object")})
        return pd.concat(frames, ignore_index=True)

    wedge_ds = hash_partitioned_groupby(oriented, ["lo"], wedges,
                                        n_buckets=32)

    # close the wedge: (a, b) must be an undirected edge — count matches.
    # wedge (a, b) is emitted a<b; und rows are a<b too.
    closed = hash_join(wedge_ds, und, on=["a", "b"],
                       lcols=["a", "b"], rcols=["a", "b"], n_buckets=32)
    n = closed.count()
    return ray.data.from_arrow(pa.table({
        "n_triangles": pa.array([int(n)], pa.int64())}))


def degree_distribution_sql(edges_path: str) -> str:
    return f"""
WITH und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM read_parquet('{edges_path}') WHERE src <> dst
), deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
  ) GROUP BY node
)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree
"""


def triangle_count_sql(edges_path: str) -> str:
    return f"""
WITH und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM read_parquet('{edges_path}') WHERE src <> dst
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM und e1
JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
"""
