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

    def per_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        src, dst = batch.column("src"), batch.column("dst")
        lo = pc.min_element_wise(src, dst)
        hi = pc.max_element_wise(src, dst)
        t = pa.table({"a": lo, "b": hi}).filter(pc.not_equal(lo, hi))
        return t.group_by(["a", "b"]).aggregate([])

    dedup = edges.select_columns(["src", "dst"]).map_batches(
        per_batch, batch_format="pyarrow", batch_size=16384)
    return hash_partitioned_groupby(
        dedup, ["a", "b"],
        lambda df: df.drop_duplicates(["a", "b"]),
        n_buckets=32,
        map_format="pyarrow",  # Arrow upstream, scalar NA-free columns
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


def triangle_count(edges: "ray.data.Dataset",
                   local_guard_edges: int = 1_000_000) -> "ray.data.Dataset":
    """One row (n_triangles,) — exact count over the undirected simple
    graph. Degree orientation bounds wedge fan-out on skewed graphs.
    Below ``local_guard_edges`` deduped edges the count runs driver-local
    (guard is tighter than the iterative ops' 5M because the wedge set —
    the same volume both paths enumerate — is super-linear in edges)."""
    und = _undirected_edges(edges).materialize()
    n_edges = und.count()
    if 0 < n_edges <= local_guard_edges:
        n = _triangles_local(und.to_pandas())
        return ray.data.from_arrow(pa.table({
            "n_triangles": pa.array([n], pa.int64())}))

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

    # wedges at the oriented centre: for each lo, all (hi_i, hi_j) pairs —
    # the enumeration is fully vectorized (the same fan-out construction
    # as _triangles_local; a per-centre Python loop with triu_indices is
    # 5-10x slower on buckets with millions of centres)
    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "lo" not in df.columns:
            return pd.DataFrame({"a": pd.Series(dtype="object"),
                                 "b": pd.Series(dtype="object")})
        lo = df["lo"].to_numpy()
        hi = df["hi"].to_numpy()
        order = np.lexsort((hi, lo))
        lo_s, hi_s = lo[order], hi[order]
        m = len(lo_s)
        grp_start = np.flatnonzero(np.r_[True, lo_s[1:] != lo_s[:-1]])
        cnt = np.diff(np.r_[grp_start, m])
        loc = np.arange(m) - np.repeat(grp_start, cnt)
        fan = np.repeat(cnt, cnt) - 1 - loc
        w = int(fan.sum())
        if w == 0:
            return pd.DataFrame({"a": pd.Series(dtype="object"),
                                 "b": pd.Series(dtype="object")})
        first = np.repeat(np.arange(m), fan)
        run_start = np.cumsum(fan) - fan
        off = np.arange(w) - np.repeat(run_start, fan)
        second = first + 1 + off
        # within a centre hi_s ascends, and second > first in the same
        # run, so (a, b) is emitted a < b — matching und's orientation
        return pd.DataFrame({"a": hi_s[first], "b": hi_s[second]})

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


def pagerank(
    edges: "ray.data.Dataset",
    damping: float = 0.85,
    iters: int = 20,
    n_buckets: int = 32,
    scale: int = 10**9,
    local_guard_edges: int = 5_000_000,
) -> "ray.data.Dataset":
    """(node, pr_ppb): truncated-power-iteration PageRank over the
    undirected simple graph, as a parts-per-billion integer surrogate.

    Reference parity: the reference ranks "important nodes" with
    ``nx.pagerank`` over its assembled knowledge graph
    (``search/tool/reasoning/kg_builder.py:293-298``) and weights core
    community entities by PageRank (``community_enhance.py:175``). This is
    the same measure as Ray dataflow: each undirected edge feeds both
    directions, rank(v) <- (1-d)/n + d * sum_{u in N(v)} rank(u)/deg(u),
    a FIXED ``iters`` iterations (a convergence test is a driver-side
    barrier and makes the output run-dependent; truncation keeps it a pure
    function of the graph — the SQL oracle unrolls the same iterations).

    Scale shape: the adjacency is edge-scale and the rank state is
    node-scale over the AGGREGATED entity graph (not the corpus). deg(u)
    is attached to the adjacency ONCE before the loop; each iteration is
    one hash_join (state onto out-edges) + one bucketed groupby-sum =
    2*iters scalar shuffles. No driver-side graph; the only driver scalar
    is n (node count). Reducers sum each node's contributions in sorted
    order so the floats are a pure function of the graph, not of block
    arrival order; the ppb grid (1e-9) sits ~6 orders above the residual
    FP noise, so the integer surrogate is hash-stable vs the SQL oracle.

    Below ``local_guard_edges`` deduped edges the iteration runs DRIVER-
    LOCAL (one guarded edge-scale collect + vectorized numpy loop — the
    communities stage's guard pattern; a 2·iters-shuffle loop pays ~1 s
    fixed exchange cost per shuffle, which dwarfs the compute on an
    entity-scale graph). Above it, the distributed loop runs; both are
    pure functions of the graph (tests assert equality).
    """
    und = _undirected_edges(edges).materialize()
    n_edges = und.count()
    if 0 < n_edges <= local_guard_edges:
        res = _power_iteration_local(
            und.to_pandas(), damping, iters, scale, "pr_ppb")
        return ray.data.from_pandas(res)

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"u": pd.Series(dtype="object"),
                                 "v": pd.Series(dtype="object")})
        return pd.concat(
            [df.rename(columns={"a": "u", "b": "v"})[["u", "v"]],
             df.rename(columns={"a": "v", "b": "u"})[["u", "v"]]],
            ignore_index=True)

    adj = und.map_batches(both_dirs, batch_format="pandas",
                          batch_size=65536)

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "u" not in df.columns:
            return pd.DataFrame({"u": pd.Series(dtype="object"),
                                 "deg": pd.Series(dtype="int64")})
        return df.groupby("u", sort=False).size().reset_index(name="deg")

    deg = hash_partitioned_groupby(
        adj.map_batches(deg_partial, batch_format="pandas"),
        ["u"],
        lambda df: df.groupby("u", sort=False)["deg"].sum().reset_index(),
        n_buckets=n_buckets,
    )
    adj_deg = hash_join(adj, deg, on=["u"], n_buckets=n_buckets,
                        lcols=["u", "v"], rcols=["u", "deg"]).materialize()
    n = deg.count()
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "pr_ppb": pa.array([], pa.int64())}))
    base = (1.0 - damping) / n
    r0 = 1.0 / n

    state = deg.map_batches(
        lambda df: pd.DataFrame({"u": df["u"], "r": r0})
        if not df.empty and "u" in df.columns
        else pd.DataFrame({"u": pd.Series(dtype="object"),
                           "r": pd.Series(dtype="float64")}),
        batch_format="pandas").materialize()

    def contrib_rows(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "v" not in df.columns:
            return pd.DataFrame({"v": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="float64")})
        return pd.DataFrame({
            "v": df["v"],
            "c": df["r"].astype("float64") / df["deg"].astype("float64")})

    def sum_reducer(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "v" not in df.columns:
            return pd.DataFrame({"u": pd.Series(dtype="object"),
                                 "r": pd.Series(dtype="float64")})
        # sort by (node, contribution) so the per-node sum order — and
        # therefore the float result — is a pure function of the graph
        df = df.sort_values(["v", "c"], kind="stable")
        s = df.groupby("v", sort=False)["c"].sum()
        return pd.DataFrame({"u": s.index, "r": base + damping * s.values})

    for _ in range(iters):
        joined = hash_join(state, adj_deg, on=["u"], n_buckets=n_buckets,
                           lcols=["u", "r"], rcols=["u", "v", "deg"])
        contribs = joined.map_batches(contrib_rows, batch_format="pandas",
                                      batch_size=65536)
        new_state = hash_partitioned_groupby(
            contribs, ["v"], sum_reducer, n_buckets=n_buckets).materialize()
        # truncate the logical-plan lineage: a materialized dataset still
        # carries its upstream plan, and tens of chained iterations overflow
        # the driver's recursion limit — re-rooting on the block refs keeps
        # the state in the object store with an O(1)-depth plan
        state = ray.data.from_arrow_refs(new_state.to_arrow_refs())

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "u" not in df.columns:
            return pd.DataFrame({"node": pd.Series(dtype="object"),
                                 "pr_ppb": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "node": df["u"],
            "pr_ppb": np.rint(df["r"].astype("float64") * scale)
            .astype("int64")})

    return state.map_batches(finalize, batch_format="pandas")


def _power_iteration_local(
    pairs: pd.DataFrame,
    damping: float,
    iters: int,
    scale: int,
    out_col: str,
    seeds=None,
) -> pd.DataFrame:
    """Driver-local truncated power iteration over deduped undirected
    (a, b) pairs — the guarded small-graph fast path shared by
    :func:`pagerank` and :func:`personalized_pagerank` (the communities
    stage's driver-local-behind-a-size-guard pattern: a 2·iters-shuffle
    distributed loop on an entity-scale graph pays ~1 s of fixed exchange
    cost per shuffle; below the guard one vectorized numpy loop is
    equivalent and ~20× faster). Edge arrays are lexsorted so the float
    fold order — and hence the ppb output — is a pure function of the
    graph, independent of collection order."""
    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    u = np.concatenate([ai, bi])
    v = np.concatenate([bi, ai])
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    n = len(nodes)
    deg = np.bincount(u, minlength=n).astype(np.float64)
    if seeds is None:
        base = np.full(n, (1.0 - damping) / n)
        r = np.full(n, 1.0 / n)
    else:
        s = np.zeros(n)
        present = [sd for sd in seeds if
                   nodes[min(np.searchsorted(nodes, sd), n - 1)] == sd]
        for sd in present:
            s[np.searchsorted(nodes, sd)] = 1.0 / len(seeds)
        base = (1.0 - damping) * s
        r = s.copy()
    for _ in range(iters):
        contrib = r[u] / deg[u]
        acc = np.bincount(v, weights=contrib, minlength=n)
        r = base + damping * acc
    return pd.DataFrame({
        "node": nodes,
        out_col: np.rint(r * scale).astype("int64")})


def pagerank_sql(
    edges_path: str,
    damping: float = 0.85,
    iters: int = 20,
    scale: int = 10**9,
) -> str:
    """DuckDB oracle for :func:`pagerank` — the identical truncated power
    iteration unrolled as chained CTEs (standard SQL forbids aggregation in
    a recursive CTE term, so the fixed iteration count is written out)."""
    ctes = [f"""und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM read_parquet('{edges_path}') WHERE src <> dst
), adj AS (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und
), deg AS (
  SELECT u, count(*) AS deg FROM adj GROUP BY u
), nn AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM deg
), pr0 AS (
  SELECT u, 1.0 / (SELECT n FROM nn) AS r FROM deg
)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""pr{k} AS (
  SELECT adj.v AS u,
         (1.0 - {damping}) / (SELECT n FROM nn)
         + {damping} * sum(p.r / deg.deg) AS r
  FROM pr{k - 1} p
  JOIN adj ON adj.u = p.u
  JOIN deg ON deg.u = p.u
  GROUP BY adj.v
)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT u AS node, CAST(round(r * {scale}.0) AS BIGINT)"
            f" AS pr_ppb FROM pr{iters}")


def personalized_pagerank(
    edges: "ray.data.Dataset",
    n_seeds: int = 3,
    damping: float = 0.85,
    iters: int = 15,
    n_buckets: int = 32,
    scale: int = 10**9,
    seeds: "list[str] | None" = None,
    local_guard_edges: int = 5_000_000,
) -> "ray.data.Dataset":
    """(node, ppr_ppb): truncated-power-iteration PERSONALIZED PageRank —
    restart mass concentrated on a seed set instead of spread uniformly.
    Default seeds are the ``n_seeds`` lexicographically-smallest node ids
    (deterministic, so the SQL oracle hash-matches); pass ``seeds``
    explicitly to personalize to query-matched entities.

    Reference parity: the reference's local search seeds retrieval at
    query-matched entities and fans out along the graph weighted by
    closeness to those seeds (``search/local_search.py:40-133``,
    chain-of-exploration ``search/tool/reasoning/*``); PPR is the standard
    closed-form of that "relevance to a seed set" measure (Haveliwala 2002,
    Topic-Sensitive PageRank).

    Scale shape: identical to :func:`pagerank` — 2*iters scalar shuffles
    over the node-scale state joined onto the edge-scale adjacency; the
    only extras are a blocks×n_seeds partial-min collect to pick seeds
    and a tiny frozenset broadcast into the reducer. Contributions sum in
    sorted order so floats are layout-independent; ppb grid sits far above
    the residual FP noise. Below ``local_guard_edges`` deduped edges the
    iteration runs driver-local (see :func:`pagerank`).
    """
    if seeds is not None and not list(seeds):
        raise ValueError("personalized_pagerank: empty seed list")
    und = _undirected_edges(edges).materialize()
    n_edges = und.count()
    if 0 < n_edges <= local_guard_edges:
        pairs = und.to_pandas()
        if seeds is None:
            all_nodes = np.unique(np.concatenate(
                [pairs["a"].to_numpy(), pairs["b"].to_numpy()]))
            seeds_l = list(all_nodes[:n_seeds])
        else:
            seeds_l = sorted(set(seeds))
        res = _power_iteration_local(
            pairs, damping, iters, scale, "ppr_ppb", seeds=seeds_l)
        return ray.data.from_pandas(res)

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"u": pd.Series(dtype="object"),
                                 "v": pd.Series(dtype="object")})
        return pd.concat(
            [df.rename(columns={"a": "u", "b": "v"})[["u", "v"]],
             df.rename(columns={"a": "v", "b": "u"})[["u", "v"]]],
            ignore_index=True)

    adj = und.map_batches(both_dirs, batch_format="pandas",
                          batch_size=65536)

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "u" not in df.columns:
            return pd.DataFrame({"u": pd.Series(dtype="object"),
                                 "deg": pd.Series(dtype="int64")})
        return df.groupby("u", sort=False).size().reset_index(name="deg")

    deg = hash_partitioned_groupby(
        adj.map_batches(deg_partial, batch_format="pandas"),
        ["u"],
        lambda df: df.groupby("u", sort=False)["deg"].sum().reset_index(),
        n_buckets=n_buckets,
    ).materialize()
    if deg.count() == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "ppr_ppb": pa.array([], pa.int64())}))

    if seeds is None:
        # seed pick: per-block partial min-k, blocks×n_seeds to the driver
        def min_k(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "u" not in df.columns:
                return pd.DataFrame({"u": pd.Series(dtype="object")})
            return df[["u"]].sort_values("u", kind="stable").head(n_seeds)

        seed_rows = deg.map_batches(min_k, batch_format="pandas").to_pandas()
        seeds = frozenset(seed_rows["u"].sort_values().head(n_seeds))
    else:
        seeds = frozenset(seeds)
        if not seeds:
            raise ValueError("personalized_pagerank: empty seed list")
    ns = len(seeds)
    restart = (1.0 - damping) / ns
    r0 = 1.0 / ns

    adj_deg = hash_join(adj, deg, on=["u"], n_buckets=n_buckets,
                        lcols=["u", "v"], rcols=["u", "deg"]).materialize()

    def init_state(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "u" not in df.columns:
            return pd.DataFrame({"u": pd.Series(dtype="object"),
                                 "r": pd.Series(dtype="float64")})
        return pd.DataFrame({
            "u": df["u"],
            "r": np.where(df["u"].isin(seeds), r0, 0.0)})

    state = deg.map_batches(init_state, batch_format="pandas").materialize()

    def contrib_rows(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "v" not in df.columns:
            return pd.DataFrame({"v": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="float64")})
        return pd.DataFrame({
            "v": df["v"],
            "c": df["r"].astype("float64") / df["deg"].astype("float64")})

    def sum_reducer(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "v" not in df.columns:
            return pd.DataFrame({"u": pd.Series(dtype="object"),
                                 "r": pd.Series(dtype="float64")})
        df = df.sort_values(["v", "c"], kind="stable")
        s = df.groupby("v", sort=False)["c"].sum()
        base = np.where(s.index.isin(seeds), restart, 0.0)
        return pd.DataFrame({"u": s.index, "r": base + damping * s.values})

    for _ in range(iters):
        joined = hash_join(state, adj_deg, on=["u"], n_buckets=n_buckets,
                           lcols=["u", "r"], rcols=["u", "v", "deg"])
        contribs = joined.map_batches(contrib_rows, batch_format="pandas",
                                      batch_size=65536)
        new_state = hash_partitioned_groupby(
            contribs, ["v"], sum_reducer, n_buckets=n_buckets).materialize()
        state = ray.data.from_arrow_refs(new_state.to_arrow_refs())

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "u" not in df.columns:
            return pd.DataFrame({"node": pd.Series(dtype="object"),
                                 "ppr_ppb": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "node": df["u"],
            "ppr_ppb": np.rint(df["r"].astype("float64") * scale)
            .astype("int64")})

    return state.map_batches(finalize, batch_format="pandas")


def personalized_pagerank_sql(
    edges_path: str,
    n_seeds: int = 3,
    damping: float = 0.85,
    iters: int = 15,
    scale: int = 10**9,
) -> str:
    """DuckDB oracle for :func:`personalized_pagerank` — the identical
    truncated iteration with the restart mass on the same deterministic
    seed set, unrolled as chained CTEs."""
    ctes = [f"""und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM read_parquet('{edges_path}') WHERE src <> dst
), adj AS (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und
), deg AS (
  SELECT u, count(*) AS deg FROM adj GROUP BY u
), seeds AS (
  SELECT u FROM deg ORDER BY u LIMIT {n_seeds}
), ns AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM seeds
), pr0 AS (
  SELECT deg.u,
         CASE WHEN s.u IS NOT NULL THEN 1.0 / (SELECT n FROM ns)
              ELSE 0.0 END AS r
  FROM deg LEFT JOIN seeds s ON s.u = deg.u
)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""pr{k} AS (
  SELECT t.u,
         (CASE WHEN s.u IS NOT NULL
               THEN (1.0 - {damping}) / (SELECT n FROM ns)
               ELSE 0.0 END) + {damping} * t.acc AS r
  FROM (SELECT adj.v AS u, sum(p.r / deg.deg) AS acc
        FROM pr{k - 1} p
        JOIN adj ON adj.u = p.u
        JOIN deg ON deg.u = p.u
        GROUP BY adj.v) t
  LEFT JOIN seeds s ON s.u = t.u
)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT u AS node, CAST(round(r * {scale}.0) AS BIGINT)"
            f" AS ppr_ppb FROM pr{iters}")


def weakly_connected(edges: "ray.data.Dataset",
                     n_buckets: int = 32,
                     local_guard_edges: int = 2_000_000
                     ) -> "ray.data.Dataset":
    """(node, component): weakly-connected components of the canonical
    entity graph; component id = smallest member node id.

    Reference parity: the GDS WCC pass that precedes entity merging
    (``graph/processing/similar_entity.py`` runs gds.wcc to group merge
    candidates). Same distributed min-label propagation with pointer
    jumping as the dedup-resolution path (functions/components.py) — no
    driver-side union-find, component count and diameter never touch the
    driver. Below ``local_guard_edges`` deduped edges a driver-local
    union-find runs instead (the propagation loop pays multiple fixed-cost
    shuffles per round on an entity-scale graph); the dedup-resolution
    path in functions/components.py stays distributed-only (its input is
    corpus-scale)."""
    und = _undirected_edges(edges).materialize()
    n_edges = und.count()
    if 0 < n_edges <= local_guard_edges:
        return ray.data.from_pandas(_wcc_local(und.to_pandas()))
    from ..functions.components import connected_components
    return connected_components(und, n_buckets=n_buckets)


def weakly_connected_sql(edges_path: str) -> str:
    """DuckDB oracle for :func:`weakly_connected`: recursive-CTE transitive
    closure (exact at driver test scale; the Ray path is the scale one)."""
    return f"""
WITH RECURSIVE und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM read_parquet('{edges_path}') WHERE src <> dst
), edges AS (
  SELECT a, b FROM und UNION SELECT b AS a, a AS b FROM und
), reach(src, node) AS (
  SELECT a, a FROM edges
  UNION
  SELECT reach.src, e.b FROM reach JOIN edges e ON e.a = reach.node
)
SELECT node, MIN(src) AS component FROM reach GROUP BY node
"""


def kcore(
    edges: "ray.data.Dataset",
    k: int = 2,
    rounds: int = 32,
    n_buckets: int = 32,
    local_guard_edges: int = 5_000_000,
) -> "ray.data.Dataset":
    """(node, core_deg): the k-core of the undirected simple graph — the
    maximal subgraph where every node has degree >= k — with each member's
    within-core degree. The classic peeling fixpoint: repeatedly drop nodes
    of degree < k (and their edges) until none remain.

    Reference parity: degree-thresholded subgraph extraction is the
    reference's "core entity" notion (community_enhance weights core
    entities by degree/rank); the k-core is the standard graph-theoretic
    formalization, alongside degree_distribution/triangle_count/pagerank.

    Scale shape: the edge set IS the iteration state (entity-scale,
    shrinking monotonically). Each round recomputes degrees with one
    bucketed groupby and rebuilds the surviving adjacency with two
    hash_joins (u-side, v-side) — 3 scalar shuffles per round, no
    driver-side graph; the driver sees one scalar per round (the alive
    count, which doubles as the fixpoint test: peeling is monotone, so an
    unchanged count means an unchanged set). Raises if the fixpoint is not
    reached within ``rounds`` — the SQL oracle unrolls the same rounds, so
    a converged result is a pure function of the graph (extra rounds are
    no-ops on both sides). Below ``local_guard_edges`` deduped edges the
    peel runs driver-local (numpy edge-mask fixpoint — see
    :func:`pagerank`'s guard rationale).
    """
    und = _undirected_edges(edges).materialize()
    n_edges_total = und.count()
    if 0 < n_edges_total <= local_guard_edges:
        return ray.data.from_pandas(_kcore_local(und.to_pandas(), k))

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"u": pd.Series(dtype="object"),
                                 "v": pd.Series(dtype="object")})
        return pd.concat(
            [df.rename(columns={"a": "u", "b": "v"})[["u", "v"]],
             df.rename(columns={"a": "v", "b": "u"})[["u", "v"]]],
            ignore_index=True)

    adj = und.map_batches(both_dirs, batch_format="pandas",
                          batch_size=65536).materialize()

    def empty_out():
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "core_deg": pa.array([], pa.int64())}))

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "u" not in df.columns:
            return pd.DataFrame({"u": pd.Series(dtype="object"),
                                 "deg": pd.Series(dtype="int64")})
        return df.groupby("u", sort=False).size().reset_index(name="deg")

    def degrees(a: "ray.data.Dataset") -> "ray.data.Dataset":
        return hash_partitioned_groupby(
            a.map_batches(deg_partial, batch_format="pandas"),
            ["u"],
            lambda df: df.groupby("u", sort=False)["deg"].sum().reset_index(),
            n_buckets=n_buckets,
        )

    def alive_rows(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "deg" not in df.columns:
            return pd.DataFrame({"u": pd.Series(dtype="object")})
        return df.loc[df["deg"] >= k, ["u"]]

    def below_rows(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "deg" not in df.columns:
            return pd.DataFrame({"u": pd.Series(dtype="object")})
        return df.loc[df["deg"] < k, ["u"]]

    prev_alive = None
    for _ in range(rounds):
        deg = degrees(adj)
        alive = deg.map_batches(alive_rows, batch_format="pandas").materialize()
        n_alive = alive.count()
        if n_alive == 0:
            return empty_out()
        if prev_alive is not None and n_alive == prev_alive:
            break  # monotone peel + same count => same set => fixpoint
        prev_alive = n_alive
        # shrink the adjacency to edges with BOTH endpoints alive
        keep_u = hash_join(adj, alive, on=["u"], n_buckets=n_buckets,
                           lcols=["u", "v"], rcols=["u"])
        alive_v = alive.map_batches(
            lambda df: df.rename(columns={"u": "v"}), batch_format="pandas")
        shrunk = hash_join(keep_u, alive_v, on=["v"], n_buckets=n_buckets,
                           lcols=["u", "v"], rcols=["v"]).materialize()
        # re-root on block refs: an O(1)-depth plan across iterations
        adj = ray.data.from_arrow_refs(shrunk.to_arrow_refs())
    else:
        # rounds exhausted without two equal consecutive counts
        deg_final = degrees(adj)
        if deg_final.map_batches(below_rows, batch_format="pandas").count() > 0:
            raise ValueError(
                f"kcore did not converge in {rounds} rounds; raise `rounds` "
                f"(the SQL oracle must unroll the same count)")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "u" not in df.columns:
            return pd.DataFrame({"node": pd.Series(dtype="object"),
                                 "core_deg": pd.Series(dtype="int64")})
        return pd.DataFrame({"node": df["u"],
                             "core_deg": df["deg"].astype("int64")})

    return degrees(adj).map_batches(finalize, batch_format="pandas")


def kcore_sql(edges_path: str, k: int = 2, rounds: int = 32) -> str:
    """DuckDB oracle for :func:`kcore`: the identical peel unrolled as
    chained CTEs (aggregation is not allowed in a recursive CTE term, so
    the fixed round count is written out — converged extra rounds are
    no-ops, matching the Ray side's fixpoint exit)."""
    # AS MATERIALIZED: each e{i-1} is referenced twice (a{i} and e{i});
    # without it DuckDB inlines the chain exponentially
    ctes = [f"""und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM read_parquet('{edges_path}') WHERE src <> dst
), e0 AS MATERIALIZED (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und
)"""]
    for i in range(1, rounds + 1):
        ctes.append(f"""a{i} AS MATERIALIZED (
  SELECT u FROM (SELECT u, count(*) AS d FROM e{i - 1} GROUP BY u) WHERE d >= {k}
), e{i} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{i - 1} e
  JOIN a{i} x ON e.u = x.u JOIN a{i} y ON e.v = y.u
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT u AS node, CAST(count(*) AS BIGINT) AS core_deg "
          f"FROM e{rounds} GROUP BY u"
    )


def _lcm_upto(n: int) -> int:
    import math
    out = 1
    for i in range(2, n + 1):
        out = out * i // math.gcd(out, i)
    return out


def _bfs_harmonic_local(
    pairs: pd.DataFrame,
    n_landmarks: int,
    iters: int,
) -> pd.DataFrame:
    """Driver-local truncated multi-source BFS — the guarded small-graph
    fast path of :func:`landmark_harmonic` (same guard rationale as
    :func:`_power_iteration_local`). CSR adjacency via lexsort +
    searchsorted; one boolean-frontier sweep per landmark per round."""
    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    nodes = np.unique(np.concatenate([a, b]))
    n = len(nodes)
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    u = np.concatenate([ai, bi])
    v = np.concatenate([bi, ai])
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    indptr = np.searchsorted(u, np.arange(n + 1))
    unit = _lcm_upto(iters)
    harm = np.zeros(n, dtype=np.int64)
    for lm in range(min(n_landmarks, n)):
        dist = np.full(n, -1, dtype=np.int64)
        dist[lm] = 0
        frontier = np.array([lm], dtype=np.int64)
        for d in range(1, iters + 1):
            if frontier.size == 0:
                break
            starts = indptr[frontier]
            cnt = indptr[frontier + 1] - starts
            total = int(cnt.sum())
            if total == 0:
                break
            # vectorized ragged gather: concat of v[starts[i]:starts[i]+cnt[i]]
            cum = np.cumsum(cnt) - cnt
            idx = np.repeat(starts - cum, cnt) + np.arange(total)
            neigh = np.unique(v[idx])
            new = neigh[dist[neigh] < 0]
            dist[new] = d
            frontier = new
        reached = dist > 0
        harm[reached] += unit // dist[reached]
        # landmarks themselves stay present (dist 0 contributes 0)
        harm[lm] += 0
    # output support: every node reached by >= 1 landmark (incl. landmarks)
    present = np.zeros(n, dtype=bool)
    for lm in range(min(n_landmarks, n)):
        present[lm] = True
    present |= harm > 0
    # nodes reached at dist>iters contribute nothing and may be absent in
    # the distributed output too; but a node reached within iters with
    # harm 0 cannot exist (dist>0 => contribution>0), so `present` is exact
    return pd.DataFrame({"node": nodes[present],
                         "harm_units": harm[present]})


def landmark_harmonic(
    edges: "ray.data.Dataset",
    n_landmarks: int = 3,
    iters: int = 8,
    n_buckets: int = 32,
    local_guard_edges: int = 5_000_000,
) -> "ray.data.Dataset":
    """(node, harm_units): landmark-based HARMONIC centrality — for each
    node, sum of 1/dist(node, landmark) over a deterministic landmark set
    (the ``n_landmarks`` lexicographically-smallest node ids), distances
    truncated at ``iters`` hops (beyond = unreachable = contributes 0).

    Reference parity: closeness-to-anchor ranking is the graph-side form of
    the reference's evidence-path scoring (search/tool/reasoning/evidence.py
    ranks by proximity to matched entities); landmark harmonic centrality is
    the standard scalable estimator (full closeness needs all-pairs BFS).

    Exact-integer output: distances are integers in [1, iters], so the
    result is emitted in units of 1/LCM(1..iters) — harm_units =
    sum(LCM // dist), pure int64 arithmetic. No float fold order, no
    rounding grid; the SQL oracle reproduces it bit-for-bit.

    Scale shape: multi-source BFS as iterative min-distance propagation.
    State is (node, lm, dist) — at most n_landmarks rows per reached node.
    Each round: one hash_join of the frontier state onto the adjacency
    (scalar columns only) + one (node, lm)-keyed min-reduce. 2*iters scalar
    shuffles total; the driver holds only the landmark ids. Below
    ``local_guard_edges`` deduped edges the BFS runs driver-local (see
    :func:`pagerank`; equality pinned by tests)."""
    und = _undirected_edges(edges).materialize()
    n_edges = und.count()
    if 0 < n_edges <= local_guard_edges:
        return ray.data.from_pandas(_bfs_harmonic_local(
            und.to_pandas(), n_landmarks, iters))

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        # join-ready orientation: "node" is the propagation source column
        if df.empty or "a" not in df.columns:
            return pd.DataFrame({"node": pd.Series(dtype="object"),
                                 "v": pd.Series(dtype="object")})
        return pd.concat(
            [df.rename(columns={"a": "node", "b": "v"})[["node", "v"]],
             df.rename(columns={"a": "v", "b": "node"})[["node", "v"]]],
            ignore_index=True)

    adj = und.map_batches(both_dirs, batch_format="pandas",
                          batch_size=65536).materialize()

    # landmark pick: per-block partial min-k over the node set, then the
    # global min-k of the blocks x k survivors on the driver
    def node_min_k(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "node" not in df.columns:
            return pd.DataFrame({"node": pd.Series(dtype="object")})
        return (df[["node"]].drop_duplicates()
                .sort_values("node", kind="stable").head(n_landmarks))

    lm_rows = adj.map_batches(node_min_k, batch_format="pandas").to_pandas()
    if lm_rows.empty:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "harm_units": pa.array([], pa.int64())}))
    landmarks = sorted(lm_rows["node"].drop_duplicates())[:n_landmarks]

    # pandas block to match the shuffle stages' block type (a mixed
    # arrow/pandas union breaks downstream batching)
    state = ray.data.from_pandas(pd.DataFrame({
        "node": pd.array(landmarks, dtype="object"),
        "lm": pd.array(landmarks, dtype="object"),
        "dist": pd.array([0] * len(landmarks), dtype="int64")}))

    def relax(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "v" not in df.columns:
            return pd.DataFrame({"node": pd.Series(dtype="object"),
                                 "lm": pd.Series(dtype="object"),
                                 "dist": pd.Series(dtype="int64")})
        return pd.DataFrame({"node": df["v"], "lm": df["lm"],
                             "dist": df["dist"].astype("int64") + 1})

    def min_reduce(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "node" not in df.columns:
            return pd.DataFrame({"node": pd.Series(dtype="object"),
                                 "lm": pd.Series(dtype="object"),
                                 "dist": pd.Series(dtype="int64")})
        return (df.groupby(["node", "lm"], sort=False)["dist"].min()
                .reset_index())

    for r in range(1, iters + 1):
        # FRONTIER scoping: with unit edge weights a (node, lm) pair's dist
        # is final the round it is first reached, so only rows discovered
        # LAST round (dist == r-1) can relax anything new — the join input
        # shrinks from state-size to frontier-size, and a saturated BFS
        # (diameter < iters) stops paying edge-scale joins entirely.
        frontier = state.map_batches(
            lambda df, _r=r: df[df["dist"] == _r - 1]
            if not df.empty and "dist" in df.columns else df,
            batch_format="pandas").materialize()
        if frontier.count() == 0:
            break  # no new reachability — remaining rounds are identity
        cand = hash_join(frontier, adj, on=["node"], n_buckets=n_buckets,
                         lcols=["node", "lm", "dist"],
                         rcols=["node", "v"]
                         ).map_batches(relax, batch_format="pandas",
                                       batch_size=65536)
        state = hash_partitioned_groupby(
            state.union(cand), ["node", "lm"], min_reduce,
            n_buckets=n_buckets).materialize()
        # break lineage so the plan doesn't grow per round; pandas refs keep
        # the block type uniform for the next round's union
        state = ray.data.from_pandas_refs(state.to_pandas_refs())

    unit = _lcm_upto(iters)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "node" not in df.columns:
            return pd.DataFrame({"node": pd.Series(dtype="object"),
                                 "harm_units": pd.Series(dtype="int64")})
        d = df["dist"].to_numpy(dtype=np.int64)
        contrib = np.where(d > 0, unit // np.maximum(d, 1), 0)
        out = pd.DataFrame({"node": df["node"], "c": contrib})
        return (out.groupby("node", sort=False)["c"].sum().astype("int64")
                .rename("harm_units").reset_index())

    # (node, lm) rows for one node share a bucket under a node-keyed hash
    return hash_partitioned_groupby(state, ["node"], finalize,
                                    n_buckets=n_buckets)


def landmark_harmonic_sql(
    edges_path: str,
    n_landmarks: int = 3,
    iters: int = 8,
) -> str:
    """DuckDB oracle for :func:`landmark_harmonic` — the identical truncated
    multi-source BFS unrolled as chained min-fold CTEs, integer units."""
    unit = _lcm_upto(iters)
    ctes = [f"""und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM read_parquet('{edges_path}') WHERE src <> dst
), adj AS (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und
), lms AS (
  SELECT DISTINCT u FROM adj ORDER BY u LIMIT {n_landmarks}
), d0 AS (
  SELECT u AS node, u AS lm, 0 AS dist FROM lms
)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""d{k} AS (
  SELECT node, lm, min(dist) AS dist FROM (
    SELECT node, lm, dist FROM d{k - 1}
    UNION ALL
    SELECT adj.v AS node, p.lm, p.dist + 1 AS dist
    FROM d{k - 1} p JOIN adj ON adj.u = p.node
  ) GROUP BY node, lm
)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, CAST(sum(CASE WHEN dist > 0"
            f" THEN {unit} // dist ELSE 0 END) AS BIGINT) AS harm_units"
            f" FROM d{iters} GROUP BY node")


def _triangles_local(pairs: pd.DataFrame) -> int:
    """Driver-local exact triangle count — the guarded small-graph fast
    path of :func:`triangle_count`, same degree-oriented algorithm
    (orient low→high degree, enumerate wedges at the low-degree centre,
    close against the edge set) as one pandas self-merge."""
    # integer node codes; pure-numpy wedge enumeration + sorted-key
    # closure (a pandas self-merge materializes the wedge set as a
    # DataFrame — 3-4× slower and 3× the memory at tens of millions of
    # wedges)
    a_s = pairs["a"].to_numpy()
    b_s = pairs["b"].to_numpy()
    nodes = np.unique(np.concatenate([a_s, b_s]))
    a = np.searchsorted(nodes, a_s)
    b = np.searchsorted(nodes, b_s)
    n = len(nodes)
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    # acyclic (deg, code) orientation: every triangle has exactly one
    # wedge centre, so each is counted once regardless of id ordering
    a_first = (deg[a] < deg[b]) | ((deg[a] == deg[b]) & (a < b))
    lo = np.where(a_first, a, b)
    hi = np.where(a_first, b, a)
    order = np.lexsort((hi, lo))
    lo_s, hi_s = lo[order], hi[order]
    m = len(lo_s)
    grp_start = np.flatnonzero(np.r_[True, lo_s[1:] != lo_s[:-1]])
    cnt = np.diff(np.r_[grp_start, m])
    # per-EDGE fan-out: element at local index i pairs with the c-1-i
    # later neighbours of the same centre
    loc = np.arange(m) - np.repeat(grp_start, cnt)
    fan = np.repeat(cnt, cnt) - 1 - loc
    ekey = np.sort(np.minimum(a, b).astype(np.int64) * n
                   + np.maximum(a, b))
    total = 0
    # chunk by edge ranges so the materialized wedge slice stays ~16M rows
    bounds = np.searchsorted(np.cumsum(fan),
                             np.arange(0, fan.sum() + 16_000_000,
                                       16_000_000))
    for s, e in zip(bounds[:-1], bounds[1:]):
        if s >= e:
            continue
        f = fan[s:e]
        w = int(f.sum())
        if w == 0:
            continue
        first = np.repeat(np.arange(s, e), f)
        run_start = np.cumsum(f) - f
        off = np.arange(w) - np.repeat(run_start, f)
        second = first + 1 + off
        xk = hi_s[first].astype(np.int64) * n + hi_s[second]
        idx = np.searchsorted(ekey, xk)
        idx_c = np.minimum(idx, len(ekey) - 1)
        total += int(((idx < len(ekey)) & (ekey[idx_c] == xk)).sum())
    return total


def _wcc_local(pairs: pd.DataFrame) -> pd.DataFrame:
    """Driver-local WCC via union-find — guarded fast path of
    :func:`weakly_connected` (component id = smallest member, matching the
    distributed min-label propagation)."""
    from ..functions.unionfind import components_from_pairs
    amap = components_from_pairs(
        zip(pairs["a"].tolist(), pairs["b"].tolist()))
    nodes = sorted(amap)
    return pd.DataFrame({"node": nodes,
                         "component": [amap[n] for n in nodes]})


def _kcore_local(pairs: pd.DataFrame, k: int) -> pd.DataFrame:
    """Driver-local k-core peel — guarded fast path of :func:`kcore`.
    Edge-mask fixpoint: drop every edge with an endpoint currently under
    degree k until none change (the same monotone fixpoint as the
    distributed shrinking-adjacency peel)."""
    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    alive = np.ones(len(ai), dtype=bool)
    n = len(nodes)
    while True:
        deg = np.bincount(np.concatenate([ai[alive], bi[alive]]),
                          minlength=n)
        bad = deg < k
        drop = alive & (bad[ai] | bad[bi])
        if not drop.any():
            break
        alive &= ~drop
    deg = np.bincount(np.concatenate([ai[alive], bi[alive]]), minlength=n)
    keep = deg >= max(k, 1)
    return pd.DataFrame({"node": nodes[keep],
                         "core_deg": deg[keep].astype("int64")})
