"""Community detection + per-community summarization.

Replaces GDS Leiden/SLLPA (/root/reference/community/detector/leiden.py:10-140,
sllpa.py:10-80) and the summary path (community/summary/base.py:53-134,
leiden.py:10-151). The canonical entity graph is orders of magnitude smaller
than the corpus (entities ≪ chunks ≪ docs), so detection runs driver-local on
the *aggregated* edges table behind an explicit size guard — the same
asymmetry the reference exploits by running GDS inside one JVM. Per-WCC
parallel detection via groupby(component).map_groups is the documented scale
fallback.

Algorithm: seeded networkx Louvain partition hierarchy (louvain_partitions) —
a deterministic stand-in for GDS Leiden's includeIntermediateCommunities
levels; the detector is pluggable per the reference's factory
(community/detector/__init__.py). Community ids follow the reference's
"<level>-<number>" scheme (leiden.py:102-140) with numbers canonicalized by
sorted minimum member so labels are stable across runs and parallelism.

Rank = count of DISTINCT chunks mentioning any member entity
(community/summary/base.py:53-68) — computed as a Ray groupby over the
canonical mentions, not driver-side.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..config import KGConfig

MAX_DRIVER_GRAPH_EDGES = 20_000_000


def detect_communities(
    edges_pdf: pd.DataFrame, cfg: KGConfig | None = None
) -> Dict[str, List[int]]:
    """entity_id -> [community number per level]. Deterministic (seeded)."""
    import networkx as nx

    cfg = cfg or KGConfig()
    if edges_pdf.empty or "src" not in edges_pdf.columns:
        return {}
    if len(edges_pdf) > MAX_DRIVER_GRAPH_EDGES:
        raise RuntimeError(
            f"{len(edges_pdf)} edges exceed driver guard; use "
            "detect_communities_distributed (per-component map_groups)"
        )
    # vectorized aggregation to an undirected simple graph before networkx
    df = edges_pdf[["src", "dst", "weight"]]
    df = df[df["src"] != df["dst"]]
    lo = df[["src", "dst"]].min(axis=1)
    hi = df[["src", "dst"]].max(axis=1)
    agg = (
        pd.DataFrame({"u": lo, "v": hi, "weight": df["weight"].astype(float)})
        .groupby(["u", "v"], sort=False)["weight"].sum().reset_index()
    )
    g = nx.Graph()
    g.add_weighted_edges_from(agg.itertuples(index=False, name=None))
    if g.number_of_nodes() == 0:
        return {}
    if cfg.community_algorithm in ("lpa", "sllpa"):
        # real SLPA (reference alternative detector via GDS sllpa,
        # community/detector/sllpa.py:10-80): label memories + association
        # threshold → overlapping communities. Level 0 is every node's
        # strongest label (a full partition); level L>0 holds the (L+1)-th
        # passing label of nodes that have one — the columnar analogue of
        # GDS's per-node communityIds array.
        from ..functions.slpa import slpa_memberships

        node_list = sorted(g.nodes)
        node_idx = {s: i for i, s in enumerate(node_list)}
        edge_idx = [(node_idx[r.u], node_idx[r.v], float(r.weight))
                    for r in agg.itertuples(index=False)]
        mems = slpa_memberships(
            len(node_list), edge_idx, seed=cfg.community_seed,
            max_iterations=cfg.sllpa_max_iterations,
            min_association=cfg.sllpa_min_association,
        )
        levels = []
        for lvl in range(max((len(m) for m in mems), default=0)):
            by_lab: Dict[int, set] = {}
            for i, labels in enumerate(mems):
                if lvl < len(labels):
                    by_lab.setdefault(labels[lvl], set()).add(node_list[i])
            levels.append(list(by_lab.values()))
    elif cfg.community_algorithm == "louvain":
        levels: List[List[set]] = list(
            nx.community.louvain_partitions(g, weight="weight", seed=cfg.community_seed)
        )[: cfg.community_max_levels]
    else:
        # real seeded Leiden (functions/leiden.py) — CPM objective by default
        # (no resolution limit: planted modular structure recovers at any
        # graph size; "modularity" gives GDS-Leiden-parity behaviour).
        # Detection runs UNWEIGHTED on the simple graph: parse weights are
        # LLM-asserted strengths, not co-occurrence counts; topology is the
        # community signal (reference projection uses COUNT aggregation —
        # community/detector/projections.py:23-37 — i.e. structural too).
        from ..functions.leiden import leiden_levels

        node_list = sorted(set(agg["u"]) | set(agg["v"]))
        node_idx = {s: i for i, s in enumerate(node_list)}
        edge_list = [(node_idx[r.u], node_idx[r.v], 1.0)
                     for r in agg.itertuples(index=False)]
        memberships = leiden_levels(
            node_list, edge_list, gamma=cfg.community_gamma,
            seed=cfg.community_seed, max_levels=cfg.community_max_levels,
            objective=cfg.community_objective,
        )
        levels = []
        for arr in memberships:
            by_comm: Dict[int, set] = {}
            for i, c in enumerate(arr):
                by_comm.setdefault(int(c), set()).add(node_list[i])
            levels.append(list(by_comm.values()))
    if not levels:
        levels = [[set(g.nodes)]]
    member_levels: Dict[str, List[int]] = {n: [] for n in g.nodes}
    for level_sets in levels:
        # canonical numbering: communities ordered by their smallest member
        ordered = sorted(level_sets, key=lambda s: min(s))
        for num, comm in enumerate(ordered):
            for n in comm:
                member_levels[n].append(num)
    return member_levels


def _component_memberships(
    edges: "ray.data.Dataset", cfg: KGConfig
) -> "ray.data.Dataset":
    """(entity_id, component, levels list<int>) — connected components
    (functions/components.py), then seeded detection per component in
    hash-bucket tasks. The edge→component attach broadcasts the node map
    below ``cfg.broadcast_alias_limit`` entities and hash-joins above it, so
    no step holds an entity-sized driver structure on the scale path."""
    import pyarrow as pa_

    from ..functions.components import connected_components
    from ..functions.shuffle import hash_join, hash_partitioned_groupby

    pairs = edges.map_batches(
        lambda b: pa_.table({"a": b.column("src"), "b": b.column("dst")}),
        batch_format="pyarrow",
    )
    comp = connected_components(pairs).materialize()  # (node, component)

    import ray as _ray
    if comp.count() <= cfg.broadcast_alias_limit:
        comp_pdf = comp.to_pandas()  # node -> component; aggregated-side size
        comp_map_ref = _ray.put(dict(zip(comp_pdf["node"], comp_pdf["component"])))

        def tag_component(df: pd.DataFrame) -> pd.DataFrame:
            cmap = _ray.get(comp_map_ref)
            df = df.copy()
            df["component"] = df["src"].map(cmap)
            return df

        tagged = edges.select_columns(["src", "dst", "weight"]).map_batches(
            tag_component, batch_format="pandas")
    else:
        # extreme entity counts: distributed hash join on src (endpoints
        # share components, so the src side suffices)
        tagged = hash_join(
            edges.select_columns(["src", "dst", "weight"]),
            comp.map_batches(
                lambda df: df.rename(columns={"node": "src"}),
                batch_format="pandas"),
            on=["src"],
            lcols=["src", "dst", "weight"], rcols=["src", "component"])

    def detect_bucket(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for comp_id, g in df.groupby("component", sort=False):
            # deterministic edge order into the seeded detector — group row
            # order depends on shuffle block arrival otherwise
            g = g.sort_values(["src", "dst", "weight"], kind="stable")
            local = detect_communities(g, cfg)
            rows = []
            for ent, levels in local.items():
                # levels ride as a delimited string: variable-length NUMERIC
                # list cells trip Ray's tensor-column conversion when blocks
                # cross pandas/Arrow boundaries downstream
                rows.append((ent, comp_id, ",".join(map(str, levels))))
            frames.append(pd.DataFrame(rows, columns=["entity_id", "component", "levels"]))
        if not frames:
            return pd.DataFrame({"entity_id": pd.Series(dtype=object),
                                 "component": pd.Series(dtype=object),
                                 "levels": pd.Series(dtype=object)})
        return pd.concat(frames, ignore_index=True)

    return hash_partitioned_groupby(tagged, ["component"], detect_bucket,
                                    n_buckets=32)


def detect_communities_distributed(
    edges: "ray.data.Dataset", cfg: KGConfig | None = None
) -> Dict[str, List[int]]:
    """Scale path: modularity communities never span disconnected components,
    so detection parallelizes across components — then a deterministic global
    renumbering (communities ordered by smallest member per level).
    Deterministic across runs and parallelism levels. Returns the driver
    dict; prefer :func:`detect_communities_distributed_ds` above the guard
    (no entity-sized driver structure)."""
    cfg = cfg or KGConfig()
    membership = _component_memberships(edges, cfg).to_pandas()
    if len(membership):
        membership = membership.assign(
            levels=membership["levels"].map(
                lambda s: [int(x) for x in s.split(",")]))
    return _renumber_global(membership)


def detect_communities_distributed_ds(
    edges: "ray.data.Dataset", cfg: KGConfig | None = None
) -> "ray.data.Dataset":
    """Dataset variant of :func:`detect_communities_distributed`:
    (entity_id, level, community_number, community_id) rows with the SAME
    canonical numbering (per level, communities ordered by smallest member).
    The only driver-side structure is the community-key → number map
    (community-count-sized); memberships never collect to the driver."""
    import numpy as np

    from ..functions.shuffle import hash_partitioned_groupby

    cfg = cfg or KGConfig()
    membership = _component_memberships(edges, cfg).materialize()

    # global level count: components with fewer levels repeat their last
    lens = membership.map_batches(
        lambda df: pd.DataFrame(
            {"n": [int((df["levels"].str.count(",") + 1).max())]
             if len(df) else []}),
        batch_format="pandas")
    lens_pdf = lens.to_pandas()
    max_levels = int(lens_pdf["n"].max()) if len(lens_pdf) else 0
    empty = pa.table({
        "entity_id": pa.array([], pa.string()),
        "level": pa.array([], pa.int32()),
        "community_number": pa.array([], pa.int32()),
        "community_id": pa.array([], pa.string()),
    })
    if max_levels == 0:
        return ray.data.from_arrow(empty)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        lists = df["levels"].str.split(",")
        out = []
        for level in range(max_levels):
            ln = lists.map(lambda L, lv=level: int(L[min(lv, len(L) - 1)]))
            out.append(pd.DataFrame({
                "entity_id": df["entity_id"], "component": df["component"],
                "level": level, "local": ln}))
        return pd.concat(out, ignore_index=True)

    exploded = membership.map_batches(
        explode, batch_format="pandas").materialize()

    # per (level, component, local) smallest member — two-phase aggregate;
    # the result is community-count-sized, the one driver-side decision
    def batch_min(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["level", "component", "local"], sort=False)
                ["entity_id"].min().reset_index(name="min_member"))

    partial = exploded.map_batches(batch_min, batch_format="pandas")
    mins = hash_partitioned_groupby(
        partial, ["level", "component", "local"],
        lambda df: (df.groupby(["level", "component", "local"], sort=False)
                    ["min_member"].min().reset_index()),
        n_buckets=16,
    ).to_pandas()
    if not len(mins):
        return ray.data.from_arrow(empty)
    mins = mins.sort_values(["level", "min_member"], kind="stable")
    mins["community_number"] = mins.groupby("level").cumcount().astype(np.int32)
    num_ref = ray.put(
        mins[["level", "component", "local", "community_number"]])

    def attach_num(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(num_ref)
        out = df.merge(m, on=["level", "component", "local"])
        out["community_id"] = (out["level"].astype(str) + "-"
                               + out["community_number"].astype(str))
        return out[["entity_id", "level", "community_number",
                    "community_id"]].astype(
            {"level": "int32", "community_number": "int32"})

    return exploded.map_batches(attach_num, batch_format="pandas")


def _renumber_global(membership: pd.DataFrame) -> Dict[str, List[int]]:
    """Global canonical renumbering of per-component local memberships:
    per level, communities (keyed by component + local number) ordered by
    their smallest member — identical labels to a driver-local run on the
    same graph. ``membership`` rows: (entity_id, component, levels)."""
    if membership.empty:
        return {}
    max_levels = membership["levels"].map(len).max()
    out: Dict[str, List[int]] = {e: [] for e in membership["entity_id"]}
    for level in range(max_levels):
        # a component with fewer levels keeps its last level's grouping
        def level_of(levels):
            return levels[min(level, len(levels) - 1)]

        keys = membership.apply(
            lambda r: (r["component"], level_of(r["levels"])), axis=1)
        groups: Dict[tuple, List[str]] = {}
        for ent, key in zip(membership["entity_id"], keys):
            groups.setdefault(key, []).append(ent)
        ordered = sorted(groups.values(), key=min)
        for num, members in enumerate(ordered):
            for ent in members:
                out[ent].append(num)
    return out


def component_fingerprints(
    edges_pdf: pd.DataFrame, cfg: KGConfig | None = None
) -> pd.DataFrame:
    """Tag the aggregated undirected simple graph with connected components
    and a content fingerprint per component subgraph (+ detection knobs).
    Returns (u, v, weight, component, comp_fp) — one row per simple edge.

    The fingerprint is order-independent (sum of row hashes over the
    canonicalized simple-edge rows), so a component whose subgraph is
    byte-identical across ticks hashes identically regardless of edge order
    or which documents produced it. Weight sensitivity follows the detector:
    Louvain consumes aggregated weights, so its fingerprints hash
    (u, v, weight); Leiden and SLPA run unweighted (see detect_communities),
    so their fingerprints hash topology only — weight-only churn (e.g. the
    same fact re-asserted by a new duplicate doc) carries the component
    instead of re-detecting an identical partition. The algorithm name is
    part of the knob tuple, so the two tiers never share cache entries."""
    import numpy as np

    from ..functions.unionfind import UnionFind
    from ..state.snapshots import fingerprint

    cfg = cfg or KGConfig()
    if edges_pdf.empty or "src" not in edges_pdf.columns:
        return pd.DataFrame({"u": pd.Series(dtype=object),
                             "v": pd.Series(dtype=object),
                             "weight": pd.Series(dtype=float),
                             "component": pd.Series(dtype=object),
                             "comp_fp": pd.Series(dtype=object)})
    df = edges_pdf[["src", "dst", "weight"]]
    df = df[df["src"] != df["dst"]]
    lo = df[["src", "dst"]].min(axis=1)
    hi = df[["src", "dst"]].max(axis=1)
    agg = (
        pd.DataFrame({"u": lo, "v": hi, "weight": df["weight"].astype(float)})
        .groupby(["u", "v"], sort=False)["weight"].sum().reset_index()
    )
    uf = UnionFind()
    for u, v in zip(agg["u"], agg["v"]):
        uf.union(u, v)
    amap = uf.alias_map()
    agg["component"] = agg["u"].map(amap)
    # weight-insensitive tier for unweighted detectors (leiden forces 1.0
    # edges; slpa ignores its weight operand — functions/slpa.py:41)
    fp_cols = (["u", "v", "weight"] if cfg.community_algorithm == "louvain"
               else ["u", "v"])
    row_hash = pd.util.hash_pandas_object(
        agg[fp_cols], index=False).to_numpy()
    content = pd.DataFrame({
        "component": agg["component"],
        "h": row_hash,
    }).groupby("component")["h"].agg(
        lambda s: int(np.asarray(s, dtype=np.uint64).sum(dtype=np.uint64)))
    sizes = agg.groupby("component").size()
    knobs = (cfg.community_algorithm, cfg.community_seed, cfg.community_gamma,
             cfg.community_max_levels, cfg.community_objective,
             cfg.sllpa_max_iterations, cfg.sllpa_min_association)
    fps = {c: fingerprint("community_component", int(content[c]),
                          int(sizes[c]), *knobs)
           for c in content.index}
    agg["comp_fp"] = agg["component"].map(fps)
    return agg


# fan dirty components out as Ray tasks at/above this count; below it the
# task-dispatch overhead exceeds the sequential cost
_PARALLEL_DETECT_MIN = 16


def _detect_component_batch(items, cfg: "KGConfig") -> pd.DataFrame:
    """Detect one batch of components: items = [(comp_fp, {u, v, weight}
    numpy arrays)]. Pure per-component function — safe to run anywhere in
    any batching."""
    frames = []
    for fp, arrs in items:
        g = pd.DataFrame({"src": arrs["u"], "dst": arrs["v"],
                          "weight": arrs["weight"]})
        local = detect_communities(g, cfg)
        frames.append(pd.DataFrame({
            "entity_id": list(local.keys()),
            "comp_fp": fp,
            "levels": [list(map(int, v)) for v in local.values()],
        }))
    if not frames:
        return pd.DataFrame({"entity_id": pd.Series(dtype=object),
                             "comp_fp": pd.Series(dtype=object),
                             "levels": pd.Series(dtype=object)})
    return pd.concat(frames, ignore_index=True)


def detect_communities_partitioned(
    edges_pdf: pd.DataFrame,
    cfg: KGConfig | None = None,
    carry_parts: pd.DataFrame | None = None,
) -> Tuple[Dict[str, List[int]], pd.DataFrame, int, int]:
    """Driver-local per-component detection with content-addressed
    per-component carry-over (the incremental analogue of the whole-graph
    detection cache): CPM-objective Leiden never forms a community across
    disconnected components, so a component whose subgraph is unchanged
    since the previous tick reuses its stored local membership verbatim and
    only dirty components re-run detection.

    ``carry_parts`` rows (from a previous tick's ``membership_parts``
    snapshot): (entity_id, comp_fp, levels list<int>) — local community
    numbers per level WITHIN the component, which are invariant to what the
    rest of the graph looks like. The returned global ``member_levels``
    renumbers all components together (smallest-member order per level,
    the same convention as detect_communities_distributed), so the result
    is a pure function of the current graph — identical whether every
    component was carried, freshly detected, or mixed.

    Returns (member_levels, parts_pdf, n_carried, n_detected)."""
    cfg = cfg or KGConfig()
    agg = component_fingerprints(edges_pdf, cfg)
    if agg.empty:
        empty = pd.DataFrame({"entity_id": pd.Series(dtype=object),
                              "comp_fp": pd.Series(dtype=object),
                              "levels": pd.Series(dtype=object)})
        return {}, empty, 0, 0

    carried_fps: set = set()
    frames: List[pd.DataFrame] = []
    if carry_parts is not None and len(carry_parts):
        live = set(agg["comp_fp"].unique())
        hit = carry_parts[carry_parts["comp_fp"].isin(live)]
        if len(hit):
            frames.append(hit[["entity_id", "comp_fp", "levels"]].copy())
            carried_fps = set(hit["comp_fp"].unique())

    dirty = [(fp, g) for fp, g in agg.groupby("comp_fp", sort=False)
             if fp not in carried_fps]
    n_detected = len(dirty)
    if len(dirty) >= _PARALLEL_DETECT_MIN and ray.is_initialized():
        # many independent small components: per-component detection is a
        # pure seeded function, so fan the dirty set out as Ray tasks —
        # greedy-balanced by edge count into ~2x-CPU bins (a 2500-component
        # sparse corpus ran 12.9s sequential on the driver, ~1.5s fanned
        # out at 32 cpus). Batching cannot change the result.
        ncpu = max(1, int(ray.cluster_resources().get("CPU", 8)))
        n_bins = min(len(dirty), 2 * ncpu)
        bins: List[list] = [[] for _ in range(n_bins)]
        loads = [0] * n_bins
        for fp, g in sorted(dirty, key=lambda t: (-len(t[1]), t[0])):
            i = loads.index(min(loads))
            bins[i].append((fp, {c: g[c].to_numpy()
                                 for c in ("u", "v", "weight")}))
            loads[i] += len(g)
        rfn = ray.remote(num_cpus=1)(_detect_component_batch)
        frames.extend(ray.get([rfn.remote(b, cfg) for b in bins if b]))
    else:
        for fp, g in dirty:
            frames.append(_detect_component_batch(
                [(fp, {c: g[c].to_numpy() for c in ("u", "v", "weight")})],
                cfg))

    parts = (pd.concat(frames, ignore_index=True)
             .sort_values(["comp_fp", "entity_id"], kind="stable")
             .reset_index(drop=True))
    membership = parts.rename(columns={"comp_fp": "component"})
    member_levels = _renumber_global(
        membership[["entity_id", "component", "levels"]])
    return member_levels, parts, len(carried_fps), n_detected


def community_membership_table(member_levels: Dict[str, List[int]]) -> pa.Table:
    """Explode to (entity_id, level, community_number, community_id) rows."""
    ent, lev, num, cid = [], [], [], []
    for e in sorted(member_levels):
        for level, n in enumerate(member_levels[e]):
            ent.append(e)
            lev.append(level)
            num.append(n)
            cid.append(f"{level}-{n}")
    return pa.table({
        "entity_id": pa.array(ent, pa.string()),
        "level": pa.array(lev, pa.int32()),
        "community_number": pa.array(num, pa.int32()),
        "community_id": pa.array(cid, pa.string()),
    })


def mention_chunk_pairs(mentions_canon: "ray.data.Dataset") -> "ray.data.Dataset":
    """The membership-independent half of the rank aggregate: per-batch
    DISTINCT (entity_id, chunk_id) pairs from the corpus-sized canonical
    mentions. Factored out so the build can materialize it CONCURRENTLY with
    community detection (the pairs depend only on mentions_canon; the
    cluster would otherwise sit idle during the driver-side Leiden)."""
    return mentions_canon.map_batches(
        lambda b: pa.Table.to_pandas(b)[["entity_id", "chunk_id"]]
        .drop_duplicates(),
        batch_format="pyarrow", batch_size=16384)


def community_ranks(
    membership, mentions_canon: "ray.data.Dataset",
    pairs: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """rank = distinct chunks mentioning any member (summary/base.py:53-68).

    Broadcast the (small) membership map and aggregate over the (large)
    mentions stream — the shuffle key is community_id, pre-aggregated per
    batch to (community_id, chunk_id) pairs before the distinct count.
    ``membership`` may be a Dataset or an already-collected DataFrame.
    ``pairs`` optionally supplies a precomputed :func:`mention_chunk_pairs`
    result (e.g. materialized while detection ran)."""
    member_pdf = (membership.to_pandas()
                  if not isinstance(membership, pd.DataFrame) else membership)
    member_ref = ray.put(member_pdf)

    def explode(batch: pa.Table) -> pd.DataFrame:
        members = ray.get(member_ref)
        df = pa.Table.to_pandas(batch)[["entity_id", "chunk_id"]].drop_duplicates()
        joined = df.merge(members[["entity_id", "community_id"]], on="entity_id")
        return joined[["community_id", "chunk_id"]].drop_duplicates()

    src = pairs if pairs is not None else mentions_canon
    pairs = src.map_batches(explode, batch_format="pyarrow", batch_size=16384)
    from ..functions.shuffle import hash_partitioned_groupby
    return hash_partitioned_groupby(
        pairs, ["community_id"],
        lambda df: df.drop_duplicates()
        .groupby("community_id")["chunk_id"].nunique().reset_index(name="rank")
        .astype({"rank": "int64"}),
        n_buckets=16,
        # distinct-pair merge is associative — tree-combine collapses the
        # per-batch pair blocks before the sort (see shuffle.pre_combine)
        pre_combine=lambda df: df.drop_duplicates(),
    )


def community_ranks_distributed(
    membership_ds: "ray.data.Dataset", mentions_canon: "ray.data.Dataset",
    pairs: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Same rank aggregate as :func:`community_ranks`, but the membership
    stays a Dataset: the entity→community attach is a distributed hash join
    (never an entity-sized driver collect/broadcast) — the scale-path pairing
    of :func:`detect_communities_distributed_ds`."""
    from ..functions.shuffle import hash_join, hash_partitioned_groupby

    if pairs is None:
        pairs = mention_chunk_pairs(mentions_canon)
    joined = hash_join(
        pairs, membership_ds.select_columns(["entity_id", "community_id"]),
        on=["entity_id"],
        lcols=["entity_id", "chunk_id"], rcols=["entity_id", "community_id"])
    tagged = joined.map_batches(
        lambda df: df[["community_id", "chunk_id"]].drop_duplicates(),
        batch_format="pandas")
    return hash_partitioned_groupby(
        tagged, ["community_id"],
        lambda df: df.drop_duplicates()
        .groupby("community_id")["chunk_id"].nunique().reset_index(name="rank")
        .astype({"rank": "int64"}),
        n_buckets=16,
    )


def summarize_communities_local(
    member_levels: Dict[str, List[int]],
    edges_pdf: pd.DataFrame,
    ranks_pdf: pd.DataFrame,
    cfg: KGConfig | None = None,
    summarizer_factory=None,
    summary_cache=None,
) -> pd.DataFrame:
    """Driver-side fast path of :func:`summarize_communities` for builds that
    already detected communities driver-locally (the membership, edge list
    and ranks are ALL on the driver and guarded-small) — one function call
    instead of three Dataset executions on community-count-sized data. Same
    output columns/values as the distributed variant."""
    cfg = cfg or KGConfig()
    member_pdf = community_membership_table(member_levels).to_pandas()
    edges_pdf = edges_pdf.copy()
    for col in ("src", "dst", "pred"):
        if col not in edges_pdf.columns:
            edges_pdf[col] = pd.Series(dtype=object)
    edges_pdf = edges_pdf[["src", "dst", "pred"]]
    # per-community intra-edge COUNT (the mock summary reports it) and the
    # first-200-lexicographic edge strings (full_content caps there) are
    # both computed vectorized — a 650k-edge sparse graph previously paid a
    # Python itertuples over every intra edge just to re-sort per community
    rel_count: Dict[str, int] = {}
    rel_text: Dict[str, str] = {}
    if len(member_pdf) and len(edges_pdf):
        m = member_pdf[["entity_id", "level", "community_id"]]
        for _level, ml in m.groupby("level", sort=False):
            tagged = (
                edges_pdf
                .merge(ml.rename(columns={"entity_id": "src",
                                          "community_id": "_c_src"}).drop(columns="level"),
                       on="src")
                .merge(ml.rename(columns={"entity_id": "dst",
                                          "community_id": "_c_dst"}).drop(columns="level"),
                       on="dst")
            )
            intra = tagged[tagged["_c_src"] == tagged["_c_dst"]]
            if not len(intra):
                continue
            rel_count.update(intra.groupby("_c_src", sort=False).size().items())
            # lexicographic (src, dst, pred) order == sorted(tuple list)
            capped = (intra.sort_values(["_c_src", "src", "dst", "pred"],
                                        kind="stable")
                      .groupby("_c_src", sort=False).head(200))
            txt = (capped["src"] + " -" + capped["pred"] + "-> "
                   + capped["dst"])
            rel_text.update(
                txt.groupby(capped["_c_src"], sort=False)
                .agg("; ".join).items())
    rank_map = dict(zip(ranks_pdf.get("community_id", []),
                        ranks_pdf.get("rank", [])))
    top_ids = set(
        ranks_pdf.sort_values(["rank", "community_id"], ascending=[False, True])
        .head(cfg.community_top_n_summaries)["community_id"]
    ) if len(ranks_pdf) else set()
    summarizer = MockSummarizer()
    rows = []
    for (cid, level), g in member_pdf.groupby(["community_id", "level"], sort=False):
        members = sorted(g["entity_id"])
        full = (
            "Nodes are: " + "; ".join(members[:200]) + ". Relationships are: "
            + rel_text.get(cid, "") + "."
        )
        # model path: leave blank here, the actor-pool stage below fills it
        summary = ("" if summarizer_factory is not None
                   else summarizer.summarize_counts(cid, members,
                                                    rel_count.get(cid, 0))) \
            if cid in top_ids else ""
        rows.append({
            "community_id": cid, "level": int(level), "members": members,
            "summary": summary, "full_content": full,
            "rank": int(rank_map.get(cid, 0)),
        })
    if not rows:
        return pd.DataFrame({
            "community_id": pd.Series(dtype=object),
            "level": pd.Series(dtype="int64"),
            "members": pd.Series(dtype=object),
            "summary": pd.Series(dtype=object),
            "full_content": pd.Series(dtype=object),
            "rank": pd.Series(dtype="int64"),
        })
    pdf = pd.DataFrame(rows).sort_values("community_id").reset_index(drop=True)
    if summarizer_factory is not None and top_ids:
        # parallel model summaries even on the driver-local fast path: the
        # top-N rows go through the same actor-pool stage as the distributed
        # variant (reference parallelizes exactly this step, base.py:225-250)
        pdf = (_model_summary_stage(ray.data.from_pandas(pdf),
                                    summarizer_factory, top_ids, cfg,
                                    summary_cache=summary_cache)
               .to_pandas().sort_values("community_id").reset_index(drop=True))
    return pdf


class MockSummarizer:
    """Deterministic stand-in for the community-summary LLM chain
    (community/summary/base.py:156-166; prompt config/prompt.py:146-151).
    :class:`ModelSummarizer` is the production path holding the chat client."""

    def summarize(self, community_id: str, members: List[str],
                  rels: List[Tuple[str, str, str]]) -> str:
        return self.summarize_counts(community_id, members, len(rels))

    def summarize_counts(self, community_id: str, members: List[str],
                         n_rels: int) -> str:
        """Same string as :meth:`summarize` from the edge COUNT alone — the
        driver-local fast path aggregates counts vectorized and never
        materializes per-community tuple lists."""
        head = ", ".join(members[:5])
        return (
            f"Community {community_id} contains {len(members)} entities "
            f"(including {head}) linked by {n_rels} relationships."
        )


class ModelSummarizer:
    """Production community summarizer — the model-backed analog of
    OpenAIExtractor/ModelEmbedChunks, mirroring the reference's summary chain
    (community/summary/base.py:156-273):

    - prompt contract: system ``给定一个输入三元组，生成信息摘要。没有序言。``
      (base.py:158-161), human message = the stringified community info the
      row already carries as ``full_content`` (describer prepare_string,
      base.py:16-45);
    - too-little-info guard: info under 10 chars skips the model and emits
      the reference's sentinel (base.py:259-265);
    - retry ladder via ``call_with_retry`` with the error sentinel on
      exhaustion (base.py:274-280 wraps failures as ``生成摘要时出错``);
    - parallel summaries: used as a CALLABLE CLASS in
      ``map_batches(..., concurrency=(1, N))`` so the chat client is built
      once per actor and batches of communities summarize concurrently —
      the Ray-native replacement for the reference's ThreadPoolExecutor
      (base.py:225-250).

    Only rows whose ``community_id`` is in ``top_ids`` (the reference's
    top-200-by-rank cut, summary/leiden.py:36-39) hit the model; other rows
    pass through with their existing summary."""

    NO_INFO_SENTINEL = "此社区没有足够的信息生成摘要。"
    ERROR_SENTINEL = "生成摘要时出错: retries exhausted"
    SYSTEM_PROMPT = "给定一个输入三元组，生成信息摘要。没有序言。"

    def __init__(self, client=None, client_factory=None, top_ids=None,
                 retries: int = 3, backoff_s: float = 0.0, cache=None):
        if client is not None:
            self._client = client
        elif client_factory is not None:
            self._client = client_factory()
        else:
            from .llm import OpenAIChatClient
            self._client = OpenAIChatClient()  # raises in sealed sandboxes
        self._top = None if top_ids is None else set(top_ids)
        self._retries = retries
        self._backoff = backoff_s
        # content-addressed summary cache {sha1(full_content): summary} —
        # the model prompt is a pure function of full_content, so an
        # unchanged community's summary carries over across ticks without a
        # model call (the reference's summary-reuse semantics). Error
        # sentinels are never cached, so failures retry next tick.
        self._cache = dict(cache) if cache else {}

    def summarize_one(self, full_content: str) -> str:
        from .llm import call_with_retry
        if len(full_content) < 10:
            return self.NO_INFO_SENTINEL
        hit = self._cache.get(summary_content_key(full_content))
        if hit is not None:
            return hit
        msgs = [{"role": "system", "content": self.SYSTEM_PROMPT},
                {"role": "user", "content": full_content}]
        out = call_with_retry(self._client, msgs, retries=self._retries,
                              backoff_s=self._backoff)
        return out if out else self.ERROR_SENTINEL

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["summary"] = [
            self.summarize_one(fc)
            if (self._top is None or cid in self._top) else s
            for cid, fc, s in zip(batch["community_id"],
                                  batch["full_content"], batch["summary"])
        ]
        return batch


def summary_content_key(full_content: str) -> str:
    """Content address of one community's model prompt (the summary is a
    pure function of full_content — members + intra edges)."""
    import hashlib

    return hashlib.sha1(full_content.encode("utf-8")).hexdigest()


def _model_summary_stage(ds: "ray.data.Dataset", summarizer_factory,
                         top_ids, cfg: KGConfig,
                         summary_cache=None) -> "ray.data.Dataset":
    """Attach the actor-pool model-summary stage to a communities dataset:
    small batches (model calls dominate), elastic pool so it never starves
    upstream stages of CPUs. ``summary_cache`` ({content_key: summary},
    top-N-sized) short-circuits unchanged communities."""
    return ds.map_batches(
        ModelSummarizer,
        fn_constructor_kwargs=dict(client_factory=summarizer_factory,
                                   top_ids=top_ids, cache=summary_cache),
        batch_format="pandas", batch_size=16,
        concurrency=(1, max(2, cfg.extract_concurrency)),
    )


def summarize_communities_distributed(
    membership_ds: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    ranks: "ray.data.Dataset",
    cfg: KGConfig | None = None,
    summarizer_factory=None,
    summary_cache=None,
) -> "ray.data.Dataset":
    """Scale variant of :func:`summarize_communities`: membership and the
    canonical edge list stay Datasets end-to-end. Intra-community edges come
    from two distributed hash joins (src-side, then dst-side at the same
    level), then member rows and intra-edge rows co-shuffle into
    per-community digest groups. Driver-side state is community-count-sized
    only (ranks + the top-N id set) — no entity- or edge-sized collect.
    Same output rows as summarize_communities (pinned by the guard-zero
    end-to-end test)."""
    from ..functions.shuffle import hash_join, hash_partitioned_groupby

    cfg = cfg or KGConfig()
    ranks_pdf = ranks.to_pandas()
    for col, dtype in (("community_id", object), ("rank", "int64")):
        if col not in ranks_pdf.columns:
            ranks_pdf[col] = pd.Series(dtype=dtype)
    top_ids = set(
        ranks_pdf.sort_values(["rank", "community_id"], ascending=[False, True])
        .head(cfg.community_top_n_summaries)["community_id"]
    )
    top_ref = ray.put(top_ids)

    e = edges.map_batches(
        lambda b: pa.table({"src": b.column("src"), "dst": b.column("dst"),
                            "pred": b.column("pred")}),
        batch_format="pyarrow")
    m_src = membership_ds.map_batches(
        lambda df: df[["entity_id", "level", "community_id"]]
        .rename(columns={"entity_id": "src", "community_id": "_c_src"})
        .astype({"level": "int64"}),
        batch_format="pandas")
    j1 = hash_join(e, m_src, on=["src"],
                   lcols=["src", "dst", "pred"],
                   rcols=["src", "level", "_c_src"])
    m_dst = membership_ds.map_batches(
        lambda df: df[["entity_id", "level", "community_id"]]
        .rename(columns={"entity_id": "dst", "community_id": "_c_dst"})
        .astype({"level": "int64"}),
        batch_format="pandas")
    j2 = hash_join(j1, m_dst, on=["dst", "level"],
                   lcols=["src", "dst", "pred", "level", "_c_src"],
                   rcols=["dst", "level", "_c_dst"])

    # member and edge rows co-shuffle as one tagged table; the edge's three
    # fields stay SEPARATE columns (packing them into one delimited string
    # breaks when an entity id itself contains the delimiter byte — the
    # driver-local path handles such ids fine, so must this one)
    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        intra = df[df["_c_src"] == df["_c_dst"]]
        return pd.DataFrame({
            "community_id": intra["_c_src"],
            "level": -1,  # digest level comes from member rows
            "kind": "e",
            "p_src": intra["src"], "p_dst": intra["dst"],
            "p_pred": intra["pred"],
        })

    def tag_members(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "community_id": df["community_id"],
            "level": df["level"].astype("int64"),
            "kind": "m",
            "p_src": df["entity_id"], "p_dst": "", "p_pred": "",
        })

    both = membership_ds.map_batches(tag_members, batch_format="pandas").union(
        j2.map_batches(tag_edges, batch_format="pandas"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        top = ray.get(top_ref)
        summarizer = MockSummarizer()
        rows = []
        for cid, g in df.groupby("community_id", sort=False):
            mrows = g[g["kind"] == "m"]
            members = sorted(mrows["p_src"])
            level = int(mrows["level"].iloc[0]) if len(mrows) else 0
            e = g[g["kind"] == "e"]
            rels = sorted(zip(e["p_src"], e["p_dst"], e["p_pred"]))
            full = (
                "Nodes are: " + "; ".join(members[:200])
                + ". Relationships are: "
                + "; ".join(f"{s} -{p}-> {d}" for s, d, p in rels[:200]) + "."
            )
            summary = ("" if summarizer_factory is not None
                       else summarizer.summarize(cid, members, rels)) \
                if cid in top else ""
            rows.append({"community_id": cid, "level": level,
                         "members": members, "summary": summary,
                         "full_content": full})
        if not rows:
            return pd.DataFrame({
                "community_id": pd.Series(dtype=object),
                "level": pd.Series(dtype="int64"),
                "members": pd.Series(dtype=object),
                "summary": pd.Series(dtype=object),
                "full_content": pd.Series(dtype=object),
            })
        return pd.DataFrame(rows)

    per_comm = hash_partitioned_groupby(both, ["community_id"], per_bucket,
                                        n_buckets=16)

    rank_ref = ray.put(dict(zip(ranks_pdf["community_id"], ranks_pdf["rank"])))

    def attach_rank(batch: pa.Table) -> pa.Table:
        ranks_map = ray.get(rank_ref)
        vals = [int(ranks_map.get(c, 0))
                for c in batch.column("community_id").to_pylist()]
        return batch.append_column("rank", pa.array(vals, pa.int64()))

    out = per_comm.map_batches(attach_rank, batch_format="pyarrow",
                               batch_size=4096)
    if summarizer_factory is not None and top_ids:
        out = _model_summary_stage(out, summarizer_factory, top_ids, cfg,
                                   summary_cache=summary_cache)
    return out


def summarize_communities(
    membership: "ray.data.Dataset",
    edges_pdf: pd.DataFrame,
    ranks: "ray.data.Dataset",
    cfg: KGConfig | None = None,
    summarizer_factory=None,
    summary_cache=None,
) -> "ray.data.Dataset":
    """Top-N communities by rank get summaries (reference takes top 200 by
    rank — community/summary/leiden.py:36-39); all communities get rows.

    full_content = the "Nodes are… Relationships are…" style digest the
    reference feeds the LLM (community/summary/base.py:15-45).
    ``edges_pdf`` is the already-collected canonical edge list (src,dst,pred)
    — the caller collects it once for community detection and reuses it here."""
    cfg = cfg or KGConfig()
    member_pdf = membership.to_pandas()
    edges_pdf = edges_pdf.copy()
    for col in ("src", "dst", "pred"):
        if col not in edges_pdf.columns:
            edges_pdf[col] = pd.Series(dtype=object)
    edges_pdf = edges_pdf[["src", "dst", "pred"]]
    ranks_pdf = ranks.to_pandas()
    for col, dtype in (("community_id", object), ("rank", "int64")):
        if col not in ranks_pdf.columns:
            ranks_pdf[col] = pd.Series(dtype=dtype)

    # pre-bucket intra-community edges ONCE via vectorized merges: tag each
    # edge with src's and dst's community per level, keep the intra ones —
    # O(E × levels) total instead of O(communities × E) isin scans
    comm_edges: Dict[str, list] = {}
    if len(member_pdf) and len(edges_pdf):
        m = member_pdf[["entity_id", "level", "community_id"]]
        for level, ml in m.groupby("level", sort=False):
            tagged = (
                edges_pdf
                .merge(ml.rename(columns={"entity_id": "src",
                                          "community_id": "_c_src"}).drop(columns="level"),
                       on="src")
                .merge(ml.rename(columns={"entity_id": "dst",
                                          "community_id": "_c_dst"}).drop(columns="level"),
                       on="dst")
            )
            intra = tagged[tagged["_c_src"] == tagged["_c_dst"]]
            for cid, g in intra.groupby("_c_src", sort=False):
                comm_edges[cid] = list(
                    g[["src", "dst", "pred"]].itertuples(index=False, name=None))
    edges_ref = ray.put(comm_edges)

    top_ids = set(
        ranks_pdf.sort_values(["rank", "community_id"], ascending=[False, True])
        .head(cfg.community_top_n_summaries)["community_id"]
    )
    summarizer = MockSummarizer()

    def per_community(g: pd.DataFrame, comm_edges_all: Dict[str, list]) -> pd.DataFrame:
        cid = g["community_id"].iloc[0]
        level = int(g["level"].iloc[0])
        members = sorted(g["entity_id"])
        rels = sorted(comm_edges_all.get(cid, []))
        full = (
            "Nodes are: " + "; ".join(members[:200]) + ". Relationships are: "
            + "; ".join(f"{s} -{p}-> {d}" for s, d, p in rels[:200]) + "."
        )
        # model path fills summaries in the downstream actor-pool stage
        summary = ("" if summarizer_factory is not None
                   else summarizer.summarize(cid, members, rels)) \
            if cid in top_ids else ""
        return pd.DataFrame([{
            "community_id": cid, "level": level, "members": members,
            "summary": summary, "full_content": full,
        }])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        comm_edges_all = ray.get(edges_ref)
        frames = [per_community(g, comm_edges_all)
                  for _, g in df.groupby("community_id", sort=False)]
        if not frames:
            return pd.DataFrame({
                "community_id": pd.Series(dtype=object),
                "level": pd.Series(dtype="int64"),
                "members": pd.Series(dtype=object),
                "summary": pd.Series(dtype=object),
                "full_content": pd.Series(dtype=object),
            })
        return pd.concat(frames, ignore_index=True)

    from ..functions.shuffle import hash_partitioned_groupby
    per_comm = hash_partitioned_groupby(membership, ["community_id"],
                                        per_bucket, n_buckets=16)

    rank_ref = ray.put(dict(zip(ranks_pdf["community_id"], ranks_pdf["rank"])))

    def attach_rank(batch: pa.Table) -> pa.Table:
        ranks_map = ray.get(rank_ref)
        vals = [int(ranks_map.get(c, 0)) for c in batch.column("community_id").to_pylist()]
        return batch.append_column("rank", pa.array(vals, pa.int64()))

    out = per_comm.map_batches(attach_rank, batch_format="pyarrow", batch_size=4096)
    if summarizer_factory is not None and top_ids:
        out = _model_summary_stage(out, summarizer_factory, top_ids, cfg,
                                   summary_cache=summary_cache)
    return out
