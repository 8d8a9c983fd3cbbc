"""Graph consistency validation — anti-join filters over the materialized
tables.

Reference: /root/reference/graph/graph_consistency_validator.py:37-182 checks
orphan entities (``NOT (e)<-[:MENTIONS]-()``), dangling/empty chunks, broken
document links, and repairs by deletion (:183-431). Here each check is a
distributed semi/anti-join (broadcast key set for the small side, hash-bucket
shuffle when both sides are large) producing an issue table; ``repair``
drops the offending rows and returns cleaned tables.
"""

from __future__ import annotations

from typing import Dict, Tuple

import pyarrow as pa

import ray
import ray.data



def _anti_join_small(ds: "ray.data.Dataset", col: str, keep_if_in: "ray.ObjectRef",
                     invert: bool = False) -> "ray.data.Dataset":
    """Rows of ``ds`` whose ``col`` is NOT in the broadcast key set (anti) or
    IS in it (semi, invert=True)."""

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keys = ray.get(keep_if_in)
        if not isinstance(keys, pa.Array):  # set-shaped refs → Arrow once
            keys = pa.array(list(keys))
        mask = pc.is_in(batch.column(col), value_set=keys)
        if not invert:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def _distinct_values(ds: "ray.data.Dataset", col: str) -> set:
    """Distinct values of one column, deduped DISTRIBUTEDLY before the
    driver collect — the collect is distinct-value-sized (entity/chunk-id
    scale), never row-count-sized (a full mentions take_all would be a
    corpus-scale driver materialization)."""
    import pandas as pd

    from ..functions.shuffle import hash_partitioned_groupby

    def part(batch: pa.Table) -> pa.Table:
        df = batch.select([col]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    distinct = hash_partitioned_groupby(
        ds.map_batches(part, batch_format="pyarrow", batch_size=16384),
        [col], lambda df: df.drop_duplicates(), n_buckets=16)
    return set(distinct.to_pandas()[col])


def validate_graph(
    tables: Dict[str, "ray.data.Dataset"]
) -> Dict[str, int]:
    """Issue counts, mirroring the reference's checks:

    - orphan_entities: entities never mentioned (validator.py:37-73)
    - empty_chunks: chunks with empty text (validator.py:75-110 analog)
    - dangling_edges: edges whose endpoint is not in entities
    - orphan_mentions: canonical mentions referencing unknown chunks
    """
    entities = tables["entities"]
    mentions = tables.get("mentions_canon")
    chunks = tables["chunks"]
    edges = tables["edges"]

    entity_ids = _distinct_values(entities, "entity_id")
    eref = ray.put(entity_ids)

    issues: Dict[str, int] = {}

    if mentions is not None:
        mentioned = _distinct_values(mentions, "entity_id")
        issues["orphan_entities"] = len(entity_ids - mentioned)
    else:
        issues["orphan_entities"] = -1

    def _count_empty(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = b.column("text")
        n_empty = pc.sum(pc.or_kleene(
            pc.is_null(t), pc.equal(pc.cast(t, pa.string()), ""))).as_py() or 0
        return pa.table({"n": pa.array([int(n_empty)], pa.int64())})

    issues["empty_chunks"] = chunks.map_batches(
        _count_empty, batch_format="pyarrow").sum("n")

    dangling_src = _anti_join_small(edges, "src", eref)
    dangling_dst = _anti_join_small(edges, "dst", eref)
    issues["dangling_edges"] = dangling_src.count() + dangling_dst.count()

    if mentions is not None:
        # both sides are corpus-scale (mention rows vs chunk ids) — a
        # hash-bucket anti-join count, never a broadcast of all chunk ids
        issues["orphan_mentions"] = _anti_count(
            mentions, "chunk_id", chunks, "chunk_id")
    else:
        issues["orphan_mentions"] = -1
    return issues


def _anti_count(left: "ray.data.Dataset", left_col: str,
                right: "ray.data.Dataset", right_col: str) -> int:
    """COUNT of left rows whose key has no right row — the large⋈large
    anti-join shape: both sides shuffled by key, counted per bucket, summed
    distributedly (only the scalar reaches the driver)."""
    import pandas as pd

    from ..functions.shuffle import hash_partitioned_groupby

    def tag(ds, col, side, dedup):
        def fn(batch: pa.Table) -> pa.Table:
            df = batch.select([col]).to_pandas()
            if dedup:
                df = df.drop_duplicates()
            df.columns = ["key"]
            df["side"] = side
            return pa.Table.from_pandas(df, preserve_index=False)
        return ds.map_batches(fn, batch_format="pyarrow", batch_size=16384)

    both = tag(left, left_col, "l", dedup=False).union(
        tag(right, right_col, "r", dedup=True))

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        has_r = set(df.loc[df["side"] == "r", "key"])
        lrows = df.loc[df["side"] == "l", "key"]
        return pd.DataFrame({"n": [int((~lrows.isin(has_r)).sum())]})

    total = hash_partitioned_groupby(both, ["key"], bucket, n_buckets=16).sum("n")
    return int(total or 0)


def repair_graph(
    tables: Dict[str, "ray.data.Dataset"]
) -> Tuple[Dict[str, "ray.data.Dataset"], Dict[str, int]]:
    """Drop inconsistent rows (reference repair strategy = delete,
    validator.py:183-431): dangling edges removed, orphan entities removed
    when a mentions table is available."""
    issues = validate_graph(tables)
    entities = tables["entities"]
    edges = tables["edges"]

    entity_ids = _distinct_values(entities, "entity_id")
    eref = ray.put(entity_ids)
    edges_clean = _anti_join_small(
        _anti_join_small(edges, "src", eref, invert=True), "dst", eref, invert=True
    )

    cleaned = dict(tables)
    cleaned["edges"] = edges_clean
    if tables.get("mentions_canon") is not None:
        mentioned = _distinct_values(tables["mentions_canon"], "entity_id")
        mref = ray.put(mentioned)
        cleaned["entities"] = _anti_join_small(entities, "entity_id", mref, invert=True)
    return cleaned, issues
