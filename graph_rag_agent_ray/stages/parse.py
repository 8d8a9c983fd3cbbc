"""Parse raw extraction records → mentions + triples (stateless map_batches).

Port of the reference's GraphDocument conversion semantics
(/root/reference/graph/extraction/graph_writer.py:36-131) to columnar form:
the two regexes are the contract (graph_writer.py:48-49), missing
relationship endpoints synthesize 未知 entities, malformed records are
dropped silently, and a per-chunk parse error yields empty output rows
rather than failing the task. Mentions and triples are separate Datasets
(the reference's per-chunk MENTIONS edges are implicit in our
``mentions.chunk_id`` column — no rewiring pass needed,
cf. graph_writer.py:245-299).
"""

from __future__ import annotations

from typing import List

import pyarrow as pa

import ray.data

from ..config import KGConfig
from ..functions.records import parse_records
from .. import schema as S


def mentions_from_batch(batch: pa.Table) -> pa.Table:
    rows: List[dict] = []
    for chunk_id, doc_id, raw in zip(
        batch.column("chunk_id").to_pylist(),
        batch.column("doc_id").to_pylist(),
        batch.column("raw").to_pylist(),
    ):
        parsed = parse_records(raw)
        for name, etype, desc in parsed.entities:
            rows.append({
                "chunk_id": chunk_id, "doc_id": doc_id,
                "entity_surface": name, "entity_type": etype, "description": desc,
            })
    if not rows:
        return S.MENTIONS.empty_table()
    return pa.Table.from_pylist(rows, schema=S.MENTIONS)


def triples_from_batch(batch: pa.Table) -> pa.Table:
    rows: List[dict] = []
    for chunk_id, doc_id, raw in zip(
        batch.column("chunk_id").to_pylist(),
        batch.column("doc_id").to_pylist(),
        batch.column("raw").to_pylist(),
    ):
        parsed = parse_records(raw)
        for src, tgt, rtype, desc, weight in parsed.relationships:
            rows.append({
                "subj": src, "pred": rtype, "obj": tgt,
                "description": desc, "weight": weight,
                "chunk_id": chunk_id, "doc_id": doc_id,
            })
    if not rows:
        return S.TRIPLES.empty_table()
    return pa.Table.from_pylist(rows, schema=S.TRIPLES)


def parse_mentions(extractions: "ray.data.Dataset", cfg: KGConfig | None = None) -> "ray.data.Dataset":
    cfg = cfg or KGConfig()
    return extractions.map_batches(
        mentions_from_batch, batch_format="pyarrow", batch_size=cfg.extract_batch_size
    )


def parse_triples(extractions: "ray.data.Dataset", cfg: KGConfig | None = None) -> "ray.data.Dataset":
    cfg = cfg or KGConfig()
    return extractions.map_batches(
        triples_from_batch, batch_format="pyarrow", batch_size=cfg.extract_batch_size
    )
