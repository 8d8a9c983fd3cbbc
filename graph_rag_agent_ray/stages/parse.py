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
    # columnar row building (lists per column) — ~2-3× cheaper than dicts +
    # from_pylist at millions of mention rows
    c_chunk: List[str] = []
    c_doc: List[str] = []
    c_surf: List[str] = []
    c_type: List[str] = []
    c_desc: List[str] = []
    for chunk_id, doc_id, raw in zip(
        batch.column("chunk_id").to_pylist(),
        batch.column("doc_id").to_pylist(),
        batch.column("raw").to_pylist(),
    ):
        parsed = parse_records(raw)
        for name, etype, desc in parsed.entities:
            c_chunk.append(chunk_id)
            c_doc.append(doc_id)
            c_surf.append(name)
            c_type.append(etype)
            c_desc.append(desc)
    return pa.table({
        "chunk_id": pa.array(c_chunk, pa.string()),
        "doc_id": pa.array(c_doc, pa.string()),
        "entity_surface": pa.array(c_surf, pa.string()),
        "entity_type": pa.array(c_type, pa.string()),
        "description": pa.array(c_desc, pa.string()),
    })


def triples_from_batch(batch: pa.Table) -> pa.Table:
    c_subj: List[str] = []
    c_pred: List[str] = []
    c_obj: List[str] = []
    c_desc: List[str] = []
    c_w: List[float] = []
    c_chunk: List[str] = []
    c_doc: List[str] = []
    for chunk_id, doc_id, raw in zip(
        batch.column("chunk_id").to_pylist(),
        batch.column("doc_id").to_pylist(),
        batch.column("raw").to_pylist(),
    ):
        parsed = parse_records(raw)
        for src, tgt, rtype, desc, weight in parsed.relationships:
            c_subj.append(src)
            c_pred.append(rtype)
            c_obj.append(tgt)
            c_desc.append(desc)
            c_w.append(weight)
            c_chunk.append(chunk_id)
            c_doc.append(doc_id)
    return pa.table({
        "subj": pa.array(c_subj, pa.string()),
        "pred": pa.array(c_pred, pa.string()),
        "obj": pa.array(c_obj, pa.string()),
        "description": pa.array(c_desc, pa.string()),
        "weight": pa.array(c_w, pa.float32()),
        "chunk_id": pa.array(c_chunk, pa.string()),
        "doc_id": pa.array(c_doc, pa.string()),
    })


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
