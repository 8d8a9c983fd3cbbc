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


def combined_from_batch(batch: pa.Table) -> pa.Table:
    """Single-pass parse: one output row per record with a ``kind`` column —
    mentions and triples are cheap Arrow filters over this table instead of
    two full regex passes over every raw extraction."""
    kind: List[str] = []
    c_chunk: List[str] = []
    c_doc: List[str] = []
    c_surf: List[object] = []
    c_type: List[object] = []
    c_desc: List[str] = []
    c_subj: List[object] = []
    c_pred: List[object] = []
    c_obj: List[object] = []
    c_w: List[object] = []
    for chunk_id, doc_id, raw in zip(
        batch.column("chunk_id").to_pylist(),
        batch.column("doc_id").to_pylist(),
        batch.column("raw").to_pylist(),
    ):
        parsed = parse_records(raw)
        for name, etype, desc in parsed.entities:
            kind.append("m")
            c_chunk.append(chunk_id)
            c_doc.append(doc_id)
            c_surf.append(name)
            c_type.append(etype)
            c_desc.append(desc)
            c_subj.append(None)
            c_pred.append(None)
            c_obj.append(None)
            c_w.append(None)
        for src, tgt, rtype, desc, weight in parsed.relationships:
            kind.append("t")
            c_chunk.append(chunk_id)
            c_doc.append(doc_id)
            c_surf.append(None)
            c_type.append(None)
            c_desc.append(desc)
            c_subj.append(src)
            c_pred.append(rtype)
            c_obj.append(tgt)
            c_w.append(weight)
    return pa.table({
        "kind": pa.array(kind, pa.string()),
        "chunk_id": pa.array(c_chunk, pa.string()),
        "doc_id": pa.array(c_doc, pa.string()),
        "entity_surface": pa.array(c_surf, pa.string()),
        "entity_type": pa.array(c_type, pa.string()),
        "description": pa.array(c_desc, pa.string()),
        "subj": pa.array(c_subj, pa.string()),
        "pred": pa.array(c_pred, pa.string()),
        "obj": pa.array(c_obj, pa.string()),
        "weight": pa.array(c_w, pa.float32()),
    })


def parse_combined(extractions: "ray.data.Dataset", cfg: KGConfig | None = None) -> "ray.data.Dataset":
    cfg = cfg or KGConfig()
    return extractions.map_batches(
        combined_from_batch, batch_format="pyarrow", batch_size=cfg.extract_batch_size
    )


def mentions_view(combined: "ray.data.Dataset") -> "ray.data.Dataset":
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("kind"), "m"))
        return t.select(["chunk_id", "doc_id", "entity_surface", "entity_type",
                         "description"])

    return combined.map_batches(f, batch_format="pyarrow", batch_size=65536)


def triples_view(combined: "ray.data.Dataset") -> "ray.data.Dataset":
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("kind"), "t"))
        return pa.table({
            "subj": t.column("subj"), "pred": t.column("pred"),
            "obj": t.column("obj"), "description": t.column("description"),
            "weight": t.column("weight"), "chunk_id": t.column("chunk_id"),
            "doc_id": t.column("doc_id"),
        })

    return combined.map_batches(f, batch_format="pyarrow", batch_size=65536)


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
