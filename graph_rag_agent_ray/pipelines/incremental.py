"""Incremental update: content-hash delta detection + work-skipping rebuild.

Reference semantics (/root/reference/build/incremental_update.py:69-111,
build/incremental/file_change_manager.py:31-130,
build/incremental_graph_builder.py:94-309): a sha256 registry detects
added/modified/deleted files; new files run the full pipeline, modified files
are delete+reprocess, deletions cascade; entity embeddings and communities
are re-derived afterwards (dirty-flag propagation,
graph/indexing/embedding_manager.py:374-474).

Ray-Data re-expression: the registry is a per-document content-hash table
snapshot. The delta is a distributed outer comparison on doc_id (hash-bucket
shuffle). The EXPENSIVE stages (chunking, LLM extraction) are recomputed only
for added/changed documents; rows of unchanged documents are carried over
from the previous snapshots; deleted/modified documents' rows are dropped.
The merged chunks/extractions snapshots are written under the new build's
fingerprints, so the subsequent ``build_kg`` call sees them as cache hits and
only re-runs the (cheap, aggregated) downstream canonicalization/community
stages — the dirty-flag propagation of the reference is subsumed by
recompute-from-merged-snapshots.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Optional, Tuple

import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..config import KGConfig
from ..functions.shuffle import hash_partitioned_groupby
from ..state.snapshots import SnapshotStore, fingerprint
from ..stages.chunker import chunk_documents
from ..stages.extract import MockLLMExtractor, extract_chunks
from .build import build_kg

REGISTRY_STAGE = "registry"


def document_hashes(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, content_hash) — hash of the full ordered span sequence."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        hashes = []
        for spans in spans_col:
            h = hashlib.sha256()
            for s in sorted(spans or [], key=lambda s: s["offset"]):
                h.update(repr((s["kind"], s["text"], s["media_ref"], s["offset"])).encode())
            hashes.append(h.hexdigest())
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "content_hash": pa.array(hashes, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def compute_delta(
    old_registry: "ray.data.Dataset", new_registry: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Distributed registry diff → (doc_id, status) with status in
    {added, modified, deleted, unchanged}. Hash-bucket shuffle on doc_id —
    no driver-side materialization of either registry."""

    def tag(which: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column("side", pa.array([which] * len(batch), pa.string()))
        return fn

    both = old_registry.map_batches(tag("old"), batch_format="pyarrow").union(
        new_registry.map_batches(tag("new"), batch_format="pyarrow")
    )

    def diff_bucket(df: pd.DataFrame) -> pd.DataFrame:
        piv = df.pivot_table(index="doc_id", columns="side", values="content_hash",
                             aggfunc="first").reset_index()
        for col in ("old", "new"):
            if col not in piv.columns:
                piv[col] = None
        status = pd.Series("unchanged", index=piv.index)
        status[piv["old"].isna()] = "added"
        status[piv["new"].isna()] = "deleted"
        changed = piv["old"].notna() & piv["new"].notna() & (piv["old"] != piv["new"])
        status[changed] = "modified"
        return pd.DataFrame({"doc_id": piv["doc_id"], "status": status})

    return hash_partitioned_groupby(both, ["doc_id"], diff_bucket, n_buckets=32)


def _filter_by_docs(ds: "ray.data.Dataset", keep_ref, doc_col: str = "doc_id"):
    """Broadcast semi-join: vectorized ``pc.is_in`` against the broadcast
    doc-id value_set (``keep_ref`` = ray.put of a pa.Array or a set)."""
    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = ray.get(keep_ref)
        if not isinstance(keep, pa.Array):  # legacy set-shaped refs
            keep = pa.array(sorted(keep), pa.string())
        return batch.filter(pc.is_in(batch.column(doc_col), value_set=keep))
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def incremental_build_kg(
    docs_new: "ray.data.Dataset",
    out_dir: str,
    prev_dir: str,
    cfg: Optional[KGConfig] = None,
    input_token: str = "",
    extractor_cls=MockLLMExtractor,
) -> Tuple[Dict[str, "ray.data.Dataset"], Dict[str, int]]:
    """Update the KG at ``out_dir`` given the previous build at ``prev_dir``.

    Returns (tables, delta_counts). Unchanged documents' chunk/extraction rows
    carry over — the expensive per-document stages run only on the delta.
    """
    cfg = cfg or KGConfig()
    prev = SnapshotStore(prev_dir)
    store = SnapshotStore(out_dir)

    new_registry = document_hashes(docs_new).materialize()
    if prev.manifest(REGISTRY_STAGE):
        old_registry = prev.read(REGISTRY_STAGE)
    else:
        old_registry = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.string()),
            "content_hash": pa.array([], pa.string()),
        }))

    delta = compute_delta(old_registry, new_registry).materialize()
    counts = {
        s: 0 for s in ("added", "modified", "deleted", "unchanged")
    }
    for row in delta.groupby("status").count().take_all():
        counts[row["status"]] = int(row["count()"])

    # doc_id sets for the delta (broadcast; at 10^12 scale this becomes a
    # bloom filter / semi-join, same shape)
    changed_pdf = delta.to_pandas()
    dirty = set(changed_pdf.loc[changed_pdf["status"].isin(["added", "modified"]), "doc_id"])
    kept = set(changed_pdf.loc[changed_pdf["status"] == "unchanged", "doc_id"])
    dirty_ref = ray.put(pa.array(sorted(dirty), pa.string()))
    kept_ref = ray.put(pa.array(sorted(kept), pa.string()))

    base_fp = fingerprint(input_token, cfg)

    # merged chunks / extractions / embeddings: prior rows for unchanged docs
    # + fresh rows for dirty docs — materialized once, then all three
    # snapshots written CONCURRENTLY (independent parquet jobs; build_kg only
    # needs them on disk before it starts) under the NEW build's
    # fingerprints so build_kg resumes straight into the downstream stages
    from concurrent.futures import ThreadPoolExecutor

    writes = ThreadPoolExecutor(max_workers=3)
    docs_dirty = _filter_by_docs(docs_new, dirty_ref)
    if prev.manifest("chunks"):
        chunks_kept = _filter_by_docs(prev.read("chunks"), kept_ref)
        chunks_merged = chunk_documents(docs_dirty, cfg).union(chunks_kept)
    else:
        chunks_merged = chunk_documents(docs_dirty, cfg)
    chunks_merged = chunks_merged.materialize()
    pending = [writes.submit(store.write, "chunks", chunks_merged,
                             fingerprint(base_fp, "chunks"))]

    if prev.manifest("extractions"):
        extr_kept = _filter_by_docs(prev.read("extractions"), kept_ref)
        chunks_dirty_only = _filter_by_docs(chunks_merged, dirty_ref)
        extr_merged = extract_chunks(chunks_dirty_only, cfg, extractor_cls).union(extr_kept)
    else:
        extr_merged = extract_chunks(chunks_merged, cfg, extractor_cls)
    pending.append(writes.submit(
        store.write, "extractions", extr_merged,
        fingerprint(base_fp, "extractions", extractor_cls.__name__)))

    # chunk embeddings — the compute-dominant model stage — carry over the
    # same way (reference dirty-flag embedding update,
    # embedding_manager.py:374-474): prior rows for unchanged docs, fresh
    # inference only for the dirty delta
    if prev.manifest("chunk_embeddings"):
        from ..stages.index import embed_chunks
        emb_kept = _filter_by_docs(prev.read("chunk_embeddings"), kept_ref)
        chunks_dirty2 = _filter_by_docs(chunks_merged, dirty_ref)
        emb_merged = embed_chunks(chunks_dirty2, cfg).union(emb_kept)
        pending.append(writes.submit(
            store.write, "chunk_embeddings", emb_merged,
            fingerprint(base_fp, "chunk_embeddings")))

    for f in pending:
        f.result()
    writes.shutdown()

    tables = build_kg(docs_new, out_dir, cfg=cfg, input_token=input_token,
                      extractor_cls=extractor_cls)
    store.write(REGISTRY_STAGE, new_registry, fingerprint(base_fp, REGISTRY_STAGE))
    return tables, counts


def write_registry(docs: "ray.data.Dataset", out_dir: str,
                   cfg: Optional[KGConfig] = None, input_token: str = "") -> None:
    """Persist the content-hash registry for a completed build (call after
    build_kg so the next incremental run can diff against it)."""
    cfg = cfg or KGConfig()
    store = SnapshotStore(out_dir)
    store.write(REGISTRY_STAGE, document_hashes(docs),
                fingerprint(fingerprint(input_token, cfg), REGISTRY_STAGE))
