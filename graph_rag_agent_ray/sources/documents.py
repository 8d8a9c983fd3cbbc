"""Document sources.

The reference walks a directory and dispatches per extension
(/root/reference/processor/file_reader.py:36-79). Our engine's input is a
table of interleaved-span documents (BASELINE.json input_hint); ingestion of
raw files into that table is an upstream concern. Readers here:

- ``read_documents``: Lance when available, else Parquet, column-pruned.
- ``flat_text_to_spans``: adapt a flat (doc_id, text) table (e.g. the
  driver's TPC-H-ish ``documents`` test table) into the interleaved-span
  shape — one text span per document.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data

from ..state.snapshots import HAVE_LANCE


def read_documents(path: str) -> "ray.data.Dataset":
    """Dispatch by input shape: Lance table, Parquet file/dir, or a raw-file
    directory (txt/md/csv/json/yaml — the reference's FileReader surface,
    handled by :func:`..sources.ingest.read_directory`)."""
    if HAVE_LANCE and (path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))):
        return ray.data.read_lance(path)
    if path.endswith(".parquet"):
        return ray.data.read_parquet(path, columns=["doc_id", "spans"])
    if os.path.isdir(path):
        # probe RECURSIVELY: a hive-partitioned / sharded parquet dataset
        # keeps its files in subdirectories, which read_parquet handles but
        # a top-level listdir would miss (routing a valid parquet input to
        # the raw-file reader and silently building an empty KG)
        has_parquet = any(
            f.endswith(".parquet")
            for _root, _dirs, files in os.walk(path) for f in files
        )
        if not has_parquet:
            from .ingest import read_directory
            # strict: a build input that yields zero documents is almost
            # certainly a mis-pointed path — fail loudly, never build empty
            return read_directory(path, strict=True)
    return ray.data.read_parquet(path, columns=["doc_id", "spans"])


def _flat_to_spans(batch: pa.Table) -> pa.Table:
    doc_ids = [str(d) for d in batch.column("doc_id").to_pylist()]
    texts = batch.column("text").to_pylist()
    spans = [
        [{"kind": "text", "text": t or "", "media_ref": "", "offset": 0}]
        for t in texts
    ]
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "spans": pa.array(spans),
    })


def flat_text_to_spans(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Adapter: (doc_id, text, ...) → (doc_id:string, spans)."""
    return ds.map_batches(_flat_to_spans, batch_format="pyarrow", batch_size=1024)


def read_flat_documents(path: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    return flat_text_to_spans(ds)
