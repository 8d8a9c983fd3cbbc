"""Embedding/index stages (reference Stage B/C parity).

The reference embeds every entity (graph/indexing/entity_indexer.py:53-107)
and every chunk (graph/indexing/chunk_indexer.py:53-118) with an
OpenAI-compatible model in sub-batches of <=64, then builds Neo4j vector
indexes. Here both are actor-pool map_batches stages producing an
``embedding: list<float32>`` column; "the index" is the materialized Lance/
Parquet table itself (ANN search over it is ops/similarity.py). The
deterministic hash embedder stands in for the model client — a real client
would load in ``__init__`` and batch its API calls in ``__call__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..config import KGConfig
from ..functions.embed import embed_texts


class EmbedChunks:
    """Chunk text → embedding (chunk_indexer.py parity). This is the
    compute-dominant stage of the build at scale (stand-in for model
    inference). STATELESS_OK: the hash embedder has no real state, so it runs
    as worker-cached tasks; a model-backed embedder would drop the flag and
    become an actor pool."""

    STATELESS_OK = True

    def __init__(self, cfg: KGConfig | None = None) -> None:
        self.cfg = cfg or KGConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        if not texts:
            return pa.table({
                "chunk_id": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.string()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            })
        vecs = embed_texts(texts, dim=self.cfg.embed_dim)
        offsets = pa.array(
            np.arange(0, (len(texts) + 1) * self.cfg.embed_dim,
                      self.cfg.embed_dim, dtype=np.int32))
        emb = pa.ListArray.from_arrays(offsets, pa.array(vecs.ravel(), pa.float32()))
        return pa.table({
            "chunk_id": batch.column("chunk_id"),
            "doc_id": batch.column("doc_id"),
            "embedding": emb,
        })


def embed_chunks(
    chunks: "ray.data.Dataset", cfg: KGConfig | None = None, concurrency: int | None = None
) -> "ray.data.Dataset":
    cfg = cfg or KGConfig()
    import ray
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    max_pool = concurrency or max(2, n_cpus - 2)
    from .pool import stage_map_batches
    # batch size is sized to the embedder's throughput: the vectorized hash
    # embedder does ~10k chunks/s/core, so sub-1k batches are pure task
    # overhead. A MODEL-backed embedder would drop this toward its inference
    # batch (reference EMBEDDING_BATCH_SIZE=64, config/settings.py:75) and
    # re-enable the fine-grained repartition for straggler smoothing.
    return stage_map_batches(
        chunks, EmbedChunks, {"cfg": cfg},
        batch_size=2048,
        max_pool=max_pool,
    )
