"""Embedding/index stages (reference Stage B/C parity).

The reference embeds every entity (graph/indexing/entity_indexer.py:53-107)
and every chunk (graph/indexing/chunk_indexer.py:53-118) with an
OpenAI-compatible model in sub-batches of <=64, then builds Neo4j vector
indexes. Here both are actor-pool map_batches stages producing an
``embedding: list<float32>`` column; "the index" is the materialized Lance/
Parquet table itself (ANN search over it is ops/similarity.py). The
deterministic hash embedder stands in for the model client in the default
path; ``ModelEmbedChunks`` (bottom of this module) is the real actor-pool
model path with an injectable embedding client, retry ladder and zero-vector
error sentinel — ``ReplayEmbedChunks`` runs it offline.
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


class EmbeddingClientError(RuntimeError):
    """Retryable embedding-API failure."""


class HashEmbeddingClient:
    """Offline embedding 'model': the deterministic hash embedder behind the
    client protocol (embed(list[str]) -> ndarray), with an optional scripted
    transient failure to exercise the retry ladder — the embedding analogue
    of stages/llm.GrammarClient."""

    def __init__(self, dim: int = 64, fail_every: int = 0) -> None:
        self.dim = dim
        self._fail_every = fail_every
        self._n = 0
        self._failed: set = set()

    def embed(self, texts):
        self._n += 1
        if self._fail_every and self._n % self._fail_every == 0:
            key = hash(tuple(texts))
            if key not in self._failed:  # fail once per batch, then heal
                self._failed.add(key)
                raise EmbeddingClientError("scripted transient failure")
        return embed_texts(list(texts), dim=self.dim)


class OpenAIEmbeddingClient:
    """Real OpenAI-compatible embeddings endpoint (entity_indexer.py:34
    parity; sub-batches of <=64 like EMBEDDING_BATCH_SIZE). Gated on the
    ``openai`` package + env — absent in sealed sandboxes."""

    def __init__(self, model: str = "text-embedding-3-small",
                 sub_batch: int = 64) -> None:  # pragma: no cover - no network
        import os
        try:
            from openai import OpenAI  # type: ignore
        except ImportError as e:
            raise NotImplementedError(
                "the 'openai' package is not installed; use "
                "HashEmbeddingClient offline") from e
        if not os.environ.get("OPENAI_API_KEY"):
            raise NotImplementedError("OPENAI_API_KEY not set")
        self._client = OpenAI(base_url=os.environ.get("OPENAI_BASE_URL"))
        self._model = model
        self._sub_batch = sub_batch

    def embed(self, texts):  # pragma: no cover - no network
        out = []
        for lo in range(0, len(texts), self._sub_batch):
            resp = self._client.embeddings.create(
                model=self._model, input=list(texts[lo:lo + self._sub_batch]))
            out.extend(d.embedding for d in resp.data)
        return np.asarray(out, dtype=np.float32)


class ModelEmbedChunks:
    """Model-backed chunk embedder: an ACTOR-POOL stage (no STATELESS_OK —
    the client loads once per actor in __init__), with the reference's retry
    ladder and a zero-vector error sentinel per batch on exhaustion (the
    embedding analogue of the extractor's empty-completion sentinel: a
    failed batch never kills the job, it produces re-embeddable rows)."""

    def __init__(self, cfg: KGConfig | None = None, client=None,
                 client_factory=None) -> None:
        self.cfg = cfg or KGConfig()
        if client is not None:
            self.client = client
        elif client_factory is not None:
            self.client = client_factory()
        else:
            self.client = OpenAIEmbeddingClient()  # raises in sealed sandboxes

    def _embed_with_retry(self, texts) -> np.ndarray:
        import time as _t
        for attempt in range(self.cfg.llm_retries):
            try:
                return self.client.embed(texts)
            except Exception:  # noqa: BLE001 — API errors are retryable here
                if attempt < self.cfg.llm_retries - 1 and self.cfg.llm_backoff_s:
                    _t.sleep(self.cfg.llm_backoff_s * (attempt + 1))
        return np.zeros((len(texts), self.cfg.embed_dim), dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        if not texts:
            return pa.table({
                "chunk_id": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.string()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            })
        vecs = self._embed_with_retry(texts)
        dim = vecs.shape[1]
        offsets = pa.array(np.arange(0, (len(texts) + 1) * dim, dim,
                                     dtype=np.int32))
        emb = pa.ListArray.from_arrays(
            offsets, pa.array(vecs.ravel(), pa.float32()))
        return pa.table({
            "chunk_id": batch.column("chunk_id"),
            "doc_id": batch.column("doc_id"),
            "embedding": emb,
        })


class ReplayEmbedChunks(ModelEmbedChunks):
    """Offline model-path embedder (HashEmbeddingClient with a scripted
    failure before every 5th batch) — runs the real actor-pool + retry +
    sentinel code path with zero network. Not STATELESS_OK on purpose: tests
    exercise the actor-pool dispatch branch with it."""

    def __init__(self, cfg: KGConfig | None = None) -> None:
        import dataclasses
        cfg = dataclasses.replace(cfg or KGConfig(), llm_backoff_s=0.0)
        super().__init__(cfg, client=HashEmbeddingClient(
            dim=cfg.embed_dim, fail_every=5))


def embed_chunks_model(
    chunks: "ray.data.Dataset", cfg: KGConfig | None = None,
    embedder_cls=ReplayEmbedChunks, concurrency: int | None = None,
) -> "ray.data.Dataset":
    """Model-backed variant of :func:`embed_chunks`: actor pool, inference-
    sized batches (reference EMBEDDING_BATCH_SIZE=64, settings.py:75),
    fine-grained blocks for straggler smoothing."""
    cfg = cfg or KGConfig()
    import ray
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    max_pool = concurrency or max(2, n_cpus - 2)
    from .pool import stage_map_batches
    chunks = chunks.repartition(max(64, n_cpus * 4))
    return stage_map_batches(
        chunks, embedder_cls, {"cfg": cfg},
        batch_size=64, max_pool=max_pool,
    )
