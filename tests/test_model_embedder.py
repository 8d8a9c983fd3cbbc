"""Model-backed embedding stage (stages/index.ModelEmbedChunks): actor-pool
dispatch, retry ladder, zero-vector sentinel, and equivalence with the
in-process hash embedder when the client is the hash model."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from graph_rag_agent_ray.config import KGConfig
from graph_rag_agent_ray.stages.index import (
    EmbeddingClientError,
    HashEmbeddingClient,
    ModelEmbedChunks,
    OpenAIEmbeddingClient,
    ReplayEmbedChunks,
    embed_chunks,
    embed_chunks_model,
)

CFG = KGConfig(llm_backoff_s=0.0)


def _chunks(n=40):
    return rd.from_arrow(pa.table({
        "chunk_id": pa.array([f"c{i}" for i in range(n)], pa.string()),
        "doc_id": pa.array([f"d{i % 7}" for i in range(n)], pa.string()),
        "text": pa.array([f"chunk text number {i} with words" for i in range(n)],
                         pa.string()),
    }))


class TestModelEmbedder:
    def test_matches_task_path_embedder(self, ray_session):
        """The model path over the hash client must equal the worker-cached
        task path bit-for-bit (same spec, two execution strategies)."""
        ds = _chunks()
        a = embed_chunks(ds, CFG).to_pandas().sort_values("chunk_id")
        b = embed_chunks_model(ds, CFG).to_pandas().sort_values("chunk_id")
        for x, y in zip(a["embedding"], b["embedding"]):
            assert np.allclose(np.asarray(x), np.asarray(y))

    def test_retry_heals_scripted_failures(self):
        emb = ModelEmbedChunks(CFG, client=HashEmbeddingClient(
            dim=CFG.embed_dim, fail_every=1))
        out = emb(pa.table({
            "chunk_id": pa.array(["c"], pa.string()),
            "doc_id": pa.array(["d"], pa.string()),
            "text": pa.array(["some text"], pa.string()),
        }))
        vec = np.asarray(out.column("embedding").to_pylist()[0])
        assert np.linalg.norm(vec) > 0  # healed on retry, not the sentinel

    def test_exhausted_retries_yield_zero_sentinel(self):
        class AlwaysDown:
            def embed(self, texts):
                raise EmbeddingClientError("down")

        emb = ModelEmbedChunks(CFG, client=AlwaysDown())
        out = emb(pa.table({
            "chunk_id": pa.array(["c"], pa.string()),
            "doc_id": pa.array(["d"], pa.string()),
            "text": pa.array(["some text"], pa.string()),
        }))
        vec = np.asarray(out.column("embedding").to_pylist()[0])
        assert np.linalg.norm(vec) == 0  # re-embeddable sentinel rows

    def test_replay_embedder_runs_actor_pool(self, ray_session):
        out = embed_chunks_model(_chunks(30), CFG,
                                 embedder_cls=ReplayEmbedChunks,
                                 concurrency=2).to_pandas()
        assert len(out) == 30
        assert all(len(v) == CFG.embed_dim for v in out["embedding"])

    def test_real_client_gated(self):
        with pytest.raises(NotImplementedError):
            OpenAIEmbeddingClient()
