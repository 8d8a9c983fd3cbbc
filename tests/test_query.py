"""Query-side reads over the built tables."""

import pytest
import ray.data as rd

from graph_rag_agent_ray import build_kg
from graph_rag_agent_ray.pipelines.query import global_search, local_search, naive_search
from graph_rag_agent_ray.synth import generate


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg_query"))
    corpus = generate(n_docs=30, seed=42)
    tables = build_kg(rd.from_arrow(corpus.documents), out, input_token="q30")
    return corpus, tables


class TestLocalSearch:
    def test_finds_query_entity_and_context(self, built):
        corpus, tables = built
        # query with an actual entity surface → it must rank first
        target = corpus.alias_groups.column("canonical_id")[0].as_py()
        out = local_search(tables, target)
        assert out["entities"].iloc[0]["entity_id"] == target
        assert len(out["edges"]) > 0
        assert len(out["chunks"]) > 0
        # chunks actually mention the query entity's context
        assert out["chunks"]["text"].str.len().gt(0).all()

    def test_deterministic(self, built):
        corpus, tables = built
        target = corpus.alias_groups.column("canonical_id")[1].as_py()
        a = local_search(tables, target)
        b = local_search(tables, target)
        assert a["entities"]["entity_id"].tolist() == b["entities"]["entity_id"].tolist()


class TestGlobalSearch:
    def test_level0_rank_ordered(self, built):
        _, tables = built
        out = global_search(tables, level=0)
        assert len(out) > 0
        assert (out["rank"].values[:-1] >= out["rank"].values[1:]).all()
        assert out["full_content"].str.len().gt(0).all()


class TestNaiveSearch:
    def test_chunk_topk(self, built):
        corpus, tables = built
        target = corpus.alias_groups.column("canonical_id")[0].as_py()
        out = naive_search(tables, target, k=3)
        assert 0 < len(out) <= 3
        assert set(out.columns) == {"chunk_id", "score", "doc_id", "text"}


class TestHybridSearch:
    def test_dual_level_retrieval(self, built):
        from graph_rag_agent_ray.pipelines.query import hybrid_search
        corpus, tables = built
        target = corpus.alias_groups.column("canonical_id")[0].as_py()
        out = hybrid_search(tables, target)
        assert target in set(out["low_entities"]["entity_id"])
        assert len(out["low_edges"]) > 0
        assert len(out["high_communities"]) > 0
        # 1-hop edges actually touch the low-level entity set
        eset = set(out["low_entities"]["entity_id"])
        assert all(s in eset or d in eset
                   for s, d in zip(out["low_edges"]["src"], out["low_edges"]["dst"]))
