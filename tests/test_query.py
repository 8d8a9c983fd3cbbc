"""Query-side reads over the built tables."""

import pandas as pd
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


class TestChainOfExploration:
    def test_beam_explores_and_collects_evidence(self, built):
        from graph_rag_agent_ray.pipelines.query import chain_of_exploration
        corpus, tables = built
        target = corpus.alias_groups.column("canonical_id")[0].as_py()
        out = chain_of_exploration(tables, target, max_hops=2, beam_width=4)
        assert target in out["visited"]
        assert len(out["visited"]) > 4          # explored beyond the seed
        assert len(out["hops"]) >= 2
        ev = out["evidence"]
        assert len(ev) > 0
        assert not ev.duplicated(["src", "dst", "pred"]).any()
        # evidence edges touch the visited set
        touched = set(ev["src"]) | set(ev["dst"])
        assert touched & set(out["visited"])

    def test_explicit_seed_and_determinism(self, built):
        from graph_rag_agent_ray.pipelines.query import chain_of_exploration
        corpus, tables = built
        target = corpus.alias_groups.column("canonical_id")[0].as_py()
        a = chain_of_exploration(tables, "anything", start_entities=[target],
                                 max_hops=1, beam_width=3)
        b = chain_of_exploration(tables, "anything", start_entities=[target],
                                 max_hops=1, beam_width=3)
        assert a["visited"] == b["visited"]
        assert a["hops"] == b["hops"]


class TestYamlReader:
    def test_yaml_documents(self, ray_session, tmp_path):
        import yaml
        from graph_rag_agent_ray.sources.ingest import read_yaml_documents
        p1 = tmp_path / "a.yaml"
        p1.write_text(yaml.safe_dump([
            {"doc_id": "y1", "text": "first yaml doc"},
            {"doc_id": "y2", "text": "second yaml doc"},
        ]))
        p2 = tmp_path / "b.yaml"
        p2.write_text(yaml.safe_dump({"title": "no text field", "n": 3}))
        docs = read_yaml_documents([str(p1), str(p2)]).to_pandas()
        ids = set(docs["doc_id"])
        assert {"y1", "y2"} <= ids and len(docs) == 3
        # mapping without text field serialized back to yaml text
        other = docs[~docs["doc_id"].isin({"y1", "y2"})].iloc[0]
        assert "title" in other["spans"][0]["text"]


class TestLocalSearchPprExpand:
    def test_ppr_widens_entity_set_multi_hop(self, built):
        """ppr_expand must keep the vector seeds and add graph-proximate
        entities (multi-hop neighbours the pure vector seed can miss)."""
        corpus, tables = built
        target = corpus.alias_groups.column("canonical_id")[0].as_py()
        base = local_search(tables, target, k_entities=3)
        exp = local_search(tables, target, k_entities=3, ppr_expand=True)
        base_ids = set(base["entities"]["entity_id"])
        exp_ids = set(exp["entities"]["entity_id"])
        assert base_ids <= exp_ids          # seeds survive
        assert len(exp_ids) > len(base_ids)  # expansion added someone
        # determinism of the expanded path
        exp2 = local_search(tables, target, k_entities=3, ppr_expand=True)
        assert exp_ids == set(exp2["entities"]["entity_id"])


class TestGlobalSearchMapReduce:
    def test_mapreduce_shape_and_determinism(self, built):
        from graph_rag_agent_ray.pipelines.query import (
            global_search_mapreduce)
        from graph_rag_agent_ray.stages.llm import GlobalPointsClient
        corpus, tables = built
        n_comm = len(tables["communities"].to_pandas().query("level == 0"))
        out = global_search_mapreduce(
            tables, "什么是社区?", client_factory=GlobalPointsClient)
        assert len(out["intermediate"]) == n_comm
        assert out["answer"] == f"FINAL({n_comm})"
        out2 = global_search_mapreduce(
            tables, "什么是社区?", client_factory=GlobalPointsClient)
        pd.testing.assert_frame_equal(out["intermediate"],
                                      out2["intermediate"])

    def test_retry_ladder_recovers(self, built):
        from graph_rag_agent_ray.pipelines.query import (
            global_search_mapreduce)
        from graph_rag_agent_ray.stages.llm import GlobalPointsClient
        corpus, tables = built
        out = global_search_mapreduce(
            tables, "query", concurrency=1,
            client_factory=lambda: GlobalPointsClient(fail_first=True))
        # the scripted first-call failure is retried, not surfaced
        assert (out["intermediate"]["points"].str.startswith("POINT-")).all()


class TestKeywordExtractor:
    def _mk(self, reply):
        from graph_rag_agent_ray.pipelines.query import KEYWORD_PROMPT, KeywordExtractor
        from graph_rag_agent_ray.stages.llm import ReplayClient, prompt_key
        key = prompt_key([{"role": "user",
                           "content": KEYWORD_PROMPT.format(query="acme corp merger details")}])
        return KeywordExtractor(ReplayClient({key: [reply]}), backoff_s=0.0)

    def test_clean_json(self):
        kw = self._mk('{"high_level": ["merger"], "low_level": ["acme"]}') \
            .extract("acme corp merger details")
        assert kw == {"high_level": ["merger"], "low_level": ["acme"]}

    def test_prose_wrapped_json(self):
        kw = self._mk('好的，结果如下：{"high_level": ["merger"], "low_level": ["acme"]} 完毕') \
            .extract("acme corp merger details")
        assert kw["low_level"] == ["acme"]

    def test_garbage_falls_back_to_tokens(self):
        kw = self._mk("no json here at all").extract("acme corp merger details")
        assert "acme" in kw["low_level"]          # 3-5 char token
        assert "details" in kw["high_level"]      # >5 char token

    def test_api_failure_exhausts_to_token_fallback(self):
        # ReplayClient raises every attempt; call_with_retry returns "" →
        # the repair ladder lands on the token fallback
        from graph_rag_agent_ray.pipelines.query import KEYWORD_PROMPT, KeywordExtractor
        from graph_rag_agent_ray.stages.llm import ReplayClient, prompt_key
        key = prompt_key([{"role": "user",
                           "content": KEYWORD_PROMPT.format(query="acme corp merger details")}])
        ex = KeywordExtractor(
            ReplayClient({key: [RuntimeError("boom")]}), backoff_s=0.0)
        kw = ex.extract("acme corp merger details")
        assert kw["low_level"] and kw["high_level"]

    def test_key_and_type_normalization(self):
        kw = self._mk('{"high_level": "merger"}').extract("acme corp merger details")
        assert kw["high_level"] == ["merger"]     # scalar → list
        assert kw["low_level"] == []              # missing key → []

    def test_no_client_uses_fallback(self):
        from graph_rag_agent_ray.pipelines.query import KeywordExtractor
        kw = KeywordExtractor().extract("the acme corp merger details")
        assert "the" not in kw["low_level"] + kw["high_level"]  # stopword


class TestHybridSearchKeywordSeam:
    def test_llm_keywords_drive_retrieval(self, built):
        """hybrid_search through the injectable extractor: the replayed LLM
        split names a real entity in low_level — retrieval must surface it."""
        from graph_rag_agent_ray.pipelines.query import (
            KEYWORD_PROMPT, KeywordExtractor, hybrid_search)
        from graph_rag_agent_ray.stages.llm import ReplayClient, prompt_key
        corpus, tables = built
        target = corpus.alias_groups.column("canonical_id")[0].as_py()
        query = f"tell me about {target}"
        key = prompt_key([{"role": "user",
                           "content": KEYWORD_PROMPT.format(query=query)}])
        ex = KeywordExtractor(ReplayClient(
            {key: ['{"high_level": ["overview"], "low_level": ["%s"]}' % target]}),
            backoff_s=0.0)
        out = hybrid_search(tables, query, keyword_extractor=ex)
        assert target in set(out["low_entities"]["entity_id"])


class TestDeepResearch:
    def test_think_search_reason_loop(self, built):
        """Scripted-client drive of the full loop: iteration 1 emits a tagged
        search query (+ a duplicate of it), the retrieval + info-extraction
        round-trips, iteration 2 declares answer-ready, and the final call
        produces the answer from the accumulated evidence."""
        from graph_rag_agent_ray.pipelines.query import (
            BEGIN_SEARCH_QUERY, BEGIN_SEARCH_RESULT, END_SEARCH_QUERY,
            deep_research)
        corpus, tables = built
        target = corpus.alias_groups.column("canonical_id")[0].as_py()

        class Scripted:
            def __init__(self):
                self.calls = []
                self.replies = [
                    f"我需要查找。{BEGIN_SEARCH_QUERY}{target}{END_SEARCH_QUERY}"
                    f"{BEGIN_SEARCH_QUERY}{target}{END_SEARCH_QUERY}",  # dup
                    f"从证据中：{target} 出现于语料。",   # info extraction
                    "已有足够的信息。**回答**",          # answer-ready turn
                    "最终答案：确认。",                   # final answer
                ]

            def complete(self, messages):
                self.calls.append(messages)
                return self.replies.pop(0)

        client = Scripted()
        out = deep_research(tables, f"tell me about {target}", client,
                            max_iterations=4)
        assert out["status"] == "answer_ready"
        assert out["queries"] == [target]          # dup deduplicated
        assert out["answer"] == "最终答案：确认。"
        assert out["retrieved"] and target in out["retrieved"][0]
        # the dedupe note was fed back into the history of the second turn
        third_turn_msgs = client.calls[2]
        assert any(BEGIN_SEARCH_RESULT in m["content"] and "已搜索过该查询"
                   in m["content"] for m in third_turn_msgs)

    def test_no_query_stop_and_empty_client(self, built):
        from graph_rag_agent_ray.pipelines.query import deep_research
        _corpus, tables = built

        class NoQuery:
            def complete(self, messages):
                return "我直接推理，不需要搜索。"

        out = deep_research(tables, "anything", NoQuery(), max_iterations=3)
        assert out["status"] == "no_query"
        assert out["queries"] == []

        class Failing:
            def complete(self, messages):
                raise RuntimeError("api down")

        out2 = deep_research(tables, "anything", Failing(), max_iterations=2)
        assert out2["status"] == "empty"
        assert out2["answer"] == ""   # retry ladder exhausted -> sentinel


class TestQueryGenerator:
    def _gen(self, replies):
        from graph_rag_agent_ray.pipelines.query import QueryGenerator

        class Scripted:
            def __init__(self, rs):
                self.rs = list(rs)

            def complete(self, messages):
                return self.rs.pop(0)

        return QueryGenerator(Scripted(replies), backoff_s=0.0)

    def test_sub_queries_list_and_fallback(self):
        g = self._gen(['好的：["谁是A？", "A在哪里？"]'])
        assert g.generate_sub_queries("关于A") == ["谁是A？", "A在哪里？"]
        g2 = self._gen(["no list here"])
        assert g2.generate_sub_queries("关于A") == ["关于A"]

    def test_followups_need_two_snippets_and_dedupe(self):
        g = self._gen([])
        assert g.generate_followup_queries("q", ["only one"]) == []
        g2 = self._gen(['["x", "x", "y"]'])
        assert g2.generate_followup_queries("q", ["a", "b"]) == ["x", "y"]
        g3 = self._gen(["[]"])
        assert g3.generate_followup_queries("q", ["a", "b"]) == []

    def test_hypotheses_parsing_ladder(self):
        g = self._gen(["1. 角度一的假设 2. 角度二的假设"])
        assert g.generate_multiple_hypotheses("q") == ["角度一的假设", "角度二的假设"]
        g2 = self._gen(["- 第一种思路继续 - 第二种思路继续"])
        assert g2.generate_multiple_hypotheses("q") == ["第一种思路继续", "第二种思路继续"]
        g3 = self._gen(["以下是假设\n这一行足够长可以当作假设内容\n短行"])
        assert g3.generate_multiple_hypotheses("q") == ["这一行足够长可以当作假设内容"]

    def test_malicious_list_is_not_evaled(self):
        # the reference uses eval(); ours must not execute expressions
        g = self._gen(['["ok", __import__("os").getpid()]'])
        assert g.generate_sub_queries("q") == ["q"]


class TestKeywordExtractorNonString:
    def test_non_string_list_elements_degrade(self, built):
        """An LLM reply with non-string list elements (e.g. a bare year)
        must degrade gracefully through hybrid_search, not crash."""
        from graph_rag_agent_ray.pipelines.query import (
            KEYWORD_PROMPT, KeywordExtractor, hybrid_search)
        from graph_rag_agent_ray.stages.llm import ReplayClient, prompt_key
        _corpus, tables = built
        query = "growth in 2023"
        key = prompt_key([{"role": "user",
                           "content": KEYWORD_PROMPT.format(query=query)}])
        ex = KeywordExtractor(ReplayClient(
            {key: ['{"low_level": ["growth", 2023], "high_level": []}']}),
            backoff_s=0.0)
        out = hybrid_search(tables, query, keyword_extractor=ex)
        assert "low_entities" in out  # no TypeError


class TestQueryGeneratorRobustness:
    def _gen(self, reply):
        from graph_rag_agent_ray.pipelines.query import QueryGenerator

        class One:
            def complete(self, messages):
                return reply

        return QueryGenerator(One(), backoff_s=0.0)

    def test_inline_decimal_does_not_split_hypotheses(self):
        g = self._gen("1. 增长3.5倍的假设 2. 另一个角度的假设")
        assert g.generate_multiple_hypotheses("q") == \
            ["增长3.5倍的假设", "另一个角度的假设"]

    def test_hyphenated_terms_do_not_split_dashes(self):
        g = self._gen("- state-of-the-art approach works - second idea here")
        assert g.generate_multiple_hypotheses("q") == \
            ["state-of-the-art approach works", "second idea here"]

    def test_trailing_bracket_text_still_parses(self):
        g = self._gen('["子问题1", "子问题2"] 注：[仅供参考]')
        assert g.generate_sub_queries("q") == ["子问题1", "子问题2"]

    def test_mismatched_answer_lists_raise(self):
        import pytest as _pytest
        from graph_rag_agent_ray.evaluate import evaluate_answers
        with _pytest.raises(ValueError):
            evaluate_answers(["a"], ["a", "b"])
