"""Deep-research reasoning auxiliaries: evidence ledger, query-local KG
builder, answer validator (reference search/tool/reasoning/* parity)."""

import pandas as pd
import pytest
import ray.data as rd

from graph_rag_agent_ray.pipelines.reasoning import (
    AnswerValidator, EvidenceChainTracker, QueryKGBuilder, complexity_estimate)


class TestEvidenceChainTracker:
    def test_ledger_records_steps_and_evidence(self):
        t = EvidenceChainTracker()
        qid = t.start_new_query("why did revenue fall",
                                {"low_level": ["revenue"], "high_level": []})
        s1 = t.add_reasoning_step(qid, "revenue 2023", "first I check 2023")
        e1 = t.add_evidence_with_confidence(
            s1, "chunk-a", "revenue was 42 million dollars this year",
            "chunk", confidence=0.9, metadata={"doc_id": "d1"})
        s2 = t.add_reasoning_step(qid, "costs 2023", "then costs")
        t.add_evidence_with_confidence(
            s2, "chunk-b", "costs rose sharply", "chunk", confidence=0.4)

        chain = t.get_reasoning_chain(qid)
        assert [s["step_id"] for s in chain["steps"]] == [s1, s2]
        assert chain["steps"][0]["evidence"][0]["evidence_id"] == e1
        assert chain["steps"][0]["evidence"][0]["confidence"] == 0.9
        assert chain["steps"][0]["evidence"][0]["metadata"] == {"doc_id": "d1"}
        assert t.get_step_evidence(s1)[0]["source_id"] == "chunk-a"

        summary = t.summarize_reasoning(qid)
        assert summary["steps_count"] == 2
        assert summary["evidence_count"] == 2
        assert summary["key_steps"][0]["evidence_count"] == 1
        stats = t.get_evidence_source_stats(qid)
        assert stats == {"sources": {"chunk": 2}, "total": 2}

    def test_deterministic_replay(self):
        def run():
            t = EvidenceChainTracker()
            qid = t.start_new_query("q", {})
            s = t.add_reasoning_step(qid, "sq", "r")
            t.add_evidence_with_confidence(s, "src", "content 42", "chunk")
            return qid, t.get_reasoning_chain(qid)
        a, b = run(), run()
        assert a == b  # no wall-clock in ids or ordering

    def test_numerical_contradiction(self):
        t = EvidenceChainTracker()
        qid = t.start_new_query("revenue", {})
        s = t.add_reasoning_step(qid, "revenue", "check")
        e1 = t.add_evidence_with_confidence(
            s, "a", "annual company revenue totalled 42 million dollars", "chunk")
        e2 = t.add_evidence_with_confidence(
            s, "b", "annual company revenue totalled 57 million dollars", "chunk")
        found = t.detect_contradictions([e1, e2])
        assert len(found) >= 1
        assert found[0]["type"] == "numerical"
        assert {found[0]["value1"], found[0]["value2"]} == {42.0, 57.0}
        assert t.get_reasoning_chain(qid)["contradiction_count"] >= 1
        # agreeing numbers do NOT contradict
        t2 = EvidenceChainTracker()
        q2 = t2.start_new_query("x", {})
        s2 = t2.add_reasoning_step(q2, "x", "r")
        f1 = t2.add_evidence_with_confidence(
            s2, "a", "annual company revenue totalled 42 million dollars", "chunk")
        f2 = t2.add_evidence_with_confidence(
            s2, "b", "annual company revenue totalled 42 million dollars", "doc")
        assert t2.detect_contradictions([f1, f2]) == []

    def test_semantic_contradiction_via_injected_client(self):
        class Scripted:
            def complete(self, messages):
                return "矛盾点：内容1说盈利，内容2说亏损。"

        t = EvidenceChainTracker(client=Scripted())
        qid = t.start_new_query("q", {})
        s = t.add_reasoning_step(qid, "q", "r")
        e1 = t.add_evidence_with_confidence(s, "a", "公司盈利", "chunk")
        e2 = t.add_evidence_with_confidence(s, "b", "公司亏损", "chunk")
        found = t.detect_contradictions([e1, e2])
        assert found and found[0]["type"] == "semantic"
        assert "矛盾点" in found[0]["analysis"]

    def test_citations(self):
        t = EvidenceChainTracker()
        qid = t.start_new_query("when", {})
        s = t.add_reasoning_step(qid, "when", "r")
        t.add_evidence_with_confidence(
            s, "chunk-7", "the partnership was founded in 1998", "chunk",
            confidence=0.8)
        out = t.generate_citations(
            "The partnership began in 1998 as documented. Unrelated filler.")
        assert len(out["citations"]) == 1
        assert out["citations"][0]["source_id"] == "chunk-7"
        assert "[1]" in out["cited_answer"]
        assert "#### 引用" in out["cited_answer"]
        # no matching evidence -> untouched answer
        empty = EvidenceChainTracker().generate_citations("nothing matches")
        assert empty == {"cited_answer": "nothing matches", "citations": []}


class TestQueryKGBuilder:
    @pytest.fixture(scope="class")
    def edges(self, ray_session):
        return rd.from_pandas(pd.DataFrame({
            "src": ["a", "a", "b", "c", "x"],
            "pred": ["p1", "p2", "p3", "p4", "p5"],
            "dst": ["b", "c", "d", "d", "y"],
            "weight": [1, 1, 1, 1, 1],
        }))

    def test_depth_bounded_expansion(self, edges):
        b = QueryKGBuilder(edges).build_query_graph("q", ["a"], depth=1)
        assert set(b.nodes) == {"a", "b", "c"}
        assert b.meta == {"query": "q", "entity_count": 3,
                          "relation_count": 2}
        b2 = QueryKGBuilder(edges).build_query_graph("q", ["a"], depth=2)
        assert set(b2.nodes) == {"a", "b", "c", "d"}   # x→y unreachable
        assert b2.nodes["a"]["type"] == "seed_entity"
        assert b2.nodes["d"]["type"] == "entity"
        assert {(e["src"], e["dst"]) for e in b2.edges} == {
            ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")}

    def test_empty_seeds_and_central_entities(self, edges):
        b = QueryKGBuilder(edges).build_query_graph("q", [], depth=2)
        assert b.meta["entity_count"] == 0
        assert b.get_central_entities() == []
        b2 = QueryKGBuilder(edges).build_query_graph("q", ["a"], depth=2)
        central = b2.get_central_entities(limit=2)
        assert len(central) == 2
        # d receives rank from both b and c -> most central non-trivially
        assert central[0]["id"] == "d"
        assert central[0]["centrality"] > central[1]["centrality"]

    def test_deterministic(self, edges):
        a = QueryKGBuilder(edges).build_query_graph("q", ["a"], depth=2)
        b = QueryKGBuilder(edges).build_query_graph("q", ["a"], depth=2)
        assert a.edges == b.edges and a.nodes == b.nodes


class TestAnswerValidator:
    def test_rule_checks(self):
        v = AnswerValidator()
        long_ok = "这是一个足够长的答案，" * 10
        assert v.validate("q", long_ok)["passed"]
        assert not v.validate("q", "太短")["length"]
        bad = "抱歉，处理您的问题时遇到了错误" + "x" * 60
        r = v.validate("q", bad)
        assert not r["no_error_patterns"] and not r["passed"]

    def test_keyword_relevance(self):
        def kw(_q):
            return {"high_level": ["经济"], "low_level": ["出口", "进口", "关税"]}
        v = AnswerValidator(keyword_extractor=kw)
        good = "经济方面，出口与进口均增长，关税下降。" + "x" * 30
        assert v.validate("q", good)["keyword_relevance"]
        no_high = "出口与进口均增长。" + "x" * 40
        assert not v.validate("q", no_high)["keyword_relevance"]
        few_low = "经济方面略有变化，其中出口增长。" + "x" * 40
        assert not v.validate("q", few_low)["keyword_relevance"]

    def test_complexity_estimate(self):
        assert complexity_estimate(None) == 0.0
        assert complexity_estimate("   ") == 0.0
        simple = complexity_estimate("天气")
        hard = complexity_estimate("为什么经济增长放缓？如何评估其影响？"
                                   "比较不同假设下的机制与原因？")
        assert 0.0 <= simple < hard <= 1.0


class TestDeepResearchEvidence:
    """Integration: the loop threads the ledger + local KG through a
    scripted client over a real built KG."""

    def test_loop_returns_ledger_and_local_kg(self, ray_session, tmp_path):
        from graph_rag_agent_ray import build_kg
        from graph_rag_agent_ray.pipelines.query import (
            BEGIN_SEARCH_QUERY, END_SEARCH_QUERY, deep_research)
        from graph_rag_agent_ray.synth import generate

        corpus = generate(n_docs=30, seed=42)
        tables = build_kg(rd.from_arrow(corpus.documents),
                          str(tmp_path / "kg"), input_token="ev30")
        target = corpus.alias_groups.column("canonical_id")[0].as_py()

        class Scripted:
            def __init__(self):
                self.replies = [
                    f"查找。{BEGIN_SEARCH_QUERY}{target}{END_SEARCH_QUERY}",
                    f"证据显示 {target} 存在。",       # info extraction
                    "已有足够的信息。**回答**",
                    f"最终答案：{target}。",
                ]

            def complete(self, messages):
                return self.replies.pop(0)

        out = deep_research(tables, f"tell me about {target}", Scripted(),
                            max_iterations=4)
        ev = out["evidence"]
        chain = ev["chain"]
        assert len(chain["steps"]) == 1
        assert chain["steps"][0]["search_query"] == target
        assert len(chain["steps"][0]["evidence"]) > 0
        assert all(e["source_type"] == "chunk"
                   for e in chain["steps"][0]["evidence"])
        assert ev["summary"]["steps_count"] == 1
        assert ev["source_stats"]["sources"]["chunk"] >= 1
        assert "cited_answer" in ev["citations"]
        kg = out["local_kg"]
        assert kg is not None and kg["entity_count"] > 0
        assert kg["relation_count"] >= 0
        assert isinstance(kg["central_entities"], list)


class TestCommunityEnhancer:
    @pytest.fixture(scope="class")
    def built(self, ray_session, tmp_path_factory):
        from graph_rag_agent_ray import build_kg
        from graph_rag_agent_ray.synth import generate
        corpus = generate(n_docs=30, seed=42)
        tables = build_kg(rd.from_arrow(corpus.documents),
                          str(tmp_path_factory.mktemp("kg_ce")),
                          input_token="ce30")
        return corpus, tables

    def test_find_and_extract(self, built):
        from graph_rag_agent_ray.pipelines.reasoning import (
            CommunityAwareSearchEnhancer)
        corpus, tables = built
        target = corpus.alias_groups.column("canonical_id")[0].as_py()
        enh = CommunityAwareSearchEnhancer(tables)
        comms = enh.find_relevant_communities(
            target, {"high_level": [target], "low_level": []})
        assert 0 < len(comms) <= 3
        assert all(set(c) >= {"community_id", "score", "summary", "members"}
                   for c in comms)
        # keyword bonus: the community containing the target should surface
        assert any(target in c["summary"] or target in c["members"]
                   for c in comms)
        know = enh.extract_community_knowledge(comms)
        assert 0 < len(know["entities"]) <= 50
        assert all(e["mention_count"] >= 0 for e in know["entities"])
        # relationships have both endpoints inside the core entity set
        core = {e["entity_id"] for e in know["entities"]}
        assert all(r["src"] in core and r["dst"] in core
                   for r in know["relationships"])
        assert len(know["relationships"]) <= 100
        assert know["summaries"] == [c["summary"] for c in comms]

    def test_enhance_search_caches_and_strategies(self, built):
        from graph_rag_agent_ray.pipelines.reasoning import (
            CommunityAwareSearchEnhancer)
        corpus, tables = built
        target = corpus.alias_groups.column("canonical_id")[1].as_py()
        enh = CommunityAwareSearchEnhancer(tables)
        ctx = enh.enhance_search(target, {"high_level": [], "low_level": []})
        assert ctx["search_strategy"]["strategy_type"] in ("basic", "fallback")
        assert enh.enhance_search(
            target, {"high_level": [], "low_level": []}) is ctx  # cached

        class Scripted:
            def complete(self, messages):
                return ('可以 "follow up one" 和 "follow up two"\n'
                        '关注实体：ALPHA CORP\n')

        enh2 = CommunityAwareSearchEnhancer(tables, client=Scripted())
        ctx2 = enh2.enhance_search(target, {"high_level": [], "low_level": []})
        strat = ctx2["search_strategy"]
        if len(ctx2["community_info"]["entities"]) >= 3:
            assert strat["strategy_type"] == "extracted"
            assert strat["follow_up_queries"] == ["follow up one",
                                                  "follow up two"]
            assert strat["focus_entities"][0] == "ALPHA CORP"

    def test_empty_communities(self, ray_session):
        import pandas as pd

        from graph_rag_agent_ray.pipelines.reasoning import (
            CommunityAwareSearchEnhancer)
        empty = rd.from_pandas(pd.DataFrame({
            "community_id": pd.Series(dtype="object"),
            "level": pd.Series(dtype="int64"),
            "members": pd.Series(dtype="object"),
            "summary": pd.Series(dtype="object"),
            "full_content": pd.Series(dtype="object"),
            "rank": pd.Series(dtype="int64")}))
        enh = CommunityAwareSearchEnhancer({"communities": empty})
        ctx = enh.enhance_search("q", {})
        assert ctx["community_info"] == {"entities": [], "relationships": [],
                                         "summaries": []}
        assert ctx["search_strategy"]["strategy_type"] == "basic"
        assert enh.extract_community_knowledge([]) == {
            "entities": [], "relationships": [], "summaries": []}
