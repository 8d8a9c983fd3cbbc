"""Unit tests for pure functions: tokenizer, records contract, hashing,
union-find, embeddings. No Ray needed."""

import numpy as np
import pytest

from graph_rag_agent_ray.functions.embed import cosine_topk, embed_texts, lsh_bucket
from graph_rag_agent_ray.functions.hashing import sha1_hex, stable_bucket
from graph_rag_agent_ray.functions.records import (
    UNKNOWN_DESC,
    UNKNOWN_TYPE,
    format_entity,
    format_relationship,
    parse_records,
)
from graph_rag_agent_ray.functions.text import (
    edit_distance,
    find_next_sentence_end,
    normalize_surface,
    tokenize,
    tokenize_with_offsets,
)
from graph_rag_agent_ray.functions.unionfind import UnionFind


class TestTokenizer:
    def test_offsets_recover_substring(self):
        text = "Hello world。中文测试 ends here."
        for tok, lo, hi in tokenize_with_offsets(text):
            assert text[lo:hi] == tok

    def test_cjk_one_char_per_token(self):
        assert tokenize("中文") == ["中", "文"]

    def test_sentence_end_search(self):
        toks = ["a", "b", "。", "c", "d"]
        assert find_next_sentence_end(toks, 0) == 3
        assert find_next_sentence_end(toks, 3) == 5  # no ender → len

    def test_deterministic(self):
        t = "Mixed 中文 and English, with punct!"
        assert tokenize(t) == tokenize(t)


class TestNormalize:
    def test_folds_case_space_width(self):
        assert normalize_surface("  sony  inc ") == "SONY INC"
        assert normalize_surface("Ｓｏｎｙ") == "SONY"  # full-width NFKC fold

    def test_edit_distance(self):
        assert edit_distance("sony", "sony") == 0
        assert edit_distance("sony", "sonyx") == 1
        assert edit_distance("abc", "xyz") == 3
        assert edit_distance("short", "muchlongerstring", limit=3) == 4  # band exit


class TestRecordsContract:
    """The exact regex contract of graph_writer.py:48-49 round-trips."""

    def test_roundtrip(self):
        raw = "\n".join([
            format_entity("SONY", "organization", "Sony is a company."),
            format_entity("TOKYO", "location", "Capital of Japan."),
            format_relationship("SONY", "TOKYO", "located_in", "HQ in Tokyo", 8),
        ])
        parsed = parse_records(raw)
        assert ("SONY", "organization", "Sony is a company.") in parsed.entities
        assert parsed.relationships == [("SONY", "TOKYO", "located_in", "HQ in Tokyo", 8.0)]

    def test_missing_endpoint_synthesized(self):
        # graph_writer.py:76-98: endpoints without entity records become 未知
        raw = format_relationship("A", "B", "uses", "a uses b", 5)
        parsed = parse_records(raw)
        types = {name: etype for name, etype, _ in parsed.entities}
        assert types == {"A": UNKNOWN_TYPE, "B": UNKNOWN_TYPE}
        descs = {name: d for name, _, d in parsed.entities}
        assert descs["A"] == UNKNOWN_DESC

    def test_malformed_record_dropped(self):
        raw = '("entity" : "NO_CLOSE" : "type"\n' + format_entity("OK", "t", "d")
        parsed = parse_records(raw)
        assert [e[0] for e in parsed.entities] == ["OK"]

    def test_bad_weight_empties_chunk(self):
        # float() failure inside the try block drops the whole chunk
        # (graph_writer.py:111-121) — "x" is unparseable as float
        raw = '("relationship" : "A" : "B" : "r" : "d" : x)'
        parsed = parse_records(raw)
        assert parsed.entities == [] and parsed.relationships == []
        assert parsed.error

    def test_duplicate_entity_first_wins(self):
        raw = "\n".join([
            format_entity("A", "t1", "first"),
            format_entity("A", "t2", "second"),
        ])
        parsed = parse_records(raw)
        assert parsed.entities == [("A", "t1", "first")]


class TestHashing:
    def test_sha1_stable(self):
        assert sha1_hex("abc") == "a9993e364706816aba3e25717850c26c9cd0d89d"

    def test_stable_bucket_deterministic(self):
        a = stable_bucket(["x", "y", "z"], 16)
        b = stable_bucket(["x", "y", "z"], 16)
        assert (a == b).all() and (a < 16).all()


class TestUnionFind:
    def test_components_and_canonical(self):
        uf = UnionFind()
        uf.union("B", "A")
        uf.union("C", "B")
        uf.union("X", "Y")
        groups = uf.groups()
        assert sorted(map(sorted, groups.values())) == [["A", "B", "C"], ["X", "Y"]]
        alias = uf.alias_map()
        assert alias["C"] == "A" and alias["Y"] == "X"

    def test_order_independent(self):
        pairs = [("A", "B"), ("C", "D"), ("B", "C")]
        maps = []
        for order in (pairs, pairs[::-1]):
            uf = UnionFind()
            for a, b in order:
                uf.union(a, b)
            maps.append(uf.alias_map())
        assert maps[0] == maps[1]


class TestEmbeddings:
    def test_deterministic_and_normalized(self):
        v1 = embed_texts(["Sony Inc", "Tokyo"], dim=64)
        v2 = embed_texts(["Sony Inc", "Tokyo"], dim=64)
        assert np.allclose(v1, v2)
        assert np.allclose(np.linalg.norm(v1, axis=1), 1.0, atol=1e-5)

    def test_variants_are_close_distinct_are_far(self):
        v = embed_texts(["VELKOR ZANTHE", "VELKOR ZANTHE INC", "QUIMBEX DALSOL"], dim=64)
        sim_variant = float(v[0] @ v[1])
        sim_distinct = float(v[0] @ v[2])
        assert sim_variant > 0.8
        assert sim_distinct < sim_variant

    def test_lsh_same_vector_same_bucket(self):
        v = embed_texts(["alpha", "alpha"], dim=64)
        b = lsh_bucket(v, 8, seed=1)
        assert b[0] == b[1]

    def test_cosine_topk_cutoff(self):
        v = embed_texts(["aaa bbb", "aaa bbb ccc", "zzz qqq"], dim=64)
        nbrs = cosine_topk(v, k=5, cutoff=0.99)
        assert all(score >= 0.99 for row in nbrs for _, score in row)


class TestDistributedComponents:
    def test_matches_union_find(self):
        import ray.data as rd
        import pandas as pd
        from graph_rag_agent_ray.functions.components import connected_components
        from graph_rag_agent_ray.functions.unionfind import UnionFind

        pairs = [("B", "A"), ("C", "B"), ("X", "Y"), ("M", "N"), ("N", "O"),
                 ("Q", "Q2"), ("A", "D")]
        uf = UnionFind()
        for a, b in pairs:
            uf.union(a, b)
        expect = uf.alias_map()

        ds = rd.from_pandas(pd.DataFrame(pairs, columns=["a", "b"]))
        got = connected_components(ds).to_pandas()
        got_map = dict(zip(got["node"], got["component"]))
        assert got_map == {**{n: n for n in got_map}, **expect} or all(
            got_map[n] == expect.get(n, n) for n in got_map
        )

    def test_chain_converges(self):
        import ray.data as rd
        import pandas as pd
        from graph_rag_agent_ray.functions.components import connected_components
        # a long chain needs several propagation rounds
        chain = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(12)]
        ds = rd.from_pandas(pd.DataFrame(chain, columns=["a", "b"]))
        got = connected_components(ds).to_pandas()
        assert set(got["component"]) == {"n00"}


class TestHashJoin:
    def test_inner_join_matches_pandas(self):
        import pandas as pd
        import ray.data as rd
        from graph_rag_agent_ray.functions.shuffle import hash_join

        l = pd.DataFrame({"k": ["a", "b", "c", "a"], "x": [1, 2, 3, 4]})
        r = pd.DataFrame({"k": ["a", "b", "d"], "y": [10, 20, 40]})
        got = hash_join(rd.from_pandas(l), rd.from_pandas(r), on=["k"]).to_pandas()
        want = l.merge(r, on="k")
        key = ["k", "x", "y"]
        assert sorted(map(tuple, got[key].to_numpy().tolist())) == \
            sorted(map(tuple, want[key].to_numpy().tolist()))

    def test_left_join_keeps_unmatched(self):
        import pandas as pd
        import ray.data as rd
        from graph_rag_agent_ray.functions.shuffle import hash_join

        l = pd.DataFrame({"k": ["a", "z"], "x": [1, 9]})
        r = pd.DataFrame({"k": ["a"], "y": [10]})
        got = hash_join(rd.from_pandas(l), rd.from_pandas(r), on=["k"],
                        how="left").to_pandas()
        assert len(got) == 2
        z = got[got["k"] == "z"]
        assert len(z) == 1 and pd.isna(z["y"].iloc[0])


class TestAutoBlockingBits:
    def test_corpus_size_rule(self):
        from graph_rag_agent_ray.config import KGConfig
        from graph_rag_agent_ray.stages.canonicalize import auto_blocking_bits
        cfg = KGConfig()
        assert auto_blocking_bits(0, cfg) == cfg.lsh_bits
        assert auto_blocking_bits(1000, cfg) == cfg.lsh_bits   # small: default
        assert auto_blocking_bits(64 * 2**8, cfg) == cfg.lsh_bits
        assert auto_blocking_bits(64 * 2**8 + 1, cfg) == 9     # first step
        assert auto_blocking_bits(10**6, cfg) == 14            # ceil(log2(n/64))
        assert auto_blocking_bits(10**12, cfg) == 16           # clamp
        ns = [auto_blocking_bits(n, cfg) for n in (10**4, 10**5, 10**6)]
        assert ns == sorted(ns)


class TestLocalBlockingParity:
    def test_local_equals_distributed_pair_set(self, ray_session):
        """candidate_pairs_pdf below the driver guard must produce the SAME
        judged pair set as the distributed shuffle path — crossing
        MAX_DRIVER_BLOCKING_SURFACES must never change merge decisions."""
        import ray.data as rd
        from graph_rag_agent_ray.config import KGConfig
        from graph_rag_agent_ray.stages import canonicalize as C
        from graph_rag_agent_ray.synth import generate
        from graph_rag_agent_ray.stages.chunker import chunk_documents
        from graph_rag_agent_ray.stages.extract import extract_chunks
        from graph_rag_agent_ray.stages.parse import parse_mentions

        cfg = KGConfig()
        corpus = generate(n_docs=40, seed=3)
        mentions = parse_mentions(
            extract_chunks(chunk_documents(
                rd.from_arrow(corpus.documents), cfg), cfg), cfg)
        embedded = C.embed_entities(
            C.aggregate_exact(mentions, cfg), cfg).materialize()
        n = embedded.count()
        assert 0 < n <= C.MAX_DRIVER_BLOCKING_SURFACES

        local = C.candidate_pairs_pdf(embedded, cfg, keep_block_key=True)
        dist = C.candidate_pairs(embedded, cfg, keep_block_key=True).to_pandas()
        key = lambda df: set(zip(df["block_key"], df["a"], df["b"],
                                 df["n_a"], df["n_b"]))
        assert key(local) == key(dist)
        assert len(local) > 0


class TestGraphQualityMetrics:
    def test_entity_coverage_detects_drop_and_mistype(self):
        import pandas as pd
        from graph_rag_agent_ray.evaluate import entity_coverage_stats
        truth = pd.DataFrame({"entity_id": ["A", "B", "C"],
                              "entity_type": ["ORG", "ORG", "PER"]})
        built = pd.DataFrame({"entity_id": ["A", "B", "X"],
                              "entity_type": ["ORG", "PER", "ORG"]})  # B mistyped, C dropped, X spurious
        out = entity_coverage_stats(built, truth).set_index("entity_type")
        assert out.loc["ORG", "n_truth"] == 2
        assert out.loc["ORG", "n_built"] == 2     # A + spurious X
        assert out.loc["ORG", "n_matched"] == 1   # only A
        assert out.loc["PER", "n_matched"] == 0   # C dropped; B mistyped as PER

    def test_subgraph_quality_density_inputs(self):
        import pandas as pd
        from graph_rag_agent_ray.evaluate import subgraph_quality_stats
        m = pd.DataFrame({"entity_id": ["a", "b", "c", "x", "y"],
                          "community_number": [0, 0, 0, 1, 1]})
        e = pd.DataFrame({"src": ["a", "b", "a", "x"],
                          "pred": ["p", "p", "q", "p"],
                          "dst": ["b", "c", "x", "y"]})
        out = subgraph_quality_stats(m, e).set_index("community_number")
        assert out.loc[0, "n_members"] == 3
        assert out.loc[0, "n_intra_edges"] == 2   # a-b, b-c; a-x crosses
        assert out.loc[0, "n_possible_pairs"] == 3
        assert out.loc[1, "n_intra_edges"] == 1

    def test_relationship_coverage_prf(self):
        import pandas as pd
        from graph_rag_agent_ray.evaluate import relationship_coverage
        truth = pd.DataFrame({"src": ["a", "b"], "pred": ["p", "p"],
                              "dst": ["b", "c"]})
        built = pd.DataFrame({"src": ["a", "z"], "pred": ["p", "p"],
                              "dst": ["b", "w"]})
        prf = relationship_coverage(built, truth)
        assert prf.tp == 1 and prf.precision == 0.5 and prf.recall == 0.5


class TestAnswerMetrics:
    def test_normalize_answer(self):
        from graph_rag_agent_ray.evaluate import normalize_answer
        assert normalize_answer("The  Answer, is: 42!") == "answer is 42"
        assert normalize_answer("这个结果，是：四十二。") == "结果 是四十二" \
            or "四十二" in normalize_answer("这个结果，是：四十二。")

    def test_exact_match(self):
        from graph_rag_agent_ray.evaluate import exact_match
        assert exact_match("The answer is 42.", "answer is 42") == 1.0
        assert exact_match("### Heading\n\nanswer is 42", "Answer, is 42!") == 1.0
        assert exact_match("answer is 43", "answer is 42") == 0.0
        assert exact_match("", "answer") == 0.0

    def test_answer_f1(self):
        from graph_rag_agent_ray.evaluate import answer_f1
        assert answer_f1("alpha beta gamma", "alpha beta gamma") == 1.0
        assert answer_f1("", "") == 1.0
        assert answer_f1("alpha beta", "") == 0.0
        # half overlap: pred {alpha,beta}, golden {alpha,delta}
        score = answer_f1("alpha beta", "alpha delta")
        assert abs(score - 0.5) < 1e-9
        # duplicates penalize precision (reference divides by list length)
        assert answer_f1("alpha alpha beta", "alpha beta") < 1.0

    def test_metric_registry_and_composite(self):
        from graph_rag_agent_ray.evaluate import METRICS, evaluate_answers, register_metric
        assert {"em", "f1"} <= set(METRICS)
        out = evaluate_answers(["answer is 42", "wrong entirely"],
                               ["Answer, is 42!", "totally different words"])
        assert out["em"]["scores"] == [1.0, 0.0]
        assert out["em"]["mean"] == 0.5
        assert out["f1"]["scores"][0] == 1.0

        @register_metric("len_ratio")
        def _lr(p, g):
            return min(len(p), len(g)) / max(len(p), len(g), 1)
        out2 = evaluate_answers(["ab"], ["abcd"], metrics=("len_ratio",))
        assert out2["len_ratio"]["scores"] == [0.5]


class TestRetrievalMetrics:
    """Reference retrieval_metrics.py rule paths — deterministic branches
    only (the LLM fallbacks are env-blocked seams)."""

    def test_match_counts(self):
        from graph_rag_agent_ray.evaluate import retrieval_match_counts
        # direct: substring containment, case-insensitive
        d, n = retrieval_match_counts(["Alpha Corp", "beta"], ["alpha corp"])
        assert (d, n) == (1, 0)
        # digit-run: "12" from ref "node12" found inside retrieved "e12x"
        d, n = retrieval_match_counts(["e12x"], ["node12"])
        assert (d, n) == (0, 1)
        assert retrieval_match_counts([], ["x"]) == (0, 0)

    def test_precision_scoring(self):
        from graph_rag_agent_ray.evaluate import retrieval_precision
        assert retrieval_precision([], ["x"]) == 0.3          # empty side
        assert retrieval_precision(["a"], ["zzz"]) == 0.3     # no match
        # full match -> 0.3 + 0.7 * 1.0
        assert abs(retrieval_precision(["aa", "bb"], ["aa", "bb"]) - 1.0) < 1e-9
        # half match -> 0.3 + 0.7 * 0.5
        assert abs(retrieval_precision(["aa"], ["aa", "qq"]) - 0.65) < 1e-9

    def test_utilization_partial_token_branch(self):
        from graph_rag_agent_ray.evaluate import retrieval_utilization
        # no id match, but a >3-char token of the ref appears in retrieved
        assert retrieval_utilization(["the boardwalk report"],
                                     ["boardwalk committee"]) == 0.4
        assert retrieval_utilization(["xyz"], ["ab cd"]) == 0.3
        assert abs(retrieval_utilization(["aa"], ["aa"]) - 1.0) < 1e-9

    def test_latency_and_chunk_utilization(self):
        from graph_rag_agent_ray.evaluate import (chunk_utilization,
                                                  retrieval_latency)
        assert retrieval_latency([1.0, 3.0]) == 2.0
        assert retrieval_latency([]) == 0.0
        assert chunk_utilization("any answer", []) == 0.3    # no chunks
        # one chunk, phrases {quick brown foxes, jumped}-ish: half present
        score = chunk_utilization(
            "the answer mentions sunflower fields only",
            ["sunflower fields beside mountain ranges"])
        assert 0.0 < score < 1.0
        full = chunk_utilization("sunflower fields beside mountain ranges",
                                 ["sunflower fields beside mountain ranges"])
        assert full == 1.0

    def test_registry_and_composite(self):
        from graph_rag_agent_ray.evaluate import METRICS, evaluate_retrieval
        assert {"em", "f1", "retrieval_precision", "retrieval_utilization",
                "retrieval_latency", "chunk_utilization"} <= set(METRICS)
        out = evaluate_retrieval([
            {"retrieved_entities": ["aa"], "referenced_entities": ["aa"],
             "retrieval_time": 0.5, "system_answer": "uses sunflower fields",
             "chunk_texts": ["sunflower fields"]},
            {"retrieved_entities": [], "referenced_entities": ["x"],
             "retrieval_time": 1.5, "system_answer": "", "chunk_texts": []},
        ])
        assert out["retrieval_precision"]["scores"][0] == 1.0
        assert out["retrieval_precision"]["scores"][1] == 0.3
        assert out["retrieval_latency"]["mean"] == 1.0
        assert out["chunk_utilization"]["scores"][1] == 0.3


class TestDeepSearchMetrics:
    """deep_search_metrics.py deterministic rule paths (the reference takes
    max(rule, llm) — the rule is each metric's floor)."""

    THINKING = ("分析问题。\n\n> 1. first query\n> 2. second query\n"
                "> 3. third query\n> 4. fourth query\n\n中段推理。\n\n"
                "**Final Information** found the fact\n\n结论。")

    def test_reasoning_coherence(self):
        from graph_rag_agent_ray.evaluate import reasoning_coherence
        # no thinking -> 0.6 default
        assert reasoning_coherence("plain answer") == 0.6
        # queries (capped at 3) + >3 paragraphs -> 0.6 + 0.3 + 0.1
        full = reasoning_coherence(f"<think>{self.THINKING}</think>答案")
        assert abs(full - 1.0) < 1e-9
        # explicit thinking_process wins over the tag
        assert reasoning_coherence("x", thinking_process="短。") == 0.6

    def test_reasoning_depth(self):
        from graph_rag_agent_ray.evaluate import reasoning_depth
        assert reasoning_depth("no thinking") == 0.6
        d = reasoning_depth("x", thinking_process=self.THINKING)
        # 0.6 + min(.2, .05*4) + min(.1, .02*5 paragraphs) + min(.1, .05*1)
        assert abs(d - (0.6 + 0.2 + 0.1 + 0.05)) < 1e-9

    def test_iterative_improvement(self):
        from graph_rag_agent_ray.evaluate import iterative_improvement
        assert iterative_improvement("no thinking") == 0.5
        assert abs(iterative_improvement(
            "x", thinking_process=self.THINKING) - 0.8) < 1e-9  # 0.5+0.3cap

    def test_kg_utilization(self):
        from graph_rag_agent_ray.evaluate import knowledge_graph_utilization
        assert abs(knowledge_graph_utilization("plain") - 0.2) < 1e-9
        both = knowledge_graph_utilization(
            "核心相关实体: A, B\n相关知识社区: C1\n<think>实体和关系与社区的知识图谱</think>")
        # 0.2 + 4 mentions * 0.03 + 0.25 + 0.25
        assert abs(both - (0.2 + 0.12 + 0.5)) < 1e-9

    def test_registered(self):
        from graph_rag_agent_ray.evaluate import METRICS
        assert {"reasoning_coherence", "reasoning_depth",
                "iterative_improvement",
                "knowledge_graph_utilization"} <= set(METRICS)
        assert len(METRICS) >= 10


class TestGraphMetricsFamily:
    """graph_metrics.py deterministic rule paths — Neo4j lookups arrive as
    precomputed data args, LLM fallbacks are the injectable seam."""

    def test_keywords(self):
        from graph_rag_agent_ray.evaluate import eval_keywords
        kws = eval_keywords("Alpha and beta, the third?")
        assert "alpha" in kws and "beta" in kws
        assert all(1 < len(k) < 15 for k in kws)
        assert eval_keywords("") == []

    def test_community_relevance_branches(self):
        from graph_rag_agent_ray.evaluate import community_relevance
        # naive + community text: 0.3 + 0.4 * match_rate
        s = community_relevance("alpha beta", "naive",
                                community_text="mentions alpha only")
        assert abs(s - 0.5) < 1e-9
        # naive without text: chunk-count branch capped at 0.4
        assert abs(community_relevance("alpha beta", "naive",
                                       chunks=["c1", "c2"])
                   - (0.3 + 0.2 / 3)) < 1e-9
        assert community_relevance("alpha", "naive",
                                   chunks=["c"] * 9) == 0.4
        # graph agent: base 0.4, rate boosted 1.2x, capped 1.0
        assert community_relevance("alpha beta", "graph",
                                   community_text="alpha beta") == 1.0
        # agent-type base scores without info
        assert community_relevance("q", "hybrid") == 0.35
        assert community_relevance("q", "graph") == 0.4
        assert community_relevance("q", "local") == 0.3

    def test_subgraph_quality_branches(self):
        from graph_rag_agent_ray.evaluate import subgraph_quality
        assert subgraph_quality([], []) == 0.3
        # entities only: 0.3 + 0.01 each, capped +0.2
        assert abs(subgraph_quality(["e"] * 10, []) - 0.4) < 1e-9
        assert abs(subgraph_quality(["e"] * 50, []) - 0.5) < 1e-9
        # unresolvable string rel ids: 0.3 + 0.02 each
        assert abs(subgraph_quality(["a"], ["5", "6"]) - 0.34) < 1e-9
        # density/connectivity: 3 nodes, 2 edges -> 0.5*(2/3) + 0.5*1.0
        q = subgraph_quality(["a", "b", "c"],
                             [("a", "r", "b"), ["b", "r", "c"]])
        assert abs(q - (0.5 * 2 / 3 + 0.5)) < 1e-9
        # graph agent gets the 5% bonus
        qg = subgraph_quality(["a", "b", "c"],
                              [("a", "r", "b"), ("b", "r", "c")], "graph")
        assert abs(qg - min(1.0, q * 1.05)) < 1e-9
        # dict relations count too
        qd = subgraph_quality(["a", "b"],
                              [{"source": "a", "target": "b",
                                "type": "rel"}])
        assert qd > 0.3

    def test_graph_coverage_naive(self):
        from graph_rag_agent_ray.evaluate import graph_coverage
        # chunk-content branch: full keyword match + 1 chunk
        s = graph_coverage("alpha beta", "naive", entities=["c1"],
                           chunk_texts=["alpha beta text"])
        assert abs(s - (0.3 + 0.4 + 0.05)) < 1e-9
        # count-only branch
        assert abs(graph_coverage("alpha", "naive", entities=["c1", "c2"])
                   - 0.5) < 1e-9

    def test_graph_coverage_graph(self):
        from graph_rag_agent_ray.evaluate import graph_coverage
        s = graph_coverage(
            "alpha beta", "graph",
            entities=["E1", "E2"], relationships=["7"],
            entity_info={"E1": "alpha", "E2": ""},
            rel_info=[{"source": "E1", "relation": "联系",
                       "target": "E2", "description": "beta"}])
        structure = 0.15 + 0.2 * 0.5 + 0.2
        expect = 0.3 + 0.7 * (0.3 * structure + 0.4 * 1.0 + 0.3 * 1.0)
        assert abs(s - expect) < 1e-9
        # no keywords -> relevance 0.5 midpoint; <2 entities -> conn 0.4
        s2 = graph_coverage("", "graph", entities=["E1"])
        assert abs(s2 - (0.3 + 0.7 * (0.3 * 0.05 + 0.4 * 0.5 + 0.3 * 0.4))) \
            < 1e-9

    def test_entity_coverage_branches(self):
        from graph_rag_agent_ray.evaluate import entity_coverage
        # keyword match over texts: 0.4 + 0.6 * rate * min(1, n/5)
        s = entity_coverage("alpha beta", "graph", entities=["e1"],
                            entity_texts=["alpha desc"])
        assert abs(s - (0.4 + 0.6 * 0.5 * 0.2)) < 1e-9
        # graph agent, no keywords: id-count bonus
        assert abs(entity_coverage("", "graph", entities=["a", "b", "c"])
                   - 0.55) < 1e-9
        # base
        assert entity_coverage("", "local") == 0.4

    def test_relationship_utilization_branches(self):
        from graph_rag_agent_ray.evaluate import relationship_utilization
        assert relationship_utilization([], []) == 0.3
        # ids without resolvable info
        assert abs(relationship_utilization(["a"], ["1", "2"]) - 0.34) < 1e-9
        # full rule: 1 weighted relation between the referenced entities
        s = relationship_utilization(
            ["A", "B"], ["1"],
            rel_info=[{"source": "A", "relation": "r1", "target": "B",
                       "description": "d", "weight": 5.0}])
        quality = 0.3 * 1.0 + 0.3 * 0.2 + 0.2 * 1.0 + 0.2 * 0.5
        expect = 0.3 + 0.7 * (0.3 * 0.1 + 0.4 * quality + 0.3 * 1.0)
        assert abs(s - expect) < 1e-9
        # unweighted mix uses the 0.4/0.3/0.3 split
        s2 = relationship_utilization(
            ["A"], ["1"],
            rel_info=[{"source": "A", "relation": "r1", "target": "B",
                       "description": ""}])
        q2 = 0.4 * 1.0 + 0.3 * 0.2 + 0.3 * 1.0
        assert abs(s2 - (0.3 + 0.7 * (0.3 * 0.1 + 0.4 * q2 + 0.3 * 1.0))) \
            < 1e-9

    def test_composite(self):
        from graph_rag_agent_ray.evaluate import evaluate_graph_samples
        out = evaluate_graph_samples([
            {"question": "alpha", "agent_type": "graph",
             "referenced_entities": ["a", "b", "c"],
             "referenced_relationships": [("a", "r", "b")]},
            {"question": "beta", "agent_type": "naive",
             "referenced_entities": []},
        ])
        assert set(out) == {"community_relevance", "subgraph_quality",
                            "graph_coverage", "entity_coverage",
                            "relationship_utilization"}
        for v in out.values():
            assert len(v["scores"]) == 2
            assert 0.0 <= v["mean"] <= 1.0


class _ScriptedJudge:
    """Injectable LLM judge returning a fixed response (the reference's
    llm.invoke contract — .content optional)."""

    def __init__(self, text):
        self.text = text
        self.prompts = []

    def invoke(self, prompt):
        self.prompts.append(prompt)
        return self.text


class TestLLMJudgeMetrics:
    """llm_metrics.py — LLM-judge family; clients injectable, reference
    default 0.5 on no client / parse failure / error."""

    def test_defaults_without_client(self):
        from graph_rag_agent_ray.evaluate import (
            answer_comprehensiveness, factual_consistency, llm_evaluation,
            response_coherence)
        assert response_coherence("q", "a") == 0.5
        assert factual_consistency("q", "a") == 0.5
        assert answer_comprehensiveness("q", "a") == 0.5
        ev = llm_evaluation("q", "a")
        assert ev["llm_total"] == 0.5
        assert all(v == 0.5 for k, v in ev.items() if k != "llm_total")

    def test_scalar_judges(self):
        from graph_rag_agent_ray.evaluate import (
            factual_consistency, response_coherence)
        assert response_coherence("q", "a", llm=_ScriptedJudge("0.8")) == 0.8
        # clamp to [0, 1]; garbage -> default
        assert response_coherence("q", "a", llm=_ScriptedJudge("说 7 分")) == 1.0
        assert response_coherence("q", "a", llm=_ScriptedJudge("no digits")) == 0.5
        # error path -> default
        class Boom:
            def invoke(self, prompt):
                raise RuntimeError("down")
        assert factual_consistency("q", "a", llm=Boom()) == 0.5

    def test_key_facts_and_prompt_assembly(self):
        from graph_rag_agent_ray.evaluate import (answer_key_facts,
                                                  factual_consistency)
        answer = ("# heading\n- short\n- a fact long enough to keep\n"
                  "another meaningful line of content\n")
        facts = answer_key_facts(answer)
        assert facts == ["a fact long enough to keep",
                         "another meaningful line of content"]
        judge = _ScriptedJudge("0.9")
        assert factual_consistency("q", answer, llm=judge) == 0.9
        assert "a fact long enough to keep" in judge.prompts[0]

    def test_llm_evaluation_parsing(self):
        from graph_rag_agent_ray.evaluate import llm_evaluation
        judge = _ScriptedJudge(
            '{"comprehensiveness": 0.9, "relativeness": 0.8, '
            '"empowerment": 0.7, "directness": 0.6, "reasoning": "ok"}')
        ev = llm_evaluation("q", "a", llm=judge)
        assert ev["llm_comprehensiveness"] == 0.9
        expect = 0.3 * 0.9 + 0.25 * 0.8 + 0.25 * 0.7 + 0.2 * 0.6
        assert abs(ev["llm_total"] - expect) < 1e-9
        # missing aspects default to 0.5
        ev2 = llm_evaluation("q", "a",
                             llm=_ScriptedJudge('{"directness": 1.0}'))
        assert ev2["llm_directness"] == 1.0
        assert ev2["llm_empowerment"] == 0.5

    def test_clean_references(self):
        from graph_rag_agent_ray.evaluate import clean_answer_references
        ans = "real answer body\n\n#### 引用数据\n{\"entities\": [1]}"
        assert clean_answer_references(ans) == "real answer body"
        assert clean_answer_references("plain") == "plain"

    def test_registry_full_parity(self):
        from graph_rag_agent_ray.evaluate import METRICS
        # the reference auto-registers this full set
        # (evaluator/metrics/*.py metric_name attributes)
        expected = {"em", "f1", "reasoning_coherence", "reasoning_depth",
                    "iterative_improvement", "knowledge_graph_utilization",
                    "community_relevance", "subgraph_quality",
                    "graph_coverage", "entity_coverage",
                    "relationship_utilization", "response_coherence",
                    "factual_consistency", "answer_comprehensiveness",
                    "llm_evaluation", "retrieval_precision",
                    "retrieval_utilization", "retrieval_latency",
                    "chunk_utilization"}
        assert expected <= set(METRICS)


class TestNormalizeRemapArray:
    """Dictionary-encoded normalize+remap must be byte-identical to the
    per-row normalize_surface_series + map(alias).fillna path."""

    CASES = ["  Alpha  Corp ", "alpha　corp", "ＡＬＰＨＡ", "北京 大学",
             "beta", "beta", "  Alpha  Corp ", "γάμμα", ""]

    def _old(self, values, alias):
        import pandas as pd
        from graph_rag_agent_ray.functions.text import normalize_surface_series
        norm = normalize_surface_series(pd.Series(values, dtype=object))
        return (norm.map(alias).fillna(norm) if alias else norm).tolist()

    def test_equivalence_with_and_without_alias(self):
        import pyarrow as pa
        from graph_rag_agent_ray.functions.text import normalize_remap_array
        arr = pa.array(self.CASES, pa.string())
        alias = {"ALPHA CORP": "E1", "BETA": "E2"}
        assert normalize_remap_array(arr, alias).to_pylist() == \
            self._old(self.CASES, alias)
        assert normalize_remap_array(arr, None).to_pylist() == \
            self._old(self.CASES, None)

    def test_null_matches_astype_str(self):
        import pyarrow as pa
        from graph_rag_agent_ray.functions.text import normalize_remap_array
        vals = ["x", None, "x"]
        arr = pa.array(vals, pa.string())
        # astype(str) rendered None as "None" -> normalized "NONE"
        assert normalize_remap_array(arr, {}).to_pylist() == \
            self._old(vals, {})

    def test_chunked_and_empty(self):
        import pyarrow as pa
        from graph_rag_agent_ray.functions.text import normalize_remap_array
        ch = pa.chunked_array([pa.array(["a", "b"]), pa.array(["a"])])
        assert normalize_remap_array(ch, {"A": "X"}).to_pylist() == \
            ["X", "B", "X"]
        assert normalize_remap_array(pa.array([], pa.string()),
                                     {}).to_pylist() == []
