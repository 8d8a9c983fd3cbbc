"""Offline-replayable production LLM extractor (stages/extract.OpenAIExtractor
+ stages/llm): prompt contract, retry ladder, gleaning union, error sentinel,
malformed-output paths, and a full build_kg run on the replay client."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from graph_rag_agent_ray.config import KGConfig
from graph_rag_agent_ray.functions.records import parse_records
from graph_rag_agent_ray.stages.extract import (
    GLEAN_PROMPT,
    OpenAIExtractor,
    build_extraction_messages,
    extract_chunks,
)
from graph_rag_agent_ray.stages.llm import (
    GrammarClient,
    ReplayClient,
    TransientAPIError,
    call_with_retry,
    prompt_key,
)

CFG = KGConfig(llm_backoff_s=0.0)


def _client_for(text: str, outcomes) -> ReplayClient:
    key = prompt_key(build_extraction_messages(text))
    return ReplayClient({key: outcomes})


class TestRetryLadder:
    def test_two_failures_then_success(self):
        good = '("entity" : "A B" : "person" : "desc")\n\n'
        client = _client_for("t", [TransientAPIError("429"),
                                   TransientAPIError("503"), good])
        ex = OpenAIExtractor(CFG, client=client)
        raw = ex.extract_one("t")
        assert '"A B"' in raw
        assert len(client.calls) == 3

    def test_exhausted_retries_yield_error_sentinel(self):
        client = _client_for("t", [TransientAPIError("down")])
        ex = OpenAIExtractor(CFG, client=client)
        raw = ex.extract_one("t")
        assert raw == ""                      # empty completion, no raise
        parsed = parse_records(raw)
        assert parsed.entities == [] and parsed.relationships == []

    def test_backoff_sleeps_between_attempts(self):
        slept = []
        client = _client_for("t", [TransientAPIError("x")])
        call_with_retry(client, build_extraction_messages("t"),
                        retries=3, backoff_s=2.0, sleep=slept.append)
        assert slept == [2.0, 4.0]            # linear backoff, no sleep after last


class TestMalformedOutput:
    def test_malformed_records_dropped_by_parse(self):
        raw = ('("entity" : "GOOD ONE" : "person" : "ok")\n'
               'this line is not a record at all\n'
               '("entity" missing delimiters)\n\n')
        client = _client_for("t", [raw])
        ex = OpenAIExtractor(CFG, client=client)
        parsed = parse_records(ex.extract_one("t"))
        assert [e[0] for e in parsed.entities] == ["GOOD ONE"]

    def test_bad_weight_aborts_chunk(self):
        raw = ('("entity" : "X Y" : "person" : "d")\n'
               '("relationship" : "X Y" : "Z W" : "uses" : "d" : not_a_number)\n\n')
        client = _client_for("t", [raw])
        ex = OpenAIExtractor(CFG, client=client)
        parsed = parse_records(ex.extract_one("t"))
        assert parsed.error and parsed.entities == []

    def test_missing_endpoint_synthesized(self):
        raw = '("relationship" : "S S" : "T T" : "uses" : "d" : 3)\n\n'
        client = _client_for("t", [raw])
        ex = OpenAIExtractor(CFG, client=client)
        parsed = parse_records(ex.extract_one("t"))
        types = {e[0]: e[1] for e in parsed.entities}
        assert types == {"S S": "未知", "T T": "未知"}


class TestGleaning:
    def test_glean_round_unions_missing_records(self):
        first = '("entity" : "ONE A" : "person" : "d")\n\n'
        extra = '("entity" : "TWO B" : "location" : "d")\n\n'
        base_key = prompt_key(build_extraction_messages("t"))

        def key_fn(messages):
            return "glean" if messages[-1]["content"] == GLEAN_PROMPT else prompt_key(messages)

        client = ReplayClient({base_key: [first], "glean": [extra]}, key_fn=key_fn)
        ex = OpenAIExtractor(KGConfig(llm_backoff_s=0.0, glean_rounds=2), client=client)
        parsed = parse_records(ex.extract_one("t"))
        assert {e[0] for e in parsed.entities} == {"ONE A", "TWO B"}
        assert len(client.calls) == 2

    def test_duplicate_records_not_doubled(self):
        rec = '("entity" : "SAME X" : "person" : "d")'
        base_key = prompt_key(build_extraction_messages("t"))

        def key_fn(messages):
            return "glean" if messages[-1]["content"] == GLEAN_PROMPT else prompt_key(messages)

        client = ReplayClient({base_key: [rec + "\n\n"], "glean": [rec + "\n\n"]},
                              key_fn=key_fn)
        ex = OpenAIExtractor(KGConfig(llm_backoff_s=0.0, glean_rounds=2), client=client)
        assert ex.extract_one("t").count("SAME X") == 1


from graph_rag_agent_ray.stages.extract import ReplayLLMExtractor as ReplayBackedExtractor  # noqa: E402


class TestFullBuildWithReplayClient:
    def test_build_kg_matches_mock_extractor(self, ray_session, tmp_path):
        """The production code path (prompt → client → retry → gleaning →
        sentinel) over the replay client must produce the same canonical
        graph as the mock extractor, and EXPENSIVE must route through the
        work-dedup join."""
        from graph_rag_agent_ray import build_kg
        from graph_rag_agent_ray.synth import generate

        corpus = generate(n_docs=40, seed=42)
        docs = rd.from_arrow(corpus.documents)
        t_mock = build_kg(docs, str(tmp_path / "mock"), input_token="m")
        t_llm = build_kg(docs, str(tmp_path / "llm"), input_token="m",
                         extractor_cls=ReplayBackedExtractor)
        a = t_mock["edges"].to_pandas()[["src", "pred", "dst", "weight"]]
        b = t_llm["edges"].to_pandas()[["src", "pred", "dst", "weight"]]
        key = ["src", "pred", "dst"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True))

    def test_expensive_routes_through_dedup(self, ray_session):
        chunks = rd.from_arrow(pa.table({
            "chunk_id": pa.array(["c1", "c1", "c2"], pa.string()),
            "doc_id": pa.array(["d1", "d2", "d3"], pa.string()),
            "text": pa.array(["The person Ada Lovelace works at the "
                              "organization Analytical Engines。"] * 2 +
                             ["filler text"], pa.string()),
        }))
        out = extract_chunks(chunks, KGConfig(llm_backoff_s=0.0),
                             ReplayBackedExtractor).to_pandas()
        assert len(out) == 3                      # re-attributed to every occurrence
        assert set(out["doc_id"]) == {"d1", "d2", "d3"}


class TestGatedRealClient:
    def test_openai_client_gated_without_package(self):
        with pytest.raises(NotImplementedError):
            OpenAIExtractor(CFG)  # no client injected, no openai package/env
