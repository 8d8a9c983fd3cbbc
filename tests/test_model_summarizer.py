"""Production community summarizer (stages/communities.ModelSummarizer +
stages/llm.DigestSummaryClient): prompt contract, too-little-info guard,
retry ladder, error sentinel, and full builds through the actor-pool stage
on both the driver-local and distributed summarize paths."""

import pandas as pd
import pytest
import ray.data as rd

import graph_rag_agent_ray.stages.communities as CM
from graph_rag_agent_ray.config import KGConfig
from graph_rag_agent_ray.stages.llm import (
    DigestSummaryClient,
    ReplayClient,
    TransientAPIError,
)


def _digest(nodes, rels):
    return ("Nodes are: " + "; ".join(nodes) + ". Relationships are: "
            + "; ".join(f"{s} -{p}-> {d}" for s, d, p in rels) + ".")


class TestDigestClient:
    def test_parses_digest(self):
        text = _digest(["a", "b", "c"], [("a", "b", "rel")])
        out = DigestSummaryClient().complete([{"role": "user", "content": text}])
        assert "3 entities" in out and "1 relationships" in out
        assert "a, b, c" in out

    def test_deterministic(self):
        text = _digest(["x"], [])
        c = DigestSummaryClient()
        assert c.complete([{"role": "user", "content": text}]) == \
            c.complete([{"role": "user", "content": text}])


class TestModelSummarizer:
    def test_prompt_contract_and_summary(self):
        calls = []

        class Spy:
            def complete(self, messages):
                calls.append(messages)
                return "ok summary"

        s = CM.ModelSummarizer(client=Spy(), backoff_s=0.0)
        out = s.summarize_one(_digest(["a", "b"], []))
        assert out == "ok summary"
        assert calls[0][0] == {"role": "system",
                               "content": CM.ModelSummarizer.SYSTEM_PROMPT}
        assert calls[0][1]["role"] == "user"
        assert calls[0][1]["content"].startswith("Nodes are: a; b")

    def test_too_little_info_sentinel(self):
        class Boom:
            def complete(self, messages):  # pragma: no cover - must not run
                raise AssertionError("model must not be called")

        s = CM.ModelSummarizer(client=Boom(), backoff_s=0.0)
        assert s.summarize_one("short") == CM.ModelSummarizer.NO_INFO_SENTINEL

    def test_retry_then_success(self):
        text = _digest(["a", "b", "c", "d"], [])
        # scripted transient failure on the first attempt, then healed
        client = DigestSummaryClient(fail_every=1)
        s = CM.ModelSummarizer(client=client, backoff_s=0.0)
        out = s.summarize_one(text)
        assert "4 entities" in out

    def test_exhausted_retries_yield_error_sentinel(self):
        rec = ReplayClient({"k": [TransientAPIError("x")]},
                           key_fn=lambda m: "k")
        s = CM.ModelSummarizer(client=rec, backoff_s=0.0)
        out = s.summarize_one(_digest(["a", "b", "c"], []))
        assert out == CM.ModelSummarizer.ERROR_SENTINEL
        assert len(rec.calls) == 3           # full retry ladder consumed

    def test_non_top_rows_pass_through(self):
        s = CM.ModelSummarizer(client=DigestSummaryClient(),
                               top_ids={"c1"}, backoff_s=0.0)
        batch = pd.DataFrame({
            "community_id": ["c1", "c2"],
            "full_content": [_digest(["a", "b"], []), _digest(["x", "y"], [])],
            "summary": ["", "existing"],
        })
        out = s(batch)
        assert "2 entities" in out["summary"].iloc[0]
        assert out["summary"].iloc[1] == "existing"

    def test_gated_without_client(self):
        with pytest.raises(NotImplementedError):
            CM.ModelSummarizer()  # no client injected, no openai package/env

    def test_cache_hit_skips_model(self):
        """A content-addressed cache hit returns the carried summary without
        touching the client at all (no model call on unchanged communities)."""
        class Boom:
            def complete(self, messages):  # pragma: no cover - must not run
                raise AssertionError("model must not be called on a hit")

        fc = _digest(["a", "b", "c"], [("a", "b", "rel")])
        cache = {CM.summary_content_key(fc): "carried summary"}
        s = CM.ModelSummarizer(client=Boom(), backoff_s=0.0, cache=cache)
        assert s.summarize_one(fc) == "carried summary"
        # a different full_content misses the cache and reaches the client
        # (whose failure is swallowed by the retry ladder → error sentinel)
        out = s.summarize_one(_digest(["x", "y", "z"], []))
        assert out == CM.ModelSummarizer.ERROR_SENTINEL


class TestFullBuildWithModelSummarizer:
    def test_build_kg_summaries_through_production_path(self, ray_session,
                                                        tmp_path):
        """A build with summarizer_factory produces model summaries for every
        top-ranked community and leaves every other table identical to the
        mock-summarizer build."""
        from graph_rag_agent_ray import build_kg
        from graph_rag_agent_ray.synth import generate

        corpus = generate(n_docs=40, seed=42)
        docs = rd.from_arrow(corpus.documents)
        t_mock = build_kg(docs, str(tmp_path / "mock"), input_token="m")
        t_model = build_kg(docs, str(tmp_path / "model"), input_token="m",
                           summarizer_factory=DigestSummaryClient)

        a = t_mock["communities"].to_pandas().sort_values(
            "community_id").reset_index(drop=True)
        b = t_model["communities"].to_pandas().sort_values(
            "community_id").reset_index(drop=True)
        # same communities / ranks / digests — only the summary text differs
        pd.testing.assert_frame_equal(
            a.drop(columns=["summary"]), b.drop(columns=["summary"]))
        top = a[a["summary"] != ""]["community_id"]
        assert len(top) > 0
        got = b.set_index("community_id").loc[top, "summary"]
        assert (got.str.contains("This community groups")).all()
        # non-top rows stay unsummarized in both
        assert (b[~b["community_id"].isin(set(top))]["summary"] == "").all()

        # entities/edges untouched by the summarizer choice
        pd.testing.assert_frame_equal(
            t_mock["edges"].to_pandas().sort_values(
                ["src", "pred", "dst"]).reset_index(drop=True),
            t_model["edges"].to_pandas().sort_values(
                ["src", "pred", "dst"]).reset_index(drop=True))

    def test_summary_cache_carries_across_ticks(self, ray_session, tmp_path):
        """An incremental tick with the model summarizer carries unchanged
        communities' summaries content-addressed (lineage evidence), and the
        tick's summaries equal a fresh model build's value-exactly."""
        import json

        import pyarrow as pa
        from graph_rag_agent_ray import build_kg
        from graph_rag_agent_ray import schema as S
        from graph_rag_agent_ray.pipelines.incremental import (
            incremental_build_kg,
            write_registry,
        )
        from graph_rag_agent_ray.synth import generate

        corpus = generate(n_docs=25, seed=9, doc_locality=True, intra_p=1.0)
        docs_v1 = rd.from_arrow(corpus.documents)
        d1 = str(tmp_path / "v1")
        build_kg(docs_v1, d1, input_token="v1",
                 summarizer_factory=DigestSummaryClient)
        write_registry(docs_v1, d1, input_token="v1")
        with open(f"{d1}/_lineage.jsonl") as f:
            sc1 = [json.loads(l) for l in f if '"summary_cache"' in l][-1]
        assert sc1["summaries_generated"] > 0
        assert sc1["summaries_carried"] == 0

        rows = corpus.documents.to_pylist()
        rows[0]["spans"][0]["text"] += (
            " The organization Zephyrix Corp collaborates with "
            "the technology Quantaflux。")
        v2 = pa.Table.from_pylist(rows, schema=S.DOCUMENTS)
        d2 = str(tmp_path / "v2")
        t_inc, _ = incremental_build_kg(
            rd.from_arrow(v2), d2, d1, input_token="v2",
            summarizer_factory=DigestSummaryClient)
        with open(f"{d2}/_lineage.jsonl") as f:
            sc2 = [json.loads(l) for l in f if '"summary_cache"' in l][-1]
        assert sc2["summaries_carried"] > 0
        assert sc2["summaries_carried"] >= sc2["summaries_generated"]

        t_full = build_kg(rd.from_arrow(v2), str(tmp_path / "full"),
                          input_token="v2f",
                          summarizer_factory=DigestSummaryClient)
        a = t_inc["communities"].to_pandas().sort_values(
            "community_id").reset_index(drop=True)
        b = t_full["communities"].to_pandas().sort_values(
            "community_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_distributed_summarize_path(self, ray_session):
        """summarize_communities (the non-driver-local variant) routes top
        rows through the same actor-pool stage."""
        membership = rd.from_pandas(pd.DataFrame({
            "entity_id": ["a", "b", "c", "d"],
            "level": [0, 0, 0, 0],
            "community_id": ["c1", "c1", "c2", "c2"],
        }))
        edges = pd.DataFrame({
            "src": ["a", "c"], "dst": ["b", "d"],
            "pred": ["rel", "rel"], "weight": [1.0, 1.0],
        })
        ranks = rd.from_pandas(pd.DataFrame({
            "community_id": ["c1", "c2"], "rank": [5, 1]}))
        cfg = KGConfig(community_top_n_summaries=1)
        out = CM.summarize_communities(
            membership, edges, ranks, cfg,
            summarizer_factory=DigestSummaryClient,
        ).to_pandas().sort_values("community_id").reset_index(drop=True)
        assert "2 entities" in out.loc[0, "summary"]      # c1: top-1 by rank
        assert out.loc[1, "summary"] == ""                # c2: below the cut
        assert out.loc[0, "rank"] == 5
