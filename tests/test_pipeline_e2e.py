"""End-to-end build over the seeded synthetic corpus.

Gates (BASELINE.json): per-row span-sequence equality (kind, text, media_ref,
order) vs the input; triple P/R >= 0.95 vs the generator's ground truth;
resume-from-snapshot equality.
"""

import json

import pandas as pd
import pytest
import ray.data as rd

from graph_rag_agent_ray import build_kg
from graph_rag_agent_ray.synth import generate

N_DOCS = 50


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("kg_e2e"))
    corpus = generate(n_docs=N_DOCS, seed=42)
    docs = rd.from_arrow(corpus.documents)
    tables = build_kg(docs, out_dir, input_token=f"synth{N_DOCS}")
    return corpus, tables, out_dir


def _reconstruct_spans(chunks_pdf: pd.DataFrame, span_idx_pdf: pd.DataFrame):
    """doc_id -> [(kind, text, media_ref)] in offset order, rebuilt by
    stitching chunk substrings at their content offsets and slicing with the
    span index char ranges."""
    out = {}
    for doc_id, spans in span_idx_pdf.groupby("doc_id"):
        doc_chunks = chunks_pdf[chunks_pdf["doc_id"] == doc_id]
        total = int(spans["char_end"].max()) if len(spans) else 0
        buf = [None] * total
        for _, c in doc_chunks.iterrows():
            lo = int(c["content_offset"])
            for i, ch in enumerate(c["text"]):
                buf[lo + i] = ch
        seq = []
        for _, s in spans.sort_values(["offset", "span_idx"]).iterrows():
            if s["kind"] == "text":
                text = "".join(
                    ch if ch is not None else " "
                    for ch in buf[int(s["char_start"]):int(s["char_end"])]
                )
                seq.append(("text", text, ""))
            else:
                seq.append((s["kind"], "", s["media_ref"]))
        out[doc_id] = seq
    return out


class TestSpanInvariant:
    def test_span_sequence_equality(self, built):
        """The BASELINE input_hint invariant: every row's (kind, text,
        media_ref, order) sequence is reconstructible from pipeline outputs."""
        corpus, tables, _ = built
        chunks_pdf = tables["chunks"].to_pandas()
        span_idx_pdf = tables["span_index"].to_pandas()
        rebuilt = _reconstruct_spans(chunks_pdf, span_idx_pdf)

        docs = corpus.documents.to_pylist()
        assert len(rebuilt) == len(docs)
        for row in docs:
            expected = [
                (s["kind"], s["text"], s["media_ref"])
                for s in sorted(row["spans"], key=lambda s: s["offset"])
            ]
            assert rebuilt[row["doc_id"]] == expected, row["doc_id"]


class TestTriplePR:
    def test_pr_gate(self, built):
        corpus, tables, out_dir = built
        canon = rd.read_parquet(f"{out_dir}/triples_canon").to_pandas()
        ours = set(zip(canon["subj"], canon["pred"], canon["obj"]))
        truth_pdf = corpus.triples_ref.to_pandas()
        truth = set(zip(truth_pdf["subj"], truth_pdf["pred"], truth_pdf["obj"]))
        tp = len(ours & truth)
        precision = tp / len(ours)
        recall = tp / len(truth)
        assert precision >= 0.95, (precision, sorted(ours - truth)[:5])
        assert recall >= 0.95, (recall, sorted(truth - ours)[:5])

    def test_entities_are_canonical(self, built):
        """Every alias-group variant that was mentioned resolves to one
        entity; canonical ids equal the generator's canonical ids."""
        corpus, tables, _ = built
        entity_ids = set(tables["entities"].to_pandas()["entity_id"])
        truth_canon = set(corpus.alias_groups.to_pandas()["canonical_id"])
        # every truth canonical that was mentioned must exist; no variant ids
        mentioned = set(corpus.triples_ref.to_pandas()["subj"]) | set(
            corpus.triples_ref.to_pandas()["obj"]
        )
        assert mentioned <= truth_canon
        assert entity_ids == (truth_canon & entity_ids) | (entity_ids - truth_canon)
        # strict: at least 95% of produced entities are true canonicals
        assert len(entity_ids & truth_canon) / len(entity_ids) >= 0.95

    def test_edges_deduped(self, built):
        _, tables, _ = built
        edges = tables["edges"].to_pandas()
        assert not edges.duplicated(["src", "dst", "pred"]).any()
        assert (edges["n_sources"] >= 1).all()


class TestCommunities:
    def test_membership_covers_connected_entities(self, built):
        _, tables, _ = built
        comm = tables["communities"].to_pandas()
        assert len(comm) > 0
        # id scheme "L-N" and level coherence
        for _, row in comm.iterrows():
            level, num = row["community_id"].split("-")
            assert int(level) == row["level"]
        # rank: top community has rank >= any other
        assert comm["rank"].max() > 0

    def test_summaries_on_top_ranked(self, built):
        _, tables, _ = built
        comm = tables["communities"].to_pandas()
        top = comm.sort_values(["rank", "community_id"], ascending=[False, True]).head(5)
        assert (top["summary"].str.len() > 0).all()
        assert (comm["full_content"].str.len() > 0).all()


class TestResume:
    def test_resume_hits_cache_and_matches(self, built):
        corpus, tables, out_dir = built
        docs = rd.from_arrow(corpus.documents)
        edges_before = tables["edges"].to_pandas().sort_values(
            ["src", "pred", "dst"]).reset_index(drop=True)
        tables2 = build_kg(docs, out_dir, input_token=f"synth{N_DOCS}")
        edges_after = tables2["edges"].to_pandas().sort_values(
            ["src", "pred", "dst"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(edges_before, edges_after)
        lineage = [json.loads(l) for l in open(f"{out_dir}/_lineage.jsonl")]
        cached = [r for r in lineage if r.get("cached")]
        assert len(cached) >= 8  # second run reused every disk snapshot

    def test_config_change_invalidates(self, built, tmp_path):
        corpus, _, out_dir = built
        from graph_rag_agent_ray.config import KGConfig
        docs = rd.from_arrow(corpus.documents)
        out2 = str(tmp_path / "other")
        tables2 = build_kg(docs, out2, input_token=f"synth{N_DOCS}",
                           cfg=KGConfig(chunk_size=100, chunk_overlap=20))
        # different chunking, same canonical graph semantics
        assert tables2["chunks"].count() >= 0
        lineage = [json.loads(l) for l in open(f"{out2}/_lineage.jsonl")]
        assert not any(r.get("cached") for r in lineage)


class TestDistributedAliasPath:
    def test_build_with_join_remap_matches_broadcast(self, built, tmp_path):
        """Force the distributed alias remap (broadcast_alias_limit=0) and
        assert the canonical graph is identical to the broadcast build."""
        from graph_rag_agent_ray.config import KGConfig
        corpus, tables, _ = built
        docs = rd.from_arrow(corpus.documents)
        out2 = str(tmp_path / "joinpath")
        tables2 = build_kg(docs, out2, input_token="joinpath",
                           cfg=KGConfig(broadcast_alias_limit=0))
        a = tables["edges"].to_pandas()
        b = tables2["edges"].to_pandas()
        key = ["src", "pred", "dst", "n_sources"]
        assert sorted(map(tuple, a[key].to_numpy().tolist())) == \
            sorted(map(tuple, b[key].to_numpy().tolist()))


class TestCommunitySummarizePaths:
    def test_local_fast_path_matches_distributed(self, built):
        """build_kg uses the driver-local community build under the guard;
        the distributed variant must produce identical rows (it is the
        beyond-guard path)."""
        import ray.data as rd_
        from graph_rag_agent_ray.stages import communities as CM

        _, tables, _ = built
        edges_pdf = tables["edges"].to_pandas()[["src", "dst", "pred", "weight"]]
        member_levels = CM.detect_communities(edges_pdf)
        membership_pdf = CM.community_membership_table(member_levels).to_pandas()
        ranks_pdf = CM.community_ranks(
            membership_pdf, tables["mentions_canon"]).to_pandas()
        local = CM.summarize_communities_local(
            member_levels, edges_pdf, ranks_pdf)
        ranks_ds = CM.community_ranks(membership_pdf, tables["mentions_canon"])
        dist = CM.summarize_communities(
            rd_.from_pandas(membership_pdf), edges_pdf, ranks_ds).to_pandas()
        cols = ["community_id", "level", "summary", "full_content", "rank"]
        a = local[cols].sort_values("community_id").reset_index(drop=True)
        b = dist[cols].sort_values("community_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        am = {r.community_id: list(r.members) for r in local.itertuples()}
        bm = {r.community_id: list(r.members) for r in dist.itertuples()}
        assert am == bm


class TestNeo4jExport:
    def test_bulk_import_csv_roundtrip(self, built, tmp_path):
        """The neo4j-admin bulk-import layout: split header files +
        headerless sharded data files; a header+parts read reassembles the
        exact entity/edge tables."""
        import glob

        import duckdb

        from graph_rag_agent_ray.ops.export import export_neo4j_csv

        corpus, tables, out_dir = built
        exp = str(tmp_path / "neo4j")
        res = export_neo4j_csv(tables, exp)
        assert res["entities"] == tables["entities"].count()
        assert res["relationships"] == tables["edges"].count()

        hdr = open(f"{exp}/entities-header.csv").read().strip().split(",")
        assert hdr[0] == "entity_id:ID" and "n_mentions:long" in hdr
        parts = sorted(glob.glob(f"{exp}/entities/*"))
        assert parts
        con = duckdb.connect()
        ents = con.execute(
            f"SELECT * FROM read_csv_auto({parts!r}, header=false, "
            f"names={[h.split(':')[0] for h in hdr]!r})").df()
        want = tables["entities"].to_pandas()
        assert len(ents) == len(want)
        assert set(ents["entity_id"]) == set(want["entity_id"])
        pd.testing.assert_frame_equal(
            ents.sort_values("entity_id")[["entity_id", "n_mentions"]]
            .reset_index(drop=True),
            want.sort_values("entity_id")[["entity_id", "n_mentions"]]
            .reset_index(drop=True), check_dtype=False)

        rhdr = open(f"{exp}/relationships-header.csv").read().strip().split(",")
        rparts = sorted(glob.glob(f"{exp}/relationships/*"))
        rels = con.execute(
            f"SELECT * FROM read_csv_auto({rparts!r}, header=false, "
            f"names={[h.split(':')[0] for h in rhdr]!r})").df()
        wedges = tables["edges"].to_pandas()
        assert len(rels) == len(wedges)
        assert (set(zip(rels["src"], rels["pred"], rels["dst"]))
                == set(zip(wedges["src"], wedges["pred"], wedges["dst"])))
