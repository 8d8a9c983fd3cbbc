"""Duplicate-heavy corpus robustness: exact-duplicate documents share every
chunk_id (sha1 of identical text) across doc_ids — the collision case the
work-dedup join, provenance lists, and per-doc truth projections must
survive."""

import pandas as pd
import pytest
import ray.data as rd

from graph_rag_agent_ray import build_kg
from graph_rag_agent_ray.config import KGConfig
from graph_rag_agent_ray.synth import generate


@pytest.fixture(scope="module")
def dup_built(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dup_kg"))
    corpus = generate(n_docs=40, seed=42, dup_rate=0.4)
    tables = build_kg(rd.from_arrow(corpus.documents), out, input_token="dup40")
    return corpus, tables, out


class TestDupCorpus:
    def test_corpus_shape(self, dup_built):
        corpus, _, _ = dup_built
        ids = corpus.documents.column("doc_id").to_pylist()
        assert len(ids) == 56 and sum(1 for d in ids if d.startswith("dup-")) == 16

    def test_triple_pr_still_exact(self, dup_built):
        corpus, _, out = dup_built
        tc = rd.read_parquet(f"{out}/triples_canon").to_pandas()
        ours = set(zip(tc["subj"], tc["pred"], tc["obj"]))
        tr = corpus.triples_ref.to_pandas()
        truth = set(zip(tr["subj"], tr["pred"], tr["obj"]))
        tp = len(ours & truth)
        assert tp / len(ours) == 1.0 and tp / len(truth) == 1.0

    def test_per_doc_triples_cover_duplicates(self, dup_built):
        """Duplicate docs must contribute their own (doc_id, s, p, o) rows —
        the chunk_id collision must not collapse doc-level provenance."""
        corpus, tables, _ = dup_built
        tc = tables["triples_canon"].to_pandas()
        ours = set(zip(tc["doc_id"], tc["subj"], tc["pred"], tc["obj"]))
        tr = corpus.triples_ref.to_pandas()
        truth = set(zip(tr["doc_id"], tr["subj"], tr["pred"], tr["obj"]))
        assert ours == truth
        assert any(d.startswith("dup-") for d, *_ in ours)

    def test_dedupe_extraction_path_identical(self, ray_session, tmp_path):
        """With work-dedup ON, duplicate chunk text hits the extractor once
        and results re-attribute to every (chunk_id, doc_id) — the canonical
        graph must be identical to the dedup-off build."""
        corpus = generate(n_docs=30, seed=42, dup_rate=0.5)
        docs = rd.from_arrow(corpus.documents)
        t_off = build_kg(docs, str(tmp_path / "off"), input_token="d")
        t_on = build_kg(docs, str(tmp_path / "on"), input_token="d",
                        cfg=KGConfig(dedupe_extraction=True))
        key = ["src", "pred", "dst"]
        a = t_off["edges"].to_pandas()[key + ["weight", "n_sources"]]
        b = t_on["edges"].to_pandas()[key + ["weight", "n_sources"]]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True))

    def test_exact_dedup_op_finds_duplicate_docs(self, dup_built):
        """The documents-level exact_dedup op sees the planted duplicates."""
        from graph_rag_agent_ray.ops.dedup import exact_dedup
        from graph_rag_agent_ray.stages.chunker import assemble_document
        import pyarrow as pa
        corpus, _, _ = dup_built
        rows = []
        for doc_id, spans in zip(corpus.documents.column("doc_id").to_pylist(),
                                 corpus.documents.column("spans").to_pylist()):
            rows.append({"doc_id": doc_id,
                         "text": assemble_document(spans)["text"]})
        flat = rd.from_arrow(pa.Table.from_pylist(rows))
        out = exact_dedup(flat).to_pandas()
        assert (out["n_dups"] >= 2).sum() >= 10  # 16 dups over 40 sources

def test_dedup_shard_guard(ray_session, monkeypatch):
    """A chunk text duplicated far beyond the shard cap must still attribute
    every occurrence exactly once (the pathological hot-key path)."""
    import pyarrow as pa
    import ray.data as rd
    from graph_rag_agent_ray.stages import extract as E

    monkeypatch.setattr(E, "DEDUP_SHARD_IDS", 7)  # force sharding
    n = 50
    chunks = rd.from_arrow(pa.table({
        "chunk_id": pa.array(["same"] * n + ["other"], pa.string()),
        "doc_id": pa.array([f"d{i:03d}" for i in range(n)] + ["dx"], pa.string()),
        "text": pa.array(
            ["The person Alfa Beta leads the person Gamma Delta。"] * n
            + ["The person Gamma Delta uses the technology Epsilon Zeta。"],
            pa.string()),
    }))
    out = E.extract_chunks_dedup(chunks).to_pandas()
    assert len(out) == n + 1
    assert out["doc_id"].is_unique
    same = out[out["chunk_id"] == "same"]
    assert same["raw"].nunique() == 1          # identical raw on every shard
    assert set(same["doc_id"]) == {f"d{i:03d}" for i in range(n)}
