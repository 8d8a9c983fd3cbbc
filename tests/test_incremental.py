"""Incremental update + consistency validation tests."""

import pyarrow as pa
import pytest
import ray.data as rd

from graph_rag_agent_ray import build_kg
from graph_rag_agent_ray.pipelines.incremental import (
    compute_delta,
    document_hashes,
    incremental_build_kg,
    write_registry,
)
from graph_rag_agent_ray.stages.validate import repair_graph, validate_graph
from graph_rag_agent_ray.synth import generate
from graph_rag_agent_ray import schema as S


def _mutate_doc(table: pa.Table, idx: int) -> pa.Table:
    rows = table.to_pylist()
    rows[idx]["spans"][0]["text"] += " Extra appended sentence。"
    return pa.Table.from_pylist(rows, schema=S.DOCUMENTS)


class TestDelta:
    def test_delta_statuses(self, ray_session):
        corpus = generate(n_docs=10, seed=42)
        old = document_hashes(rd.from_arrow(corpus.documents))
        # new: drop doc 0, modify doc 1, add doc X
        rows = corpus.documents.to_pylist()[1:]
        rows[0]["spans"][0]["text"] += "改"
        rows.append({"doc_id": "doc-new", "spans": [
            {"kind": "text", "text": "Fresh doc。", "media_ref": "", "offset": 0}]})
        new_docs = pa.Table.from_pylist(rows, schema=S.DOCUMENTS)
        delta = compute_delta(old, document_hashes(rd.from_arrow(new_docs))).to_pandas()
        status = dict(zip(delta["doc_id"], delta["status"]))
        assert status["doc-00000000"] == "deleted"
        assert status["doc-00000001"] == "modified"
        assert status["doc-new"] == "added"
        assert status["doc-00000002"] == "unchanged"

    def test_hash_deterministic_and_order_insensitive(self, ray_session):
        corpus = generate(n_docs=3, seed=42)
        h1 = document_hashes(rd.from_arrow(corpus.documents)).to_pandas()
        h2 = document_hashes(rd.from_arrow(corpus.documents)).to_pandas()
        assert h1.sort_values("doc_id").equals(h2.sort_values("doc_id"))


class TestIncrementalBuild:
    def test_unchanged_docs_skip_extraction(self, ray_session, tmp_path):
        corpus = generate(n_docs=20, seed=42)
        docs = rd.from_arrow(corpus.documents)
        prev_dir = str(tmp_path / "v1")
        t1 = build_kg(docs, prev_dir, input_token="v1")
        write_registry(docs, prev_dir, input_token="v1")
        edges_v1 = t1["edges"].to_pandas()

        # modify one document
        new_docs_tbl = _mutate_doc(corpus.documents, 3)
        new_docs = rd.from_arrow(new_docs_tbl)
        out_dir = str(tmp_path / "v2")
        t2, counts = incremental_build_kg(
            new_docs, out_dir, prev_dir, input_token="v2")
        assert counts["modified"] == 1 and counts["unchanged"] == 19
        # extraction rows exist for every chunk of the new corpus
        assert t2["extractions"].count() == t2["chunks"].count()
        # unchanged docs' chunk rows identical to v1
        c1 = t1["chunks"].to_pandas()
        c2 = t2["chunks"].to_pandas()
        d = "doc-00000005"
        a = c1[c1.doc_id == d].sort_values("position").reset_index(drop=True)
        b = c2[c2.doc_id == d].sort_values("position").reset_index(drop=True)
        assert a["chunk_id"].tolist() == b["chunk_id"].tolist()
        # graph still consistent: edges present
        assert t2["edges"].count() > 0

    def test_incremental_equals_full_rebuild(self, ray_session, tmp_path):
        corpus = generate(n_docs=15, seed=42)
        docs = rd.from_arrow(corpus.documents)
        prev_dir = str(tmp_path / "p1")
        build_kg(docs, prev_dir, input_token="p1")
        write_registry(docs, prev_dir, input_token="p1")

        new_tbl = _mutate_doc(corpus.documents, 0)
        inc_dir = str(tmp_path / "inc")
        t_inc, _ = incremental_build_kg(
            rd.from_arrow(new_tbl), inc_dir, prev_dir, input_token="p2")
        full_dir = str(tmp_path / "full")
        t_full = build_kg(rd.from_arrow(new_tbl), full_dir, input_token="p2full")

        for name in ("triples", "edges"):
            a = t_inc[name].to_pandas()
            b = t_full[name].to_pandas()
            key = ["subj", "pred", "obj"] if name == "triples" else ["src", "pred", "dst"]
            sa = set(map(tuple, a[key].to_numpy()))
            sb = set(map(tuple, b[key].to_numpy()))
            assert sa == sb, name


class TestValidator:
    def test_clean_graph_validates(self, ray_session, tmp_path):
        corpus = generate(n_docs=15, seed=42)
        tables = build_kg(rd.from_arrow(corpus.documents), str(tmp_path / "v"),
                          input_token="val")
        issues = validate_graph(tables)
        assert issues["empty_chunks"] == 0
        assert issues["dangling_edges"] == 0
        assert issues["orphan_mentions"] == 0
        assert issues["orphan_entities"] == 0

    def test_repair_drops_dangling(self, ray_session, tmp_path):
        corpus = generate(n_docs=10, seed=42)
        tables = build_kg(rd.from_arrow(corpus.documents), str(tmp_path / "r"),
                          input_token="rep")
        # inject a dangling edge
        bad = pa.table({
            "src": ["GHOST ENTITY"], "dst": ["ALSO GHOST"], "pred": ["uses"],
            "description": ["x"], "weight": pa.array([1.0], pa.float32()),
            "n_sources": pa.array([1], pa.int32()),
            "chunk_ids": pa.array([["c"]], pa.list_(pa.string())),
        })
        tables2 = dict(tables)
        tables2["edges"] = tables["edges"].union(rd.from_arrow(bad))
        cleaned, issues = repair_graph(tables2)
        assert issues["dangling_edges"] >= 2  # both endpoints unknown
        assert cleaned["edges"].count() == tables["edges"].count()


class TestDocumentHashProperty:
    def test_vectorized_equals_naive_and_span_order_insensitive(self, ray_session):
        """The Arrow-vectorized document_hashes must equal a straightforward
        per-row implementation, and be insensitive to span STORAGE order
        (offset-lexsort) while sensitive to any content change."""
        import hashlib
        import pyarrow as pa
        import graph_rag_agent_ray.schema as S

        def naive(rows):
            out = {}
            for r in rows:
                parts = []
                for s in sorted(r["spans"] or [], key=lambda s: s["offset"]):
                    parts.append("\x1e".join([
                        f"{len(s['kind'])}:{s['kind']}",
                        f"{len(s['text'])}:{s['text']}",
                        f"{len(s['media_ref'])}:{s['media_ref']}",
                        str(s["offset"])]))
                out[r["doc_id"]] = hashlib.sha256(
                    "\x1f".join(parts).encode()).hexdigest()
            return out

        corpus = generate(n_docs=12, seed=9, media_rate=0.5)
        rows = corpus.documents.to_pylist()
        rows.append({"doc_id": "empty", "spans": []})
        shuffled = [dict(r, spans=list(reversed(r["spans"]))) for r in rows]
        tbl = pa.Table.from_pylist(rows, schema=S.DOCUMENTS)
        tbl_shuf = pa.Table.from_pylist(shuffled, schema=S.DOCUMENTS)

        got = dict(zip(*[document_hashes(rd.from_arrow(tbl)).to_pandas()[c]
                         for c in ("doc_id", "content_hash")]))
        got_shuf = dict(zip(*[document_hashes(rd.from_arrow(tbl_shuf)).to_pandas()[c]
                              for c in ("doc_id", "content_hash")]))
        assert got == naive(rows)
        assert got == got_shuf  # storage order must not matter

        mutated = [dict(r) for r in rows]
        mutated[0] = dict(mutated[0], spans=[
            dict(mutated[0]["spans"][0],
                 text=mutated[0]["spans"][0]["text"] + "x")
        ] + list(mutated[0]["spans"][1:]))
        got_mut = dict(zip(*[document_hashes(
            rd.from_arrow(pa.Table.from_pylist(mutated, schema=S.DOCUMENTS))
        ).to_pandas()[c] for c in ("doc_id", "content_hash")]))
        changed = [d for d in got if got_mut[d] != got[d]]
        assert changed == [mutated[0]["doc_id"]]

    def test_delimiter_bytes_in_text_stay_injective(self, ray_session):
        """Length-prefixed framing: texts containing the encoding's delimiter
        bytes must not alias a different span layout."""
        import pyarrow as pa
        import graph_rag_agent_ray.schema as S

        def doc(doc_id, spans):
            return {"doc_id": doc_id, "spans": [
                {"kind": "text", "text": t, "media_ref": m, "offset": o}
                for t, m, o in spans]}

        rows = [
            doc("a", [("x\x1ey", "", 0)]),
            doc("b", [("x", "y", 0)]),
            doc("c", [("x\x1fy", "", 0)]),
            doc("d", [("x", "", 0), ("y", "", 2)]),
        ]
        tbl = pa.Table.from_pylist(rows, schema=S.DOCUMENTS)
        got = document_hashes(rd.from_arrow(tbl)).to_pandas()
        assert got["content_hash"].nunique() == 4
