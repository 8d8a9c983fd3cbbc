"""Chunker invariants mirroring text_chunker.py:185-266 semantics, plus the
span-assembly round trip that underpins the span-sequence invariant."""

import pytest

from graph_rag_agent_ray.config import KGConfig
from graph_rag_agent_ray.functions.hashing import sha1_hex
from graph_rag_agent_ray.functions.text import tokenize
from graph_rag_agent_ray.stages.chunker import (
    assemble_document,
    chunk_one_document,
)

CFG = KGConfig(chunk_size=50, chunk_overlap=10)


def _doc(sentences, media_at=()):
    spans, offset = [], 0
    for i, s in enumerate(sentences):
        spans.append({"kind": "text", "text": s, "media_ref": "", "offset": offset})
        offset += len(s) + 1
        if i in media_at:
            spans.append({"kind": "image", "text": "", "media_ref": f"m://{i}", "offset": offset})
            offset += 1
    return spans


class TestAssembly:
    def test_spans_sorted_by_offset_and_ranges_exact(self):
        spans = _doc(["First sentence。", "Second one。"], media_at=(0,))
        shuffled = [spans[2], spans[0], spans[1]]
        out = assemble_document(shuffled)
        # order restored by offset
        assert [s["offset"] for s in out["spans"]] == sorted(s["offset"] for s in spans)
        # char ranges slice back to the original text spans
        for s in out["spans"]:
            if s["kind"] == "text":
                orig = next(x for x in spans if x["offset"] == s["offset"])
                assert out["text"][s["char_start"]:s["char_end"]] == orig["text"]

    def test_media_zero_width(self):
        spans = _doc(["Only text。"], media_at=(0,))
        out = assemble_document(spans)
        media = [s for s in out["spans"] if s["kind"] == "image"]
        assert media and media[0]["char_start"] == media[0]["char_end"]


class TestChunking:
    def test_short_text_single_chunk(self):
        spans = _doc(["Tiny。"])
        rows = chunk_one_document("d", spans, CFG)
        assert len(rows) == 1 and rows[0]["position"] == 0

    def test_window_and_overlap(self):
        # 40 sentences x ~6 tokens: several windows expected
        sentences = [f"Sentence number {i} has tokens。" for i in range(40)]
        rows = chunk_one_document("d", _doc(sentences), CFG)
        assert len(rows) > 2
        # positions are consecutive; offsets strictly increase
        assert [r["position"] for r in rows] == list(range(len(rows)))
        offsets = [r["content_offset"] for r in rows]
        assert offsets == sorted(offsets) and len(set(offsets)) == len(offsets)
        # token budget respected (window + sentence-snap slack)
        for r in rows:
            assert r["n_tokens"] <= CFG.chunk_size + CFG.sentence_snap_slack

    def test_chunks_end_on_sentence_boundary_when_snapped(self):
        sentences = [f"Filler words number {i}。" for i in range(40)]
        rows = chunk_one_document("d", _doc(sentences), CFG)
        for r in rows[:-1]:
            assert r["text"].rstrip().endswith("。")

    def test_chunk_id_is_sha1_of_text(self):
        rows = chunk_one_document("d", _doc(["Some sentence here。"]), CFG)
        assert rows[0]["chunk_id"] == sha1_hex(rows[0]["text"])

    def test_coverage_no_text_lost(self):
        """Stitching chunks at their offsets reproduces the assembled text."""
        sentences = [f"Sentence number {i} has several tokens in it。" for i in range(60)]
        spans = _doc(sentences, media_at=(5, 20))
        assembled = assemble_document(spans)["text"]
        rows = chunk_one_document("d", spans, CFG)
        rebuilt = [" "] * len(assembled)
        for r in rows:
            lo = r["content_offset"]
            for i, ch in enumerate(r["text"]):
                rebuilt[lo + i] = ch
        # every token char is covered; only inter-token whitespace may be absent
        recovered = "".join(rebuilt)
        assert [t for t in tokenize(recovered)] == [t for t in tokenize(assembled)]

    def test_deterministic_across_runs(self):
        spans = _doc([f"Sentence {i} here。" for i in range(30)])
        a = chunk_one_document("d", spans, CFG)
        b = chunk_one_document("d", spans, CFG)
        assert a == b

    def test_empty_doc(self):
        assert chunk_one_document("d", [], CFG) == []
        assert chunk_one_document("d", [{"kind": "image", "text": "", "media_ref": "m", "offset": 0}], CFG) == []


class TestSpanIndexVectorized:
    """The vectorized SpanIndexBatch must emit exactly the rows the
    per-doc assemble_document bookkeeping produces."""

    def _reference_rows(self, doc_id, spans):
        out = []
        for s in assemble_document(spans or [])["spans"]:
            out.append((doc_id, s["span_idx"], s["kind"], s["media_ref"],
                        s["offset"], s["char_start"], s["char_end"]))
        return out

    def test_equivalence_mixed_docs(self):
        import pyarrow as pa
        from graph_rag_agent_ray.stages.chunker import SpanIndexBatch

        docs = {
            "a": _doc(["First sentence。", "Second one。"], media_at=(0,)),
            # out-of-order offsets + duplicate offsets (tie → list position)
            "b": [
                {"kind": "text", "text": "tail", "media_ref": "", "offset": 9},
                {"kind": "image", "text": "", "media_ref": "m://x", "offset": 9},
                {"kind": "text", "text": "héad 多字", "media_ref": "", "offset": 0},
                {"kind": "audio", "text": "", "media_ref": "m://y", "offset": 0},
            ],
            "c": [],                                      # empty list
            "d": [{"kind": "image", "text": "", "media_ref": "m", "offset": 3}],
            "e": [{"kind": "text", "text": "", "media_ref": "", "offset": 0},
                  {"kind": "text", "text": "after empty", "media_ref": "", "offset": 1}],
        }
        batch = pa.table({
            "doc_id": pa.array(list(docs), pa.string()),
            "spans": pa.array([docs[k] for k in docs],
                              pa.list_(__import__("graph_rag_agent_ray.schema",
                                                  fromlist=["SPAN_STRUCT"]).SPAN_STRUCT)),
        })
        got = SpanIndexBatch()(batch).to_pandas()
        got_rows = sorted(map(tuple, got.to_numpy()))
        want = sorted(r for k in docs for r in self._reference_rows(k, docs[k]))
        assert got_rows == want

    def test_null_spans_and_empty_batch(self):
        import pyarrow as pa
        import graph_rag_agent_ray.schema as S
        from graph_rag_agent_ray.stages.chunker import SpanIndexBatch

        batch = pa.table({
            "doc_id": pa.array(["x"], pa.string()),
            "spans": pa.array([None], pa.list_(S.SPAN_STRUCT)),
        })
        assert len(SpanIndexBatch()(batch)) == 0
        assert len(SpanIndexBatch()(S.DOCUMENTS.empty_table())) == 0


class TestTokenizerDivergence:
    def test_harness_detects_and_clears(self):
        """The divergence harness must report identity for an equivalent
        tokenizer and real divergence for one with different token-count
        semantics — and the char-coverage invariant must hold for both."""
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from tools.tokenizer_divergence import (
            divergence, char_level_cjk_tokenizer, whitespace_tokenizer)
        from graph_rag_agent_ray.functions.text import tokenize_with_offsets
        from graph_rag_agent_ray.synth import generate
        import dataclasses
        cfg = dataclasses.replace(CFG, chunk_size=64, chunk_overlap=16)
        corpus = generate(n_docs=40, seed=42, facts_per_doc=25)
        docs = list(zip(corpus.documents.column("doc_id").to_pylist(),
                        corpus.documents.column("spans").to_pylist()))
        same = divergence(docs, tokenize_with_offsets,
                          char_level_cjk_tokenizer, cfg)
        assert same["boundary_jaccard"] == 1.0
        diff = divergence(docs, tokenize_with_offsets,
                          whitespace_tokenizer, cfg)
        assert diff["boundary_jaccard"] < 0.5
        assert same["coverage_equal_docs"] == 1.0
        assert diff["coverage_equal_docs"] == 1.0
