"""Synthetic corpus generator: determinism + shape + ground-truth coherence."""

import pyarrow as pa

from graph_rag_agent_ray.functions.text import edit_distance
from graph_rag_agent_ray.synth import generate


class TestSynth:
    def test_deterministic(self):
        a = generate(n_docs=20, seed=42)
        b = generate(n_docs=20, seed=42)
        assert a.documents.equals(b.documents)
        assert a.triples_ref.equals(b.triples_ref)

    def test_schema_matches_input_hint(self):
        c = generate(n_docs=5)
        assert c.documents.schema.field("doc_id").type == pa.string()
        span_type = c.documents.schema.field("spans").type
        assert pa.types.is_list(span_type)
        names = [f.name for f in span_type.value_type]
        assert names == ["kind", "text", "media_ref", "offset"]

    def test_offsets_strictly_increasing(self):
        c = generate(n_docs=30, seed=7)
        for spans in c.documents.column("spans").to_pylist():
            offs = [s["offset"] for s in spans]
            assert offs == sorted(offs) and len(set(offs)) == len(offs)

    def test_media_spans_shape(self):
        c = generate(n_docs=50, seed=42)
        saw_media = False
        for spans in c.documents.column("spans").to_pylist():
            for s in spans:
                if s["kind"] == "text":
                    assert s["media_ref"] == "" and s["text"]
                else:
                    saw_media = True
                    assert s["text"] == "" and s["media_ref"]
        assert saw_media

    def test_canonical_names_well_separated(self):
        c = generate(n_docs=10, seed=42)
        ids = c.alias_groups.column("canonical_id").to_pylist()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert edit_distance(ids[i], ids[j], 4) > 4

    def test_truth_uses_canonical_ids(self):
        c = generate(n_docs=10, seed=42)
        canon = set(c.alias_groups.column("canonical_id").to_pylist())
        for col in ("subj", "obj"):
            assert set(c.triples_ref.column(col).to_pylist()) <= canon
