"""Tests for ingestion readers, packed extraction, LPA detector, evaluate helpers."""

import json
import os

import pandas as pd
import pytest
import ray.data as rd

from graph_rag_agent_ray.config import KGConfig
from graph_rag_agent_ray.evaluate import triple_prf
from graph_rag_agent_ray.sources.ingest import (
    read_csv_documents,
    read_json_documents,
    read_pdf_documents,
    read_text_documents,
)
from graph_rag_agent_ray.stages.extract import (
    MockLLMExtractor,
    PackedExtractor,
    extract_chunks,
)
from graph_rag_agent_ray.stages.chunker import chunk_documents
from graph_rag_agent_ray.synth import generate


class TestIngest:
    def test_text_dir(self, ray_session, tmp_path):
        (tmp_path / "a.txt").write_text("Hello world。", encoding="utf-8")
        (tmp_path / "b.txt").write_bytes("中文内容。".encode("gb18030"))
        ds = read_text_documents(str(tmp_path))
        rows = {r["doc_id"]: r["spans"][0]["text"] for r in ds.take_all()}
        assert rows["a.txt"] == "Hello world。"
        assert rows["b.txt"] == "中文内容。"

    def test_csv(self, ray_session, tmp_path):
        p = tmp_path / "d.csv"
        p.write_text("id,body\n1,first doc\n2,second doc\n")
        ds = read_csv_documents(str(p), id_column="id", text_column="body")
        rows = {r["doc_id"]: r["spans"][0]["text"] for r in ds.take_all()}
        assert rows == {"1": "first doc", "2": "second doc"}

    def test_jsonl(self, ray_session, tmp_path):
        p = tmp_path / "d.json"
        p.write_text("\n".join(json.dumps({"doc_id": f"j{i}", "text": f"t{i}"})
                               for i in range(3)))
        ds = read_json_documents(str(p))
        assert ds.count() == 3

    def test_pdf_reader_real(self, ray_session, tmp_path):
        # round 4: PDFs decode for real (vendored extractor, sources/pdf.py);
        # full coverage lives in tests/test_pdf_ingest.py
        from tests.test_pdf_ingest import make_pdf
        (tmp_path / "x.pdf").write_bytes(make_pdf())
        rows = read_pdf_documents(str(tmp_path)).take_all()
        assert "Acme Corp acquired" in rows[0]["spans"][0]["text"]

    def test_read_directory_dispatch(self, ray_session, tmp_path):
        """FileReader.read_files parity: recursive walk, per-extension
        dispatch, relative-path doc ids, gated formats skipped, decode
        errors produce the reference's sentinel text."""
        from graph_rag_agent_ray.sources.ingest import read_directory
        (tmp_path / "a.txt").write_text("plain text。", encoding="utf-8")
        (tmp_path / "sub").mkdir()
        (tmp_path / "sub" / "a.txt").write_bytes("中文。".encode("gb18030"))
        (tmp_path / "t.csv").write_text("h1,h2\nv1,v2\n")
        (tmp_path / "d.json").write_text('{"k": "v"}')
        (tmp_path / "bad.json").write_text("{not json")
        (tmp_path / "y.yaml").write_text("k: v\n")
        (tmp_path / "l.jsonl").write_text(
            '{"a": 1}\n\n{"b": "文"}\n')
        (tmp_path / "doc.pdf").write_bytes(b"%PDF-fake")   # r4: dispatched
        (tmp_path / "w.docx").write_bytes(b"PK\x03\x04")     # r4: dispatched
        ds = read_directory(str(tmp_path))
        rows = {r["doc_id"]: r["spans"][0]["text"] for r in ds.take_all()}
        assert set(rows) == {"a.txt", os.path.join("sub", "a.txt"),
                             "t.csv", "d.json", "bad.json", "y.yaml",
                             "l.jsonl", "doc.pdf", "w.docx"}
        # headerless-content pdf decodes to empty pages, not a crash;
        # truncated docx hits the reference error sentinel
        assert isinstance(rows["doc.pdf"], str)
        assert rows["w.docx"].startswith("[无法读取Word文档内容:")
        assert rows["l.jsonl"] == '{"a": 1}\n{"b": "文"}'
        assert rows["a.txt"] == "plain text。"
        assert rows[os.path.join("sub", "a.txt")] == "中文。"
        assert rows["t.csv"] == "h1,h2\nv1,v2"
        assert json.loads(rows["d.json"]) == {"k": "v"}
        assert rows["bad.json"].startswith("[无法读取JSON文件内容")
        assert "k: v" in rows["y.yaml"]

    def test_read_directory_filters_and_nonrecursive(self, ray_session, tmp_path):
        from graph_rag_agent_ray.sources.ingest import read_directory
        (tmp_path / "a.txt").write_text("keep")
        (tmp_path / "b.md").write_text("drop via filter")
        (tmp_path / "sub").mkdir()
        (tmp_path / "sub" / "c.txt").write_text("drop via nonrecursive")
        ds = read_directory(str(tmp_path), file_extensions=[".txt"],
                            recursive=False)
        rows = {r["doc_id"] for r in ds.take_all()}
        assert rows == {"a.txt"}

    def test_read_directory_empty(self, ray_session, tmp_path):
        from graph_rag_agent_ray.sources.ingest import read_directory
        assert read_directory(str(tmp_path)).count() == 0


class TestPackedExtraction:
    def test_packed_equals_per_chunk(self, ray_session):
        corpus = generate(n_docs=15, seed=42)
        chunks = chunk_documents(rd.from_arrow(corpus.documents)).materialize()
        plain = extract_chunks(chunks, extractor_cls=MockLLMExtractor).to_pandas()
        packed = extract_chunks(chunks, extractor_cls=PackedExtractor).to_pandas()
        a = plain.sort_values("chunk_id").reset_index(drop=True)
        b = packed.sort_values("chunk_id").reset_index(drop=True)
        assert (a["chunk_id"] == b["chunk_id"]).all()
        assert (a["raw"] == b["raw"]).all()

    def test_fallback_on_mismatch(self):
        # a chunk containing the separator itself triggers count mismatch
        ext = PackedExtractor(pack_size=2)
        import pyarrow as pa
        sep_text = "The person Alfa Beta leads the person Gamma Delta。\n" + "-" * 50 + "\nnoise"
        batch = pa.table({
            "chunk_id": ["c1", "c2"], "doc_id": ["d", "d"],
            "text": [sep_text, "The person Gamma Delta uses the technology Epsilon Zeta。"],
        })
        out = ext(batch)
        assert out.num_rows == 2
        assert "ALFA BETA" in out.column("raw")[0].as_py()


class TestCommunityAlgorithms:
    def test_sllpa_detector(self, ray_session):
        import pandas as pd
        from graph_rag_agent_ray.stages.communities import detect_communities
        edges = pd.DataFrame({
            "src": ["a", "b", "c", "x", "y"],
            "dst": ["b", "c", "a", "y", "z"],
            "weight": [1.0] * 5,
        })
        out = detect_communities(edges, KGConfig(community_algorithm="sllpa"))
        assert set(out) == {"a", "b", "c", "x", "y", "z"}
        # every node has a primary (level-0) community; overlap may add more
        assert all(len(v) >= 1 for v in out.values())
        # the triangle ends up in one level-0 community, disjoint from x/y/z
        assert out["a"][0] == out["b"][0] == out["c"][0]
        assert out["a"][0] != out["z"][0]
        # deterministic across calls (seeded); "lpa" is an accepted alias
        assert out == detect_communities(edges, KGConfig(community_algorithm="lpa"))

    def test_sllpa_overlap_bridge_node(self, ray_session):
        """A node bridging two dense cliques retains both labels above the
        association threshold — SLPA's overlapping-communities signature."""
        import itertools
        import pandas as pd
        from graph_rag_agent_ray.stages.communities import detect_communities
        left = [f"l{i}" for i in range(5)]
        right = [f"r{i}" for i in range(5)]
        rows = [(a, b) for a, b in itertools.combinations(left, 2)]
        rows += [(a, b) for a, b in itertools.combinations(right, 2)]
        rows += [("bridge", n) for n in left[:3] + right[:3]]
        edges = pd.DataFrame({
            "src": [r[0] for r in rows],
            "dst": [r[1] for r in rows],
            "weight": [1.0] * len(rows),
        })
        out = detect_communities(
            edges, KGConfig(community_algorithm="sllpa",
                            sllpa_min_association=0.15))
        # the two cliques separate at level 0...
        assert out["l0"][0] == out["l4"][0]
        assert out["r0"][0] == out["r4"][0]
        assert out["l0"][0] != out["r0"][0]
        # ...and the bridge node retains BOTH labels above threshold
        assert len(out["bridge"]) > 1


class TestEvaluate:
    def test_triple_prf(self):
        ours = pd.DataFrame({"subj": ["A", "B"], "pred": ["p", "q"], "obj": ["X", "Y"]})
        truth = pd.DataFrame({"subj": ["A", "C"], "pred": ["p", "q"], "obj": ["X", "Z"]})
        m = triple_prf(ours, truth)
        assert m.tp == 1 and m.precision == 0.5 and m.recall == 0.5


class TestExtractionWorkDedup:
    def test_identical_chunks_extracted_once(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from graph_rag_agent_ray.config import KGConfig
        from graph_rag_agent_ray.stages.extract import extract_chunks

        class CountingExtractor(MockLLMExtractor):
            STATELESS_OK = True

            def __call__(self, batch):
                out = super().__call__(batch)
                # record how many chunk rows this stage actually processed
                import os
                with open("/tmp/_extract_count.txt", "a") as f:
                    f.write(f"{len(batch)}\n")
                return out

        # two docs share an identical chunk text
        text = "The person Alfa Beta leads the person Gamma Delta。"
        import hashlib
        cid = hashlib.sha1(text.encode()).hexdigest()
        chunks = rd.from_arrow(pa.table({
            "chunk_id": [cid, cid, "other"],
            "doc_id": ["d1", "d2", "d3"],
            "text": [text, text, "The person Gamma Delta uses the technology Eps Zet。"],
        }))
        import os
        if os.path.exists("/tmp/_extract_count.txt"):
            os.remove("/tmp/_extract_count.txt")
        cfg = KGConfig(dedupe_extraction=True)
        out = extract_chunks(chunks, cfg, CountingExtractor).to_pandas()
        processed = sum(int(x) for x in open("/tmp/_extract_count.txt"))
        assert processed == 2          # unique chunk texts, not 3 rows
        assert len(out) == 3           # every (chunk, doc) occurrence re-attributed
        assert set(out["doc_id"]) == {"d1", "d2", "d3"}
        raws = out[out["chunk_id"] == cid]["raw"]
        assert raws.nunique() == 1 and "ALFA BETA" in raws.iloc[0]


class TestCacheManager:
    def test_exact_and_context_keys(self, tmp_path):
        from graph_rag_agent_ray.state.cache import CacheManager, HybridBackend
        cm = CacheManager(HybridBackend(str(tmp_path / "c")))
        cm.set("what is sony", {"answer": 42})
        assert cm.get("what is sony") == {"answer": 42}
        # different context → different key → miss (no sim hit: different ctx
        # but same query text embeds identically → similarity fallback fires)
        got = cm.get("what is sony", context=["earlier turn"])
        assert got == {"answer": 42}
        assert cm.similarity_hits >= 1

    def test_similarity_fallback_and_threshold(self):
        from graph_rag_agent_ray.state.cache import CacheManager
        cm = CacheManager(similarity_threshold=0.9)
        cm.set("the organization velkor zanthe", "cached!")
        assert cm.get("the organization velkor zanthe inc") == "cached!"
        assert cm.get("a completely different unrelated topic") is None
        s = cm.stats()
        assert s["similarity_hits"] == 1 and s["misses"] == 1

    def test_disk_survives_new_manager(self, tmp_path):
        from graph_rag_agent_ray.state.cache import CacheManager, DiskBackend
        d = str(tmp_path / "disk")
        CacheManager(DiskBackend(d)).set("q1", [1, 2, 3])
        cm2 = CacheManager(DiskBackend(d))
        assert cm2.get("q1") == [1, 2, 3]

    def test_memory_lru_eviction(self):
        from graph_rag_agent_ray.state.cache import MemoryBackend
        mb = MemoryBackend(max_items=2)
        mb.set("a", 1); mb.set("b", 2); mb.set("c", 3)
        assert mb.get("a") is None and mb.get("c") == 3


class TestDistributedCommunities:
    def test_matches_driver_on_clear_components(self, ray_session):
        import pandas as pd
        import ray.data as rd
        import pyarrow as pa
        from graph_rag_agent_ray.config import KGConfig
        from graph_rag_agent_ray.stages.communities import (
            detect_communities, detect_communities_distributed)

        # two unambiguous triangles + an isolated pair
        edges = pd.DataFrame({
            "src": ["a", "b", "c", "p", "q", "r", "x"],
            "dst": ["b", "c", "a", "q", "r", "p", "y"],
            "weight": [1.0] * 7,
        })
        driver = detect_communities(edges, KGConfig())
        ds = rd.from_arrow(pa.table({
            "src": edges["src"], "dst": edges["dst"],
            "weight": pa.array(edges["weight"], pa.float32()),
        }))
        dist = detect_communities_distributed(ds, KGConfig())
        assert set(dist) == set(driver)
        # same groupings at level 0 (communities are unambiguous here)
        def groups(levels_map, level=0):
            g = {}
            for ent, levels in levels_map.items():
                g.setdefault(levels[min(level, len(levels)-1)], set()).add(ent)
            return sorted(map(frozenset, g.values()), key=min)
        assert groups(dist) == groups(driver)
        # deterministic
        dist2 = detect_communities_distributed(ds, KGConfig())
        assert dist == dist2


class TestDistributedAliasRemap:
    def test_join_path_equals_broadcast_path(self, ray_session):
        import pandas as pd
        import pyarrow as pa
        import ray
        import ray.data as rd
        from graph_rag_agent_ray.stages.canonicalize import (
            canonical_triples, canonical_triples_distributed)

        triples = rd.from_arrow(pa.table({
            "subj": ["sony", "Sony Inc", "TOKYO", "acme"],
            "pred": ["located_in"] * 4,
            "obj": ["tokyo", "TOKYO", "JAPAN", "SONY INC"],
            "description": ["d"] * 4,
            "weight": pa.array([1.0] * 4, pa.float32()),
            "chunk_id": ["c1", "c2", "c3", "c4"],
            "doc_id": ["d1", "d1", "d2", "d2"],
        }))
        alias = {"SONY INC": "SONY"}
        broadcast = canonical_triples(
            triples, ray.put(alias)).to_pandas()
        alias_ds = rd.from_arrow(pa.table({
            "member": list(alias), "canonical": list(alias.values())}))
        joined = canonical_triples_distributed(triples, alias_ds).to_pandas()

        key = ["subj", "pred", "obj", "chunk_id"]
        a = sorted(map(tuple, broadcast[key].to_numpy().tolist()))
        b = sorted(map(tuple, joined[key].to_numpy().tolist()))
        assert a == b
        assert ("SONY", "located_in", "TOKYO", "c2") in b  # both endpoints remapped/normalized


class TestDistributedMembershipEndToEnd:
    def test_guard_zero_build_matches_driver_local(self, ray_session, tmp_path,
                                                   monkeypatch):
        """Force the distributed community path (guard = 0 edges) through a
        FULL build: memberships stay a Dataset (detect_communities_distributed_ds
        + hash-join attach) and every output table must match the driver-local
        build value-exactly — crossing MAX_DRIVER_GRAPH_EDGES must never
        change labels (smallest-member renumbering parity)."""
        import ray.data as rd
        from graph_rag_agent_ray import build_kg
        from graph_rag_agent_ray.stages import communities as CM
        from graph_rag_agent_ray.synth import generate
        from tests.test_incremental_delta import _assert_tables_equal

        corpus = generate(n_docs=30, seed=5)
        docs = rd.from_arrow(corpus.documents)
        t_local = build_kg(docs, str(tmp_path / "loc"), input_token="gl")

        monkeypatch.setattr(CM, "MAX_DRIVER_GRAPH_EDGES", 0)
        t_dist = build_kg(docs, str(tmp_path / "dist"), input_token="gd")
        _assert_tables_equal(
            t_dist, t_local,
            ("entities", "edges", "communities", "triples_canon"))

    def test_entities_fast_path_matches_shuffle_path(self, ray_session,
                                                     tmp_path, monkeypatch):
        """The driver-local final-entities fast path (merge + attach on the
        driver, no canonicalize shuffle) must be value-identical to the
        map_batches/shuffle path it replaces — only row order may differ."""
        import ray.data as rd
        from graph_rag_agent_ray import build_kg
        from graph_rag_agent_ray.pipelines import build as B
        from graph_rag_agent_ray.synth import generate
        from tests.test_incremental_delta import _assert_tables_equal

        corpus = generate(n_docs=30, seed=7)
        docs = rd.from_arrow(corpus.documents)
        t_fast = build_kg(docs, str(tmp_path / "fast"), input_token="ef")

        monkeypatch.setattr(B, "MAX_DRIVER_ENTITY_ROWS", -1)
        t_shuf = build_kg(docs, str(tmp_path / "shuf"), input_token="es")
        _assert_tables_equal(t_shuf, t_fast, ("entities",))
