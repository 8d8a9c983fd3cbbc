"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().

- ``entry()``: flagship KG build (synthetic interleaved-doc corpus, the
  BASELINE.json input shape) → canonical triples Dataset.
- ``queries()``: one callable per implemented operator (SURVEY.md §2 plus the
  training-data ops). SQL-checkable ops run over the driver's parquet tables
  (documents/embeddings); the KG pipeline ops run over the deterministic
  synthetic interleaved corpus (the LLM-extraction semantics are not
  SQL-expressible — driver records rows-only checks for those).
- ``oracle_sql()``: exact DuckDB equivalents for every SQL-expressible query,
  with matching column names.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any, Dict

import pyarrow as pa

import ray.data as rd

from graph_rag_agent_ray import build_kg
from graph_rag_agent_ray.ops import dedup as D
from graph_rag_agent_ray.ops import export as EX
from graph_rag_agent_ray.ops import analytics as AN
from graph_rag_agent_ray.ops import relational as R
from graph_rag_agent_ray.ops import search as SE
from graph_rag_agent_ray.ops import similarity as SIM
from graph_rag_agent_ray.ops import sketches as SK
from graph_rag_agent_ray.ops import spans as SP
from graph_rag_agent_ray.ops import textstats as TS
from graph_rag_agent_ray.ops import windows as W
from graph_rag_agent_ray.ops.multimodal import decode_media, media_from_documents
from graph_rag_agent_ray.sources.documents import read_flat_documents
from graph_rag_agent_ray.stages.chunker import assemble_document
from graph_rag_agent_ray.synth import generate


def _clean():
    from graph_rag_agent_ray.ops import clean
    return clean


def _graphstats():
    from graph_rag_agent_ray.ops import graphstats
    return graphstats


def _linalg():
    from graph_rag_agent_ray.ops import linalg
    return linalg

_KG_CACHE: Dict[str, dict] = {}


def _docs(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _emb(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _events(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["event_id", "ts", "user_id", "value"])


def _events_typed(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"])


def _tbl(sf_dir: str, name: str, columns=None) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


STRATA_RATES = {"HOUSEHOLD": 0.5, "MACHINERY": 0.2, "FURNITURE": 0.05}
QUOTAS = {"en": 50, "zh": 30, "de": 20}
TOKEN_BUDGETS = {"en": 20000, "zh": 8000}


KG_TRUTH_DIR = "/tmp/graft_kg_truth/current"


def _write_kg_truth(corpus) -> None:
    """Planted ground truth for the kg_* oracle queries, derived ONLY from
    the generator's emission log (never from pipeline output): the driver
    reads these parquet files via read_parquet() in oracle_sql(). Written on
    every _kg_tables() call so the truth always matches the sf the driver is
    currently querying (queries run before their oracle)."""
    import pyarrow.parquet as pq

    os.makedirs(KG_TRUTH_DIR, exist_ok=True)
    import pandas as pd

    mref = corpus.mentions_ref.to_pandas()
    tref = corpus.triples_ref.to_pandas()

    pq.write_table(corpus.assembled_ref, f"{KG_TRUTH_DIR}/kg_chunks.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            mref.drop_duplicates().sort_values(["doc_id", "entity_id"]),
            preserve_index=False),
        f"{KG_TRUTH_DIR}/kg_mentions.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            tref[["doc_id", "subj", "pred", "obj"]].drop_duplicates(),
            preserve_index=False),
        f"{KG_TRUTH_DIR}/kg_triples.parquet")
    ents = (mref.drop_duplicates().groupby("entity_id")["doc_id"].nunique()
            .reset_index(name="n_docs"))
    ents["entity_type"] = ents["entity_id"].map(corpus.entity_types)
    pq.write_table(
        pa.Table.from_pandas(ents[["entity_id", "entity_type", "n_docs"]],
                             preserve_index=False),
        f"{KG_TRUTH_DIR}/kg_entities.parquet")
    edges = (tref.groupby(["subj", "pred", "obj"], sort=False)["weight"]
             .max().reset_index())
    edges = edges.rename(columns={"subj": "src", "obj": "dst"})
    pq.write_table(pa.Table.from_pandas(edges, preserve_index=False),
                   f"{KG_TRUTH_DIR}/kg_edges.parquet")
    # communities: planted clusters over participating entities, canonical
    # numbering = clusters ordered by their lexicographically smallest member
    participants = sorted(set(mref["entity_id"]))
    clusters: Dict[int, list] = {}
    for e in participants:
        clusters.setdefault(corpus.cluster_of[e], []).append(e)
    ordered = sorted(clusters.values(), key=min)
    rows = [(e, num) for num, members in enumerate(ordered) for e in members]
    comm = pd.DataFrame(rows, columns=["entity_id", "community_number"])
    pq.write_table(pa.Table.from_pandas(comm, preserve_index=False),
                   f"{KG_TRUTH_DIR}/kg_communities.parquet")
    # media inventory truth: every non-text span + the decode stage's
    # feature-dim contract (independent pandas walk over the input spans)
    from graph_rag_agent_ray.ops.multimodal import FEATURE_DIM
    m_rows = []
    for doc_id, spans in zip(corpus.documents.column("doc_id").to_pylist(),
                             corpus.documents.column("spans").to_pylist()):
        for s in spans or []:
            if s["kind"] != "text":
                m_rows.append((doc_id, s["media_ref"], s["kind"], FEATURE_DIM))
    media = pd.DataFrame(m_rows, columns=["doc_id", "media_ref", "kind",
                                          "n_features"])
    pq.write_table(pa.Table.from_pandas(media, preserve_index=False),
                   f"{KG_TRUTH_DIR}/media_features.parquet")
    # frame-sampling truth: images yield one frame at ts 0, temporal media
    # (audio/video) n_frames uniform samples — mirrors ops/multimodal
    # SampleFrames' documented contract, computed independently here
    N_FRAMES, DUR_MS = 4, 4000
    f_rows = []
    for doc_id, ref, kind, _fd in m_rows:
        n = 1 if kind == "image" else N_FRAMES
        step = DUR_MS // N_FRAMES
        for i in range(n):
            f_rows.append((doc_id, ref, kind, i, i * step))
    frames = pd.DataFrame(f_rows, columns=["doc_id", "media_ref", "kind",
                                           "frame_idx", "ts_ms"])
    pq.write_table(pa.Table.from_pandas(frames, preserve_index=False),
                   f"{KG_TRUTH_DIR}/media_frames.parquet")


def _kg_tables(sf_dir: str) -> dict:
    """Build (or reuse) the KG over the deterministic synthetic corpus sized
    by the scale factor. Snapshots under /tmp make repeat calls cheap."""
    if sf_dir in _KG_CACHE:
        _write_kg_truth(_KG_CACHE[sf_dir]["_corpus"])
        return _KG_CACHE[sf_dir]
    n_docs = 200 if "0.01" in sf_dir else (800 if "0.1" in sf_dir else 60)
    token = hashlib.sha1(f"kgq|{n_docs}|42|r2".encode()).hexdigest()[:12]
    out_dir = os.path.join("/tmp", "graft_kg", token)
    corpus = generate(n_docs=n_docs, seed=42)
    tables = build_kg(rd.from_arrow(corpus.documents), out_dir, input_token=token)
    tables["_corpus"] = corpus
    _write_kg_truth(corpus)
    _KG_CACHE[sf_dir] = tables
    return tables


def entry() -> Any:
    """Flagship: full KG construction on the sf0.001-scale synthetic corpus;
    returns the canonical edges table (subj/pred/obj graph)."""
    return _kg_tables("/root/testdata/sf0.001")["edges"]


# ---------------------------------------------------------------------------

def _span_echo(sf_dir: str) -> "rd.Dataset":
    """documents → interleaved spans → assembled text: proves the span
    adapter + assembly is lossless (SQL oracle: identity)."""
    docs = read_flat_documents(f"{sf_dir}/documents.parquet")

    def echo(batch: pa.Table) -> pa.Table:
        texts = [assemble_document(spans)["text"]
                 for spans in batch.column("spans").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": pa.array(texts, pa.string()),
        })

    return docs.map_batches(echo, batch_format="pyarrow", batch_size=1024)


def _chunk_roundtrip(sf_dir: str):
    """Chunk every document with the real token-window chunker, then stitch
    the chunks back at their content offsets — proves the chunker is lossless
    end-to-end (SQL oracle: identity on (doc_id, text))."""
    import pandas as pd

    from graph_rag_agent_ray.stages.chunker import chunk_documents

    docs = read_flat_documents(f"{sf_dir}/documents.parquet")
    chunks = chunk_documents(docs)

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("position")
        end = int((g["content_offset"] + g["length"]).max())
        buf = [" "] * end
        for off, text in zip(g["content_offset"], g["text"]):
            for i, ch in enumerate(text):
                buf[off + i] = ch
        return pd.DataFrame([{"doc_id": g["doc_id"].iloc[0], "text": "".join(buf)}])

    from graph_rag_agent_ray.functions.shuffle import hash_partitioned_groupby

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        frames = [stitch(g) for _, g in df.groupby("doc_id", sort=False)]
        return pd.concat(frames, ignore_index=True)

    return hash_partitioned_groupby(chunks, ["doc_id"], per_bucket, n_buckets=32)


def _kg_chunks_q(sf_dir: str):
    """Chunker losslessness ON the KG corpus: stitch every doc's chunks back
    at their content offsets; must equal the generator's independently
    assembled span text (newlines included — overlap windows cover them)."""
    import pandas as pd

    from graph_rag_agent_ray.functions.shuffle import hash_partitioned_groupby

    chunks = _kg_tables(sf_dir)["chunks"]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, g in df.groupby("doc_id", sort=False):
            g = g.sort_values("position")
            end = int((g["content_offset"] + g["length"]).max())
            buf = [" "] * end
            for off, text in zip(g["content_offset"], g["text"]):
                buf[off:off + len(text)] = list(text)
            frames.append(pd.DataFrame([{
                "doc_id": g["doc_id"].iloc[0], "text": "".join(buf)}]))
        return pd.concat(frames, ignore_index=True)

    return hash_partitioned_groupby(chunks, ["doc_id"], per_bucket, n_buckets=16)


def _kg_mentions_q(sf_dir: str):
    """Distinct (doc_id, entity_id) after canonicalization — chunk-overlap
    insensitive, so it compares exactly against the generator's mention log."""
    from graph_rag_agent_ray.functions.shuffle import drop_duplicate_keys

    mc = _kg_tables(sf_dir)["mentions_canon"]

    def part(batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", "entity_id"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    return drop_duplicate_keys(
        mc.map_batches(part, batch_format="pyarrow", batch_size=16384),
        ["doc_id", "entity_id"], n_buckets=16, map_format="pyarrow")


def _kg_triples_q(sf_dir: str):
    """Distinct canonical (doc_id, subj, pred, obj) fact instances."""
    from graph_rag_agent_ray.functions.shuffle import drop_duplicate_keys

    tc = _kg_tables(sf_dir)["triples_canon"]

    def part(batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", "subj", "pred", "obj"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    return drop_duplicate_keys(
        tc.map_batches(part, batch_format="pyarrow", batch_size=16384),
        ["doc_id", "subj", "pred", "obj"], n_buckets=16,
        map_format="pyarrow")


def _kg_entities_q(sf_dir: str):
    """(entity_id, entity_type, n_docs): canonical entities with the count of
    distinct documents mentioning them (overlap-insensitive)."""
    import pandas as pd

    from graph_rag_agent_ray.functions.shuffle import hash_join, hash_partitioned_groupby

    t = _kg_tables(sf_dir)
    ents = t["entities"].select_columns(["entity_id", "entity_type"])

    def part(batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", "entity_id"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = t["mentions_canon"].map_batches(part, batch_format="pyarrow",
                                            batch_size=16384)
    ndocs = hash_partitioned_groupby(
        pairs, ["entity_id"],
        lambda df: df.drop_duplicates().groupby("entity_id")["doc_id"]
        .nunique().reset_index(name="n_docs"),
        n_buckets=16, map_format="pyarrow")
    return hash_join(ents, ndocs, on=["entity_id"], n_buckets=16)


def _kg_edges_q(sf_dir: str):
    return _kg_tables(sf_dir)["edges"].select_columns(
        ["src", "pred", "dst", "weight"])


def _kg_degree_dist_q(sf_dir: str):
    from graph_rag_agent_ray.ops import graphstats as G
    return G.degree_distribution(_kg_tables(sf_dir)["edges"])


def _kg_triangles_q(sf_dir: str):
    from graph_rag_agent_ray.ops import graphstats as G
    return G.triangle_count(_kg_tables(sf_dir)["edges"])


def _kg_pagerank_q(sf_dir: str):
    from graph_rag_agent_ray.ops import graphstats as G
    return G.pagerank(_kg_tables(sf_dir)["edges"], n_buckets=8)


def _kg_ppr_q(sf_dir: str):
    from graph_rag_agent_ray.ops import graphstats as G
    return G.personalized_pagerank(_kg_tables(sf_dir)["edges"], n_buckets=8)


def _kg_harmonic_q(sf_dir: str):
    from graph_rag_agent_ray.ops import graphstats as G
    return G.landmark_harmonic(_kg_tables(sf_dir)["edges"], n_buckets=8)


def _kg_components_q(sf_dir: str):
    from graph_rag_agent_ray.ops import graphstats as G
    return G.weakly_connected(_kg_tables(sf_dir)["edges"], n_buckets=8)


def _kg_kcore_q(sf_dir: str):
    from graph_rag_agent_ray.ops import graphstats as G
    return G.kcore(_kg_tables(sf_dir)["edges"], k=3, n_buckets=8)


def _kg_communities_q(sf_dir: str):
    """(entity_id, community_number) at the FINAL detection level — compared
    against the generator's planted partition (canonically numbered)."""
    ents = _kg_tables(sf_dir)["entities"]

    def final_level(batch: pa.Table) -> pa.Table:
        ids, nums = [], []
        for eid, comm in zip(batch.column("entity_id").to_pylist(),
                             batch.column("community").to_pylist()):
            if comm:
                ids.append(eid)
                nums.append(int(comm[-1]))
        return pa.table({
            "entity_id": pa.array(ids, pa.string()),
            "community_number": pa.array(nums, pa.int64()),
        })

    return ents.map_batches(final_level, batch_format="pyarrow", batch_size=8192)


def _kg_coverage_q(sf_dir: str):
    """Per-type entity coverage of the BUILT entities table against the
    planted golden entity set (reference EntityCoverageMetric semantics,
    evaluator/metrics/graph_metrics.py:1009-1062, as exact id+type matching
    over the build output instead of question-keyword lookup). A dropped or
    mis-typed entity shows up as n_built/n_matched diverging from n_truth."""
    import pandas as pd

    from graph_rag_agent_ray.evaluate import entity_coverage_stats

    ents = (_kg_tables(sf_dir)["entities"]
            .select_columns(["entity_id", "entity_type"]).to_pandas())
    truth = pd.read_parquet(f"{KG_TRUTH_DIR}/kg_entities.parquet")
    return entity_coverage_stats(ents, truth[["entity_id", "entity_type"]])


def _kg_subgraph_quality_q(sf_dir: str):
    """Per-community density inputs over the BUILT graph (reference
    SubgraphQualityMetric's density half, evaluator/metrics/graph_metrics.py:
    242-330, over build output): members, intra-community edges, possible
    pairs — exact integers, so the SQL oracle reproduces them from the
    planted clusters + golden edges."""
    import pandas as pd

    from graph_rag_agent_ray.evaluate import subgraph_quality_stats

    membership = _kg_communities_q(sf_dir).to_pandas()
    edges = (_kg_tables(sf_dir)["edges"]
             .select_columns(["src", "pred", "dst"]).to_pandas())
    return subgraph_quality_stats(membership, edges)


def _kg_retrieval_precision_q(sf_dir: str):
    """Deterministic core of the reference's RetrievalPrecision metric
    (evaluator/metrics/retrieval_metrics.py:54-129) over the BUILT KG:
    per document, 'retrieved' = the lexicographic top-3 of its canonical
    mentions (a deterministic stand-in for local_search's ranked entity
    retrieval) and 'referenced' = the full golden mention set; the output
    is the metric's integer matching inputs (direct substring matches and
    digit-run matches via evaluate.retrieval_match_counts) so the SQL
    oracle reproduces them exactly — the 0.3/0.7 scoring on top is
    evaluate.retrieval_precision, pinned by tests."""
    import pandas as pd

    from graph_rag_agent_ray.evaluate import retrieval_match_counts
    from graph_rag_agent_ray.functions.shuffle import hash_partitioned_groupby

    mc = _kg_tables(sf_dir)["mentions_canon"]

    def part(batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", "entity_id"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = mc.map_batches(part, batch_format="pyarrow", batch_size=16384)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, g in df.groupby("doc_id", sort=False):
            ref = sorted(set(g["entity_id"].str.lower()))
            retr = ref[:3]
            direct, num = retrieval_match_counts(retr, ref)
            rows.append((doc_id, len(retr), len(ref), direct, num))
        return pd.DataFrame(rows, columns=[
            "doc_id", "n_retrieved", "n_referenced",
            "n_matched_direct", "n_matched_num"])

    return hash_partitioned_groupby(pairs, ["doc_id"], per_bucket,
                                    n_buckets=16, map_format="pyarrow")


_INC_CACHE: Dict[str, "rd.Dataset"] = {}


def _kg_incremental_q(sf_dir: str):
    """Incremental-update path under the hard gate: tick 0 builds the base
    corpus, tick 1 incrementally adds exact-duplicate documents (registry
    diff → carry-over of unchanged chunks/extractions/embeddings → rebuild).
    The final canonical per-doc triples must equal the generator's ground
    truth for the FULL corpus — i.e. the incremental build must be
    indistinguishable from a fresh build."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    from graph_rag_agent_ray.functions.shuffle import drop_duplicate_keys
    from graph_rag_agent_ray.pipelines.incremental import (
        incremental_build_kg, write_registry)
    from graph_rag_agent_ray.pipelines.build import build_kg as _build

    n_docs = 200 if "0.01" in sf_dir else (800 if "0.1" in sf_dir else 60)
    gen2 = generate(n_docs=n_docs, seed=42, dup_rate=0.15)
    # truth: distinct per-doc canonical triples of the FULL (v2) corpus
    import pandas as pd
    os.makedirs(KG_TRUTH_DIR, exist_ok=True)
    tref = gen2.triples_ref.to_pandas()[["doc_id", "subj", "pred", "obj"]]
    pq.write_table(
        pa.Table.from_pandas(tref.drop_duplicates(), preserve_index=False),
        f"{KG_TRUTH_DIR}/kg_incremental.parquet")
    if sf_dir in _INC_CACHE:
        return _INC_CACHE[sf_dir]

    v2 = rd.from_arrow(gen2.documents)
    v1 = v2.filter(
        lambda row: not str(row["doc_id"]).startswith("dup-"))
    token = hashlib.sha1(f"kginc|{n_docs}|42".encode()).hexdigest()[:12]
    base = os.path.join("/tmp", "graft_kg_inc", token)
    t0_dir, t1_dir = f"{base}/tick0", f"{base}/tick1"
    if not os.path.exists(f"{t1_dir}/_lineage.jsonl"):
        _build(v1, t0_dir, input_token=token + "v1")
        write_registry(v1, t0_dir, input_token=token + "v1")
        tables, _delta = incremental_build_kg(
            v2, t1_dir, t0_dir, input_token=token + "v2")
    else:
        tables = _build(v2, t1_dir, input_token=token + "v2")  # cached resume
    tc = tables["triples_canon"]

    def part(batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", "subj", "pred", "obj"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    out = drop_duplicate_keys(
        tc.map_batches(part, batch_format="pyarrow", batch_size=16384),
        ["doc_id", "subj", "pred", "obj"], n_buckets=16)
    _INC_CACHE[sf_dir] = out
    return out


def _media_features_q(sf_dir: str):
    """Media decode plumbing over the KG corpus: extract media spans →
    actor-pool decode (deterministic fake features) → inventory projection
    (doc_id, media_ref, kind, n_features)."""
    corpus = _kg_tables(sf_dir)["_corpus"]
    feats = decode_media(media_from_documents(rd.from_arrow(corpus.documents)))

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": batch.column("media_ref"),
            "kind": batch.column("kind"),
            "n_features": pa.array(
                [len(f) for f in batch.column("feature").to_pylist()],
                pa.int64()),
        })

    return feats.map_batches(project, batch_format="pyarrow", batch_size=4096)


def _media_frames_q(sf_dir: str):
    """Frame-sampling plumbing: media spans → actor-pool SampleFrames
    (uniform timestamps; stills degenerate to one frame) → projection
    (doc_id, media_ref, kind, frame_idx, ts_ms) checked against the
    independently-planted truth table."""
    from graph_rag_agent_ray.ops.multimodal import sample_frames

    corpus = _kg_tables(sf_dir)["_corpus"]
    frames = sample_frames(media_from_documents(rd.from_arrow(corpus.documents)),
                           n_frames=4, duration_ms=4000)
    return frames.drop_columns(["frame"])


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {
        # --- span plumbing + text analysis (SQL-checked) ---
        "span_echo": _span_echo,
        "chunk_roundtrip": _chunk_roundtrip,
        "token_count": lambda sf: TS.token_count(_docs(sf)),
        # BPE-ish piece count (GPT-2-style pre-tokenizer, RE2-safe):
        # the token-budget estimator a token-priced pipeline runs
        # before the real tokenizer; one vectorized regex scan
        "bpe_token_count": lambda sf: TS.bpe_token_count(_docs(sf)),
        "text_quality": lambda sf: TS.text_quality(_docs(sf)),
        "lang_feature": lambda sf: TS.lang_feature(_docs(sf)),
        "lang_id": lambda sf: TS.lang_id(_docs(sf)),
        "fingerprint_md5": lambda sf: TS.fingerprint(_docs(sf)),
        # --- dedup (SQL-checked where exact) ---
        "exact_dedup": lambda sf: D.exact_dedup(_docs(sf)),
        "embedding_neardup": lambda sf: D.embedding_neardup_pairs(_emb(sf), threshold=0.35),
        # --- similarity search (SQL-checked) ---
        "knn_topk": lambda sf: SIM.knn_bruteforce(
            _emb(sf), query_ids=range(8), k=10
        ).drop_columns(["sim"]),
        # --- stream-shaped windowed aggregates over events (SQL-checked) ---
        "tumbling_window": lambda sf: W.tumbling_window(_events(sf), size_s=3600),
        "sliding_window": lambda sf: W.sliding_window(_events(sf), size_s=3600, slide_s=900),
        "session_window": lambda sf: W.session_window(_events(sf), gap_s=1800),
        # --- SQL-exact approximate dedup (full-pipeline DuckDB oracles) ---
        "minhash_dups": lambda sf: D.minhash_duplicate_pairs(_docs(sf), threshold=0.7),
        "simhash_dups": lambda sf: D.simhash_duplicate_pairs(_docs(sf), max_hamming=3),
        "ngram_jaccard": lambda sf: D.ngram_jaccard_pairs(_docs(sf), n=3, threshold=0.5),
        "winnow_fps": lambda sf: TS.winnow_fingerprints(_docs(sf)),
        # substring-granular near-dup: pairs sharing winnowing fingerprints
        "winnow_shared": lambda sf: D.winnow_shared_pairs(
            _docs(sf), min_shared=2, max_df=64),
        # corpus cleaning (C4-style): boilerplate lines + PII masking
        "boilerplate_stats": lambda sf: _clean().boilerplate_stats(_docs(sf), min_df=2),
        "mask_pii": lambda sf: _clean().mask_pii(_docs(sf)),
        # Gopher repetition signals + C4-style keep/drop filter
        "gopher_repetition": lambda sf: TS.gopher_repetition(_docs(sf)),
        "quality_filter": lambda sf: TS.quality_filter(_docs(sf), min_words=5),
        # corpus-unigram-LM scoring (perplexity-filter shape): integer
        # surrogate columns hash-compare; mean_logp is float-derived and
        # dropped like knn's sim
        "unigram_rarity": lambda sf: TS.unigram_rarity(
            _docs(sf)).drop_columns(["mean_logp"]),
        # per-doc tf-idf keyword extraction (the corpus-statistics form of
        # the reference's query-side keyword seeding); float score dropped
        "tfidf_keywords": lambda sf: SE.tfidf_keywords(
            _docs(sf), k=5).drop_columns(["score"]),
        # multi-probe IVF at full Hamming coverage (n_probes=2^n_bits) is
        # EXACT, so the bucketize/probe/partial-topk/merge machinery verifies
        # against the same SQL oracle as brute force; the approximate default
        # config's recall@10 is measured in bench instead
        "knn_ivf": lambda sf: SIM.knn_ivf(
            _emb(sf), query_ids=range(8), k=10, n_bits=2, n_probes=4
        ).drop_columns(["sim"]),
        # trained-centroid IVF probing ALL cells is exact too — verifies the
        # k-means train/assign/probe machinery against the brute-force oracle;
        # the approximate config's recall@10 is measured in bench
        "knn_ivf_trained": lambda sf: SIM.knn_ivf_trained(
            _emb(sf), query_ids=range(8), k=10, n_centroids=8, n_probes=8
        ).drop_columns(["sim"]),
        # IVF-PQ probing all cells with rerank >= batch size prunes nothing,
        # so the exact-cosine rerank makes it exact — verifies the coarse
        # assign + residual encode + ADC scan plumbing against the same
        # oracle; the compressed approximate config's recall@10 is in bench
        "knn_ivf_pq": lambda sf: SIM.knn_ivf_pq(
            _emb(sf), query_ids=range(8), k=10, n_centroids=8, m=8,
            n_codes=64, n_probes=8, rerank=4096
        ).drop_columns(["sim"]),
        # knobs COMPUTED, not hand-tuned: n_bits from corpus size
        # (auto_neardup_bits) and n_tables from the OR-construction recall
        # rule at target 1-1e-6 (auto_lsh_tables → 30 tables at this
        # threshold/bits, vs the previously hand-calibrated 32). Recall is a
        # config/corpus property, so the gate re-verifies exactness per run
        "embedding_neardup_blocked": lambda sf: D.embedding_neardup_blocked(
            _emb(sf), threshold=0.35, n_bits=None, n_tables=None),
        # distributed linear algebra: integer-exact quantized Gram matrix
        # (the one distributed step under PCA/whitening — per-batch d x d
        # matmul combine, one scalar shuffle of d^2 partials per block;
        # eigendecomposition happens on the driver over the d x d result)
        "embedding_gram": lambda sf: _linalg().gram_matrix(_emb(sf)),
        # --- KG construction pipeline (synthetic interleaved corpus) ---
        # Each query is a deterministic projection of a pipeline table and is
        # hash-compared against PLANTED ground truth parquet the generator
        # emits independently (read_parquet in oracle_sql) — the extraction→
        # linking→canonicalization→community chain is verified end-to-end.
        # relational / stream ops over the events + documents tables
        "asof_join": lambda sf: R.asof_join(_events_typed(sf), "click", "purchase"),
        "group_topk": lambda sf: R.group_topk(_events(sf), k=3),
        "hash_sample": lambda sf: R.hash_sample(
            rd.read_parquet(f"{sf}/documents.parquet",
                            columns=["doc_id", "n_chars"]), rate=0.25),
        "token_shards": lambda sf: R.token_shards(_docs(sf), budget=5000),
        # near-dup RESOLUTION: simhash pairs -> connected components ->
        # smallest-id representative (the keep/drop decision after pairing)
        "neardup_components": lambda sf: D.duplicate_components(
            D.simhash_duplicate_pairs(_docs(sf), max_hamming=3)),
        # full keep/drop policy applied to the corpus: survivors after
        # dropping every doc dominated by a smaller-id near-duplicate
        # (broadcast is_in below 2M dominated ids, hash anti-join above)
        "neardup_resolve": lambda sf: D.resolve_duplicates(
            _tbl(sf, "documents", ["doc_id", "lang", "n_chars"]),
            D.simhash_duplicate_pairs(_docs(sf), max_hamming=3)),
        # analytical shapes over the relational side tables (ops/analytics):
        # map-side-combined rollup, partitioned hash join, broadcast
        # dimension join, exact per-group quantiles, deterministic samplers,
        # two-phase exact distinct — integer-cents money arithmetic keeps
        # every aggregate order-independent and hash-exact vs DuckDB
        "pricing_summary": lambda sf: AN.pricing_summary(
            _tbl(sf, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity",
                                  "l_extendedprice", "l_discount", "l_tax"])),
        "order_revenue": lambda sf: AN.order_revenue_rollup(
            _tbl(sf, "lineitem", ["l_orderkey", "l_returnflag",
                                  "l_extendedprice", "l_discount"]),
            _tbl(sf, "orders", ["o_orderkey", "o_orderpriority"])),
        "segment_sales": lambda sf: AN.segment_sales(
            _tbl(sf, "orders", ["o_custkey", "o_orderpriority", "o_totalprice"]),
            _tbl(sf, "customer", ["c_custkey", "c_mktsegment"])),
        "group_quantiles": lambda sf: AN.group_quantiles(_events_typed(sf)),
        "stratified_sample": lambda sf: AN.stratified_sample(
            _tbl(sf, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"]),
            STRATA_RATES, strata_col="c_mktsegment", key="c_custkey",
            default_rate=0.1),
        "sample_exact_k": lambda sf: AN.sample_exact_k(
            _tbl(sf, "documents", ["doc_id", "n_chars"]), k=50),
        "distinct_per_group": lambda sf: AN.distinct_per_group(
            _events_typed(sf)),
        # SQL window-function family: per-key windows are one hash shuffle
        # + vectorized grouped cumsum; the global running sum is the
        # distributed two-phase prefix scan (O(n_ranges) driver state)
        "user_windows": lambda sf: AN.user_windows(_events_typed(sf)),
        "running_total": lambda sf: AN.running_total(_events_typed(sf)),
        # exact per-group quotas (the training-mix recipe primitive):
        # deterministic smallest-(md5,key) draw per language
        "quota_sample": lambda sf: AN.quota_sample(
            _tbl(sf, "documents", ["doc_id", "lang", "n_chars"]),
            QUOTAS, group_col="lang", default_quota=5),
        # per-group TOKEN budgets (mixture recipes count tokens): scalar
        # rows only shuffle; map-side local-prefix prune is budget-bounded
        "token_budget_sample": lambda sf: AN.token_budget_sample(
            _tbl(sf, "documents", ["doc_id", "lang", "text"]),
            TOKEN_BUDGETS, group_col="lang", default_budget=2000),
        # inequality (band) join via time-bucket co-partitioning — each
        # event meets each incident window in exactly one (key, bucket)
        # partition, so no dedup shuffle (ops/relational.interval_join)
        "interval_join": lambda sf: R.interval_join(
            _events_typed(sf), anchor_type="error", window_s=600),
        # GPT-3/Pile-style benchmark decontamination: docs 0-4 stand in as
        # the held-out benchmark; flag any doc sharing a token n-gram with
        # them (broadcast benchmark grams, shuffle-free corpus scan). n=3
        # here so the synthetic corpus yields a discriminative flag set
        # (~30% hit); production protocol default is n=13
        "contamination": lambda sf: TS.contamination_stats(
            _docs(sf), benchmark_ids=range(5), n=3),
        # composed export manifest: quality filter -> decontaminate ->
        # exact-dedup winners -> global token-shard prefix sum, all in one
        # streaming pipeline (ops/export.training_export)
        # min_words=40 + decontamination discriminate on the synthetic
        # token-stream corpus; the prose-only terminal-punct clause is off
        "training_export": lambda sf: EX.training_export(
            _docs(sf), benchmark_ids=range(5), budget=5000, n=3,
            min_words=40, require_terminal=False),
        # ExactSubstr dedup (Lee et al. 2022): rolling-hash candidates ->
        # substring-verified duplicated positions -> maximal per-doc spans;
        # the strip variant removes every duplicated span
        "duplicate_spans": lambda sf: SP.duplicate_spans(_docs(sf), length=20),
        "strip_dup_spans": lambda sf: SP.strip_duplicate_spans(
            _docs(sf), length=20),
        # heavy-hitter token n-grams (map-side combine before the one
        # gram-keyed shuffle; HAVING runs inside complete-key reducers)
        "frequent_ngrams": lambda sf: TS.frequent_ngrams(
            _docs(sf), n=2, min_count=5),
        # BM25 lexical top-k (keyword retrieval at corpus scale): tiny
        # stats collect -> broadcast idf/avgdl -> per-batch partial top-k;
        # rounded-score + doc_id total order makes it SQL-exact
        "bm25_topk": lambda sf: SE.bm25_topk(
            _docs(sf), terms=["spark", "vector", "customer"], k=20),
        # materialized inverted index (token, doc_id, tf, df): the build-
        # once/serve-many form of the BM25 stats pass; vocabulary-keyed
        # scalar shuffles only, postings never collect to the driver
        "inverted_postings": lambda sf: SE.inverted_postings(
            _docs(sf), min_df=2),
        # one-pass corpus profile (long form): totals + language mix +
        # EXACT token-length quantiles folded from a distinct-length
        # histogram — the pre-flight stats report for a 100 TB pass
        "corpus_profile": lambda sf: TS.corpus_profile(_docs(sf)),
        # row-expanding sentence segmentation (flat_map class): shuffle-
        # free, the base table for sentence-level dedup/decontamination
        "split_sentences": lambda sf: TS.split_sentences(_docs(sf)),
        # HyperLogLog distinct sketch: the register TABLE is deterministic
        # (string registers + integer ranks), so the sketch machinery is
        # hash-exact even though the derived estimate is approximate
        "hll_registers": lambda sf: SK.hll_registers(
            _tbl(sf, "events", ["event_type", "user_id"])),
        # Count-Min frequency sketch: same determinism design — integer
        # register sums are associative, so the table is hash-exact
        "cms_registers": lambda sf: SK.cms_registers(
            _tbl(sf, "events", ["event_type"])),
        # fixed-grid histogram sketch (distribution companion): integer-
        # cents bins over the global [lo, hi] — register table hash-exact
        "hist_registers": lambda sf: SK.hist_registers(
            _tbl(sf, "events", ["event_type", "value"])),
        "kg_chunks": _kg_chunks_q,
        "kg_mentions": _kg_mentions_q,
        "kg_triples": _kg_triples_q,
        "kg_entities": _kg_entities_q,
        "kg_edges": _kg_edges_q,
        # graph metrics over the canonical edge graph (GDS degree-projection
        # parity): distinct-neighbour degree histogram + exact triangle
        # count via degree-oriented wedge enumeration (skew-bounded)
        "kg_degree_dist": _kg_degree_dist_q,
        "kg_triangles": _kg_triangles_q,
        # important-node ranking, the reference's nx.pagerank over its
        # assembled KG (search/tool/reasoning/kg_builder.py:293-298):
        # truncated power iteration as 2*iters scalar shuffles over the
        # aggregated entity graph; ppb integer surrogate for the hash gate
        "kg_pagerank": _kg_pagerank_q,
        # personalized PageRank: restart mass on a deterministic seed set —
        # the closed-form of local_search's "relevance to query entities"
        # fan-out (search/local_search.py:40-133); same 2*iters scalar
        # shuffles as pagerank, seeds picked by partial min-k
        "kg_ppr": _kg_ppr_q,
        # landmark harmonic centrality: truncated multi-source BFS from
        # deterministic landmarks; exact-integer 1/LCM(1..iters) units so
        # the hash gate needs no float grid at all
        "kg_harmonic": _kg_harmonic_q,
        # WCC over the canonical graph (GDS wcc parity,
        # graph/processing/similar_entity.py) — distributed min-label
        # propagation with pointer jumping, no driver union-find
        "kg_components": _kg_components_q,
        "kg_kcore": _kg_kcore_q,
        "kg_communities": _kg_communities_q,
        # graph-quality metrics (reference evaluator parity, build-side):
        # per-type entity coverage of the built KG vs the planted golden
        # entity set, and per-community density inputs — integer counts so
        # both verify hash-exact against SQL over the truth tables
        "kg_coverage_stats": _kg_coverage_q,
        "kg_subgraph_quality": _kg_subgraph_quality_q,
        # retrieval-metric core (reference RetrievalPrecision rule path):
        # integer substring/digit-run match counts per document between a
        # deterministic top-3 retrieval and the golden mention set
        "kg_retrieval_precision": _kg_retrieval_precision_q,
        "kg_incremental": _kg_incremental_q,
        # --- multimodal plumbing (stubbed decode, real Ray plumbing):
        # inventory projection (which media spans were found + the decode
        # stage's feature-dim contract) verifies against the generator's
        # span log; feature VALUES stay unverifiable until a real codec ---
        "media_features": _media_features_q,
        "media_frames": _media_frames_q,
    }
    return q


def oracle_sql() -> dict[str, str]:
    from graph_rag_agent_ray.ops import oracles as O

    # ordering insurance: if the driver evaluates an oracle before its query
    # has run (truth files are normally written during query execution),
    # plant truth now — pure numpy, ~1 s, and identical to what the queries
    # would write. Sized from the sf the driver is configured to grade
    # (GRAFT_SF_DIR when set; the correctness gate default is sf0.01 →
    # n_docs=200), and covers kg_incremental via the same dup_rate=0.15
    # generation the incremental query uses. Never overwrites truth already
    # written by a query run.
    if not os.path.exists(f"{KG_TRUTH_DIR}/kg_triples.parquet"):
        _sf = os.environ.get("GRAFT_SF_DIR", "sf0.01")
        _nd = 200 if "0.01" in _sf else (800 if "0.1" in _sf else 60)
        _write_kg_truth(generate(n_docs=_nd, seed=42))
        if not os.path.exists(f"{KG_TRUTH_DIR}/kg_incremental.parquet"):
            import pyarrow.parquet as _pq
            _tref = (generate(n_docs=_nd, seed=42, dup_rate=0.15)
                     .triples_ref.to_pandas()[["doc_id", "subj", "pred", "obj"]])
            _pq.write_table(
                pa.Table.from_pandas(_tref.drop_duplicates(), preserve_index=False),
                f"{KG_TRUTH_DIR}/kg_incremental.parquet")

    ws = r"'\s+'"
    n_tokens = (
        "CASE WHEN trim(text, ' \t\n\r') = '' THEN 0 "
        f"ELSE array_length(regexp_split_to_array(trim(text, ' \t\n\r'), {ws})) END"
    )
    return {
        "span_echo": "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents",
        "chunk_roundtrip": "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents",
        "token_count": f"SELECT doc_id, CAST({n_tokens} AS BIGINT) AS n_tokens FROM documents",
        "bpe_token_count": TS.bpe_token_count_sql(),
        "text_quality": f"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
                   CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
                   CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
                   CAST({n_tokens} AS BIGINT) AS n_tokens
            FROM documents
        """,
        "lang_feature": """
            SELECT doc_id,
                   CAST((length(text) - length(replace(text, ' the ', ''))) // 5 AS BIGINT) AS n_the,
                   (CAST((length(text) - length(replace(text, ' the ', ''))) // 5 AS BIGINT) * 200
                    > length(text)) AS en_like
            FROM documents
        """,
        "lang_id": O.lang_id_sql(),
        "fingerprint_md5": "SELECT doc_id, md5(text) AS fp FROM documents",
        "tumbling_window": """
            SELECT user_id,
                   (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
                   COUNT(*) AS n_events,
                   round(SUM(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "sliding_window": """
            SELECT user_id,
                   (epoch_us(ts) // 900000000) * 900000000
                     - hop.i * 900000000 AS window_start_us,
                   COUNT(*) AS n_events,
                   round(SUM(value), 6) AS sum_value
            FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS i) hop
            GROUP BY 1, 2
        """,
        "session_window": """
            WITH ordered AS (
                SELECT user_id, event_id, value, epoch_us(ts) AS tus,
                       LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS prev
                FROM events
            ), flagged AS (
                SELECT *, CASE WHEN prev IS NULL OR tus - prev > 1800000000
                               THEN 1 ELSE 0 END AS new_s
                FROM ordered
            ), sessioned AS (
                SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                                           ORDER BY tus, event_id
                                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM flagged
            )
            SELECT user_id,
                   MIN(tus) AS session_start_us,
                   MAX(tus) AS session_end_us,
                   COUNT(*) AS n_events,
                   round(SUM(value), 6) AS sum_value,
                   MAX(tus) - MIN(tus) AS duration_us
            FROM sessioned GROUP BY user_id, sid
        """,
        "exact_dedup": """
            SELECT md5(text) AS text_hash,
                   MIN(doc_id) AS keep_doc_id,
                   COUNT(*) AS n_dups
            FROM documents GROUP BY md5(text)
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding, b.embedding), 6) >= 0.35
        """,
        # the LSH-blocked scale path is graded against the same exact-pair
        # definition: at (n_bits=2, n_tables=16) its recall is 1.0 on this
        # corpus, so any missed pair is a real regression the driver catches
        "embedding_neardup_blocked": """
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding, b.embedding), 6) >= 0.35
        """,
        # quantized Gram sums are integer-exact on both sides (HUGEINT in
        # SQL, Python-int reduce in Ray) — no float-order sensitivity
        "embedding_gram": _linalg().gram_matrix_sql(table="embeddings"),
        # --- kg_* planted-truth oracles: the generator writes ground-truth
        # parquet (emission log, independent of the pipeline) to KG_TRUTH_DIR
        # when the matching query runs; DuckDB reads it back here ---
        "kg_chunks": f"SELECT doc_id, text FROM read_parquet('{KG_TRUTH_DIR}/kg_chunks.parquet')",
        "kg_mentions": f"SELECT doc_id, entity_id FROM read_parquet('{KG_TRUTH_DIR}/kg_mentions.parquet')",
        "kg_triples": f"SELECT doc_id, subj, pred, obj FROM read_parquet('{KG_TRUTH_DIR}/kg_triples.parquet')",
        "kg_entities": f"SELECT entity_id, entity_type, n_docs FROM read_parquet('{KG_TRUTH_DIR}/kg_entities.parquet')",
        "kg_edges": f"SELECT src, pred, dst, weight FROM read_parquet('{KG_TRUTH_DIR}/kg_edges.parquet')",
        "kg_degree_dist": _graphstats().degree_distribution_sql(
            f"{KG_TRUTH_DIR}/kg_edges.parquet"),
        "kg_triangles": _graphstats().triangle_count_sql(
            f"{KG_TRUTH_DIR}/kg_edges.parquet"),
        "kg_pagerank": _graphstats().pagerank_sql(
            f"{KG_TRUTH_DIR}/kg_edges.parquet"),
        "kg_ppr": _graphstats().personalized_pagerank_sql(
            f"{KG_TRUTH_DIR}/kg_edges.parquet"),
        "kg_harmonic": _graphstats().landmark_harmonic_sql(
            f"{KG_TRUTH_DIR}/kg_edges.parquet"),
        "kg_components": _graphstats().weakly_connected_sql(
            f"{KG_TRUTH_DIR}/kg_edges.parquet"),
        "kg_kcore": _graphstats().kcore_sql(
            f"{KG_TRUTH_DIR}/kg_edges.parquet", k=3),
        "kg_communities": f"SELECT entity_id, community_number FROM read_parquet('{KG_TRUTH_DIR}/kg_communities.parquet')",
        # coverage of a correct build: built == matched == truth per type
        "kg_coverage_stats": f"""
            SELECT entity_type,
                   CAST(COUNT(*) AS BIGINT) AS n_truth,
                   CAST(COUNT(*) AS BIGINT) AS n_built,
                   CAST(COUNT(*) AS BIGINT) AS n_matched
            FROM read_parquet('{KG_TRUTH_DIR}/kg_entities.parquet')
            GROUP BY entity_type
        """,
        "kg_subgraph_quality": f"""
            WITH m AS (SELECT entity_id, community_number
                       FROM read_parquet('{KG_TRUTH_DIR}/kg_communities.parquet')),
                 e AS (SELECT DISTINCT src, pred, dst
                       FROM read_parquet('{KG_TRUTH_DIR}/kg_edges.parquet')),
                 mem AS (SELECT community_number, COUNT(*) AS n_members
                         FROM m GROUP BY community_number),
                 intra AS (
                   SELECT ms.community_number, COUNT(*) AS n_intra_edges
                   FROM e
                   JOIN m ms ON e.src = ms.entity_id
                   JOIN m md ON e.dst = md.entity_id
                   WHERE ms.community_number = md.community_number
                   GROUP BY ms.community_number)
            SELECT mem.community_number,
                   CAST(mem.n_members AS BIGINT) AS n_members,
                   CAST(COALESCE(intra.n_intra_edges, 0) AS BIGINT) AS n_intra_edges,
                   CAST(mem.n_members * (mem.n_members - 1) // 2 AS BIGINT) AS n_possible_pairs
            FROM mem LEFT JOIN intra USING (community_number)
        """,
        # retrieval-precision matching core: top-3 'retrieved' per doc by
        # lexicographic rank, counts per the reference rule (substring +
        # digit-run) — a correct build makes built mentions == truth, so
        # the oracle computes both sides from the planted mention log
        "kg_retrieval_precision": f"""
            WITH ref AS (SELECT DISTINCT doc_id, lower(entity_id) AS e
                         FROM read_parquet('{KG_TRUTH_DIR}/kg_mentions.parquet')),
                 retr AS (SELECT doc_id, e FROM (
                            SELECT doc_id, e,
                                   row_number() OVER (PARTITION BY doc_id
                                                      ORDER BY e) AS rn
                            FROM ref) WHERE rn <= 3),
                 counts AS (
                   SELECT r.doc_id,
                          CAST(COUNT(*) AS BIGINT) AS n_referenced,
                          CAST(COUNT(*) FILTER (WHERE EXISTS (
                              SELECT 1 FROM retr t WHERE t.doc_id = r.doc_id
                              AND strpos(t.e, r.e) > 0)) AS BIGINT)
                            AS n_matched_direct,
                          CAST(COUNT(*) FILTER (
                              WHERE regexp_extract(r.e, '[0-9]+') <> ''
                              AND EXISTS (
                                SELECT 1 FROM retr t WHERE t.doc_id = r.doc_id
                                AND strpos(t.e, regexp_extract(r.e, '[0-9]+')) > 0))
                            AS BIGINT) AS n_matched_num
                   FROM ref r GROUP BY r.doc_id),
                 rc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_retrieved
                        FROM retr GROUP BY doc_id)
            SELECT counts.doc_id, rc.n_retrieved, counts.n_referenced,
                   counts.n_matched_direct, counts.n_matched_num
            FROM counts JOIN rc USING (doc_id)
        """,
        "media_features": f"SELECT doc_id, media_ref, kind, n_features FROM read_parquet('{KG_TRUTH_DIR}/media_features.parquet')",
        "media_frames": f"SELECT doc_id, media_ref, kind, frame_idx, ts_ms FROM read_parquet('{KG_TRUTH_DIR}/media_frames.parquet')",
        "kg_incremental": f"SELECT doc_id, subj, pred, obj FROM read_parquet('{KG_TRUTH_DIR}/kg_incremental.parquet')",
        "asof_join": R.asof_join_sql("click", "purchase"),
        "group_topk": R.group_topk_sql(3),
        "hash_sample": ("SELECT doc_id, n_chars FROM documents WHERE "
                        + R.hash_sample_sql(0.25).split("WHERE", 1)[1]),
        "token_shards": R.token_shards_sql(5000, n_tokens),
        "neardup_components": D.duplicate_components_sql(
            O.simhash_sql(max_hamming=3)),
        "neardup_resolve": D.resolve_duplicates_sql(
            O.simhash_sql(max_hamming=3),
            columns="doc_id, lang, n_chars"),
        "pricing_summary": AN.pricing_summary_sql(),
        "order_revenue": AN.order_revenue_rollup_sql(),
        "segment_sales": AN.segment_sales_sql(),
        "group_quantiles": AN.group_quantiles_sql(),
        "stratified_sample": AN.stratified_sample_sql(
            STRATA_RATES, strata_col="c_mktsegment", key="c_custkey",
            table="customer", columns="c_custkey, c_mktsegment, c_acctbal",
            default_rate=0.1),
        "sample_exact_k": AN.sample_exact_k_sql(
            50, key="doc_id", table="documents", columns="doc_id, n_chars"),
        "distinct_per_group": AN.distinct_per_group_sql(),
        "user_windows": AN.user_windows_sql(),
        "running_total": AN.running_total_sql(),
        "quota_sample": AN.quota_sample_sql(
            QUOTAS, group_col="lang", columns="doc_id, lang, n_chars",
            default_quota=5),
        "token_budget_sample": AN.token_budget_sample_sql(
            TOKEN_BUDGETS, group_col="lang", default_budget=2000),
        "interval_join": R.interval_join_sql(anchor_type="error", window_s=600),
        "contamination": TS.contamination_sql(benchmark_ids=range(5), n=3),
        "duplicate_spans": SP.duplicate_spans_sql(length=20),
        "strip_dup_spans": SP.strip_duplicate_spans_sql(length=20),
        "frequent_ngrams": TS.frequent_ngrams_sql(n=2, min_count=5),
        "hll_registers": SK.hll_registers_sql(),
        "cms_registers": SK.cms_registers_sql(),
        "hist_registers": SK.hist_registers_sql(),
        "bm25_topk": SE.bm25_topk_sql(
            terms=["spark", "vector", "customer"], k=20),
        "inverted_postings": SE.inverted_postings_sql(min_df=2),
        "corpus_profile": TS.corpus_profile_sql(),
        "split_sentences": TS.split_sentences_sql(),
        "training_export": EX.training_export_sql(
            benchmark_ids=range(5), budget=5000, n=3,
            min_words=40, require_terminal=False),
        "minhash_dups": O.minhash_sql(threshold=0.7),
        "simhash_dups": O.simhash_sql(max_hamming=3),
        "ngram_jaccard": O.ngram_jaccard_sql(n=3, threshold=0.5),
        "winnow_fps": O.winnow_sql(),
        "winnow_shared": O.winnow_shared_sql(min_shared=2, max_df=64),
        "boilerplate_stats": O.boilerplate_sql(min_df=2),
        "mask_pii": O.pii_sql(),
        "gopher_repetition": O.gopher_sql(),
        "quality_filter": O.quality_filter_sql(min_words=5),
        "unigram_rarity": TS.unigram_rarity_sql(),
        "tfidf_keywords": SE.tfidf_keywords_sql(k=5),
        "knn_topk": """
            WITH sims AS (
                SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                       round(list_cosine_similarity(q.embedding, v.embedding), 6) AS sim
                FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
                WHERE q.vec_id < 8
            ), ranked AS (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS rank
                FROM sims
            )
            SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
        """,
        # all-cells trained IVF is exact — same ground truth as brute force
        "knn_ivf_trained": """
            WITH sims AS (
                SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                       round(list_cosine_similarity(q.embedding, v.embedding), 6) AS sim
                FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
                WHERE q.vec_id < 8
            ), ranked AS (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS rank
                FROM sims
            )
            SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
        """,
        # all-cells IVF-PQ with no-op pruning + exact rerank — same truth
        "knn_ivf_pq": """
            WITH sims AS (
                SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                       round(list_cosine_similarity(q.embedding, v.embedding), 6) AS sim
                FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
                WHERE q.vec_id < 8
            ), ranked AS (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS rank
                FROM sims
            )
            SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
        """,
        # full-Hamming-coverage multi-probe IVF is exact — same ground truth
        "knn_ivf": """
            WITH sims AS (
                SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                       round(list_cosine_similarity(q.embedding, v.embedding), 6) AS sim
                FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
                WHERE q.vec_id < 8
            ), ranked AS (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS rank
                FROM sims
            )
            SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
        """,
    }
