"""Benchmark harness.

Headline: the full KG construction pipeline (extract → link → canonicalize →
materialize) over a deterministic synthetic interleaved-doc corpus scaled to
$GRAFT_SF_DIR, reported as end-to-end seconds and triples/sec (the
BASELINE.json metric). Also times the individual training-data operators over
the driver's parquet tables.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "triples_per_sec": ...}

--scaling: runs the headline job in two FRESH processes (num_cpus=8 and 32)
on the same input and reports both throughputs + scaling efficiency
(the sandbox stand-in for the N vs 4N node-cluster criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# corpus size by scale factor: (docs, facts per doc); entities capped so
# name-separation generation stays O(small). The bench tier is sized so real
# per-chunk compute (tokenize/extract/embed) dominates fixed pipeline
# overhead — that is what the two-level scaling measurement needs to be
# meaningful.
CORPUS = {"0.001": (60, 6), "0.01": (200, 6), "0.1": (100_000, 25)}


def corpus_spec_for(sf_dir: str) -> tuple:
    for key, spec in CORPUS.items():
        if sf_dir.rstrip("/").endswith(f"sf{key}"):
            n_docs, facts = spec
            break
    else:
        n_docs, facts = CORPUS["0.1"]
    # GRAFT_DOCS overrides the doc count (the scaling sweep uses a larger
    # corpus so every width has meaningful work per core — see run_scaling)
    return int(os.environ.get("GRAFT_DOCS", n_docs)), facts


def ensure_corpus(n_docs: int, facts_per_doc: int, dup_rate: float = 0.0,
                  sparse: bool = False) -> str:
    """Generate the corpus parquet once (untimed) and reuse it.

    ``sparse`` builds the SPARSE-VOCABULARY variant: a large structured-name
    entity vocabulary with per-doc topical locality, so a 1% doc delta
    touches ~1% of surfaces (the regime where delta-scoped incremental
    updates pay off; the default corpus caps entities at 500, so any delta
    touches nearly every surface)."""
    tag = f"_dup{int(dup_rate * 100)}" if dup_rate else ""
    if sparse:
        tag += "_sparse2"  # v2: intra_p=1.0 (disconnected components)
    # shard the documents table so the headline's first read is parallel
    # (one file = one Ray read task = ~1 s serialized at every CPU width)
    n_files = min(32, max(1, n_docs // 2048))
    if n_files > 1:
        tag += f"_f{n_files}"
    path = f"/tmp/bench_corpus_{n_docs}_{facts_per_doc}{tag}"
    if not os.path.exists(f"{path}/documents.parquet"):
        from graph_rag_agent_ray.synth import generate, write_corpus
        if sparse:
            # intra_p=1.0: the entity graph decomposes into per-cluster
            # connected components (the topology of a real topical corpus),
            # so a delta tick re-detects only the touched components
            corpus = generate(n_docs=n_docs, seed=42,
                              facts_per_doc=facts_per_doc,
                              n_entities=min(32_000, max(100, n_docs // 2)),
                              name_mode="structured", doc_locality=True,
                              dup_rate=dup_rate, intra_p=1.0)
        else:
            corpus = generate(n_docs=n_docs, seed=42,
                              facts_per_doc=facts_per_doc,
                              n_entities=min(500, max(20, n_docs // 2)),
                              dup_rate=dup_rate)
        write_corpus(corpus, path, n_files=n_files)
    return path


def _object_store_bytes():
    """50% of physical RAM, capped at 90% of available /dev/shm (shared-
    memory-backed plasma only; a request /dev/shm cannot back either fails
    ray.init or spills to disk). Returns None (use Ray's default) when the
    cap falls under Ray's 75 MiB minimum or /dev/shm is unreadable."""
    phys = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    want = int(phys * 0.5)
    try:
        st = os.statvfs("/dev/shm")
        cap = int(st.f_bsize * st.f_bavail * 0.9)
        want = min(want, cap)
    except OSError:
        return None
    return want if want >= 100 * 1024 * 1024 else None


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        # object store at Ray Data's recommended 50% of RAM (the default
        # ~43% triggers its performance warning and spills earlier on the
        # duplicate-corpus headline) — but never more than /dev/shm can
        # actually back (a container with a small shm cap would otherwise
        # fail ray.init or silently fall back to disk-backed plasma)
        obj_mem = _object_store_bytes()
        extra = {"object_store_memory": obj_mem} if obj_mem else {}
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR", **extra)
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import ray.data as rd
    from graph_rag_agent_ray import build_kg
    from graph_rag_agent_ray.ops import dedup as D
    from graph_rag_agent_ray.ops import similarity as SIM
    from graph_rag_agent_ray.ops import textstats as TS

    n_docs, facts_per_doc = corpus_spec_for(SF_DIR)
    corpus_path = ensure_corpus(n_docs, facts_per_doc)

    # warm the worker pool and the page cache (measure compute + shuffle,
    # not python-worker cold start or the first disk read)
    @ray.remote
    def _noop():
        return 0

    ray.get([_noop.remote() for _ in range(NUM_CPUS)])
    rd.read_parquet(f"{corpus_path}/documents.parquet").count()

    timings: dict = {}

    # ---- headline: full KG build, fresh snapshot dir (no resume reuse) ----
    out_dir = f"/tmp/bench_kg_{n_docs}_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = rd.read_parquet(f"{corpus_path}/documents.parquet")
    t0 = time.monotonic()
    tables = build_kg(docs, out_dir, input_token=f"bench{n_docs}")
    n_triples = tables["triples"].count()
    headline = time.monotonic() - t0
    timings["kg_build"] = round(headline, 3)

    # ---- operator benches over the driver's tables ----
    if os.environ.get("GRAFT_HEADLINE_ONLY"):
        return {
            "metric": "kg_build_end_to_end",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": timings,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "n_docs": n_docs,
            "n_triples": int(n_triples),
            "triples_per_sec": round(n_triples / headline, 2),
        }

    def timed(name, fn):
        t = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t, 3)

    # ---- secondary headline: work-dedup join over a duplicate-heavy corpus
    # (TODO #7): 50% extra exact-duplicate docs; dedupe_extraction=True sends
    # each unique chunk text to the extractor ONCE (distinct + hash-bucket
    # join re-attributes results to every occurrence) — the reference's
    # sha1-keyed LLM cache semantics under load ----
    from graph_rag_agent_ray.config import KGConfig
    dup_path = ensure_corpus(n_docs, facts_per_doc, dup_rate=0.5)
    dup_docs = rd.read_parquet(f"{dup_path}/documents.parquet")
    n_dup_docs = dup_docs.count()  # warms the page cache too
    out_dup = f"/tmp/bench_kg_dup_{n_docs}_{NUM_CPUS}"
    shutil.rmtree(out_dup, ignore_errors=True)
    t0 = time.monotonic()
    tables_dup = build_kg(dup_docs, out_dup, cfg=KGConfig(dedupe_extraction=True),
                          input_token=f"benchdup{n_docs}")
    n_triples_dup = tables_dup["triples"].count()
    dup_headline = time.monotonic() - t0
    timings["kg_build_dedup"] = round(dup_headline, 3)
    # drop refs so the object store can evict this headline's blocks —
    # otherwise they pin plasma memory and the later incremental headlines
    # run under artificial memory pressure (measured: sparse update 38s
    # pinned vs 23s clean at 50k docs)
    del tables, tables_dup, dup_docs

    docs_flat = lambda: rd.read_parquet(  # noqa: E731
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    emb = lambda: rd.read_parquet(  # noqa: E731
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])

    timed("token_count", lambda: TS.token_count(docs_flat()).count())
    timed("text_quality", lambda: TS.text_quality(docs_flat()).count())
    timed("exact_dedup", lambda: D.exact_dedup(docs_flat()).count())
    timed("minhash_dups", lambda: D.minhash_duplicate_pairs(docs_flat(), threshold=0.7).count())
    timed("simhash_dups", lambda: D.simhash_duplicate_pairs(docs_flat()).count())
    timed("ngram_jaccard", lambda: D.ngram_jaccard_pairs(docs_flat(), n=3, threshold=0.5).count())
    timed("winnow_fps", lambda: TS.winnow_fingerprints(docs_flat()).count())
    timed("winnow_shared", lambda: D.winnow_shared_pairs(docs_flat()).count())
    from graph_rag_agent_ray.ops import clean as CL
    timed("boilerplate_stats", lambda: CL.boilerplate_stats(docs_flat()).count())
    timed("mask_pii", lambda: CL.mask_pii(docs_flat()).count())
    timed("gopher_repetition", lambda: TS.gopher_repetition(docs_flat()).count())
    timed("quality_filter", lambda: TS.quality_filter(docs_flat()).count())
    timed("knn_topk", lambda: SIM.knn_bruteforce(emb(), range(8), k=10).count())
    timed("knn_ivf", lambda: SIM.knn_ivf(emb(), range(8), k=10).count())
    timed("knn_ivf_trained",
          lambda: SIM.knn_ivf_trained(emb(), range(8), k=10,
                                      n_centroids=16, n_probes=12).count())
    timed("knn_ivf_pq",
          lambda: SIM.knn_ivf_pq(emb(), range(8), k=10, n_centroids=16,
                                 m=8, n_codes=64, n_probes=12).count())
    from graph_rag_agent_ray.ops import export as EXP
    timed("training_export",
          lambda: EXP.training_export(docs_flat(), benchmark_ids=range(5),
                                      budget=5000, n=3, min_words=40,
                                      require_terminal=False).count())
    timed("embedding_neardup", lambda: D.embedding_neardup_pairs(emb(), 0.35).count())
    timed("neardup_blocked",
          lambda: D.embedding_neardup_blocked(emb(), 0.35, n_bits=2, n_tables=16).count())
    from graph_rag_agent_ray.ops import search as SRCH
    from graph_rag_agent_ray.ops import sketches as SKETCH
    from graph_rag_agent_ray.ops import spans as SPN
    timed("duplicate_spans", lambda: SPN.duplicate_spans(docs_flat(), length=20).count())
    timed("frequent_ngrams", lambda: TS.frequent_ngrams(docs_flat(), n=2, min_count=5).count())
    timed("bm25_topk", lambda: SRCH.bm25_topk(
        docs_flat(), terms=["spark", "vector", "customer"], k=20).count())
    timed("hll_registers", lambda: SKETCH.hll_registers(rd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "user_id"])).count())
    timed("inverted_postings", lambda: SRCH.inverted_postings(
        docs_flat(), min_df=2).count())
    timed("bpe_token_count", lambda: TS.bpe_token_count(docs_flat()).count())
    timed("corpus_profile", lambda: TS.corpus_profile(docs_flat()).count())
    timed("split_sentences", lambda: TS.split_sentences(docs_flat()).count())
    # graph ops read the edge snapshot back from disk — the in-memory build
    # tables were dropped above to release their object-store blocks
    from graph_rag_agent_ray.ops import graphstats as GS
    kg_edges = lambda: rd.read_parquet(  # noqa: E731
        f"{out_dir}/edges", columns=["src", "dst"])
    timed("kg_pagerank", lambda: GS.pagerank(kg_edges()).count())
    timed("kg_ppr", lambda: GS.personalized_pagerank(kg_edges()).count())
    timed("kg_harmonic", lambda: GS.landmark_harmonic(kg_edges()).count())
    timed("kg_components", lambda: GS.weakly_connected(kg_edges()).count())
    timed("kg_kcore", lambda: GS.kcore(kg_edges(), k=3).count())
    timed("kg_triangles", lambda: GS.triangle_count(kg_edges()).count())
    # ---- third headline: incremental update with 1% dirty docs — the
    # delta-scoped path: per-doc stages (chunk/extract/embed/parse) carry
    # rows over for unchanged docs, and the graph-side aggregates (exact
    # dedup, canonical remap, edge dedup) re-run only the touched key
    # groups; the remaining full-corpus work is copy-forward snapshot I/O
    # plus the community-rank aggregate. Runs LAST so its mutated-corpus
    # blocks don't pressure the other headlines.
    from graph_rag_agent_ray.pipelines.incremental import (
        incremental_build_kg, write_registry)
    write_registry(docs, out_dir, input_token=f"bench{n_docs}")

    def mutate(batch):
        rows = batch.to_pylist()
        for r in rows:
            if int(r["doc_id"].rsplit("-", 1)[-1]) % 100 == 0:
                for s in r["spans"]:
                    if s["kind"] == "text":
                        s["text"] = s["text"] + " Revised content marker。"
                        break
        import pyarrow as pa_
        return pa_.Table.from_pylist(rows, schema=batch.schema)

    docs_mut = rd.read_parquet(f"{corpus_path}/documents.parquet") \
        .map_batches(mutate, batch_format="pyarrow").materialize()
    out_inc = f"/tmp/bench_kg_inc_{n_docs}_{NUM_CPUS}"
    shutil.rmtree(out_inc, ignore_errors=True)
    t0 = time.monotonic()
    tables_inc, delta = incremental_build_kg(
        docs_mut, out_inc, out_dir, input_token=f"bench{n_docs}v2")
    n_triples_inc = tables_inc["triples"].count()
    inc_headline = time.monotonic() - t0
    timings["kg_update_1pct"] = round(inc_headline, 3)
    del tables_inc, docs_mut  # release before the sparse headline

    # ---- fourth headline: sparse-vocabulary incremental update. The main
    # corpus caps the entity vocabulary at 500, so a 1% doc delta touches
    # ~100% of surfaces and the graph-side re-aggregation is inherently
    # corpus-sized (the adversarial hot-key regime). Real corpora have
    # topical locality; here a 1% delta touches ~1% of surfaces and the
    # delta-scoped path shows its O(delta) cost. ----
    sparse_headline = None
    sparse_n = min(n_docs, 50_000)
    if sparse_n >= 1000:
        sparse_path = ensure_corpus(sparse_n, facts_per_doc, sparse=True)
        out_sp = f"/tmp/bench_kg_sparse_{sparse_n}_{NUM_CPUS}"
        shutil.rmtree(out_sp, ignore_errors=True)
        docs_sp = rd.read_parquet(f"{sparse_path}/documents.parquet").materialize()
        t0 = time.monotonic()
        tables_sp = build_kg(docs_sp, out_sp, input_token=f"sparse{sparse_n}")
        n_triples_sp = tables_sp["triples"].count()
        sparse_build = time.monotonic() - t0
        write_registry(docs_sp, out_sp, input_token=f"sparse{sparse_n}")
        del tables_sp  # release build blocks before timing the update tick
        docs_sp_mut = docs_sp.map_batches(mutate, batch_format="pyarrow").materialize()
        del docs_sp
        out_sp_inc = f"{out_sp}_inc"
        shutil.rmtree(out_sp_inc, ignore_errors=True)
        t0 = time.monotonic()
        tables_sp_inc, delta_sp = incremental_build_kg(
            docs_sp_mut, out_sp_inc, out_sp, input_token=f"sparse{sparse_n}v2")
        tables_sp_inc["triples"].count()
        sparse_update = time.monotonic() - t0
        timings["kg_build_sparse"] = round(sparse_build, 3)
        timings["kg_update_sparse"] = round(sparse_update, 3)
        sparse_headline = {
            "n_docs": int(sparse_n),
            "n_triples": int(n_triples_sp),
            "build_sec": round(sparse_build, 3),
            "update_sec": round(sparse_update, 3),
            "delta": {k: int(v) for k, v in delta_sp.items()},
            "update_over_build": round(sparse_update / sparse_build, 3),
            "delta_scoped_stages": _stage_evidence(out_sp_inc)[1],
            "community_carry": _louvain_evidence(out_sp_inc),
        }

    ivf_recall = SIM.knn_recall(emb(), range(8), k=10)
    # matched probe FRACTION vs the LSH config (12/16 vs 3/4 cells) so the
    # two recall numbers are comparable; finer cells are the scale shape
    ivf_trained_recall = SIM.knn_recall(
        emb(), range(8), k=10, method=SIM.knn_ivf_trained,
        n_centroids=16, n_probes=12)
    # compressed tier at the same probe fraction: uint8 PQ codes + ADC scan
    # + exact rerank of the ADC survivors (recall-only errors)
    ivf_pq_recall = SIM.knn_recall(
        emb(), range(8), k=10, method=SIM.knn_ivf_pq,
        n_centroids=16, m=8, n_codes=64, n_probes=12)

    return {
        "metric": "kg_build_end_to_end",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "n_triples": int(n_triples),
        "triples_per_sec": round(n_triples / headline, 2),
        "knn_ivf_recall_at_10": round(ivf_recall, 4),
        "knn_ivf_trained_recall_at_10": round(ivf_trained_recall, 4),
        "knn_ivf_pq_recall_at_10": round(ivf_pq_recall, 4),
        "dedup_headline": {
            "n_docs": int(n_dup_docs),
            "n_triples": int(n_triples_dup),
            "sec": round(dup_headline, 3),
            "triples_per_sec": round(n_triples_dup / dup_headline, 2),
        },
        "incremental_headline": {
            "sec": round(inc_headline, 3),
            "n_triples": int(n_triples_inc),
            "delta": {k: int(v) for k, v in delta.items()},
            "speedup_vs_full_build": round(headline / inc_headline, 2),
            # work-skipping evidence: stages whose compute was scoped to the
            # dirty delta / touched key groups (rows for everything else
            # carried over from the previous build's snapshots), plus any
            # stage that resumed fully from a fingerprint-matched snapshot
            "delta_scoped_stages": _stage_evidence(out_inc)[1],
            "cached_stages": _stage_evidence(out_inc)[0],
        },
        "sparse_incremental_headline": sparse_headline,
    }


def _louvain_evidence(out_dir: str) -> dict:
    """Per-component community carry-over evidence from the lineage log:
    how many components were carried vs re-detected and the detection wall."""
    import json as _json
    try:
        with open(os.path.join(out_dir, "_lineage.jsonl")) as f:
            rows = [_json.loads(l) for l in f if '"louvain"' in l]
        r = rows[-1]
        return {"components_carried": r.get("components_carried", 0),
                "components_detected": r.get("components_detected", 0),
                "cached": bool(r.get("cached")),
                "wall_s": r.get("wall_s")}
    except (OSError, IndexError):
        return {}


def _stage_evidence(out_dir: str) -> tuple:
    import json as _json
    cached, delta_scoped = set(), set()
    try:
        with open(os.path.join(out_dir, "_lineage.jsonl")) as f:
            for line in f:
                if not line.strip():
                    continue
                row = _json.loads(line)
                if row.get("cached"):
                    cached.add(row.get("stage"))
                if row.get("delta_scoped"):
                    delta_scoped.add(row.get("stage"))
    except OSError:
        pass
    return sorted(cached), sorted(delta_scoped)


_CALIBRATE_SRC = r"""
import ray, time, sys, hashlib, json
N = int(sys.argv[1])
ray.init(address="local", num_cpus=N, include_dashboard=False, logging_level="ERROR")

@ray.remote
def work(seed):
    h = hashlib.sha1(str(seed).encode()).digest()
    acc = 0
    for _ in range(600000):
        h = hashlib.sha1(h).digest()
        acc ^= h[0]
    return acc

@ray.remote
def noop():
    return 0

ray.get([noop.remote() for _ in range(N)])
t0 = time.monotonic()
ray.get([work.remote(i) for i in range(256)])
print(json.dumps({"sec": time.monotonic() - t0}))
ray.shutdown()
"""


def _calibrate(ncpu: int) -> float:
    """Wall-clock of a perfectly-parallel pure-python workload at ``ncpu`` —
    measures the PLATFORM's core-scaling ceiling (CPU frequency scaling /
    VM throttling make even embarrassingly-parallel code scale sublinearly
    on one box; a real N→4N node cluster does not have this artifact because
    per-node resources are constant)."""
    out = subprocess.run(
        [sys.executable, "-c", _CALIBRATE_SRC, str(ncpu)],
        capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])["sec"]


def run_scaling() -> dict:
    """Same job, two parallelism levels, fresh processes (the in-sandbox
    evidence for the N vs 4N cluster-size criterion), plus a platform
    calibration so pipeline scaling is separable from single-box limits.
    Override the pair with GRAFT_SCALE_LO/GRAFT_SCALE_HI (e.g. 4/16, which
    avoids the full-width frequency-throttling artifact — BASELINE.md carries
    the full 4/8/16/32 curve and the Amdahl decomposition)."""
    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    # strong scaling needs meaningful work per core: at the sf0.1 default
    # (100k docs) the 32-cpu build is ~10s wall against ~5s of fixed
    # stage-launch cost, so the ratio measures Ray's task-launch constant,
    # not the pipeline. The sweep therefore runs a 3× corpus (same
    # generator, same shape) unless the caller overrides GRAFT_DOCS —
    # mirroring the real deployment, where a 4N-node cluster exists because
    # the input is large, never to re-run a fixed small input faster.
    scale_docs = os.environ.get("GRAFT_DOCS", "600000")
    results = {}
    rep_times: dict = {}
    for ncpu in (lo, hi):
        best = None
        rep_times[ncpu] = []
        for _rep in range(2):  # min of 2 reps — single-box timings are noisy
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_HEADLINE_ONLY="1", GRAFT_DOCS=scale_docs)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            rep_times[ncpu].append(r["value"])
            if best is None or r["value"] < best["value"]:
                best = r
        results[ncpu] = best
    # min of 2 calibration reps — the ceiling measurement is the most
    # sensitive to background load (a loaded box inflates the low-cpu run
    # less than the high-cpu run and corrupts the ratio)
    cal_lo = min(_calibrate(lo), _calibrate(lo))
    cal_hi = min(_calibrate(hi), _calibrate(hi))
    t_lo = results[lo]["value"]
    t_hi = results[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    ceiling = (cal_lo / cal_hi) / (hi / lo)
    report = {
        "metric": "scaling_efficiency",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": t_lo, "sec_hi": t_hi,
        "rep_sec_lo": [round(v, 2) for v in rep_times[lo]],
        "rep_sec_hi": [round(v, 2) for v in rep_times[hi]],
        "triples_per_sec_lo": results[lo]["triples_per_sec"],
        "triples_per_sec_hi": results[hi]["triples_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "platform_ceiling_efficiency": round(ceiling, 3),
        "normalized_scaling_efficiency": round(eff / ceiling, 3),
        "calibration_sec_lo": round(cal_lo, 2),
        "calibration_sec_hi": round(cal_hi, 2),
        "sf": SF_DIR,
        "n_docs": int(scale_docs),
        "n_triples": results[hi].get("n_triples"),
    }
    # Write the evidence artifact DIRECTLY (round-4 lesson: a shell
    # redirection left BENCH_scaling.json empty at the final commit — the
    # run itself now owns the file). Multiple pairs accumulate under their
    # "lo->hi" key so a 4->16 run does not clobber an 8->32 run.
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_scaling.json")
    try:
        with open(path) as f:
            existing = json.load(f)
        if not isinstance(existing, dict) or "pairs" not in existing:
            existing = {"pairs": {}}
    except (OSError, ValueError):
        existing = {"pairs": {}}
    existing["pairs"][f"{lo}->{hi}"] = report
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(existing, f, indent=1)
    os.replace(tmp, path)
    return report


if __name__ == "__main__":
    if "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__.strip())
        sys.exit(0)
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_bench()
        import ray
        ray.shutdown()
        # platform self-calibration (AFTER shutdown — a fresh throwaway
        # cluster must not share CPUs with the bench session): wall of a
        # perfectly-parallel pure-python workload at the same width. This
        # VM's effective core throughput drifts >2× run-to-run (BASELINE.md
        # reproducibility table; measured calib_32 2.5s quiet vs 5.3s
        # throttled on identical code), so absolute pipeline walls are only
        # interpretable next to the same run's calibration.
        try:
            result["calibration_sec"] = round(_calibrate(NUM_CPUS), 2)
        except Exception:  # noqa: BLE001 — calibration must not fail a bench
            result["calibration_sec"] = None
        print(json.dumps(result))
