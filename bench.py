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
            return spec
    return CORPUS["0.1"]


def ensure_corpus(n_docs: int, facts_per_doc: int) -> str:
    """Generate the corpus parquet once (untimed) and reuse it."""
    path = f"/tmp/bench_corpus_{n_docs}_{facts_per_doc}"
    if not os.path.exists(f"{path}/documents.parquet"):
        from graph_rag_agent_ray.synth import generate, write_corpus
        corpus = generate(n_docs=n_docs, seed=42,
                          facts_per_doc=facts_per_doc,
                          n_entities=min(500, max(20, n_docs // 2)))
        write_corpus(corpus, path)
    return path


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
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
    def timed(name, fn):
        t = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t, 3)

    docs_flat = lambda: rd.read_parquet(  # noqa: E731
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    emb = lambda: rd.read_parquet(  # noqa: E731
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])

    timed("token_count", lambda: TS.token_count(docs_flat()).count())
    timed("text_quality", lambda: TS.text_quality(docs_flat()).count())
    timed("exact_dedup", lambda: D.exact_dedup(docs_flat()).count())
    timed("minhash_dups", lambda: D.minhash_duplicate_pairs(docs_flat(), threshold=0.7).count())
    timed("simhash_dups", lambda: D.simhash_duplicate_pairs(docs_flat()).count())
    timed("knn_topk", lambda: SIM.knn_bruteforce(emb(), range(8), k=10).count())
    timed("embedding_neardup", lambda: D.embedding_neardup_pairs(emb(), 0.35).count())

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


def run_scaling() -> dict:
    """Same job, two parallelism levels, fresh processes (the in-sandbox
    evidence for the N vs 4N cluster-size criterion)."""
    lo, hi = 8, 32
    results = {}
    for ncpu in (lo, hi):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    t_lo = results[lo]["value"]
    t_hi = results[hi]["value"]
    tput_lo = results[lo]["triples_per_sec"]
    tput_hi = results[hi]["triples_per_sec"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": t_lo, "sec_hi": t_hi,
        "triples_per_sec_lo": tput_lo, "triples_per_sec_hi": tput_hi,
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_bench()
        print(json.dumps(result))
        import ray
        ray.shutdown()
