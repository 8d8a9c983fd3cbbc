"""End-to-end KG build: the Ray-Data re-expression of the reference's
three-builder lifecycle (/root/reference/build/main.py:19-45 →
build_graph.py:141-408, build_index_and_community.py:134-269,
build_chunk_index.py:101-172).

documents ─ map_batches ─▶ chunks ─┬─ actor pool ─▶ extractions
        └─ map_batches ─▶ span_index └─ actor pool ─▶ chunk_embeddings
                                         │ map_batches
                            ┌────────────┴────────────┐
                         mentions                  triples
                            │ combine + hash-bucket    │
                       exact entities                  │
                            │ actor pool (embed)       │
                       embedded ── block shuffle ──▶ pairs
                            │        union-find → alias map (broadcast)
                            ├─ hash-bucket merge ──▶ entities
                            └────────▶ remap ─▶ hash-bucket ─▶ edges
                                                      │ (small, aggregated)
                                        Louvain levels → communities (+rank)

Checkpointing: the expensive stages (extractions = the LLM pass,
chunk_embeddings = the model pass) and the final outputs snapshot to
resumable Parquet with lineage; cheap derivations between them stay fused in
memory and are recomputed on resume — partition-granular work-skipping at the
stages where work is actually expensive, matching the reference's chunk-level
LLM cache semantics (entity_extractor.py:89-143) without its shared cache dir.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .. import schema as S
from ..config import KGConfig
from ..functions.text import normalize_remap_array
from ..state.snapshots import LineageLog, SnapshotStore, fingerprint
from ..stages import canonicalize as C
from ..stages import communities as CM
from ..stages.chunker import build_span_index, chunk_documents
from ..stages.extract import MockLLMExtractor, extract_chunks
from ..stages.index import embed_chunks
from ..stages.parse import parse_mentions, parse_triples

logger = logging.getLogger(__name__)

# Driver-local final-entities guard: below this row count the canonical
# entity merge + degree/community attach run on the driver (the shuffle +
# map_batches round-trips cost more than the work — ~1.3 s of task-launch
# overhead at 16 cpus for <1k rows). 200k rows × (embedding + strings) is
# ~100-200 MB of driver heap — comfortably inside the same budget as the
# MAX_DRIVER_GRAPH_EDGES community guard this path already sits behind.
MAX_DRIVER_ENTITY_ROWS = 200_000


def build_kg(
    docs: "ray.data.Dataset",
    out_dir: str,
    cfg: Optional[KGConfig] = None,
    input_token: str = "",
    extractor_cls=MockLLMExtractor,
    summarizer_factory=None,
) -> Dict[str, "ray.data.Dataset"]:
    """Run the full build; returns every materialized logical table.

    ``input_token`` identifies the input version (path+mtime or content hash)
    for resume fingerprints; same token + same config ⇒ snapshots are reused.
    """
    cfg = cfg or KGConfig()
    store = SnapshotStore(out_dir)
    lineage = LineageLog(out_dir)
    base_fp = fingerprint(input_token, cfg)

    # spread the input across the cluster: a single parquet file arrives as
    # one or two blocks, which would cap every downstream stage's
    # parallelism. Skip the (barrier) repartition when the input is already
    # a many-file read — its tasks fan out on their own, and the repartition
    # would serialize behind the full read instead of pipelining into the
    # chunker.
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    try:
        n_files = len(docs.input_files() or [])
    except Exception:  # noqa: BLE001 — in-memory datasets have no files
        n_files = 0
    if n_files < n_cpus:
        # single-file / in-memory input: spread it (the repartition barrier
        # costs less than serializing every downstream stage on 1-2 blocks)
        docs = docs.repartition(max(n_cpus * 2, 8))
    # else: a many-file read already fans out (ReadParquet splits each file
    # into multiple blocks) and pipelines straight into the chunker; the
    # repartition would add a full barrier + a single-task reduce (~4 s at
    # 32 cpus on the 100k-doc bench corpus, measured in the stage stats)

    # side threads: independent snapshot jobs + background checkpoint writes
    # — Ray Data supports concurrent dataset executions, so the streaming
    # executor interleaves them instead of serializing the whole DAG
    from concurrent.futures import ThreadPoolExecutor
    # 16 workers: some side jobs BLOCK on other side jobs' futures (the edge
    # pre-aggregate waits on triples; the edge chain waits on the pre-
    # aggregate), so the pool must hold every concurrently-alive job plus
    # its dependencies — threads are cheap, a starved dependency deadlocks
    side = ThreadPoolExecutor(max_workers=16)

    span_index_f = side.submit(
        store.run_stage, "span_index", fingerprint(base_fp, "span_index"),
        lambda: build_span_index(docs, cfg), lineage,
    )

    # hot-path corpus-sized stages checkpoint WRITE-THROUGH (tee_stage): the
    # parquet lands per-batch inside the consuming pipeline, so the consumer
    # streams block-by-block instead of waiting for a full object-store
    # materialization, and the snapshot costs no second pass. Classic
    # materialize-then-async-write remains for (a) resume hits on the
    # consumer (its pipeline would never execute, so nothing would tee) and
    # (b) multi-execution consumers (the dedup explode reads chunks twice).
    fp_chunks = fingerprint(base_fp, "chunks")
    fp_ext = fingerprint(base_fp, "extractions", extractor_cls.__name__)
    # the dedup-extraction path consumes chunks exactly ONCE too (a single
    # distinct shuffle whose bucket assign runs per input block), so the tee
    # applies to every extractor configuration; only a consumer resume-hit
    # disables it (the tee pipeline would never execute)
    use_chunk_tee = not store.is_complete("extractions", fp_ext)
    fp_cemb = fingerprint(base_fp, "chunk_embeddings")
    if use_chunk_tee:
        chunks_in, chunks_commit = store.tee_stage(
            "chunks", fp_chunks, lambda: chunk_documents(docs, cfg), lineage,
            schema=S.CHUNKS)
        chunks_w = side.submit(lambda: None)
        extractions, extractions_w = store.run_stage_async_write(
            "extractions", fp_ext,
            lambda: extract_chunks(chunks_in, cfg, extractor_cls), side,
            lineage,
        )
        chunks = chunks_commit()
        # chunk embeddings stream from the committed chunk snapshot
        # (page-cache warm); only the return dict needs them. Trade-off:
        # in the tee path embed starts AFTER extraction (the commit gates
        # it) — fine for the cheap hash embedder (finishes long before the
        # community tail needs anything), but if a model-backed embedder is
        # ever wired into build_kg's default path, prefer the classic
        # branch below so embedding overlaps extraction again
        chunk_embeddings_f = side.submit(
            store.run_stage, "chunk_embeddings", fp_cemb,
            lambda: embed_chunks(chunks, cfg), lineage,
        )
    else:
        chunks, chunks_w = store.run_stage_async_write(
            "chunks", fp_chunks, lambda: chunk_documents(docs, cfg), side,
            lineage)
        # embed overlaps the extractor — both stream the materialized chunks
        chunk_embeddings_f = side.submit(
            store.run_stage, "chunk_embeddings", fp_cemb,
            lambda: embed_chunks(chunks, cfg), lineage,
        )
        extractions, extractions_w = store.run_stage_async_write(
            "extractions", fp_ext,
            lambda: extract_chunks(chunks, cfg, extractor_cls), side, lineage,
        )

    import time as _time

    # Two direct parses (mentions on the main thread, triples overlapped).
    # Measured note: a single-pass combined parse (parse.py:parse_combined)
    # saves ~40% of regex compute but costs MORE wall-clock here — the wide
    # combined intermediate must materialize on the critical path and every
    # consumer re-scans it; with parse this cheap, overlap beats re-use.
    #
    # pre-alias edge partial aggregate: the heavy (s,p,o) combine + shuffle
    # is alias-independent (canonicalize.preaggregate_edges), so it runs
    # here — concurrently with the entity aggregate / embedding / blocking
    # phase — instead of serializing behind the alias map; the edge chain
    # below finishes it with an edge-scale remap + re-reduce. On a fresh
    # build the triples parse tees write-through INTO the pre-aggregate
    # pipeline (extractions → parse → tee checkpoint → combine → shuffle in
    # one streaming pass — no corpus-sized triples materialization barrier).
    fp_tr = fingerprint(base_fp, "triples", extractor_cls.__name__)
    use_triples_tee = store.manifest("edges") is None
    if use_triples_tee:
        triples_in, triples_commit = store.tee_stage(
            "triples", fp_tr, lambda: parse_triples(extractions, cfg),
            lineage, schema=S.TRIPLES)
        triples_w = side.submit(lambda: None)

        def _edge_partials_job():
            # block-granular partial map fused with the parse+tee (the small
            # partial rows are the barrier, not the corpus-sized triples),
            # then the tree-combine + shuffle finish at its own granularity
            _t0 = _time.monotonic()
            rows = C.edge_partial_rows(triples_in).materialize()
            tr = triples_commit()
            ds = C.preaggregate_edges_finish(rows, cfg).materialize()
            lineage.record("edge_partials", cached=False,
                           wall_s=_time.monotonic() - _t0)
            return ds, tr

        edge_partials_f = side.submit(_edge_partials_job)
        get_partials = lambda: edge_partials_f.result()[0]  # noqa: E731
        get_triples = lambda: edge_partials_f.result()[1]  # noqa: E731
    else:
        # an edges snapshot exists (resume): the edge stage lambda never
        # runs, so the eager pre-aggregate would be pure waste — classic
        # materialize + async checkpoint for the triples table
        triples_f = side.submit(
            store.run_stage_async_write, "triples", fp_tr,
            lambda: parse_triples(extractions, cfg), side, lineage,
        )
        edge_partials_f = side.submit(lambda: None)
        get_partials = lambda: None  # noqa: E731
        get_triples = lambda: triples_f.result()[0]  # noqa: E731
        triples_w = side.submit(lambda: triples_f.result()[1].result())

    # mentions snapshot (kept under incremental_snapshots) so a later
    # incremental_build_kg can carry over parse rows per doc instead of
    # re-parsing the whole corpus (delta-scoped graph side). On a fresh
    # build the parse tees write-through INTO the exact-dedup aggregate
    # below — the aggregate's map-side combine streams the parse output
    # block-by-block while the checkpoint lands alongside.
    fp_m = fingerprint(base_fp, "mentions", extractor_cls.__name__)
    fp_emb = fingerprint(base_fp, "entities_embedded", extractor_cls.__name__)
    # the tee's consuming pipeline is the entities_embedded materialization,
    # which executes on a fingerprint miss. With incremental_snapshots OFF
    # the caller asked for NO mentions snapshot on disk — keep the classic
    # in-memory materialize (a tee would silently write one anyway)
    use_mentions_tee = (cfg.incremental_snapshots
                        and not store.is_complete("entities_embedded", fp_emb))
    _t = _time.monotonic()
    if use_mentions_tee:
        mentions_in, mentions_commit = store.tee_stage(
            "mentions", fp_m, lambda: parse_mentions(extractions, cfg),
            lineage, schema=S.MENTIONS)
        mentions_w = side.submit(lambda: None)
    elif cfg.incremental_snapshots:
        mentions, mentions_w = store.run_stage_async_write(
            "mentions", fp_m,
            lambda: parse_mentions(extractions, cfg), side, lineage,
        )
        mentions_in = mentions
    else:
        mentions = parse_mentions(extractions, cfg).materialize()
        lineage.record("mentions_parse", cached=False,
                       wall_s=_time.monotonic() - _t)
        mentions_w = side.submit(lambda: None)
        mentions_in = mentions

    # The exact-dedup aggregate + entity embedding are the last wide scans the
    # decision chain needs; after this point the canonicalization chain works
    # on the tiny aggregated entity table and runs CONCURRENTLY with the long
    # chunk-embedding tail (resolved only at the very end).
    if use_mentions_tee:
        # same split as the edge side: parse+tee+block-granular partials in
        # one streaming pass; the vocabulary-sized partial rows materialize,
        # the mentions snapshot commits, and the shuffle finish runs inside
        # the entities_embedded stage
        exact_partials = C.aggregate_exact_partials(mentions_in).materialize()
        mentions = mentions_commit()
        exact = C.aggregate_exact_finish(exact_partials, cfg)
    else:
        exact = C.aggregate_exact(mentions_in, cfg)
    if cfg.incremental_snapshots:
        # entity-scale (aggregated) — snapshot is cheap and lets an update
        # carry over model embeddings for untouched entities
        embedded, embedded_w = store.run_stage_async_write(
            "entities_embedded", fp_emb,
            lambda: C.embed_entities(exact, cfg), side, lineage,
        )
    else:
        embedded = C.embed_entities(exact, cfg).materialize()  # reused 3×, small
        embedded_w = side.submit(lambda: None)
    lineage.record("throughput_phase", cached=False, wall_s=_time.monotonic() - _t)

    # ---- decision chain: blocking → alias → edges → communities ----
    _t = _time.monotonic()
    n_entities = embedded.count()
    blocking_bits = C.auto_blocking_bits(n_entities, cfg)
    # judged merge decisions — small by construction; driver-local blocking
    # below the surface guard, distributed shuffle above it
    pairs_pdf = C.candidate_pairs_pdf(
        embedded, cfg, keep_block_key=cfg.incremental_snapshots,
        bits=blocking_bits, n_entities=n_entities)
    lineage.record("canon_blocking", cached=False, wall_s=_time.monotonic() - _t,
                   n_entities=int(n_entities))
    # mention counts ride on the pair rows (canonicalize._pairs_in_block), so
    # the alias map needs no second scan over the entity table — one driver
    # collect total in the serial decision section
    if len(pairs_pdf) and "n_a" in pairs_pdf.columns:
        counts = dict(zip(pairs_pdf["a"], pairs_pdf["n_a"]))
        counts.update(zip(pairs_pdf["b"], pairs_pdf["n_b"]))
    else:
        counts = {}
    alias = C.build_alias_map(pairs_pdf, counts)
    alias_ref = ray.put(alias)
    alias_fp = fingerprint(base_fp, sorted(alias.items()))
    lineage.record("alias_map", cached=False, wall_s=0.0,
                   n_pairs=int(len(pairs_pdf)), n_aliases=len(alias))
    if cfg.incremental_snapshots:
        # persist the alias map so the next incremental tick can diff old vs
        # new mappings and re-remap only the affected canonical ids
        alias_tbl = pa.table({
            "member": pa.array(list(alias), pa.string()),
            "canonical": pa.array(list(alias.values()), pa.string()),
        })
        alias_w = side.submit(
            store.write, "alias_map", ray.data.from_arrow(alias_tbl),
            fingerprint(base_fp, "alias_map", extractor_cls.__name__))
        # persist per-block pairs so the next tick re-pairs only the blocks
        # touching a changed surface and carries the rest (O(delta) blocking)
        pairs_tbl = pa.table({
            "block_key": pa.array(pairs_pdf.get("block_key", []), pa.string()),
            "a": pa.array(pairs_pdf.get("a", []), pa.string()),
            "b": pa.array(pairs_pdf.get("b", []), pa.string()),
            "n_a": pa.array(pairs_pdf.get("n_a", []), pa.int64()),
            "n_b": pa.array(pairs_pdf.get("n_b", []), pa.int64()),
        })
        # blocking_bits rides in the manifest: carried pairs are only valid
        # for a tick that derives the SAME block-key scheme
        pairs_w = side.submit(
            store.write, "canon_pairs", ray.data.from_arrow(pairs_tbl),
            fingerprint(base_fp, "canon_pairs", extractor_cls.__name__),
            {"blocking_bits": blocking_bits})
    else:
        alias_w = side.submit(lambda: None)
        pairs_w = side.submit(lambda: None)

    # the edge chain (remap triples → dedupe) is independent of the mention/
    # entity chain — run it on a side thread so its shuffles interleave;
    # remap + map-side combine + reduce fuse into one streaming pipeline
    # remap strategy: broadcast dict for normal alias volumes, distributed
    # hash joins beyond cfg.broadcast_alias_limit (the 10^12-doc path)
    if len(alias) > cfg.broadcast_alias_limit:
        alias_ds = ray.data.from_pandas(pd.DataFrame({
            "member": list(alias), "canonical": list(alias.values())}))

        def remap_triples(t):
            return C.canonical_triples_distributed(t, alias_ds, cfg)
    else:
        def remap_triples(t):
            return C.canonical_triples(t, alias_ref, cfg)

    # triples_canon (the corpus-sized remapped-triples snapshot) and edges
    # are now independent jobs: edges derives from the pre-aggregated
    # partials (broadcast-alias path), so it no longer waits for the full
    # corpus remap to materialize
    def canon_chain():
        return store.run_stage_async_write(
            "triples_canon", fingerprint(alias_fp, "triples_canon"),
            lambda: remap_triples(get_triples()), side, lineage,
        )

    canon_chain_f = side.submit(canon_chain)

    def edge_chain():
        if (len(alias) > cfg.broadcast_alias_limit
                or get_partials() is None):
            # distributed-alias path (the partial rows would need two hash
            # joins against the alias Dataset; the classic full-remap path
            # already has exactly that machinery) — or a resume where the
            # eager pre-aggregate was skipped (see _edge_partials_job)
            triples_canon, _ = canon_chain_f.result()
            return store.run_stage(
                "edges", fingerprint(alias_fp, "edges"),
                lambda: C.dedupe_edges(triples_canon, cfg), lineage,
            )
        partials = get_partials()
        if 0 < partials.count() <= C.MAX_DRIVER_EDGE_PARTIALS:
            # driver-local finish: a ~100-task shuffle for an edge-scale
            # table queues behind the corpus-sized jobs sharing the cluster
            # (see MAX_DRIVER_EDGE_PARTIALS); 0 rows stay on the shuffle
            # path (schema-correct empty output)
            return store.run_stage(
                "edges", fingerprint(alias_fp, "edges"),
                lambda: C.dedupe_edges_from_partials_local(
                    partials, alias_ref, cfg), lineage,
            )
        return store.run_stage(
            "edges", fingerprint(alias_fp, "edges"),
            lambda: C.dedupe_edges_from_partials(
                partials, alias_ref, cfg, n_entities=int(n_entities)),
            lineage,
        )

    edge_chain_f = side.submit(edge_chain)

    # canonical mentions (entity_id, chunk_id) for community ranks
    def canon_mentions(batch: pa.Table) -> pa.Table:
        amap = ray.get(alias_ref)
        # dictionary-encoded: normalize + lookup once per unique surface
        ids = normalize_remap_array(batch.column("entity_surface"), amap)
        return pa.table({
            "entity_id": ids,
            "chunk_id": batch.column("chunk_id"),
            "doc_id": batch.column("doc_id"),
        })

    # mention canonicalization overlaps the edge chain on a side thread —
    # independent sub-DAGs sharing the streaming executor. (The canonical
    # ENTITY table is tiny — aggregated — so it stays lazy and fuses into
    # the final attach stage below: one fewer Dataset execution.)
    _t = _time.monotonic()

    def _mentions_canon_job():
        compute = lambda: mentions.map_batches(  # noqa: E731
            canon_mentions, batch_format="pyarrow", batch_size=8192)
        if cfg.incremental_snapshots:
            return store.run_stage_async_write(
                "mentions_canon", fingerprint(alias_fp, "mentions_canon"),
                compute, side, lineage)
        return compute().materialize(), side.submit(lambda: None)

    mentions_canon_f = side.submit(_mentions_canon_job)
    edges = edge_chain_f.result()

    # mentions_canon is only consumed at the community-RANK step, so it is
    # passed as a resolver: the edge collect + fingerprint + Leiden detection
    # inside communities_and_entities run while the corpus-sized
    # mentions_canon map is still materializing on its side thread
    def _mentions_canon_resolve():
        mc, _w = mentions_canon_f.result()
        # time from the decision chain's start until the rank step could
        # proceed (includes detection overlap) — distinct from the
        # "mentions_canon" stage record, which is the materialize wall
        lineage.record("mentions_canon_resolved", cached=False,
                       wall_s=_time.monotonic() - _t)
        return mc

    entities_final, communities = communities_and_entities(
        store, lineage, cfg, alias_fp, alias_ref, embedded, edges,
        _mentions_canon_resolve, summarizer_factory=summarizer_factory)
    mentions_canon, mentions_canon_w = mentions_canon_f.result()

    # the corpus-sized triples_canon remap ran on a side thread the whole
    # time — collect it only now, after the community tail is done
    triples_canon, canon_w = canon_chain_f.result()
    triples = get_triples()

    chunk_embeddings = chunk_embeddings_f.result()
    span_index = span_index_f.result()
    _t = _time.monotonic()
    _waits = {}
    for _name, _w in (("chunks", chunks_w), ("extractions", extractions_w),
                      ("triples", triples_w), ("triples_canon", canon_w),
                      ("mentions", mentions_w), ("entities_embedded", embedded_w),
                      ("alias", alias_w), ("pairs", pairs_w),
                      ("mentions_canon", mentions_canon_w)):
        _t0 = _time.monotonic()
        _w.result()
        _dt = _time.monotonic() - _t0
        if _dt > 0.05:
            _waits[_name] = round(_dt, 3)
    lineage.record("writes_wait", cached=False,
                   wall_s=_time.monotonic() - _t, waited_on=_waits)
    side.shutdown()

    return {
        "chunks": chunks,
        "span_index": span_index,
        "extractions": extractions,
        "chunk_embeddings": chunk_embeddings,
        "mentions": mentions,
        "triples": triples,
        "triples_canon": triples_canon,
        "entities": entities_final,
        "edges": edges,
        "communities": communities,
        "mentions_canon": mentions_canon,
    }


def _graph_fingerprint(edges_pdf: pd.DataFrame, cfg: KGConfig) -> str:
    """Content address of the community-detection input: an order-independent
    multiset hash of the (src, dst, weight) rows (uint64 per-row hashes summed
    — no driver-side sort of a possibly-20M-row frame) plus every config knob
    detection reads. Same graph + same knobs → same seeded detection result."""
    if edges_pdf.empty or "src" not in edges_pdf.columns:
        content = 0
    else:
        import numpy as np
        row_hashes = pd.util.hash_pandas_object(
            edges_pdf[["src", "dst", "weight"]], index=False).to_numpy()
        content = int(row_hashes.sum(dtype=np.uint64))
    return fingerprint(
        "community_graph", content, len(edges_pdf),
        cfg.community_algorithm, cfg.community_seed, cfg.community_gamma,
        cfg.community_max_levels, cfg.community_objective,
        cfg.sllpa_max_iterations, cfg.sllpa_min_association,
    )


def _write_summary_cache(store: SnapshotStore, communities, sc_fp: str,
                         prev_cache: Dict[str, str], lineage) -> None:
    """Persist {sha1(full_content): summary} for every model-summarized
    community (top-N-sized) so the next tick carries unchanged communities.
    Error sentinels are excluded — a failed summary retries next tick."""
    from ..stages.communities import ModelSummarizer, summary_content_key

    pdf = communities.select_columns(["summary", "full_content"]).to_pandas()
    if len(pdf):
        pdf = pdf[(pdf["summary"] != "")
                  & (pdf["summary"] != ModelSummarizer.ERROR_SENTINEL)]
    keys = [summary_content_key(fc) for fc in pdf.get("full_content", [])]
    hits = sum(1 for k in keys if k in prev_cache)
    tbl = pa.table({
        "content_key": pa.array(keys, pa.string()),
        "summary": pa.array(list(pdf.get("summary", [])), pa.string()),
    })
    if not store.is_complete("summary_cache", sc_fp):
        store.write("summary_cache", ray.data.from_arrow(tbl), sc_fp)
    lineage.record("summary_cache", cached=False, wall_s=0.0,
                   summaries_carried=int(hits),
                   summaries_generated=int(len(keys) - hits))


def _parts_table(parts_pdf: pd.DataFrame) -> pa.Table:
    """(entity_id, comp_fp, levels) per-component membership parts → Arrow
    (the membership_parts snapshot the per-component carry-over reads)."""
    return pa.table({
        "entity_id": pa.array(list(parts_pdf["entity_id"]), pa.string()),
        "comp_fp": pa.array(list(parts_pdf["comp_fp"]), pa.string()),
        "levels": pa.array([list(map(int, x)) for x in parts_pdf["levels"]],
                           pa.list_(pa.int32())),
    })


def _member_levels_from_table(pdf: pd.DataFrame) -> Dict[str, list]:
    """Inverse of communities.community_membership_table — rebuild the
    entity_id -> [community number per level] dict from the snapshot.
    Vectorized boundary split: a pandas groupby-per-entity here cost ~4 s on
    a 47k-entity cache-hit tick (it runs on EVERY tick that hits the
    membership cache — the hot path of a metadata-only update)."""
    import numpy as np
    if pdf.empty or "entity_id" not in pdf.columns:
        return {}
    pdf = pdf.sort_values(["entity_id", "level"], kind="stable")
    ents = pdf["entity_id"].to_numpy()
    nums = pdf["community_number"].to_numpy()
    starts = np.flatnonzero(np.r_[True, ents[1:] != ents[:-1]])
    bounds = np.r_[starts, len(ents)]
    return {ents[i]: [int(x) for x in nums[i:j]]
            for i, j in zip(bounds[:-1], bounds[1:])}


def communities_and_entities(
    store: SnapshotStore,
    lineage: LineageLog,
    cfg: KGConfig,
    alias_fp: str,
    alias_ref,
    embedded: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    mentions_canon: "ray.data.Dataset",
    summarizer_factory=None,
    prev: SnapshotStore | None = None,
):
    """Shared tail of the build: community detection + summaries over the
    aggregated edge graph, then the final entities table with degree and
    community levels attached. Entity-scale throughout (only the rank
    aggregate scans the corpus-sized canonical mentions), so both the fresh
    build and the delta-scoped incremental path run it in full.

    ``mentions_canon`` may be a Dataset or a ZERO-ARG CALLABLE returning one
    — it is only consumed at the rank aggregate, so the fresh build passes a
    resolver and the detection phase overlaps the mentions_canon
    materialization. Returns (entities_final, communities)."""
    import time as _time

    entities0 = C.canonical_entities(embedded, alias_ref, cfg)

    # (measured non-win: materializing the rank aggregate's mentions-side
    # distinct pairs concurrently with Leiden costs MORE than the fused
    # single-scan ranks — the extra pass + object-store round-trip exceeds
    # the ~1.5 s detection window it hides. Keep ranks fused and lazy.)

    # ---- communities (aggregated graph — provably small; guarded) ----
    # guard decision from a metadata count; the light columns collect ONLY
    # below the guard — above it the whole tail (detect → ranks → summarize
    # → attach) stays Datasets and nothing edge- or entity-sized reaches the
    # driver
    _t = _time.monotonic()
    driver_local = edges.count() <= CM.MAX_DRIVER_GRAPH_EDGES
    edges_pdf = (edges.select_columns(["src", "dst", "pred", "weight"])
                 .to_pandas() if driver_local
                 else pd.DataFrame({c: [] for c in
                                    ("src", "dst", "pred", "weight")}))
    _t_collect = _time.monotonic() - _t
    # content-addressed detection cache: the membership is a pure seeded
    # function of the aggregated edge graph + detection knobs, so a tick
    # that leaves the graph unchanged (the common metadata/text-only edit)
    # reuses the previous membership snapshot instead of re-running Leiden
    graph_fp = _graph_fingerprint(edges_pdf, cfg) if driver_local else None
    _t_fp = _time.monotonic() - _t - _t_collect
    member_levels = None
    detect_cached = False
    cached_membership_pdf = None
    if graph_fp is not None:
        for src in (store, prev):
            if src is not None and src.is_complete("membership", graph_fp):
                cached_tbl = src.read_local("membership")
                cached_membership_pdf = (
                    cached_tbl.to_pandas() if cached_tbl is not None
                    else src.read("membership").to_pandas())
                member_levels = _member_levels_from_table(cached_membership_pdf)
                detect_cached = True
                if src is prev and not store.is_complete("membership",
                                                         graph_fp):
                    # forward the hit into THIS tick's store — the next
                    # tick's lookup only consults (its store, this store),
                    # so without the copy the cache would survive one tick
                    store.write_local(
                        "membership",
                        pa.Table.from_pandas(cached_membership_pdf,
                                             preserve_index=False),
                        graph_fp)
                break
    n_carried = n_detected = 0
    membership_ds = None
    if member_levels is None:
        if driver_local:
            # tier 2: per-component carry-over — components whose subgraph
            # is unchanged since the previous tick reuse their stored local
            # membership; only dirty components re-run Leiden
            carry = None
            for src in (prev, store):
                if src is not None and src.manifest("membership_parts"):
                    carry_tbl = src.read_local("membership_parts")
                    carry = (carry_tbl.to_pandas() if carry_tbl is not None
                             else src.read("membership_parts").to_pandas())
                    break
            member_levels, parts_pdf, n_carried, n_detected = (
                CM.detect_communities_partitioned(edges_pdf, cfg,
                                                  carry_parts=carry))
            if graph_fp is not None and not store.is_complete(
                    "membership_parts", graph_fp):
                store.write_local("membership_parts",
                                  _parts_table(parts_pdf), graph_fp)
        else:
            # scale path: memberships stay a Dataset end-to-end — the only
            # driver-side community structure is the community-count-sized
            # renumber map inside detect_communities_distributed_ds
            membership_ds = CM.detect_communities_distributed_ds(
                edges, cfg).materialize()
    elif (prev is not None and prev.manifest("membership_parts")
          and not store.manifest("membership_parts")):
        # tier-1 (whole-graph) hit: forward the per-component parts so the
        # NEXT tick can still carry when only this run's store is consulted
        fwd_tbl = prev.read_local("membership_parts")
        if fwd_tbl is not None:
            store.write_local("membership_parts", fwd_tbl, graph_fp)
        else:
            store.write("membership_parts", prev.read("membership_parts"),
                        graph_fp)
    lineage.record("louvain", cached=detect_cached,
                   wall_s=_time.monotonic() - _t,
                   collect_s=round(_t_collect, 3), fp_s=round(_t_fp, 3),
                   components_carried=n_carried,
                   components_detected=n_detected)
    if membership_ds is None:
        if cached_membership_pdf is not None:
            # cache hit: the snapshot IS the membership table — don't
            # re-explode the dict we just rebuilt from it
            membership_pdf = cached_membership_pdf
        else:
            membership_tbl = CM.community_membership_table(member_levels)
            if graph_fp is not None and not store.is_complete(
                    "membership", graph_fp):
                store.write_local("membership", membership_tbl, graph_fp)
            membership_pdf = membership_tbl.to_pandas()
        # one distributed aggregate over the big mentions side; everything
        # else in the community chain is community-count-sized
        if callable(mentions_canon):
            mentions_canon = mentions_canon()
        ranks = CM.community_ranks(membership_pdf, mentions_canon)
    else:
        if callable(mentions_canon):
            mentions_canon = mentions_canon()
        ranks = CM.community_ranks_distributed(membership_ds, mentions_canon)
    # summarizer identity is part of the stage fingerprint — switching
    # mock ↔ model invalidates the cached communities snapshot
    sumr_tag = ("mock" if summarizer_factory is None else
                f"{getattr(summarizer_factory, '__module__', '?')}."
                f"{getattr(summarizer_factory, '__qualname__', repr(summarizer_factory))}")
    comm_fp = fingerprint(alias_fp, "communities", sumr_tag)
    # content-addressed per-community summary carry-over (model path only):
    # the model prompt is a pure function of full_content, so an unchanged
    # community's summary carries across ticks without a model call. The
    # cache snapshot is top-N-sized (≤ community_top_n_summaries rows).
    sum_cache: Dict[str, str] = {}
    sc_fp = fingerprint("summary_cache", sumr_tag)
    if summarizer_factory is not None:
        for src in (prev, store):
            if src is not None and src.is_complete("summary_cache", sc_fp):
                sc_pdf = src.read("summary_cache").to_pandas()
                if len(sc_pdf) and "content_key" in sc_pdf.columns:
                    sum_cache = dict(zip(sc_pdf["content_key"],
                                         sc_pdf["summary"]))
                break
    if driver_local:
        _t_r = _time.monotonic()
        ranks_pdf = ranks.to_pandas()
        _t_rank = _time.monotonic() - _t_r
        comm_pdf = CM.summarize_communities_local(
            member_levels, edges_pdf, ranks_pdf, cfg,
            summarizer_factory=summarizer_factory, summary_cache=sum_cache)
        lineage.record("community_ranks", cached=False, wall_s=_t_rank,
                       summarize_s=round(_time.monotonic() - _t_r - _t_rank, 3))
        comm_arrow = pa.Table.from_pandas(comm_pdf, preserve_index=False)
        communities = store.run_stage(
            "communities", comm_fp,
            lambda: ray.data.from_arrow(comm_arrow), lineage,
        )
    else:
        communities = store.run_stage(
            "communities", comm_fp,
            lambda: CM.summarize_communities_distributed(
                membership_ds, edges, ranks, cfg,
                summarizer_factory=summarizer_factory,
                summary_cache=sum_cache),
            lineage,
        )
    if summarizer_factory is not None:
        _write_summary_cache(store, communities, sc_fp, sum_cache, lineage)

    # ---- final entities: attach degree + community levels ----
    if driver_local and len(edges_pdf) and "src" in edges_pdf.columns:
        deg = pd.concat([
            edges_pdf.groupby("src").size(), edges_pdf.groupby("dst").size()
        ]).groupby(level=0).sum().to_dict()
    else:
        deg = {}

    if membership_ds is None:

        def _attach(batch: pa.Table, degrees, levels) -> pa.Table:
            ids = batch.column("entity_id").to_pandas()
            degree = pa.array(
                ids.map(degrees).fillna(0).astype("int64").to_numpy(),
                pa.int64())
            lv = ids.map(levels)  # vectorized dict lookup; miss → NaN
            comm = pa.array([v if isinstance(v, list) else [] for v in lv],
                            pa.list_(pa.int32()))
            return (batch.append_column("degree", degree)
                    .append_column("community", comm))

        ent_fp = fingerprint(alias_fp, "entities")
        # 0-row inputs stay on the shuffle path: to_pandas() of an empty
        # Dataset is COLUMN-LESS (groupby/map_groups empty-frame gotcha),
        # while the reducer machinery already produces a schema-correct
        # empty table
        if (not store.is_complete("entities", ent_fp)
                and 0 < embedded.count() <= MAX_DRIVER_ENTITY_ROWS):
            # Driver-local fast path: under the graph guard the merged
            # entity table is entity-scale-small, so the canonicalize
            # shuffle (salt_buckets*4 reduce tasks) + the attach
            # map_batches round-trip are pure task-launch overhead
            # (~1.3 s at 16 cpus for <1k rows — and it grows with cpu
            # count). Same merge reducer over the whole collected frame +
            # the same pandas→Arrow block conversion Ray applies at the
            # reducer boundary → value-identical output (row order is
            # globally sorted instead of bucket-concatenated; all
            # consumers are order-free — pinned by test).
            _t_ent = _time.monotonic()
            alias = ray.get(alias_ref)
            emb_pdf = embedded.to_pandas()
            emb_pdf["entity_id"] = [
                alias.get(s, s) for s in emb_pdf["norm_surface"]]
            merged = C._merge_entities_bucket(emb_pdf)
            from ray.data.block import BlockAccessor
            blk = BlockAccessor.for_block(merged).to_arrow()
            out_tbl = _attach(blk, deg, member_levels)
            lineage.record("entities_local_merge", cached=False,
                           wall_s=_time.monotonic() - _t_ent,
                           n_entities=out_tbl.num_rows)

            def entities_compute():
                return ray.data.from_arrow(out_tbl)
        else:
            attach_ref = ray.put((deg, member_levels))

            def attach(batch: pa.Table) -> pa.Table:
                degrees, levels = ray.get(attach_ref)
                return _attach(batch, degrees, levels)

            def entities_compute():
                return entities0.map_batches(attach, batch_format="pyarrow",
                                             batch_size=8192)
    else:
        # scale path: community levels AND degrees arrive via distributed
        # hash attaches against Datasets (no entity-sized driver dict and no
        # edge-sized degree map). Levels ride as a delimited STRING and both
        # attaches are Arrow end-to-end — the entities' embedding payload
        # must not round-trip through pandas tensor-extension blocks (see
        # arrow_left_attach)
        from ..functions.shuffle import arrow_left_attach, hash_partitioned_groupby

        ent_schema = {
            "entity_id": pa.string(),
            "surface_forms": pa.list_(pa.string()),
            "entity_type": pa.string(),
            "description": pa.string(),
            "embedding": pa.list_(pa.float32()),
            "n_mentions": pa.int64(),
        }
        comm_lists = hash_partitioned_groupby(
            membership_ds.select_columns(
                ["entity_id", "level", "community_number"]),
            ["entity_id"],
            lambda df: (df.sort_values(["entity_id", "level"], kind="stable")
                        .astype({"community_number": str})
                        .groupby("entity_id", sort=False)["community_number"]
                        .agg(",".join).reset_index(name="community")),
            n_buckets=32)
        joined = arrow_left_attach(
            entities0, comm_lists, key="entity_id", value_col="community",
            value_type=pa.string(), lschema=ent_schema)

        # per-node edge-row degree (src size + dst size), two-phase aggregate
        def _deg_partial(b: pa.Table) -> pd.DataFrame:
            cnt = pd.concat([b.column("src").to_pandas(),
                             b.column("dst").to_pandas()]).value_counts()
            return pd.DataFrame({"entity_id": cnt.index,
                                 "degree": cnt.to_numpy()})

        deg_ds = hash_partitioned_groupby(
            edges.select_columns(["src", "dst"]).map_batches(
                _deg_partial, batch_format="pyarrow"),
            ["entity_id"],
            lambda df: (df.groupby("entity_id", sort=False)["degree"].sum()
                        .reset_index()),
            n_buckets=32)
        joined2 = arrow_left_attach(
            joined, deg_ds, key="entity_id", value_col="degree",
            value_type=pa.int64(),
            lschema={**ent_schema, "community": pa.string()})

        def finish(batch: pa.Table) -> pa.Table:
            degree = pc.fill_null(batch.column("degree"), 0)
            comm_str = batch.column("community").to_pylist()
            comm = pa.array(
                [[int(x) for x in s.split(",")] if s else [] for s in comm_str],
                pa.list_(pa.int32()))
            return (batch.drop_columns(["community", "degree"])
                    .append_column("degree", degree)
                    .append_column("community", comm))

        def entities_compute():
            return joined2.map_batches(finish, batch_format="pyarrow")

    entities_final = store.run_stage(
        "entities", fingerprint(alias_fp, "entities"),
        entities_compute,
        lineage,
    )
    return entities_final, communities
