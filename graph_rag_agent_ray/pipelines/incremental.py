"""Incremental update: content-hash delta detection + delta-scoped rebuild.

Reference semantics (/root/reference/build/incremental_update.py:69-111,
build/incremental/file_change_manager.py:31-130,
build/incremental_graph_builder.py:94-309): a sha256 registry detects
added/modified/deleted files; new files run the full pipeline, modified files
are delete+reprocess, deletions cascade; dirty-flag propagation
(graph/indexing/embedding_manager.py:374-474,
incremental_graph_builder.py:520-560) bounds the update cost to the delta.

Ray-Data re-expression — TWO cost tiers, both delta-scoped:

* **Per-document stages** (chunk, extract, chunk-embed, span-index, parse):
  rows are keyed by ``doc_id``, so unchanged documents' rows carry over from
  the previous build's snapshots via a broadcast ``pc.is_in`` filter scan —
  no recompute, no shuffle. Only the dirty delta runs the actual stage.
* **Graph-side aggregates** (exact entity dedup, entity embeddings, canonical
  remap, edge dedup): per-key independence makes them delta-scopable — the
  *touched* key set (surfaces whose mention multiset changed; canonical ids
  affected by alias-map churn; (s,p,o) edge keys that lost or gained a row)
  is delta-sized, so only those groups re-aggregate; every other output row
  carries over from the previous snapshot unchanged. This is the columnar
  equivalent of the reference's dirty-flag propagation.

The remaining full-corpus work per tick is copy-forward I/O (merged snapshots
are rewritten so the NEXT tick has a consistent ``prev``) and the one
community-rank aggregate over canonical mentions; every shuffle, regex parse,
and model call is O(delta). The entity-scale chain (blocking → alias →
communities → final entities) reruns in full, exactly as the reference
re-detects communities each tick — it is aggregated-size, not corpus-size.

Fallback: when the previous build predates the graph-side snapshots
(``cfg.incremental_snapshots``), the legacy path merges what exists and
re-runs ``build_kg`` (correct, not delta-scoped).
"""

from __future__ import annotations

import hashlib
import logging
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional, Set, Tuple

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..config import KGConfig
from ..functions.shuffle import hash_partitioned_groupby
from ..functions.text import normalize_remap_array
from ..state.snapshots import LineageLog, SnapshotStore, fingerprint
from ..stages import canonicalize as C
from ..stages.chunker import build_span_index, chunk_documents
from ..stages.extract import MockLLMExtractor, extract_chunks
from ..stages.index import embed_chunks
from ..stages.parse import parse_mentions, parse_triples
from .build import build_kg, communities_and_entities

logger = logging.getLogger(__name__)

REGISTRY_STAGE = "registry"

# snapshots the delta-scoped graph side needs from the previous build; any
# missing → legacy merge + full build_kg (older prev layouts stay supported)
DELTA_STAGES = (
    "chunks", "extractions", "chunk_embeddings", "span_index", "mentions",
    "triples", "triples_canon", "edges", "mentions_canon",
    "entities_embedded", "alias_map", "canon_pairs",
)

MAX_TOUCHED_KEYS = 20_000_000  # driver guard for the touched-key collects


def document_hashes(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, content_hash) — hash of the full offset-ordered span sequence.

    Vectorized: per-span strings come from one Arrow join kernel over the
    flattened struct fields; the only per-row Python work is the final join +
    sha256 (the hash itself is inherently per-row). The encoding is
    INJECTIVE — every variable-length field is length-prefixed, so field and
    span boundaries decode unambiguously even when a text contains the
    delimiter bytes (a bare delimiter join would let crafted texts alias a
    different span sequence and misclassify an edit as 'unchanged'). The
    format is only ever compared against registries written by the same
    code version (old vs new registry within one tick)."""

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np
        ids = batch.column("doc_id").to_pylist()
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        n = pc.fill_null(pc.list_value_length(spans), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        off = flat.field("offset")

        def framed(col) -> "pa.Array":
            s = pc.cast(col, pa.string())
            s = pc.fill_null(s, "\x00")
            return pc.binary_join_element_wise(
                pc.cast(pc.utf8_length(s), pa.string()), s, ":")

        span_str = pc.binary_join_element_wise(
            framed(flat.field("kind")),
            framed(flat.field("text")),
            framed(flat.field("media_ref")),
            pc.fill_null(pc.cast(off, pa.string()), "\x00"),
            "\x1e")  # a null offset must hash, not null the whole span
        svals = np.asarray(span_str.to_pylist(), dtype=object)
        if len(svals):
            # offset-order within each row (storage order already is, for
            # every source in this repo — the lexsort makes it a guarantee)
            parent = np.repeat(np.arange(len(n)), n)
            order = np.lexsort((off.to_numpy(zero_copy_only=False), parent))
            svals = svals[order]
        bounds = np.concatenate(([0], np.cumsum(n)))
        hashes = [
            hashlib.sha256("\x1f".join(svals[bounds[i]:bounds[i + 1]])
                           .encode()).hexdigest()
            for i in range(len(ids))
        ]
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "content_hash": pa.array(hashes, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=4096)


MAX_DRIVER_REGISTRY_ROWS = 5_000_000


def _classify_status(piv: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, old, new) pivoted hashes → (doc_id, status). ONE definition
    of the status semantics, shared by the driver-merge and distributed
    compute_delta paths so they can never diverge."""
    status = pd.Series("unchanged", index=piv.index)
    status[piv["old"].isna()] = "added"
    status[piv["new"].isna()] = "deleted"
    changed = piv["old"].notna() & piv["new"].notna() & (piv["old"] != piv["new"])
    status[changed] = "modified"
    return pd.DataFrame({"doc_id": piv["doc_id"], "status": status})


def compute_delta(
    old_registry: "ray.data.Dataset", new_registry: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Registry diff → (doc_id, status) with status in {added, modified,
    deleted, unchanged}. Registries are (doc_id, hash) scalars — tiny per
    doc — so below MAX_DRIVER_REGISTRY_ROWS the diff is ONE driver merge
    (the hash-bucket shuffle's fixed cost dwarfs the work at this size);
    beyond the guard the distributed shuffle runs, no driver-side
    materialization of either registry."""
    if old_registry.count() + new_registry.count() <= MAX_DRIVER_REGISTRY_ROWS:
        old = old_registry.to_pandas().rename(columns={"content_hash": "old"})
        new = new_registry.to_pandas().rename(columns={"content_hash": "new"})
        out = _classify_status(old.merge(new, on="doc_id", how="outer"))
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "status": pa.array(out["status"], pa.string()),
        }))

    def tag(which: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column("side", pa.array([which] * len(batch), pa.string()))
        return fn

    both = old_registry.map_batches(tag("old"), batch_format="pyarrow").union(
        new_registry.map_batches(tag("new"), batch_format="pyarrow")
    )

    def diff_bucket(df: pd.DataFrame) -> pd.DataFrame:
        piv = df.pivot_table(index="doc_id", columns="side", values="content_hash",
                             aggfunc="first").reset_index()
        for col in ("old", "new"):
            if col not in piv.columns:
                piv[col] = None
        return _classify_status(piv)

    return hash_partitioned_groupby(both, ["doc_id"], diff_bucket, n_buckets=32)


def _filter_by_docs(ds: "ray.data.Dataset", keep_ref, doc_col: str = "doc_id",
                    invert: bool = False):
    """Broadcast semi/anti-join: vectorized ``pc.is_in`` against the
    broadcast doc-id value_set (``keep_ref`` = ray.put of a pa.Array or a
    set). ``batch_size=None`` keeps whole blocks — the per-call is_in
    hash-set build is paid once per BLOCK, not once per 8k rows."""
    def fn(batch: pa.Table) -> pa.Table:
        keep = ray.get(keep_ref)
        if not isinstance(keep, pa.Array):  # legacy set-shaped refs
            keep = pa.array(sorted(keep), pa.string())
        mask = pc.is_in(batch.column(doc_col), value_set=keep)
        if invert:
            mask = pc.invert(mask)
        return batch.filter(mask)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# delta-scoped graph side
# --------------------------------------------------------------------------

def _norm_col(batch: pa.Table, col: str) -> pd.Series:
    # dictionary-encoded: normalize once per unique surface, not per row
    return normalize_remap_array(batch.column(col)).to_pandas()


_DRIVER_DISTINCT_ROWS = 500_000


def _distinct_norm_surfaces(ds: "ray.data.Dataset", col: str) -> Set[str]:
    """Driver collect of the DISTINCT normalized surfaces of a delta-sized
    dataset (per-batch dedup first; guarded). A small MATERIALIZED input
    (the fresh-mentions table of a routine tick) skips the Dataset
    execution entirely — its blocks are already in the object store and a
    driver normalize over ≤500k rows is cheaper than the ~0.5-1 s fixed
    scheduling cost of a distributed pass."""
    out: Set[str] = set()
    from ray.data.dataset import MaterializedDataset

    if isinstance(ds, MaterializedDataset) \
            and ds.count() <= _DRIVER_DISTINCT_ROWS:
        for tbl in ray.get(ds.to_arrow_refs()):
            if tbl.num_rows:
                out.update(_norm_col(tbl, col).unique())
        if len(out) > MAX_TOUCHED_KEYS:
            raise RuntimeError(
                f"touched-surface set exceeds {MAX_TOUCHED_KEYS}; delta too "
                "large for the delta-scoped path — run a fresh build_kg")
        return out

    def fn(batch: pa.Table) -> pa.Table:
        uniq = _norm_col(batch, col).unique()
        return pa.table({"s": pa.array(uniq, pa.string())})

    for b in ds.map_batches(fn, batch_format="pyarrow",
                            batch_size=16384).iter_batches(batch_format="pyarrow"):
        out.update(b.column("s").to_pylist())
        if len(out) > MAX_TOUCHED_KEYS:
            raise RuntimeError(
                f"touched-surface set exceeds {MAX_TOUCHED_KEYS}; delta too "
                "large for the delta-scoped path — run a fresh build_kg")
    return out


def _filter_surface_in(ds, ref, col: str, invert: bool = False):
    """Keep rows whose NORMALIZED ``col`` is (not) in the broadcast set."""
    def fn(batch: pa.Table) -> pa.Table:
        keep = ray.get(ref)
        mask = pc.is_in(pa.array(_norm_col(batch, col), pa.string()), value_set=keep)
        if invert:
            mask = pc.invert(mask)
        return batch.filter(mask)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def _filter_col_in(ds, ref, col: str, invert: bool = False):
    """Keep rows whose RAW ``col`` is (not) in the broadcast value set."""
    def fn(batch: pa.Table) -> pa.Table:
        keep = ray.get(ref)
        mask = pc.is_in(batch.column(col), value_set=keep)
        if invert:
            mask = pc.invert(mask)
        return batch.filter(mask)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def _edge_key(batch: pa.Table, cols: Tuple[str, str, str]) -> pa.Array:
    a, b, c = (pc.cast(batch.column(x), pa.string()) for x in cols)
    return pc.binary_join_element_wise(a, b, c, "\x1f")


def _filter_edge_keys(ds, keys_ref, cols: Tuple[str, str, str], invert: bool = False):
    def fn(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        mask = pc.is_in(_edge_key(batch, cols), value_set=keys)
        if invert:
            mask = pc.invert(mask)
        return batch.filter(mask)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def _distinct_edge_keys(ds, cols: Tuple[str, str, str]) -> Set[str]:
    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({"k": pc.unique(_edge_key(batch, cols))})

    out: Set[str] = set()
    for b in ds.map_batches(fn, batch_format="pyarrow",
                            batch_size=32768).iter_batches(batch_format="pyarrow"):
        out.update(b.column("k").to_pylist())
        if len(out) > MAX_TOUCHED_KEYS:
            raise RuntimeError(
                f"touched-edge-key set exceeds {MAX_TOUCHED_KEYS}; delta too "
                "large for the delta-scoped path — run a fresh build_kg")
    return out


def _canon_mentions_map(alias_ref):
    """mentions → (entity_id, chunk_id, doc_id) under the broadcast alias map
    (same transform as build_kg's canon_mentions)."""
    def fn(batch: pa.Table) -> pa.Table:
        amap = ray.get(alias_ref)
        ids = normalize_remap_array(batch.column("entity_surface"), amap)
        return pa.table({
            "entity_id": ids,
            "chunk_id": batch.column("chunk_id"),
            "doc_id": batch.column("doc_id"),
        })
    return fn


def _delta_graph_build(
    docs_new, store: SnapshotStore, prev: SnapshotStore, cfg: KGConfig,
    base_fp: str, extractor_cls, dirty: Set[str], kept: Set[str],
    removed: Set[str], lineage: LineageLog, summarizer_factory=None,
) -> Dict[str, "ray.data.Dataset"]:
    """The delta-scoped update: every per-doc stage and every corpus-sized
    shuffle runs only on the touched subset; untouched rows carry over from
    ``prev`` snapshots. Output tables and snapshot fingerprints are identical
    to a fresh ``build_kg`` over the same input (equivalence-tested)."""
    dirty_ref = ray.put(pa.array(sorted(dirty), pa.string()))
    removed_ref = ray.put(pa.array(sorted(removed), pa.string()))
    # prev snapshots hold rows for kept ∪ modified ∪ deleted docs, so the
    # kept-rows filter is an ANTI-join on the DELTA-sized dirty∪removed set
    # (broadcast ~|delta| ids) — never a semi-join on the corpus-sized kept
    # set; the per-block is_in hash build stays O(delta)
    notkept_ref = ray.put(pa.array(sorted(dirty | removed), pa.string()))

    def _kept_rows(ds, col: str = "doc_id"):
        return _filter_by_docs(ds, notkept_ref, col, invert=True)

    writes = ThreadPoolExecutor(max_workers=6)
    pending = []

    # prefetch the previous mentions snapshot into the object store NOW —
    # the kept-rows union is consumed by the entity aggregate several
    # stages later, and a lazy read would put the parquet scan on that
    # stage's critical path (measured +1.2 s on the dense headline); here
    # it overlaps with the per-doc delta stages
    prefetch = ThreadPoolExecutor(max_workers=1)
    f_prev_mentions = prefetch.submit(
        lambda: prev.read("mentions").materialize())
    prefetch.shutdown(wait=False)

    def _record(stage: str, t0: float, **extra) -> None:
        lineage.record(stage, cached=False, wall_s=time.monotonic() - t0,
                       delta_scoped=True, **extra)

    # ---- per-doc stages: fresh compute on dirty docs only; the snapshot
    # update is a DELTA write (prev parquet files hardlinked + tombstones +
    # the fresh rows — no corpus-sized copy-forward I/O, see
    # SnapshotStore.write_delta). ``removed`` = modified ∪ deleted — exactly
    # the docs whose previous snapshot rows are stale. ----
    t0 = time.monotonic()
    docs_dirty = _filter_by_docs(docs_new, dirty_ref)
    chunks_fresh = chunk_documents(docs_dirty, cfg).materialize()
    pending.append(writes.submit(
        store.write_delta, "chunks", prev, chunks_fresh, removed,
        fingerprint(base_fp, "chunks")))
    _record("chunks", t0)

    t0 = time.monotonic()
    extr_fresh = extract_chunks(chunks_fresh, cfg, extractor_cls).materialize()
    pending.append(writes.submit(
        store.write_delta, "extractions", prev, extr_fresh, removed,
        fingerprint(base_fp, "extractions", extractor_cls.__name__)))
    _record("extractions", t0)

    # chunk embeddings — the compute-dominant model stage — fresh inference
    # only for the dirty delta (reference dirty-flag embedding update,
    # embedding_manager.py:374-474); the delta write runs in background
    t0 = time.monotonic()
    pending.append(writes.submit(
        store.write_delta, "chunk_embeddings", prev,
        embed_chunks(chunks_fresh, cfg), removed,
        fingerprint(base_fp, "chunk_embeddings")))
    _record("chunk_embeddings", t0)

    t0 = time.monotonic()
    pending.append(writes.submit(
        store.write_delta, "span_index", prev,
        build_span_index(docs_dirty, cfg), removed,
        fingerprint(base_fp, "span_index")))
    _record("span_index", t0)

    # ---- parse: regex pass only over the dirty extractions ----
    t0 = time.monotonic()
    mentions_fresh = parse_mentions(extr_fresh, cfg).materialize()
    triples_fresh = parse_triples(extr_fresh, cfg).materialize()
    # kept-row views stay LAZY: the mentions union is consumed once (the
    # touched-surface scan); kept triples are only scanned at all when the
    # alias diff is non-empty
    mentions_kept = _kept_rows(f_prev_mentions.result())
    triples_kept = _kept_rows(prev.read("triples"))
    mentions = mentions_fresh.union(mentions_kept)
    pending.append(writes.submit(
        store.write_delta, "mentions", prev, mentions_fresh, removed,
        fingerprint(base_fp, "mentions", extractor_cls.__name__)))
    pending.append(writes.submit(
        store.write_delta, "triples", prev, triples_fresh, removed,
        fingerprint(base_fp, "triples", extractor_cls.__name__)))
    _record("mentions", t0)

    # ---- touched surfaces: mention multiset changed for exactly the
    # surfaces seen in fresh mentions or in removed docs' prior mentions ----
    t0 = time.monotonic()
    # dense-vocabulary decision: when the touched set covers most of the
    # previous vocabulary (low-cardinality corpora — every doc reuses the
    # same few hundred surfaces), the carry-over filters scan every row only
    # to keep ~nothing, and the per-key bookkeeping costs MORE than a plain
    # full re-aggregate. Bypass to fresh-build semantics for the entity and
    # edge aggregates (identical output — they are pure functions of the
    # merged inputs); per-doc stages above stay delta-scoped regardless.
    # The decision reads the FRESH side only (touched_fresh ⊆ touched, so
    # fresh-dense ⇒ dense): in dense mode the removed-doc mention scan —
    # the one corpus-sized execution in this section — is never consumed
    # (its only users are the sparse-path filters, and existence churn
    # comes from the vocabulary diff below). A deletion-heavy tick with a
    # small fresh side conservatively takes the sparse path. The removed
    # scan is submitted SPECULATIVELY before the decision so the common
    # sparse tick keeps the two-scan overlap (~1 s of fixed scheduler cost
    # per execution); a dense tick merely lets the speculative scan finish
    # in the background, overlapped with the full re-aggregate.
    scans = ThreadPoolExecutor(max_workers=2)
    # pure-append tick (no modified/deleted docs): the removed-doc mention
    # scan would keep zero rows — skip the submit entirely
    f_removed = scans.submit(
        lambda: _distinct_norm_surfaces(
            _filter_by_docs(f_prev_mentions.result(), removed_ref),
            "entity_surface")) if removed else None
    # ONE read of the previous vocabulary serves both the dense decision
    # (its length) and the existence diff below (its surface set) — the
    # round-4 path paid a count() here plus a second full read later
    def _read_prev_vocab() -> pd.DataFrame:
        # control-plane read: prefer the driver-local parquet path (~ms)
        # over a Dataset execution (~0.5 s fixed) — entities_embedded is
        # vocabulary-sized and full-written, so this almost always hits
        local = prev.read_local("entities_embedded", columns=["norm_surface"])
        if local is not None:
            return local.to_pandas()
        return prev.read("entities_embedded",
                         columns=["norm_surface"]).to_pandas()

    f_prev_vocab = scans.submit(_read_prev_vocab)
    scans.shutdown(wait=False)
    touched_fresh = _distinct_norm_surfaces(mentions_fresh, "entity_surface")
    prev_vocab_pdf = f_prev_vocab.result()
    prev_vocab = len(prev_vocab_pdf)
    dense = len(touched_fresh) >= max(
        cfg.incremental_dense_min,
        int(prev_vocab * cfg.incremental_dense_fraction))
    if dense:
        touched = touched_fresh
        touched_ref = None  # no sparse-path filter ever runs in dense mode
    else:
        touched = touched_fresh | (f_removed.result()
                                   if f_removed is not None else set())
        touched_ref = ray.put(pa.array(sorted(touched), pa.string()))
    _record("touched_surfaces", t0, n_touched=len(touched),
            prev_vocab=int(prev_vocab), dense_bypass=dense)

    # ---- exact dedup + entity embedding ----
    # sparse: per-surface aggregation is independent across surfaces, so
    # re-aggregating exactly the touched groups from the merged mentions
    # reproduces the fresh-build rows; untouched rows carry over embedded.
    # dense: aggregate the full merged mentions directly (one normalize pass,
    # no filter scans) — same rows, fresh-build cost.
    t0 = time.monotonic()
    if dense:
        embedded = C.embed_entities(C.aggregate_exact(mentions, cfg),
                                    cfg).materialize()
    else:
        exact_touched = C.aggregate_exact(
            _filter_surface_in(mentions, touched_ref, "entity_surface"), cfg)
        embedded_touched = C.embed_entities(exact_touched, cfg)
        embedded_kept = _filter_col_in(
            prev.read("entities_embedded"), touched_ref, "norm_surface",
            invert=True)
        embedded = embedded_touched.union(embedded_kept).materialize()
    pending.append(writes.submit(
        store.write, "entities_embedded", embedded,
        fingerprint(base_fp, "entities_embedded", extractor_cls.__name__)))
    _record("entities_embedded", t0, dense_bypass=dense)

    # ---- blocking → pairs → alias map (DIRTY-BLOCK scoped) ----
    # Pair membership is a pure function of each block's member surface SET:
    # block keys derive from the surface text alone (surface_block_keys),
    # the pair generators see only member surfaces and their DETERMINISTIC
    # hash embeddings (EmbedEntities is a function of norm_surface), and the
    # judge is surface-only (judge_indices). So the touched set splits:
    #
    # * EXISTENCE-touched — surfaces that entered or left the vocabulary —
    #   change their blocks' member sets: re-pair exactly those blocks.
    # * COUNT-touched — mention count changed, surface present both ticks —
    #   change NO block and NO pair decision; only the n_a/n_b metadata
    #   carried on their pairs is stale (build_alias_map reads counts off
    #   the pair rows), and a vectorized map() refresh fixes it in place.
    #
    # A bulk edit that rewrites counts across the corpus therefore still
    # takes the scoped path (the usual tick mutates text in place: counts
    # churn, the vocabulary barely moves). The saturation bypass now keys on
    # existence churn only: each such surface dirties one bucket per LSH
    # table, so once existence-touched approaches the bucket count
    # (2^lsh_bits) virtually every block is dirty and the plain vocab-scale
    # re-pair is faster than scoped bookkeeping.
    t0 = time.monotonic()
    pair_cols = ["block_key", "a", "b", "n_a", "n_b"]
    bits = C.auto_blocking_bits(embedded.count(), cfg)
    prev_bits = (prev.manifest("canon_pairs") or {}).get("blocking_bits")
    # (norm_surface, n_mentions) serving the existence split + count patch.
    # Sparse: two touched-sized filter collects, run concurrently (each
    # execution carries ~1 s of scheduler fixed cost that would otherwise
    # serialize into the update's critical path). Dense: the touched set ≈
    # the vocabulary, so collect BOTH vocabularies unfiltered (entity-scale)
    # — existence churn is exactly their symmetric difference (a surface
    # enters/leaves the vocabulary only by a mention change, which makes it
    # touched), and the count patch over the full new vocabulary is a no-op
    # for surfaces whose counts did not change.
    if dense:
        touched_new_pdf = embedded.select_columns(
            ["norm_surface", "n_mentions"]).to_pandas()
    else:
        touched_new_pdf = (
            _filter_col_in(embedded, touched_ref, "norm_surface")
            .select_columns(["norm_surface", "n_mentions"]).to_pandas())
    new_present = (set(touched_new_pdf["norm_surface"])
                   if len(touched_new_pdf) else set())
    # previous-side presence comes from the vocabulary pdf already read for
    # the dense decision — no second distributed scan
    prev_present_all = (set(prev_vocab_pdf["norm_surface"])
                        if len(prev_vocab_pdf) else set())
    prev_present = prev_present_all if dense else (prev_present_all & touched)
    if dense:
        existence_touched = new_present ^ prev_present
    else:
        existence_touched = touched - (new_present & prev_present)
    # carried pairs are only valid under the SAME block-key scheme — a
    # vocabulary-growth step that changes the auto bits forces a full re-pair
    scoped = (prev_bits == bits
              and len(existence_touched) <= max(8, (1 << bits) // 8))
    if scoped:
        dirty_keys = C.surface_block_keys(sorted(existence_touched), cfg,
                                          bits=bits)
        if dirty_keys:
            dirty_ref = ray.put(pa.array(sorted(dirty_keys), pa.string()))
            fresh_pairs = C.candidate_pairs_pdf(
                embedded, cfg, keep_block_key=True, only_keys=dirty_keys,
                bits=bits,
            )
            carried_pairs = _filter_col_in(
                prev.read("canon_pairs"), dirty_ref, "block_key", invert=True,
            ).to_pandas()
        else:
            fresh_pairs = pd.DataFrame({c: [] for c in pair_cols})
            carried_pairs = prev.read("canon_pairs").to_pandas()
        if len(carried_pairs) and len(touched_new_pdf):
            # refresh stale counts on carried pairs (count-touched surfaces;
            # removed surfaces never reach here — their blocks are dirty)
            patch = dict(zip(touched_new_pdf["norm_surface"],
                             touched_new_pdf["n_mentions"]))
            if patch:
                carried_pairs = carried_pairs.copy()
                for col, ncol in (("a", "n_a"), ("b", "n_b")):
                    m = carried_pairs[col].map(patch)
                    carried_pairs[ncol] = (
                        m.fillna(carried_pairs[ncol]).astype("int64"))
        frames = [f[pair_cols] for f in (fresh_pairs, carried_pairs) if len(f)]
    else:
        dirty_keys = ()
        fresh_pairs = C.candidate_pairs_pdf(
            embedded, cfg, keep_block_key=True, bits=bits)
        frames = [fresh_pairs[pair_cols]] if len(fresh_pairs) else []
    pairs_pdf = (pd.concat(frames, ignore_index=True) if frames
                 else pd.DataFrame({c: [] for c in pair_cols}))
    pending.append(writes.submit(
        store.write, "canon_pairs",
        ray.data.from_arrow(pa.table({
            "block_key": pa.array(pairs_pdf["block_key"], pa.string()),
            "a": pa.array(pairs_pdf["a"], pa.string()),
            "b": pa.array(pairs_pdf["b"], pa.string()),
            "n_a": pa.array(pairs_pdf["n_a"], pa.int64()),
            "n_b": pa.array(pairs_pdf["n_b"], pa.int64()),
        })),
        fingerprint(base_fp, "canon_pairs", extractor_cls.__name__),
        {"blocking_bits": bits}))
    if len(pairs_pdf):
        counts = dict(zip(pairs_pdf["a"], pairs_pdf["n_a"]))
        counts.update(zip(pairs_pdf["b"], pairs_pdf["n_b"]))
    else:
        counts = {}
    alias = C.build_alias_map(pairs_pdf, counts)
    alias_ref = ray.put(alias)
    alias_fp = fingerprint(base_fp, sorted(alias.items()))
    alias_tbl = pa.table({
        "member": pa.array(list(alias), pa.string()),
        "canonical": pa.array(list(alias.values()), pa.string()),
    })
    pending.append(writes.submit(
        store.write, "alias_map", ray.data.from_arrow(alias_tbl),
        fingerprint(base_fp, "alias_map", extractor_cls.__name__)))
    _record("alias_map", t0, n_pairs=int(len(pairs_pdf)), n_aliases=len(alias),
            scoped=scoped, n_dirty_blocks=len(dirty_keys),
            n_fresh_pairs=int(len(fresh_pairs)),
            n_existence_touched=len(existence_touched))

    # ---- alias diff → affected canonical ids ----
    # a surface s with old_map(s) == new_map(s) produces identical canonical
    # rows; only surfaces whose mapping changed (and the canonical ids they
    # pointed at, old or new) can invalidate carried rows
    old_alias_pdf = prev.read("alias_map").to_pandas()
    old_alias: Dict[str, str] = dict(zip(old_alias_pdf.get("member", []),
                                         old_alias_pdf.get("canonical", [])))
    changed = {s for s in set(old_alias) | set(alias)
               if old_alias.get(s, s) != alias.get(s, s)}
    affected = ({old_alias.get(s, s) for s in changed}
                | {alias.get(s, s) for s in changed} | changed)
    affected_ref = ray.put(pa.array(sorted(affected), pa.string()))
    old_alias_ref = ray.put(old_alias)
    affected_set_ref = ray.put(affected)

    # ---- triples_canon: carried rows + delta remap ----
    # carried: kept-doc rows whose canonical endpoints are unaffected by the
    # alias churn (for those, old mapping == new mapping, proven by the diff);
    # redo: dirty-doc rows + kept-doc rows whose OLD canonical endpoint is
    # affected — together an exact partition of the merged raw triples.
    # When the alias diff is EMPTY (the common small-delta tick) the
    # endpoint conditions are vacuous: carried = all kept-doc rows, redo =
    # fresh rows only — the two corpus-sized normalize-and-remap scans over
    # kept triples/mentions are skipped entirely.
    t0 = time.monotonic()
    has_affected = bool(affected)

    def _carried_tc(batch: pa.Table) -> pa.Table:
        mask = pc.invert(
            pc.is_in(batch.column("doc_id"), value_set=ray.get(notkept_ref)))
        if has_affected:
            aff = ray.get(affected_ref)
            mask = pc.and_(mask, pc.and_(
                pc.invert(pc.is_in(batch.column("subj"), value_set=aff)),
                pc.invert(pc.is_in(batch.column("obj"), value_set=aff)),
            ))
        return batch.filter(mask)

    prev_tc = prev.read("triples_canon")
    if not dense:
        prev_tc = prev_tc.materialize()  # one read, two scans (carried + invalidated)
    tc_carried = prev_tc.map_batches(
        _carried_tc, batch_format="pyarrow", batch_size=None)

    def _old_canon_affected(cols):
        def fn(batch: pa.Table) -> pa.Table:
            old_map = ray.get(old_alias_ref)
            aff = ray.get(affected_set_ref)
            mask = None
            for col in cols:
                norm = _norm_col(batch, col)
                old_c = norm.map(old_map).fillna(norm) if old_map else norm
                m = old_c.isin(aff).to_numpy()
                mask = m if mask is None else (mask | m)
            return batch.filter(pa.array(mask))
        return fn

    if affected:
        triples_redo = triples_fresh.union(triples_kept.map_batches(
            _old_canon_affected(["subj", "obj"]), batch_format="pyarrow",
            batch_size=None))
    else:
        triples_redo = triples_fresh
    tc_redo = C.canonical_triples(triples_redo, alias_ref, cfg).materialize()
    triples_canon = tc_carried.union(tc_redo)
    if affected:
        # redo includes SOME rows of kept docs — doc-granular tombstones
        # can't express that; full rewrite on alias-churn ticks
        triples_canon = triples_canon.materialize()
        pending.append(writes.submit(store.write, "triples_canon", triples_canon,
                                     fingerprint(alias_fp, "triples_canon")))
    else:
        pending.append(writes.submit(
            store.write_delta, "triples_canon", prev, tc_redo, removed,
            fingerprint(alias_fp, "triples_canon")))
    _record("triples_canon", t0, n_affected_ids=len(affected))

    # ---- edges: re-dedupe only the (s,p,o) groups that lost or gained a
    # row; every other edge's input multiset is unchanged. Dense regime: the
    # touched-key set approaches the whole edge table (every surface's groups
    # churned), so skip the key bookkeeping and dedupe the merged
    # triples_canon in full — the fresh-build aggregate, same output. ----
    t0 = time.monotonic()
    if dense:
        edges = C.dedupe_edges(triples_canon, cfg).materialize()
        pending.append(writes.submit(store.write, "edges", edges,
                                     fingerprint(alias_fp, "edges")))
        _record("edges", t0, dense_bypass=True)
    else:
        def _invalidated_tc(b: pa.Table) -> pa.Table:
            mask = pc.is_in(b.column("doc_id"), value_set=ray.get(notkept_ref))
            if has_affected:
                aff = ray.get(affected_ref)
                mask = pc.or_(mask, pc.or_(
                    pc.is_in(b.column("subj"), value_set=aff),
                    pc.is_in(b.column("obj"), value_set=aff),
                ))
            return b.filter(mask)

        invalidated_prev = prev_tc.map_batches(
            _invalidated_tc, batch_format="pyarrow", batch_size=None)
        touched_keys = _distinct_edge_keys(
            invalidated_prev, ("subj", "pred", "obj"))
        touched_keys |= _distinct_edge_keys(tc_redo, ("subj", "pred", "obj"))
        tkeys_ref = ray.put(pa.array(sorted(touched_keys), pa.string()))
        edges_touched = C.dedupe_edges(
            _filter_edge_keys(triples_canon, tkeys_ref,
                              ("subj", "pred", "obj")), cfg)
        edges_kept = _filter_edge_keys(
            prev.read("edges"), tkeys_ref, ("src", "pred", "dst"), invert=True)
        edges = edges_touched.union(edges_kept).materialize()
        pending.append(writes.submit(store.write, "edges", edges,
                                     fingerprint(alias_fp, "edges")))
        _record("edges", t0, n_touched_keys=len(touched_keys))

    # ---- mentions_canon: same carried/redo split as triples_canon ----
    t0 = time.monotonic()

    def _carried_mc(batch: pa.Table) -> pa.Table:
        mask = pc.invert(
            pc.is_in(batch.column("doc_id"), value_set=ray.get(notkept_ref)))
        if has_affected:
            mask = pc.and_(mask, pc.invert(pc.is_in(
                batch.column("entity_id"), value_set=ray.get(affected_ref))))
        return batch.filter(mask)

    mc_carried = prev.read("mentions_canon").map_batches(
        _carried_mc, batch_format="pyarrow", batch_size=None)
    if affected:
        mentions_redo = mentions_fresh.union(mentions_kept.map_batches(
            _old_canon_affected(["entity_surface"]), batch_format="pyarrow",
            batch_size=None))
    else:
        mentions_redo = mentions_fresh
    mc_redo = mentions_redo.map_batches(
        _canon_mentions_map(alias_ref), batch_format="pyarrow", batch_size=8192)
    mentions_canon = mc_carried.union(mc_redo)
    if affected:
        mentions_canon = mentions_canon.materialize()
        pending.append(writes.submit(store.write, "mentions_canon", mentions_canon,
                                     fingerprint(alias_fp, "mentions_canon")))
    else:
        mc_redo = mc_redo.materialize()
        mentions_canon = mc_carried.union(mc_redo)
        pending.append(writes.submit(
            store.write_delta, "mentions_canon", prev, mc_redo, removed,
            fingerprint(alias_fp, "mentions_canon")))
    _record("mentions_canon", t0)

    # ---- communities + final entities (shared tail; entity-scale) ----
    entities_final, communities = communities_and_entities(
        store, lineage, cfg, alias_fp, alias_ref, embedded, edges,
        mentions_canon, summarizer_factory=summarizer_factory, prev=prev)

    t0 = time.monotonic()
    for f in pending:
        f.result()
    writes.shutdown()
    _record("writes_wait", t0)

    # corpus-sized tables read back from the just-written delta snapshots
    # (lazy; prev files are hardlinked so the read is as cheap as a fresh
    # snapshot) — returning the in-memory lazy unions instead would make any
    # consumer count()/scan re-execute the carry-over filter over the whole
    # previous corpus
    return {
        "chunks": store.read("chunks"),
        "span_index": store.read("span_index"),
        "extractions": store.read("extractions"),
        "chunk_embeddings": store.read("chunk_embeddings"),
        "mentions": store.read("mentions"),
        "triples": store.read("triples"),
        "triples_canon": store.read("triples_canon"),
        "entities": entities_final,
        "edges": edges,
        "communities": communities,
        "mentions_canon": store.read("mentions_canon"),
    }


# --------------------------------------------------------------------------
# legacy path (previous build lacks graph-side snapshots)
# --------------------------------------------------------------------------

def _legacy_incremental(
    docs_new, store: SnapshotStore, prev: SnapshotStore, cfg: KGConfig,
    base_fp: str, out_dir: str, input_token: str, extractor_cls,
    dirty: Set[str], kept: Set[str], summarizer_factory=None,
) -> Dict[str, "ray.data.Dataset"]:
    """Merge the per-doc snapshots that DO exist under the new build's
    fingerprints, then run ``build_kg`` (it resumes into the downstream
    stages). Correct for any prev layout; graph side is O(corpus)."""
    dirty_ref = ray.put(pa.array(sorted(dirty), pa.string()))
    kept_ref = ray.put(pa.array(sorted(kept), pa.string()))

    writes = ThreadPoolExecutor(max_workers=3)
    docs_dirty = _filter_by_docs(docs_new, dirty_ref)
    if prev.manifest("chunks"):
        chunks_kept = _filter_by_docs(prev.read("chunks"), kept_ref)
        chunks_merged = chunk_documents(docs_dirty, cfg).union(chunks_kept)
    else:
        chunks_merged = chunk_documents(docs_dirty, cfg)
    chunks_merged = chunks_merged.materialize()
    pending = [writes.submit(store.write, "chunks", chunks_merged,
                             fingerprint(base_fp, "chunks"))]

    if prev.manifest("extractions"):
        extr_kept = _filter_by_docs(prev.read("extractions"), kept_ref)
        chunks_dirty_only = _filter_by_docs(chunks_merged, dirty_ref)
        extr_merged = extract_chunks(chunks_dirty_only, cfg, extractor_cls).union(extr_kept)
    else:
        extr_merged = extract_chunks(chunks_merged, cfg, extractor_cls)
    pending.append(writes.submit(
        store.write, "extractions", extr_merged,
        fingerprint(base_fp, "extractions", extractor_cls.__name__)))

    if prev.manifest("chunk_embeddings"):
        emb_kept = _filter_by_docs(prev.read("chunk_embeddings"), kept_ref)
        chunks_dirty2 = _filter_by_docs(chunks_merged, dirty_ref)
        emb_merged = embed_chunks(chunks_dirty2, cfg).union(emb_kept)
        pending.append(writes.submit(
            store.write, "chunk_embeddings", emb_merged,
            fingerprint(base_fp, "chunk_embeddings")))

    for f in pending:
        f.result()
    writes.shutdown()

    return build_kg(docs_new, out_dir, cfg=cfg, input_token=input_token,
                    extractor_cls=extractor_cls,
                    summarizer_factory=summarizer_factory)


def incremental_build_kg(
    docs_new: "ray.data.Dataset",
    out_dir: str,
    prev_dir: str,
    cfg: Optional[KGConfig] = None,
    input_token: str = "",
    extractor_cls=MockLLMExtractor,
    summarizer_factory=None,
) -> Tuple[Dict[str, "ray.data.Dataset"], Dict[str, int]]:
    """Update the KG at ``out_dir`` given the previous build at ``prev_dir``.

    Returns (tables, delta_counts). With a full set of prev snapshots the
    whole pipeline — including the graph side — is delta-scoped; otherwise
    the legacy merge + full-rebuild path runs.
    """
    cfg = cfg or KGConfig()
    prev = SnapshotStore(prev_dir)
    store = SnapshotStore(out_dir)
    lineage = LineageLog(out_dir)

    t_reg = time.monotonic()
    new_registry = document_hashes(docs_new).materialize()
    if prev.manifest(REGISTRY_STAGE):
        old_registry = prev.read(REGISTRY_STAGE)
    else:
        old_registry = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.string()),
            "content_hash": pa.array([], pa.string()),
        }))

    delta = compute_delta(old_registry, new_registry).materialize()
    lineage.record("registry_diff", cached=False,
                   wall_s=time.monotonic() - t_reg)
    # doc_id sets for the delta (broadcast; at 10^12 scale this becomes a
    # bloom filter / semi-join, same shape). Status counts come off the same
    # collect — a separate groupby().count() would re-execute the delta
    # pipeline as one more all-to-all just to produce four integers.
    changed_pdf = delta.to_pandas()
    counts = {
        s: 0 for s in ("added", "modified", "deleted", "unchanged")
    }
    if len(changed_pdf):
        counts.update({str(k): int(v) for k, v in
                       changed_pdf["status"].value_counts().items()})
    dirty = set(changed_pdf.loc[changed_pdf["status"].isin(["added", "modified"]), "doc_id"])
    kept = set(changed_pdf.loc[changed_pdf["status"] == "unchanged", "doc_id"])
    removed = set(changed_pdf.loc[changed_pdf["status"].isin(["modified", "deleted"]), "doc_id"])

    base_fp = fingerprint(input_token, cfg)

    if cfg.incremental_snapshots and all(prev.manifest(s) for s in DELTA_STAGES):
        tables = _delta_graph_build(
            docs_new, store, prev, cfg, base_fp, extractor_cls,
            dirty, kept, removed, lineage,
            summarizer_factory=summarizer_factory)
    else:
        tables = _legacy_incremental(
            docs_new, store, prev, cfg, base_fp, out_dir, input_token,
            extractor_cls, dirty, kept,
            summarizer_factory=summarizer_factory)

    store.write(REGISTRY_STAGE, new_registry, fingerprint(base_fp, REGISTRY_STAGE))
    return tables, counts


def write_registry(docs: "ray.data.Dataset", out_dir: str,
                   cfg: Optional[KGConfig] = None, input_token: str = "") -> None:
    """Persist the content-hash registry for a completed build (call after
    build_kg so the next incremental run can diff against it)."""
    cfg = cfg or KGConfig()
    store = SnapshotStore(out_dir)
    store.write(REGISTRY_STAGE, document_hashes(docs),
                fingerprint(fingerprint(input_token, cfg), REGISTRY_STAGE))
