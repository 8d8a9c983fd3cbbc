"""Entity linking + canonicalization as explicit Ray Data shuffles.

Replaces the reference's Neo4j-hosted pipeline (embedding KNN → SIMILAR edges
→ GDS WCC → edit-distance candidate groups → LLM merge judge → apoc
mergeNodes → duplicate-relationship cleanup; /root/reference/graph/processing/
similar_entity.py:147-442 and entity_merger.py:89-526) with:

1. **Exact dedup** — normalize surfaces, then a skew-proof two-phase
   aggregate: per-batch partial aggregation (map-side combine — one row per
   surface per batch, no shuffle) followed by a hash-bucket-partitioned
   vectorized reduce (functions/shuffle.py). The combine bounds any
   Zipf-hot key's reducer fan-in to the number of input blocks — the salting
   strategy the north rule requires, applied as combine-then-shuffle.
2. **Similarity blocking** — deterministic hash embeddings + multi-table
   random-hyperplane LSH keys PLUS a normalized-prefix key, exploded to
   (block_key, entity) rows and shuffled with groupby(block_key). Within each
   block an exact cosine top-k (cutoff 0.9, k 10 — the reference's GDS KNN
   parameters, similar_entity.py:169-180) proposes pairs.
3. **Merge judge** — deterministic rules standing in for the LLM dedup prompt
   (config/prompt.py:103-137): suffix/punctuation-folded equality, else edit
   distance < 3 (similar_entity.py:17,324), never merging surfaces that
   differ in digits (prompt rule 4: numbers/dates/models are distinct).
4. **Union-find** on surviving pairs (driver-side with an explicit size
   guard — candidate pairs are orders of magnitude smaller than the corpus;
   the reference's WCC+transitive-closure equivalent).
5. **Canonical remap** — the alias map is broadcast once via ray.put and read
   inside map_batches (no shuffle join); edges deduped per (src, dst, pred)
   keeping the deterministic-first description (entity_merger.py:409-450
   keeps rels[0]; our "first" is min chunk_id so it is order-stable).

Canonical representative = the member with the highest mention count (tie →
lexicographically smallest). The reference keeps the first node's properties
(apoc 'discard'); arrival order is nondeterministic under parallel execution,
so majority-mention is the order-free equivalent.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Set, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..config import KGConfig
from ..functions.embed import (cosine_topk_pairs, embed_texts,
                               list_column_to_matrix, lsh_bucket)
from ..functions.shuffle import hash_partitioned_groupby
from ..functions.text import (edit_distance, normalize_remap_array,
                              normalize_surface, normalize_surface_series)
from ..functions.unionfind import UnionFind

logger = logging.getLogger(__name__)

MAX_BLOCK_COMPARE = 1024  # pairwise-compare cap per block (logged, not silent)
MAX_DRIVER_PAIRS = 5_000_000  # union-find size guard


# --------------------------------------------------------------------------
# 1. exact dedup (salted two-phase aggregate)
# --------------------------------------------------------------------------

def _capped_lists(df: pd.DataFrame, keys: List[str], col: str,
                  cap: int, out_col: str | None = None) -> pd.DataFrame:
    """Per-key list of the ``cap`` smallest DISTINCT values of ``col`` —
    fully vectorized (global sort + numpy boundary split), replacing the
    per-group ``agg(lambda s: sorted(set(s))[:cap])`` that cost one Python
    call per key group in every hot aggregate (100k+ groups per edge
    bucket). Input rows may repeat; output is one row per key with a
    Python-list cell (the shuffle's reducer-boundary contract)."""
    out_col = out_col or col
    uq = df[keys + [col]].drop_duplicates().sort_values(keys + [col],
                                                        kind="stable")
    uq = uq.groupby(keys, sort=False).head(cap)
    vals = uq[col].to_numpy(dtype=object)
    kframe = uq[keys]
    change = (kframe != kframe.shift()).any(axis=1).to_numpy()
    starts = np.flatnonzero(change)
    bounds = np.r_[starts, len(uq)]
    out = uq.iloc[starts][keys].reset_index(drop=True)
    out[out_col] = [list(vals[i:j]) for i, j in zip(bounds[:-1], bounds[1:])]
    return out


def _partial_exact(batch: pa.Table) -> pd.DataFrame:
    """Per-batch partial aggregation (map-side combine): one output row per
    (surface, type) per batch — no shuffle. This bounds any Zipf-hot key's
    reducer fan-in to the number of input blocks, which is the salting the
    north rule requires for the canonicalization shuffle (combine-then-
    shuffle instead of an explicit salt column; see functions/shuffle.py)."""
    # normalize via dictionary encode (once per unique surface, not per row)
    norm_arr = normalize_remap_array(batch.column("entity_surface"))
    df = pa.Table.to_pandas(batch)
    df["norm_surface"] = norm_arr.to_pandas()
    # description = the min (chunk_id, description) pair's description —
    # lexicographic min distributes over batch partitioning, so the reducer's
    # pick is identical for ANY batching (the delta-scoped incremental path
    # re-aggregates with different batching and must reproduce fresh-build
    # rows exactly); a bare "first" would be batch-order-dependent on ties
    ordered = df.sort_values(["chunk_id", "description"], kind="stable")
    keys = ["norm_surface", "entity_type"]
    grouped = (
        ordered.groupby(keys, sort=False)
        .agg(
            n_mentions=("chunk_id", "size"),
            min_chunk=("chunk_id", "min"),
            description=("description", "first"),
        )
        .reset_index()
    )
    # 8 lexicographically-smallest raw surfaces per (surface, type) —
    # vectorized (was a per-group sorted(set(...))[:8] lambda)
    grouped = grouped.merge(
        _capped_lists(df, keys, "entity_surface", 8, "surfaces"), on=keys)
    # emit Arrow so the dedup shuffle moves zero-copy blocks (surfaces
    # becomes list<string>; the reducer boundary restores Python lists)
    return pa.Table.from_pandas(grouped, preserve_index=False)


def _final_exact_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-bucket reducer: merges all partials of every surface in
    the bucket. Majority type (tie → lexicographic), description from the row
    with the smallest chunk_id (order-stable 'first'), union of surfaces."""
    type_counts = (
        df.groupby(["norm_surface", "entity_type"], sort=False)["n_mentions"]
        .sum().reset_index()
        .sort_values(["norm_surface", "n_mentions", "entity_type"],
                     ascending=[True, False, True], kind="stable")
    )
    top_type = type_counts.drop_duplicates("norm_surface")[["norm_surface", "entity_type"]]
    firsts = (
        # ties in min_chunk (duplicate chunk content across docs, or surface
        # variants inside one chunk) break on description — batching-free
        df.sort_values(["norm_surface", "min_chunk", "description"], kind="stable")
        .drop_duplicates("norm_surface")[["norm_surface", "description"]]
    )
    n = df.groupby("norm_surface", sort=False)["n_mentions"].sum().reset_index()
    surf = _capped_lists(df[["norm_surface", "surfaces"]].explode("surfaces"),
                         ["norm_surface"], "surfaces", 16, "surface_forms")
    out = top_type.merge(firsts, on="norm_surface").merge(n, on="norm_surface") \
        .merge(surf, on="norm_surface")
    return out[["norm_surface", "entity_type", "description", "n_mentions", "surface_forms"]]


def _merge_exact_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Tree-combine level between :func:`_partial_exact` and
    :func:`_final_exact_bucket`: merge partial rows per
    (norm_surface, entity_type). Associative and final-preserving:
    n_mentions sums; (min_chunk, description) takes the lexicographic min of
    per-block minima (= the global min); surfaces keep the 16 smallest of
    the union — ≥ the final reducer's cap of 16, so the final 16-smallest
    set is unchanged (k-smallest merge property)."""
    keys = ["norm_surface", "entity_type"]
    ordered = df.sort_values(keys + ["min_chunk", "description"], kind="stable")
    firsts = ordered.drop_duplicates(keys)[keys + ["min_chunk", "description"]]
    n = df.groupby(keys, sort=False)["n_mentions"].sum().reset_index()
    surf = _capped_lists(df[keys + ["surfaces"]].explode("surfaces"),
                         keys, "surfaces", 16)
    return firsts.merge(n, on=keys).merge(surf, on=keys)


def _partial_exact_arrow(batch: pa.Table) -> pa.Table:
    """Polars map-side combine — value-identical to :func:`_partial_exact`
    (n_mentions sum, lexicographic-min (chunk_id, description) pick, 8
    lexicographically-smallest unique raw surfaces). Swapped in when polars
    is importable: this map runs over every mention row of the corpus."""
    import polars as pl

    norm_arr = normalize_remap_array(batch.column("entity_surface"))
    tbl = pa.table({
        "norm_surface": norm_arr,
        "entity_type": batch.column("entity_type"),
        "chunk_id": batch.column("chunk_id"),
        "description": batch.column("description"),
        "entity_surface": batch.column("entity_surface"),
    })
    keys = ["norm_surface", "entity_type"]
    out = (
        pl.from_arrow(tbl)
        .sort(["chunk_id", "description"])
        .group_by(keys, maintain_order=False)
        .agg([
            pl.len().cast(pl.Int64).alias("n_mentions"),
            pl.col("chunk_id").first().alias("min_chunk"),
            pl.col("description").first(),
            pl.col("entity_surface").unique().sort().head(8)
            .alias("surfaces"),
        ])
        .select(["norm_surface", "entity_type", "n_mentions", "min_chunk",
                 "description", "surfaces"])
    )
    return out.to_arrow().cast(pa.schema([
        ("norm_surface", pa.string()), ("entity_type", pa.string()),
        ("n_mentions", pa.int64()), ("min_chunk", pa.string()),
        ("description", pa.string()), ("surfaces", pa.list_(pa.string())),
    ]))


def aggregate_exact_partials(mentions: "ray.data.Dataset") -> "ray.data.Dataset":
    """Map-side partial of :func:`aggregate_exact` at INPUT-BLOCK granularity
    (``batch_size=None``) — split out so a write-through parse tee
    (build.py) can fuse into it and the small per-block-combined partial
    rows become the materialization barrier instead of the corpus-sized
    mentions table. Granularity note: a lazy chain over a NARROW input must
    not inherit aggregate-scale batch sizes — Ray bundles fused map tasks by
    input rows, so a 65k-row batch over a 100k-row extraction table would
    collapse the whole corpus into 2 tasks (measured: 11.6s vs 2.7s)."""
    fn = _partial_exact_arrow if _HAVE_POLARS else _partial_exact
    return mentions.map_batches(fn, batch_format="pyarrow", batch_size=None)


_EXACT_PARTIAL_SCHEMA = pa.schema([
    ("norm_surface", pa.string()), ("entity_type", pa.string()),
    ("min_chunk", pa.string()), ("description", pa.string()),
    ("n_mentions", pa.int64()), ("surfaces", pa.list_(pa.string())),
])


def _merge_exact_partials_arrow(tbl: pa.Table) -> pa.Table:
    """Polars tree-combine — value-identical to
    :func:`_merge_exact_partials` (associative, partial-schema-preserving:
    lexicographic-min (min_chunk, description) pair, n_mentions sum,
    16-smallest surface union)."""
    import polars as pl

    keys = ["norm_surface", "entity_type"]
    out = (
        pl.from_arrow(tbl)
        .sort(keys + ["min_chunk", "description"])
        .group_by(keys, maintain_order=False)
        .agg([
            pl.col("min_chunk").first(),
            pl.col("description").first(),
            pl.col("n_mentions").sum(),
            pl.col("surfaces").explode(empty_as_null=False).unique().sort()
            .head(16).alias("surfaces"),
        ])
        .select(["norm_surface", "entity_type", "min_chunk", "description",
                 "n_mentions", "surfaces"])
    )
    return out.to_arrow().cast(_EXACT_PARTIAL_SCHEMA)


def _final_exact_bucket_arrow(tbl: pa.Table) -> pa.Table:
    """Polars final entity reduce — value-identical to
    :func:`_final_exact_bucket` (majority type with lexicographic
    tie-break, description from the global (min_chunk, description) min,
    union of surfaces capped at 16)."""
    import polars as pl

    df = pl.from_arrow(tbl)
    tc = (df.group_by(["norm_surface", "entity_type"], maintain_order=False)
          .agg(pl.col("n_mentions").sum()))
    top = (tc.sort(["norm_surface", "n_mentions", "entity_type"],
                   descending=[False, True, False])
           .unique(subset=["norm_surface"], keep="first",
                   maintain_order=True)
           .select(["norm_surface", "entity_type"]))
    firsts = (df.sort(["norm_surface", "min_chunk", "description"])
              .unique(subset=["norm_surface"], keep="first",
                      maintain_order=True)
              .select(["norm_surface", "description"]))
    n = df.group_by("norm_surface").agg(pl.col("n_mentions").sum())
    surf = (df.select(["norm_surface", "surfaces"])
            .group_by("norm_surface", maintain_order=False)
            .agg(pl.col("surfaces").explode(empty_as_null=False).unique()
                 .sort().head(16).alias("surface_forms")))
    out = (top.join(firsts, on="norm_surface")
           .join(n, on="norm_surface")
           .join(surf, on="norm_surface")
           .select(["norm_surface", "entity_type", "description",
                    "n_mentions", "surface_forms"]))
    return out.to_arrow().cast(pa.schema([
        ("norm_surface", pa.string()), ("entity_type", pa.string()),
        ("description", pa.string()), ("n_mentions", pa.int64()),
        ("surface_forms", pa.list_(pa.string())),
    ]))


def aggregate_exact_finish(
    partials: "ray.data.Dataset", cfg: KGConfig | None = None
) -> "ray.data.Dataset":
    """Tree-combine + bucket reduce over :func:`aggregate_exact_partials`
    output (or any associative re-partition of it — the incremental path
    re-feeds carried partial rows here)."""
    cfg = cfg or KGConfig()
    if _HAVE_POLARS:
        return hash_partitioned_groupby(
            partials, ["norm_surface"], _final_exact_bucket_arrow,
            n_buckets=cfg.salt_buckets * 4, map_format="pyarrow",
            pre_combine=_merge_exact_partials_arrow, arrow_reducers=True,
        )
    return hash_partitioned_groupby(
        partials, ["norm_surface"], _final_exact_bucket,
        n_buckets=cfg.salt_buckets * 4, map_format="pyarrow",
        pre_combine=_merge_exact_partials,
    )


def aggregate_exact(mentions: "ray.data.Dataset", cfg: KGConfig | None = None) -> "ray.data.Dataset":
    cfg = cfg or KGConfig()
    partial = mentions.map_batches(
        _partial_exact_arrow if _HAVE_POLARS else _partial_exact,
        batch_format="pyarrow", batch_size=16384,
    )
    return aggregate_exact_finish(partial, cfg)


# --------------------------------------------------------------------------
# 2. embedding + blocking
# --------------------------------------------------------------------------

class EmbedEntities:
    """Hash-embed ``norm_surface`` once per unique entity. A model-backed
    embedder (entity_indexer.py:34) would load its client in __init__ (actor
    pool); the deterministic hash embedder is STATELESS_OK and runs as
    worker-cached tasks."""

    STATELESS_OK = True

    def __init__(self, cfg: KGConfig | None = None) -> None:
        self.cfg = cfg or KGConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch.column("norm_surface").to_pylist()
        if not surfaces:
            return batch.append_column("embedding", pa.array([], pa.list_(pa.float32())))
        vecs = embed_texts(surfaces, dim=self.cfg.embed_dim)
        offsets = pa.array(
            np.arange(0, (len(surfaces) + 1) * self.cfg.embed_dim, self.cfg.embed_dim,
                      dtype=np.int32)
        )
        emb = pa.ListArray.from_arrays(offsets, pa.array(vecs.ravel(), pa.float32()))
        return batch.append_column("embedding", emb)


def embed_entities(entities: "ray.data.Dataset", cfg: KGConfig | None = None) -> "ray.data.Dataset":
    cfg = cfg or KGConfig()
    import ray
    max_pool = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    from .pool import stage_map_batches
    return stage_map_batches(
        entities, EmbedEntities, {"cfg": cfg},
        batch_size=cfg.embed_batch_size, max_pool=max_pool,
    )


N_LSH_TABLES = 8
BLOCK_TARGET_MEMBERS = 64  # aim for ~this many entities per LSH bucket


def auto_blocking_bits(n_entities: int, cfg: KGConfig) -> int:
    """Corpus-size rule for the similarity-blocking LSH granularity: enough
    hyperplanes that a bucket holds ~BLOCK_TARGET_MEMBERS entities, never
    fewer than the configured ``cfg.lsh_bits`` (small vocabularies keep the
    tuned default — every small-corpus test and oracle is unchanged), capped
    at 16. Bounded buckets keep the per-block O(n·W + KNN) cost flat as the
    vocabulary grows AND give the dirty-block incremental path locality (a
    touched surface dirties 1/2^bits of each table instead of a
    corpus-fraction bucket)."""
    import math
    if n_entities <= 0:
        return cfg.lsh_bits
    need = math.ceil(math.log2(max(n_entities / BLOCK_TARGET_MEMBERS, 1.0)))
    return int(min(16, max(cfg.lsh_bits, need)))


def _blocking_keys(batch: pa.Table, cfg: KGConfig, bits: int | None = None) -> pa.Table:
    """Explode each entity to its blocking keys: N_LSH_TABLES LSH buckets +
    one normalized-prefix key (catches suffix/typo variants whose embeddings
    straddle a hyperplane). Output: (block_key, norm_surface, embedding)."""
    surfaces = batch.column("norm_surface").to_pylist()
    if not surfaces:
        return pa.table({
            "block_key": pa.array([], pa.string()),
            "norm_surface": pa.array([], pa.string()),
            "n_mentions": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
        })
    n_mentions = batch.column("n_mentions").to_pylist()
    vecs = list_column_to_matrix(batch.column("embedding"), cfg.embed_dim).astype(np.float32)
    keys: List[str] = []
    surf_out: List[str] = []
    vec_out: List[int] = []  # row indices, to avoid copying vectors per key
    for t in range(N_LSH_TABLES):
        buckets = lsh_bucket(vecs, bits if bits is not None else cfg.lsh_bits,
                             seed=cfg.seed + t)
        for i, b in enumerate(buckets):
            keys.append(f"lsh{t}:{b}")
            surf_out.append(surfaces[i])
            vec_out.append(i)
    for i, s in enumerate(surfaces):
        keys.append("pfx:" + s[:4])
        surf_out.append(s)
        vec_out.append(i)
        # suffix key: a typo inside the first 4 chars escapes the prefix
        # block AND sorts far away in the window; ≤2-edit variants almost
        # always still share the last 4 chars
        keys.append("sfx:" + s[-4:])
        surf_out.append(s)
        vec_out.append(i)
        # stripped-noise key: one blocking key per judge rule — the judge's
        # stripped-equality rule (dash/underscore/suffix formatting variants)
        # gets a DETERMINISTIC block of exactly its equality class, so those
        # merges never depend on LSH geometry or window adjacency (at fine
        # LSH bits the 8 tables can split a formatting pair; the pfx block
        # holding it is often oversized/window-only)
        keys.append("nrm:" + _strip_noise(s, cfg).lower())
        surf_out.append(s)
        vec_out.append(i)
    idx = np.asarray(vec_out, dtype=np.int64)
    sel = vecs[idx]
    offsets = pa.array(np.arange(0, (len(idx) + 1) * cfg.embed_dim,
                                 cfg.embed_dim, dtype=np.int32))
    emb = pa.ListArray.from_arrays(offsets, pa.array(sel.ravel(), pa.float32()))
    return pa.table({
        "block_key": pa.array(keys, pa.string()),
        "norm_surface": pa.array(surf_out, pa.string()),
        "n_mentions": pa.array([int(n_mentions[i]) for i in idx], pa.int64()),
        "embedding": emb,
    })


def surface_block_keys(surfaces: List[str], cfg: KGConfig,
                       bits: int | None = None) -> Set[str]:
    """Every blocking key the given surfaces participate in — the DIRTY block
    set for an incremental tick. Pure function of the surface text + cfg +
    ``bits`` (the entity embedding is a deterministic hash of the surface),
    so both the old and the new members of a block can be located with no
    stored state. Must stay in lockstep with :func:`_blocking_keys`."""
    out: Set[str] = set()
    if not surfaces:
        return out
    vecs = embed_texts(list(surfaces), dim=cfg.embed_dim).astype(np.float32)
    for t in range(N_LSH_TABLES):
        for b in lsh_bucket(vecs, bits if bits is not None else cfg.lsh_bits,
                            seed=cfg.seed + t):
            out.add(f"lsh{t}:{b}")
    for s in surfaces:
        out.add("pfx:" + s[:4])
        out.add("sfx:" + s[-4:])
        out.add("nrm:" + _strip_noise(s, cfg).lower())
    return out


def _strip_noise(surface: str, cfg: KGConfig) -> str:
    s = surface.replace("-", " ").replace("_", " ").replace(".", " ").replace("/", " ")
    s = " ".join(s.split())
    parts = s.split(" ")
    while parts and parts[-1] in cfg.company_suffixes:
        parts = parts[:-1]
    return " ".join(parts)


def judge_pair(a: str, b: str, cfg: KGConfig) -> bool:
    """Deterministic stand-in for the LLM merge judge (config/prompt.py:103-137).

    Rules mirror the prompt: formatting/suffix variants merge; small edit
    distance merges (reference gate: apoc.text.distance < 3,
    similar_entity.py:324); entities differing in digits never merge."""
    if len(a) <= 1 or len(b) <= 1:  # reference: len(id) > 1 guard
        return False
    da, db = "".join(ch for ch in a if ch.isdigit()), "".join(ch for ch in b if ch.isdigit())
    if da != db:
        return False
    sa, sb = _strip_noise(a, cfg), _strip_noise(b, cfg)
    if sa == sb:
        return True
    return edit_distance(sa.lower(), sb.lower(), cfg.word_edit_distance - 1) < cfg.word_edit_distance


class SurfaceFeatures:
    """Per-unique-surface judge features (lengths, digit classes, stripped
    forms, char-count vectors), computed ONCE for a reducer slice and shared
    across its blocks. Every surface participates in ~N_LSH_TABLES+3 blocks,
    so per-block recomputation did this same Python-loop work ~11× per
    surface — on a 47k-surface sparse corpus it was the single hottest part
    of the whole canonicalization stage."""

    def __init__(self, surfaces, cfg: KGConfig) -> None:
        surfaces = list(surfaces)
        self.index = {s: i for i, s in enumerate(surfaces)}
        n = len(surfaces)
        self.raw_len = np.fromiter((len(s) for s in surfaces),
                                   dtype=np.int64, count=n)
        self.digit_codes = pd.factorize(np.array(
            ["".join(ch for ch in s if ch.isdigit()) for s in surfaces],
            dtype=object))[0]
        stripped = [_strip_noise(s, cfg) for s in surfaces]
        self.strip_codes = pd.factorize(np.array(stripped, dtype=object))[0]
        self.low = [s.lower() for s in stripped]
        self.low_len = np.fromiter((len(s) for s in self.low),
                                   dtype=np.int64, count=n)
        charset: dict = {}
        for s in self.low:
            for ch in s:
                if ch not in charset:
                    charset[ch] = len(charset)
        counts = np.zeros((n, max(1, len(charset))), dtype=np.int32)
        for i, s in enumerate(self.low):
            for ch in s:
                counts[i, charset[ch]] += 1
        self.counts = counts

    def rows(self, surfaces: np.ndarray) -> np.ndarray:
        idx = self.index
        return np.fromiter((idx[s] for s in surfaces), dtype=np.int64,
                           count=len(surfaces))


def judge_indices(lo: np.ndarray, hi: np.ndarray, surfaces: np.ndarray,
                  cfg: KGConfig,
                  feats: SurfaceFeatures | None = None) -> np.ndarray:
    """Exactly ``judge_pair`` over candidate index pairs (``lo``/``hi`` index
    into ``surfaces``), fully vectorized: per-surface work (digit extraction,
    noise stripping, char counts) happens once per surface — once per SLICE
    when the caller passes a shared :class:`SurfaceFeatures` — every gate is
    a numpy array op, and only the survivors of a character-count LOWER
    BOUND reach the banded edit-distance DP — every edit operation changes
    the character multiset by at most 2, so edit(a, b) ≥
    L1(count(a), count(b))/2 and ≥ |len(a) − len(b)|. Returns a boolean mask
    over the pairs. With large sorted-neighbour blocks (big entity
    vocabularies) a per-pair Python loop here would dominate the whole
    canonicalization stage. Factorized codes are only ever compared for
    EQUALITY, so slice-global vs block-local factorization is semantically
    identical."""
    wed = cfg.word_edit_distance
    if feats is None:
        feats = SurfaceFeatures(surfaces, cfg)
        glo, ghi = np.asarray(lo), np.asarray(hi)
    else:
        rows = feats.rows(surfaces)
        glo, ghi = rows[lo], rows[hi]
    low = feats.low

    ok = ((feats.raw_len[glo] > 1) & (feats.raw_len[ghi] > 1)
          & (feats.digit_codes[glo] == feats.digit_codes[ghi]))
    out = ok & (feats.strip_codes[glo] == feats.strip_codes[ghi])
    rest = ok & ~out & (np.abs(feats.low_len[glo] - feats.low_len[ghi]) < wed)
    rest_idx = np.flatnonzero(rest)
    if len(rest_idx):
        l1 = np.abs(feats.counts[glo[rest_idx]]
                    - feats.counts[ghi[rest_idx]]).sum(axis=1)
        rest_idx = rest_idx[l1 < 2 * wed]
    for t in rest_idx:
        if edit_distance(low[glo[t]], low[ghi[t]], wed - 1) < wed:
            out[t] = True
    return out


SORTED_NEIGHBOUR_WINDOW = 20


def _pairs_in_block_arrays(surfaces: np.ndarray, n_mentions: np.ndarray,
                           emb_cells: np.ndarray, block_key: str,
                           cfg: KGConfig,
                           feats: "SurfaceFeatures | None" = None):
    """Array-mode kernel of :func:`_pairs_in_block`: within one block, two
    candidate generators feed the merge judge — mirroring the reference's
    two gates (embedding KNN, similar_entity.py:147-222; textual distance
    grouping, similar_entity.py:288-365):

    1. exact cosine top-k (cutoff 0.9 / k 10, the GDS KNN parameters);
    2. sorted-neighbourhood window over the lexicographically ordered
       surfaces (suffix/typo variants sort adjacently even when their hash
       embeddings dip under the cosine cutoff).

    Oversized blocks (> MAX_BLOCK_COMPARE members) degrade to the
    window-only generator over ALL members — O(n·W) instead of the O(n²)
    KNN matmul — rather than truncating (truncation silently lost
    candidates; the window keeps sorted-adjacent variants at any block
    size, and the other LSH tables still provide the embedding gate for
    members of oversized buckets).

    Returns (a, b, n_a, n_b) arrays of judge-surviving pairs with a < b,
    or None. Takes plain numpy columns so the slice walkers convert the
    pandas block ONCE instead of building ~#blocks small frames."""
    uniq, first_idx = np.unique(surfaces, return_index=True)
    if len(uniq) < 2:
        return None
    if len(uniq) != len(surfaces):
        # first-occurrence dedup, order-preserving (drop_duplicates parity)
        keep_rows = np.sort(first_idx)
        surfaces = surfaces[keep_rows]
        n_mentions = n_mentions[keep_rows]
        emb_cells = emb_cells[keep_rows]
    n = len(surfaces)
    # nrm: blocks are stripped-equality classes — every pair passes the
    # judge's stripped-equality rule, and the union-find chains the class
    # through window-adjacent pairs, so the KNN embedding gate adds nothing
    oversized = n > MAX_BLOCK_COMPARE or block_key.startswith("nrm:")
    if n > MAX_BLOCK_COMPARE:
        logger.info("block %s window-only: %d > %d entities",
                    block_key, n, MAX_BLOCK_COMPARE)
    order = np.argsort(surfaces, kind="stable")

    parts_a, parts_b = [], []
    for d in range(1, min(SORTED_NEIGHBOUR_WINDOW, n - 1) + 1):
        parts_a.append(order[:-d])
        parts_b.append(order[d:])
    ai = np.concatenate(parts_a)
    bi = np.concatenate(parts_b)
    if not oversized:
        vecs = np.array(emb_cells.tolist(), dtype=np.float32)
        ki, kj = cosine_topk_pairs(vecs, cfg.knn_top_k, cfg.knn_similarity_cutoff)
        ai = np.concatenate([ai, ki])
        bi = np.concatenate([bi, kj])

    # orient each pair lexicographically (a < b) via sorted rank, dedupe
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    ra, rb = rank[ai], rank[bi]
    codes = np.unique(np.minimum(ra, rb) * n + np.maximum(ra, rb))
    lo = order[codes // n]
    hi = order[codes % n]

    keep = judge_indices(lo, hi, surfaces, cfg, feats)
    if not keep.any():
        return None
    lo, hi = lo[keep], hi[keep]
    # carry mention counts on the pair rows so the driver's alias-map step
    # needs NO second scan over the entity table (the Amdahl serial section)
    return (surfaces[lo], surfaces[hi],
            n_mentions[lo].astype("int64"), n_mentions[hi].astype("int64"))


def _pairs_in_block(group: pd.DataFrame, cfg: KGConfig,
                    feats: "SurfaceFeatures | None" = None) -> pd.DataFrame:
    """DataFrame wrapper over :func:`_pairs_in_block_arrays` (kept for the
    single-block call sites and tests; the slice walkers use the array
    kernel directly)."""
    res = _pairs_in_block_arrays(
        group["norm_surface"].to_numpy(dtype=object),
        group["n_mentions"].to_numpy(),
        group["embedding"].to_numpy(dtype=object),
        group["block_key"].iloc[0], cfg, feats)
    if res is None:
        return _EMPTY_PAIRS()
    a, b, n_a, n_b = res
    return pd.DataFrame({"a": a, "b": b, "n_a": n_a, "n_b": n_b})


def _EMPTY_PAIRS() -> pd.DataFrame:
    return pd.DataFrame({"a": pd.Series(dtype=object),
                         "b": pd.Series(dtype=object),
                         "n_a": pd.Series(dtype="int64"),
                         "n_b": pd.Series(dtype="int64")})


def _judge_blocks_slice(df: pd.DataFrame, cfg: KGConfig,
                        keep_block_key: bool) -> pd.DataFrame:
    """All complete blocks of one reducer slice → judged pairs, array-mode:
    ONE pandas→numpy conversion per slice, per-surface judge features shared
    across every block (:class:`SurfaceFeatures` — each surface sits in
    ~N_LSH_TABLES+3 blocks), per-block results accumulated as arrays and
    assembled into a single output frame. The per-block DataFrame
    construction/groupby machinery this replaces was ~a third of the whole
    blocking stage on sparse vocabularies."""
    if not len(df):
        return pd.DataFrame()
    feats = SurfaceFeatures(pd.unique(df["norm_surface"]), cfg)
    bkeys = df["block_key"].to_numpy(dtype=object)
    surfs = df["norm_surface"].to_numpy(dtype=object)
    nment = df["n_mentions"].to_numpy()
    embs = df["embedding"].to_numpy(dtype=object)
    # group rows by block: factorize preserves first-appearance order — the
    # same iteration order as groupby(sort=False)
    codes, uniq_keys = pd.factorize(bkeys)
    order = np.argsort(codes, kind="stable")
    bounds = np.searchsorted(codes[order], np.arange(len(uniq_keys) + 1))
    out_a, out_b, out_na, out_nb, out_k = [], [], [], [], []
    for bidx in range(len(uniq_keys)):
        sl = order[bounds[bidx]:bounds[bidx + 1]]
        res = _pairs_in_block_arrays(surfs[sl], nment[sl], embs[sl],
                                     uniq_keys[bidx], cfg, feats)
        if res is None:
            continue
        a, b, n_a, n_b = res
        out_a.append(a); out_b.append(b)
        out_na.append(n_a); out_nb.append(n_b)
        if keep_block_key:
            out_k.append(np.full(len(a), uniq_keys[bidx], dtype=object))
    if not out_a:
        return pd.DataFrame()
    out = pd.DataFrame({
        "a": np.concatenate(out_a), "b": np.concatenate(out_b),
        "n_a": np.concatenate(out_na), "n_b": np.concatenate(out_nb),
    })
    if keep_block_key:
        out["block_key"] = np.concatenate(out_k)
    return out if keep_block_key else out.drop_duplicates()


def candidate_pairs(
    embedded: "ray.data.Dataset",
    cfg: KGConfig | None = None,
    *,
    keep_block_key: bool = False,
    only_keys_ref=None,
    bits: int | None = None,
) -> "ray.data.Dataset":
    """Blocking keys → hash-partitioned shuffle → per-block KNN + judge.
    One vectorized task per hash bucket (each holding many complete blocks);
    output may contain the same pair from several blocks — consumers dedup
    (build_alias_map's union-find is idempotent).

    ``keep_block_key`` tags every pair with the block it came from (and skips
    the cross-block dedup) so a snapshot of the pairs can be carried over
    block-by-block on an incremental tick. ``only_keys_ref`` (a ray ObjectRef
    to a ``pa.StringArray`` of block keys) restricts pairing to those blocks —
    the filter runs BEFORE the shuffle, so a small dirty set means a small
    shuffle regardless of entity-table size.

    ``bits`` sets the LSH blocking granularity (default: the
    :func:`auto_blocking_bits` corpus-size rule over the entity count, so
    buckets hold ~BLOCK_TARGET_MEMBERS entities at any vocabulary size).
    Callers that carry pairs across ticks must pass a consistent value."""
    cfg = cfg or KGConfig()
    if bits is None:
        bits = auto_blocking_bits(embedded.count(), cfg)
    blocks = embedded.map_batches(
        lambda b: _blocking_keys(b, cfg, bits), batch_format="pyarrow",
        batch_size=4096,
    )
    if only_keys_ref is not None:
        def _keep(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch.column("block_key"), value_set=ray.get(only_keys_ref)))
        blocks = blocks.map_batches(_keep, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # singleton blocks pair nothing — drop them before the per-group
        # dispatch (most nrm:/pfx: classes are singletons; iterating 10k+
        # empty groups costs more than the real pair work)
        counts = df["block_key"].value_counts()
        df = df[df["block_key"].map(counts) >= 2]
        out = _judge_blocks_slice(df, cfg, keep_block_key)
        if not len(out):
            # default (float64) empty columns: Ray's block size estimator
            # warns on 0-row object/string columns; consumers guard empty
            cols = {"a": [], "b": [], "n_a": [], "n_b": []}
            if keep_block_key:
                cols["block_key"] = []
            return pd.DataFrame(cols)
        return out

    # pre_split: the blocking reducer is compute-bound (KNN + judge), and the
    # surface table is entity-scale — without it, a small-byte input runs all
    # 64 buckets serially in one task (see hash_partitioned_groupby)
    return hash_partitioned_groupby(blocks, ["block_key"], per_bucket,
                                    n_buckets=64, pre_split=True)


# vocabularies at or below this size run blocking + judge on the driver —
# the distributed path's explode + repartition + sort + 64 reducers cost
# seconds of fixed scheduling for sub-second real work at entity scale
# (communities-stage guard pattern); above it the distributed path runs.
# Raising the guard buys nothing: at the 47k-surface sparse bench corpus
# the two paths are within noise of each other (7.4 s distributed vs 8.5 s
# driver-local at 32 cpus) because the cost is the blocking/judge COMPUTE,
# not the exchange. Local == distributed pair-set parity is pinned by
# test_functions.py.
MAX_DRIVER_BLOCKING_SURFACES = 20_000
# below this many surviving block rows the per-block judge runs inline on
# the driver — the hash-sliced Ray-task fan-out costs ~0.4-0.8 s of fixed
# round-trips that dwarf the ~50 ms of actual judging at small vocabularies
# (pair SET is identical either way; build_alias_map is pair-order-free)
MAX_INLINE_JUDGE_ROWS = 4_096


def candidate_pairs_pdf(
    embedded: "ray.data.Dataset",
    cfg: KGConfig | None = None,
    *,
    keep_block_key: bool = False,
    only_keys=None,
    bits: int | None = None,
    n_entities: int | None = None,
) -> pd.DataFrame:
    """Judged merge pairs as a driver frame (they are the decision set — tiny
    by construction; every caller collects them anyway). Small vocabularies
    run the whole blocking → judge chain locally with the SAME kernels
    (:func:`_blocking_keys`, :func:`_pairs_in_block`), producing the same
    pair set as the distributed shuffle without its fixed scheduling cost;
    big vocabularies fall through to :func:`candidate_pairs`.

    ``only_keys``: optional set of block keys to restrict pairing to (the
    incremental dirty-block scope)."""
    cfg = cfg or KGConfig()
    if n_entities is None:
        n_entities = embedded.count()
    if bits is None:
        bits = auto_blocking_bits(n_entities, cfg)
    if n_entities > MAX_DRIVER_BLOCKING_SURFACES:
        ref = (ray.put(pa.array(sorted(only_keys), pa.string()))
               if only_keys is not None else None)
        return candidate_pairs(
            embedded, cfg, keep_block_key=keep_block_key,
            only_keys_ref=ref, bits=bits).to_pandas()

    frames = []
    for tbl in ray.get(embedded.to_arrow_refs()):
        if tbl.num_rows:
            frames.append(_blocking_keys(
                tbl.select(["norm_surface", "n_mentions", "embedding"]),
                cfg, bits).to_pandas())
    cols = {"a": [], "b": [], "n_a": [], "n_b": []}
    if keep_block_key:
        cols["block_key"] = []
    empty = pd.DataFrame(cols)
    if not frames:
        return empty
    df = pd.concat(frames, ignore_index=True)
    if only_keys is not None:
        df = df[df["block_key"].isin(set(only_keys))]
    counts = df["block_key"].value_counts()
    df = df[df["block_key"].map(counts) >= 2]
    if not len(df):
        return empty
    # fan the per-block judge out as plain Ray tasks over block-hash slices —
    # the compute parallelism of the distributed path without its
    # explode/repartition/sort Dataset machinery (thousands of small blocks
    # at ~1 ms each would otherwise serialize on the driver)
    if len(df) <= MAX_INLINE_JUDGE_ROWS:
        out_frames = [_pairs_in_blocks(df, cfg, keep_block_key)]
        out_frames = [f for f in out_frames if len(f)]
    else:
        nparts = max(1, min(32, int(ray.cluster_resources().get("CPU", 8))))
        h = pd.util.hash_pandas_object(df["block_key"], index=False) % nparts
        futures = [
            _pairs_in_blocks_task.remote(df[h == i], cfg, keep_block_key)
            for i in range(nparts) if (h == i).any()
        ]
        out_frames = [f for f in ray.get(futures) if len(f)]
    if not out_frames:
        return empty
    out = pd.concat(out_frames, ignore_index=True)
    return out if keep_block_key else out.drop_duplicates()


def _pairs_in_blocks(df: pd.DataFrame, cfg: KGConfig,
                     keep_block_key: bool) -> pd.DataFrame:
    """One hash-slice of complete blocks → judged pairs (driver-local
    blocking's worker half; same kernel as the distributed per_bucket).
    Run inline for tiny vocabularies, fanned out via the ray.remote wrapper
    below otherwise — same kernel, same pair set either way."""
    out = _judge_blocks_slice(df, cfg, keep_block_key)
    # (no final drop_duplicates here: candidate_pairs_pdf applies it for
    # keep_block_key=False, matching the walker's behavior already)
    return out


_pairs_in_blocks_task = ray.remote(_pairs_in_blocks)


# --------------------------------------------------------------------------
# 3-4. union-find → alias map
# --------------------------------------------------------------------------

def build_alias_map(
    pairs: "pd.DataFrame",
    mention_counts: Dict[str, int],
) -> Dict[str, str]:
    """Driver-side union-find over judged pairs (size-guarded: pairs are the
    *merge decisions*, not the corpus). canonical = max mention count, tie →
    lexicographic min."""
    pdf = pairs if isinstance(pairs, pd.DataFrame) else pairs.to_pandas()
    if len(pdf) == 0 or "a" not in pdf.columns:
        return {}
    pdf = pdf[["a", "b"]]
    if len(pdf) > MAX_DRIVER_PAIRS:
        # scale path: distributed min-label propagation
        # (functions/components.py), then the SAME representative rule as the
        # union-find path (max mention count, tie → lexicographic min) via a
        # per-component count join — crossing the guard must not change
        # entity_ids for the same logical graph.
        from ..functions.components import connected_components as cc
        comp = cc(ray.data.from_pandas(pdf)).to_pandas()
        comp["n"] = comp["node"].map(mention_counts).fillna(0).astype("int64")
        reps = (comp.sort_values(["component", "n", "node"],
                                 ascending=[True, False, True], kind="stable")
                .drop_duplicates("component")[["component", "node"]]
                .rename(columns={"node": "rep"}))
        merged = comp.merge(reps, on="component")
        return {n: r for n, r in zip(merged["node"], merged["rep"]) if n != r}
    uf = UnionFind()
    for a, b in pdf.drop_duplicates().itertuples(index=False):
        uf.union(a, b)
    alias: Dict[str, str] = {}
    for _root, members in uf.groups().items():
        canonical = sorted(members, key=lambda m: (-mention_counts.get(m, 0), str(m)))[0]
        for m in members:
            if m != canonical:
                alias[str(m)] = str(canonical)
    return alias


# --------------------------------------------------------------------------
# 5. canonical remap + merges
# --------------------------------------------------------------------------

def _merge_entities_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-bucket entity merge: representative = member with the
    most mentions (tie → lexicographically smallest surface) — the order-free
    equivalent of apoc mergeNodes 'discard' (first node's properties win)."""
    ordered = df.sort_values(["entity_id", "n_mentions", "norm_surface"],
                             ascending=[True, False, True], kind="stable")
    reps = ordered.drop_duplicates("entity_id")[
        ["entity_id", "description", "embedding"]]
    type_counts = (
        df.groupby(["entity_id", "entity_type"], sort=False)["n_mentions"]
        .sum().reset_index()
        .sort_values(["entity_id", "n_mentions", "entity_type"],
                     ascending=[True, False, True], kind="stable")
    )
    top_type = type_counts.drop_duplicates("entity_id")[["entity_id", "entity_type"]]
    n = df.groupby("entity_id", sort=False)["n_mentions"].sum().reset_index()
    surf = (
        df.groupby("entity_id", sort=False)["surface_forms"]
        .agg(lambda ls: sorted({s for lst in ls for s in lst})[:32])
        .reset_index()
    )
    out = reps.merge(top_type, on="entity_id").merge(n, on="entity_id") \
        .merge(surf, on="entity_id")
    # pin embedding cells to float32 ndarrays regardless of how the group
    # crossed the shuffle (pandas path delivers ndarray cells, the Arrow
    # path Python lists) — keeps the entities snapshot schema stable
    out["embedding"] = out["embedding"].map(
        lambda v: np.asarray(v, dtype=np.float32))
    return out[["entity_id", "surface_forms", "entity_type", "description",
                "embedding", "n_mentions"]]


def canonical_entities(
    embedded: "ray.data.Dataset", alias_ref: "ray.ObjectRef", cfg: KGConfig | None = None
) -> "ray.data.Dataset":
    cfg = cfg or KGConfig()

    def add_canonical(batch: pa.Table) -> pa.Table:
        alias = ray.get(alias_ref)
        surfaces = batch.column("norm_surface").to_pylist()
        canon = [alias.get(s, s) for s in surfaces]
        return batch.append_column("entity_id", pa.array(canon, pa.string()))

    with_id = embedded.map_batches(add_canonical, batch_format="pyarrow", batch_size=8192)
    # Arrow map side: the embedding list column stays Arrow through the
    # merge shuffle (no tensor-extension pandas blocks in the exchange)
    return hash_partitioned_groupby(
        with_id, ["entity_id"], _merge_entities_bucket,
        n_buckets=cfg.salt_buckets * 4, map_format="pyarrow",
    )


def canonical_triples(
    triples: "ray.data.Dataset", alias_ref: "ray.ObjectRef", cfg: KGConfig | None = None
) -> "ray.data.Dataset":
    """Normalize + canonical-remap subj/obj. Broadcast alias map (ray.put once,
    ray.get per task from local object store — never re-shipped per batch)."""

    def remap(batch: pa.Table) -> pa.Table:
        alias = ray.get(alias_ref)
        # dictionary-encoded: normalize + lookup once per unique surface
        return (
            batch.drop_columns(["subj", "obj"])
            .append_column("subj",
                           normalize_remap_array(batch.column("subj"), alias))
            .append_column("obj",
                           normalize_remap_array(batch.column("obj"), alias))
        )

    return triples.map_batches(remap, batch_format="pyarrow", batch_size=8192)


MAX_EDGE_CHUNK_IDS = 64  # provenance list cap per edge (n_sources saturates here)


def _partial_edges(batch: pa.Table) -> pd.DataFrame:
    """Map-side combine: duplicate facts are endemic (the whole corpus keeps
    restating the same triples), so collapse per (s,p,o) inside the batch
    before the shuffle — the exchange then moves distinct-per-block rows, not
    every mention."""
    df = pa.Table.to_pandas(batch)
    keys = ["subj", "pred", "obj"]
    # ties in chunk_id (same canonical fact restated by surface variants in
    # one chunk, or duplicate chunk content) break on description so the
    # kept "first" is identical for any batching (delta-path requirement)
    ordered = df.sort_values(keys + ["chunk_id", "description"], kind="stable")
    firsts = ordered.drop_duplicates(keys)[keys + ["description", "chunk_id"]]
    firsts = firsts.rename(columns={"chunk_id": "min_chunk"})
    # weight: per-key MAX — order-free across variant restatements of the
    # same canonical fact (each surface variant may assert its own weight)
    wmax = df.groupby(keys, sort=False)["weight"].max().reset_index()
    chunk_lists = _capped_lists(df, keys, "chunk_id",
                                MAX_EDGE_CHUNK_IDS, "chunk_ids")
    out = firsts.merge(wmax, on=keys).merge(chunk_lists, on=keys)
    # emit Arrow: the edge-dedup shuffle is the biggest exchange of the
    # build (every distinct-per-block fact row) — zero-copy blocks beat
    # pickled pandas; chunk_ids becomes list<string> and the reducer
    # boundary restores Python lists
    return pa.Table.from_pandas(out, preserve_index=False)


def canonical_triples_distributed(
    triples: "ray.data.Dataset", alias_ds: "ray.data.Dataset",
    cfg: KGConfig | None = None,
) -> "ray.data.Dataset":
    """Scale variant of :func:`canonical_triples` for alias maps too large to
    broadcast: two left hash-joins against an ``(member, canonical)`` alias
    Dataset (subj then obj), unmatched surfaces keep their normalized form.
    Same output schema/values as the broadcast path (equivalence-tested)."""
    from ..functions.shuffle import hash_join

    cfg = cfg or KGConfig()

    def normalize_cols(batch: pa.Table) -> pd.DataFrame:
        subj = normalize_remap_array(batch.column("subj"))
        obj = normalize_remap_array(batch.column("obj"))
        df = pa.Table.to_pandas(batch)
        df["subj"] = subj.to_pandas()
        df["obj"] = obj.to_pandas()
        return df

    norm = triples.map_batches(normalize_cols, batch_format="pyarrow",
                               batch_size=8192)

    subj_alias = alias_ds.map_batches(
        lambda b: pa.table({"subj": b.column("member"),
                            "_subj_canon": b.column("canonical")}),
        batch_format="pyarrow")
    j1 = hash_join(norm, subj_alias, on=["subj"], how="left")

    obj_alias = alias_ds.map_batches(
        lambda b: pa.table({"obj": b.column("member"),
                            "_obj_canon": b.column("canonical")}),
        batch_format="pyarrow")
    j2 = hash_join(j1, obj_alias, on=["obj"], how="left")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["subj"] = df["_subj_canon"].fillna(df["subj"])
        df["obj"] = df["_obj_canon"].fillna(df["obj"])
        return df.drop(columns=["_subj_canon", "_obj_canon"])

    return j2.map_batches(finish, batch_format="pandas", batch_size=16384)


def _edges_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Reduce: merge partials per (s,p,o): first = min chunk_id overall
    (order-stable rels[0]); provenance = union of chunk lists (capped)."""
    keys = ["subj", "pred", "obj"]
    ordered = df.sort_values(keys + ["min_chunk", "description"], kind="stable")
    firsts = ordered.drop_duplicates(keys)[keys + ["description"]]
    wmax = df.groupby(keys, sort=False)["weight"].max().reset_index()
    firsts = firsts.merge(wmax, on=keys)
    unions = _capped_lists(df[keys + ["chunk_ids"]].explode("chunk_ids"),
                           keys, "chunk_ids", MAX_EDGE_CHUNK_IDS)
    out = firsts.merge(unions, on=keys)
    out = out.rename(columns={"subj": "src", "obj": "dst"})
    out["weight"] = out["weight"].astype(np.float32)
    out["n_sources"] = out["chunk_ids"].map(len).astype(np.int32)
    return out[["src", "dst", "pred", "description", "weight", "n_sources", "chunk_ids"]]


def _edges_partial_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Reduce map-side partials per (still pre-alias) key, KEEPING the
    partial schema (min_chunk survives) so a later canonical remap can
    re-reduce the merged rows with :func:`_edges_bucket`. Every aggregate is
    associative over a refinement of the final key partition: weight is a
    max, (min_chunk, description) is a lexicographic min of per-block minima
    (= the global min), and the chunk_ids cap keeps each subkey's
    MAX_EDGE_CHUNK_IDS smallest ids — a k-smallest merge, so the final
    union-sort-cap still yields the global k smallest."""
    keys = ["subj", "pred", "obj"]
    ordered = df.sort_values(keys + ["min_chunk", "description"], kind="stable")
    firsts = ordered.drop_duplicates(keys)[keys + ["min_chunk", "description"]]
    wmax = df.groupby(keys, sort=False)["weight"].max().reset_index()
    unions = _capped_lists(df[keys + ["chunk_ids"]].explode("chunk_ids"),
                           keys, "chunk_ids", MAX_EDGE_CHUNK_IDS)
    return firsts.merge(wmax, on=keys).merge(unions, on=keys)


# ---- polars (Rust) kernels for the build's heaviest exchange ----------
# The edge-dedup family moves every distinct-per-block fact row; its pandas
# kernels are explode+sort+3-merge per batch. When polars is importable the
# map side and both reducers run as single fused group_bys (Arrow-in/
# Arrow-out, no pandas boundary) — value-identical (ties break on the same
# sorted (min_chunk, description) pair; UTF-8 bytewise sort == codepoint
# sort), pinned by tests/test_edge_preagg.py and the kg_edges oracle.
try:  # availability gate — mirrors MAX_DRIVER_EDGE_PARTIALS above
    import polars as _pl  # noqa: F401
    _HAVE_POLARS = True
except ImportError:  # pragma: no cover
    _HAVE_POLARS = False

_EDGE_PARTIAL_ARROW_SCHEMA = pa.schema([
    ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
    ("min_chunk", pa.string()), ("description", pa.string()),
    ("weight", pa.float32()), ("chunk_ids", pa.list_(pa.string())),
])


def _partial_edges_arrow(batch: pa.Table) -> pa.Table:
    """Polars map-side combine — value-identical to :func:`_partial_edges`
    (one fused group_by instead of sort + three pandas merges)."""
    import polars as pl

    df = pl.from_arrow(batch.select(
        ["subj", "pred", "obj", "chunk_id", "description", "weight"]))
    keys = ["subj", "pred", "obj"]
    out = (
        df.sort(keys + ["chunk_id", "description"])
        .group_by(keys, maintain_order=False)
        .agg([
            pl.col("chunk_id").first().alias("min_chunk"),
            pl.col("description").first(),
            pl.col("weight").max(),
            pl.col("chunk_id").unique().sort()
            .head(MAX_EDGE_CHUNK_IDS).alias("chunk_ids"),
        ])
        .select(["subj", "pred", "obj", "min_chunk", "description",
                 "weight", "chunk_ids"])
    )
    return out.to_arrow().cast(_EDGE_PARTIAL_ARROW_SCHEMA)


def _edges_partial_bucket_arrow(tbl: pa.Table) -> pa.Table:
    """Polars partial-merge — value-identical to
    :func:`_edges_partial_bucket` (associative; schema-preserving)."""
    import polars as pl

    df = pl.from_arrow(tbl)
    keys = ["subj", "pred", "obj"]
    out = (
        df.sort(keys + ["min_chunk", "description"])
        .group_by(keys, maintain_order=False)
        .agg([
            pl.col("min_chunk").first(),
            pl.col("description").first(),
            pl.col("weight").max(),
            pl.col("chunk_ids").explode(empty_as_null=False).unique().sort()
            .head(MAX_EDGE_CHUNK_IDS).alias("chunk_ids"),
        ])
        .select(["subj", "pred", "obj", "min_chunk", "description",
                 "weight", "chunk_ids"])
    )
    return out.to_arrow().cast(_EDGE_PARTIAL_ARROW_SCHEMA)


def _edges_bucket_arrow(tbl: pa.Table) -> pa.Table:
    """Polars final edge reduce (no remap) — the per-bucket form of
    :func:`_edges_finish_local_table`."""
    return _edges_finish_local_table(tbl, {})


def preaggregate_edges(
    triples: "ray.data.Dataset", cfg: KGConfig | None = None
) -> "ray.data.Dataset":
    """Alias-INDEPENDENT half of the edge dedup: normalize subj/obj and run
    the heavy (s,p,o) combine + shuffle on NORMALIZED surface keys. Because
    the alias map only merges normalized keys (normalized partitions refine
    canonical partitions) and every edge aggregate is associative
    (:func:`_edges_partial_bucket`), this can run BEFORE the alias map
    exists — i.e. concurrently with the entity aggregate/embedding/blocking
    phase — leaving only an edge-scale remap + re-reduce
    (:func:`dedupe_edges_from_partials`) on the decision chain's critical
    path. Output is aggregated-edge-scale (distinct normalized facts)."""
    cfg = cfg or KGConfig()
    partial = triples.map_batches(_norm_edge_partial, batch_format="pyarrow",
                                  batch_size=65536)
    return preaggregate_edges_finish(partial, cfg)


def _norm_edge_partial(batch: pa.Table) -> pa.Table:
    batch = (
        batch.drop_columns(["subj", "obj"])
        .append_column("subj", normalize_remap_array(batch.column("subj")))
        .append_column("obj", normalize_remap_array(batch.column("obj")))
    )
    if _HAVE_POLARS:
        return _partial_edges_arrow(batch)
    return _partial_edges(batch)


def edge_partial_rows(triples: "ray.data.Dataset") -> "ray.data.Dataset":
    """Map-side partial of :func:`preaggregate_edges` at INPUT-BLOCK
    granularity — the fuse-into-a-parse-tee split (see
    :func:`aggregate_exact_partials` for the task-granularity rationale)."""
    return triples.map_batches(_norm_edge_partial, batch_format="pyarrow",
                               batch_size=None)


def preaggregate_edges_finish(
    partials: "ray.data.Dataset", cfg: KGConfig | None = None
) -> "ray.data.Dataset":
    cfg = cfg or KGConfig()
    if _HAVE_POLARS:
        return hash_partitioned_groupby(
            partials, ["subj", "pred", "obj"], _edges_partial_bucket_arrow,
            n_buckets=cfg.salt_buckets * 4, map_format="pyarrow",
            pre_combine=_edges_partial_bucket_arrow, arrow_reducers=True,
        )
    return hash_partitioned_groupby(
        partials, ["subj", "pred", "obj"], _edges_partial_bucket,
        n_buckets=cfg.salt_buckets * 4, map_format="pyarrow",
        pre_combine=_edges_partial_bucket,
    )


def _remap_only_array(arr, alias: Dict[str, str]):
    """Alias-remap an ALREADY-NORMALIZED Arrow string column (dictionary-
    encoded lookup, no re-normalization — the lookup must hit the exact
    normalized keys ``build_alias_map`` emitted, and re-normalizing would
    assume idempotence instead of guaranteeing it)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    d = arr.dictionary_encode()
    uniq = pd.Series(d.dictionary.to_pylist(), dtype=object)
    if len(uniq) and alias:
        uniq = uniq.map(alias).fillna(uniq)
    return pa.DictionaryArray.from_arrays(
        d.indices, pa.array(uniq.tolist(), pa.string())).cast(pa.string())


def _finish_singleton_partials(batch: pa.Table) -> pa.Table:
    """Vectorized finish for partial rows that are ALREADY final groups
    (exactly one partial per key): the :func:`_edges_bucket` output schema
    without the groupby."""
    import pyarrow.compute as pc

    return pa.table({
        "src": batch.column("subj"),
        "dst": batch.column("obj"),
        "pred": batch.column("pred"),
        "description": batch.column("description"),
        "weight": pc.cast(batch.column("weight"), pa.float32()),
        "n_sources": pc.cast(
            pc.list_value_length(batch.column("chunk_ids")), pa.int32()),
        "chunk_ids": batch.column("chunk_ids"),
    })


def dedupe_edges_from_partials(
    partials: "ray.data.Dataset", alias_ref: "ray.ObjectRef",
    cfg: KGConfig | None = None, n_entities: int | None = None,
) -> "ray.data.Dataset":
    """Finish the edge dedup from :func:`preaggregate_edges` output,
    ALIAS-SCOPED: the pre-aggregate already reduced to one row per
    normalized (s,p,o), and the canonical remap can merge two keys only
    when it CHANGES one of them — so a key can gain a partner only if its
    endpoints touch the alias map (a member, which remaps away, or a
    canonical target, which a remapped row can land on). Rows whose
    endpoints avoid ``members ∪ canonicals`` are therefore already final
    groups and finish with one vectorized per-batch transform — no second
    corpus-of-edges shuffle. The affected slice (merge-event-scale on a
    realistic vocabulary) remaps + re-reduces in one driver task; when the
    slice is large in absolute terms OR as a fraction (merge-dense graphs,
    where the split buys nothing) the classic whole-table bucket shuffle
    runs instead. Value-identical to
    ``dedupe_edges(canonical_triples(triples, alias_ref))`` — equivalence
    pinned by tests/test_edge_preagg.py."""
    cfg = cfg or KGConfig()
    import pyarrow.compute as pc

    def _aff_array(alias: Dict[str, str]) -> pa.Array:
        return pa.array(sorted(set(alias).union(alias.values())), pa.string())

    def _split(batch: pa.Table, want_affected: bool) -> pa.Table:
        alias = ray.get(alias_ref)
        if not alias:
            return batch if not want_affected else batch.slice(0, 0)
        aff = _aff_array(alias)
        m = pc.or_(pc.is_in(batch.column("subj"), value_set=aff),
                   pc.is_in(batch.column("obj"), value_set=aff))
        return batch.filter(m if want_affected else pc.invert(m))

    def remap(batch: pa.Table) -> pa.Table:
        alias = ray.get(alias_ref)
        return (
            batch.drop_columns(["subj", "obj"])
            .append_column("subj", _remap_only_array(batch.column("subj"), alias))
            .append_column("obj", _remap_only_array(batch.column("obj"), alias))
        )

    def _full_shuffle() -> "ray.data.Dataset":
        remapped = partials.map_batches(remap, batch_format="pyarrow",
                                        batch_size=65536)
        # the input is ALREADY aggregated (edge-scale), so the finish needs
        # a quarter of the dedupe fan-out — 64 reducers over ~100k rows was
        # measured 1.4s slower than 16 (task-launch dominated)
        if _HAVE_POLARS:
            return hash_partitioned_groupby(
                remapped, ["subj", "pred", "obj"], _edges_bucket_arrow,
                n_buckets=cfg.salt_buckets, map_format="pyarrow",
                arrow_reducers=True,
            )
        return hash_partitioned_groupby(
            remapped, ["subj", "pred", "obj"], _edges_bucket,
            n_buckets=cfg.salt_buckets, map_format="pyarrow",
        )

    # driver-side density estimate first (free): when a large fraction of
    # the entity vocabulary sits in the alias map, most edges are
    # alias-incident and the split would scan for nothing
    alias = ray.get(alias_ref)
    n_aff_surfaces = len(set(alias).union(alias.values()))
    if n_entities and n_aff_surfaces > 0.1 * n_entities:
        return _full_shuffle()

    affected = partials.map_batches(
        lambda b: _split(b, True), batch_format="pyarrow", batch_size=None)
    n_affected = affected.count()
    n_partials = partials.count()
    if n_affected > min(MAX_DRIVER_EDGE_PARTIALS, max(1, 0.2 * n_partials)):
        # EITHER bound exceeded: absolute (the slice would not fit the
        # driver-merge heap budget) or relative (merge-dense graph, most
        # keys alias-incident — the split buys nothing). The classic
        # whole-table shuffle is the safe plan for both.
        return _full_shuffle()

    untouched = partials.map_batches(
        lambda b: _finish_singleton_partials(_split(b, False)),
        batch_format="pyarrow", batch_size=None)
    if n_affected == 0:
        return untouched

    tabs = [t for t in ray.get(affected.to_arrow_refs()) if t.num_rows]
    merged_ds = ray.data.from_arrow(_edges_finish_local_table(
        pa.concat_tables(tabs), ray.get(alias_ref)))
    return untouched.union(merged_ds)


# Driver-local edge-finish guard: below this many pre-aggregated partial
# rows the remap + final reduce run on the driver (one vectorized pass)
# instead of a bucket shuffle — for aggregated-edge-scale tables the
# shuffle is mostly task-launch overhead (the entities fast-path pattern).
# With polars importable the driver kernel is a Rust hash group-by + list
# ops (measured 0.4 s on 175k partial rows vs 1.9 s for the uncontended
# 16-bucket shuffle and 3.3 s for the pandas kernel, value-identical), so
# the guard rises to 1M rows (~300 MB driver heap; beyond that the
# alias-scoped / shuffle paths take over — at 10^12-doc scale the edge
# table exceeds any driver, and the shuffle is the design path). The
# pandas fallback kernel is SLOWER than the shuffle past ~50k rows
# (explode of the provenance lists is ~25× the row count), hence the
# availability-gated guard.
try:  # pragma: no cover - exercised via the guard value
    import polars as _pl_probe  # noqa: F401
    MAX_DRIVER_EDGE_PARTIALS = 1_000_000
except ImportError:  # pragma: no cover
    MAX_DRIVER_EDGE_PARTIALS = 50_000


def _edges_finish_local_table(tbl: pa.Table, alias: Dict[str, str]) -> pa.Table:
    """Driver-side alias remap + final edge reduce over one Arrow table.
    Polars kernel when importable; pandas kernel otherwise. Value-identical
    to shuffling through :func:`_edges_bucket` (pinned by
    tests/test_edge_preagg.py): description = lexicographic-min
    (min_chunk, description) pair's description, weight = max, chunk_ids =
    sorted union capped at MAX_EDGE_CHUNK_IDS (k-smallest)."""
    try:
        import polars as pl
    except ImportError:
        from ray.data.block import BlockAccessor

        from ..functions.shuffle import _arrow_group_to_pandas

        df = _arrow_group_to_pandas(tbl)
        if alias and len(df):
            df = df.copy()
            df["subj"] = df["subj"].map(alias).fillna(df["subj"])
            df["obj"] = df["obj"].map(alias).fillna(df["obj"])
        return BlockAccessor.for_block(_edges_bucket(df)).to_arrow()

    df = pl.from_arrow(tbl)
    if alias:
        df = df.with_columns([
            pl.col("subj").replace(alias),
            pl.col("obj").replace(alias),
        ])
    keys = ["subj", "pred", "obj"]
    # group_by preserves row order WITHIN each group, so the pre-sort makes
    # first() the lexicographic-min (min_chunk, description) pick — the
    # same batching-free tie-break as the pandas reducer
    out = (
        df.sort(keys + ["min_chunk", "description"])
        .group_by(keys, maintain_order=False)
        .agg([
            pl.col("description").first(),
            pl.col("weight").max(),
            pl.col("chunk_ids").explode(empty_as_null=False).unique().sort()
            .head(MAX_EDGE_CHUNK_IDS).alias("chunk_ids"),
        ])
        .with_columns(
            pl.col("weight").cast(pl.Float32),
            pl.col("chunk_ids").list.len().cast(pl.Int32).alias("n_sources"),
        )
        .rename({"subj": "src", "obj": "dst"})
        .select(["src", "dst", "pred", "description", "weight",
                 "n_sources", "chunk_ids"])
    )
    # cast away polars' large_* types so the block unifies with parquet
    # read-backs and pandas-origin blocks downstream
    res = out.to_arrow()
    return res.cast(pa.schema([
        ("src", pa.string()), ("dst", pa.string()), ("pred", pa.string()),
        ("description", pa.string()), ("weight", pa.float32()),
        ("n_sources", pa.int32()), ("chunk_ids", pa.list_(pa.string())),
    ]))


def dedupe_edges_from_partials_local(
    partials: "ray.data.Dataset", alias_ref: "ray.ObjectRef",
    cfg: KGConfig | None = None,
) -> "ray.data.Dataset":
    """Driver-local variant of :func:`dedupe_edges_from_partials` for
    partial tables under MAX_DRIVER_EDGE_PARTIALS: collect the (aggregated,
    edge-scale) partials and run :func:`_edges_finish_local_table` (polars
    kernel when importable, the pandas :func:`_edges_bucket` otherwise).
    Value-identical to the shuffle path (row order differs; every consumer
    is order-free — pinned by tests/test_edge_preagg.py)."""
    import ray as _ray

    tabs = [t for t in _ray.get(partials.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(tabs)
    return ray.data.from_arrow(
        _edges_finish_local_table(tbl, _ray.get(alias_ref)))


def dedupe_edges(triples_canon: "ray.data.Dataset", cfg: KGConfig | None = None) -> "ray.data.Dataset":
    """groupby(src,dst,pred) keep-first — entity_merger.py:409-450 semantics
    (duplicate same-direction relationships collapse to rels[0]), with
    deterministic ordering by chunk_id instead of arrival order. Map-side
    combine, then a vectorized hash-bucket reduce (functions/shuffle.py).
    n_sources saturates at MAX_EDGE_CHUNK_IDS (documented provenance cap)."""
    cfg = cfg or KGConfig()
    # large combine batches: duplicate facts are spread uniformly, so the
    # map-side combine ratio improves with batch size (a 64k batch sees ~all
    # hot (s,p,o) keys and emits one row each) — less data into the shuffle
    partial = triples_canon.map_batches(
        _partial_edges_arrow if _HAVE_POLARS else _partial_edges,
        batch_format="pyarrow", batch_size=65536
    )
    if _HAVE_POLARS:
        return hash_partitioned_groupby(
            partial, ["subj", "pred", "obj"], _edges_bucket_arrow,
            n_buckets=cfg.salt_buckets * 4, map_format="pyarrow",
            pre_combine=_edges_partial_bucket_arrow, arrow_reducers=True,
        )
    return hash_partitioned_groupby(
        partial, ["subj", "pred", "obj"], _edges_bucket,
        n_buckets=cfg.salt_buckets * 4, map_format="pyarrow",
        pre_combine=_edges_partial_bucket,
    )
