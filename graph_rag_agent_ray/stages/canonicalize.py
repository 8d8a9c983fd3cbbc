"""Entity linking + canonicalization as explicit Ray Data shuffles.

Replaces the reference's Neo4j-hosted pipeline (embedding KNN → SIMILAR edges
→ GDS WCC → edit-distance candidate groups → LLM merge judge → apoc
mergeNodes → duplicate-relationship cleanup; /root/reference/graph/processing/
similar_entity.py:147-442 and entity_merger.py:89-526) with:

1. **Exact dedup** — normalize surfaces, then a SALTED two-phase aggregate:
   per-batch partial aggregation (one row per (surface, salt) per batch — no
   shuffle) followed by groupby(surface, salt) → groupby(surface). The salt
   bounds any single reducer's input under Zipf-skewed hot entities, which the
   north rule calls out explicitly.
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

import ray
import ray.data

from ..config import KGConfig
from ..functions.embed import cosine_topk, embed_texts, lsh_bucket
from ..functions.hashing import stable_bucket
from ..functions.text import edit_distance, normalize_surface
from ..functions.unionfind import UnionFind

logger = logging.getLogger(__name__)

MAX_BLOCK_COMPARE = 1024  # pairwise-compare cap per block (logged, not silent)
MAX_DRIVER_PAIRS = 5_000_000  # union-find size guard


# --------------------------------------------------------------------------
# 1. exact dedup (salted two-phase aggregate)
# --------------------------------------------------------------------------

def _partial_exact(batch: pa.Table, salt_buckets: int) -> pd.DataFrame:
    """Per-batch partial aggregation: one output row per (surface, salt,
    type). Runs inside map_batches — no shuffle, bounds reducer fan-in."""
    df = pa.Table.to_pandas(batch)
    df["norm_surface"] = [normalize_surface(s) for s in df["entity_surface"]]
    df["salt"] = stable_bucket(df["chunk_id"].tolist(), salt_buckets)
    grouped = (
        df.groupby(["norm_surface", "salt", "entity_type"], sort=False)
        .agg(
            n_mentions=("chunk_id", "size"),
            min_chunk=("chunk_id", "min"),
            description=("description", "first"),
            surfaces=("entity_surface", lambda s: sorted(set(s))[:8]),
        )
        .reset_index()
    )
    return grouped


def _final_exact(group: pd.DataFrame) -> pd.DataFrame:
    """Final per-surface merge: majority type, deterministic-first description,
    union of raw surfaces."""
    by_type = group.groupby("entity_type")["n_mentions"].sum().sort_values(
        ascending=False, kind="stable"
    )
    top = by_type.iloc[0]
    etype = sorted(by_type[by_type == top].index)[0]
    first = group.loc[group["min_chunk"].idxmin()]
    surfaces = sorted({s for lst in group["surfaces"] for s in lst})[:16]
    return pd.DataFrame([{
        "norm_surface": group["norm_surface"].iloc[0],
        "entity_type": etype,
        "description": first["description"],
        "n_mentions": int(group["n_mentions"].sum()),
        "surface_forms": surfaces,
        "min_chunk": group["min_chunk"].min(),
    }])


def aggregate_exact(mentions: "ray.data.Dataset", cfg: KGConfig | None = None) -> "ray.data.Dataset":
    cfg = cfg or KGConfig()
    partial = mentions.map_batches(
        lambda b: _partial_exact(b, cfg.salt_buckets),
        batch_format="pyarrow",
        batch_size=8192,
    )
    # salted stage: groupby (surface, salt) first so no reducer sees a whole
    # hot key, then the tiny final groupby per surface
    salted = partial.groupby(["norm_surface", "salt"]).map_groups(
        lambda g: _final_exact(g), batch_format="pandas"
    )
    merged = salted.groupby("norm_surface").map_groups(
        lambda g: _final_exact(g.assign(surfaces=g["surface_forms"])),
        batch_format="pandas",
    )
    return merged.drop_columns(["min_chunk"])


# --------------------------------------------------------------------------
# 2. embedding + blocking
# --------------------------------------------------------------------------

class EmbedEntities:
    """Actor-pool stage: hash-embed ``norm_surface`` once per unique entity.
    A model-backed embedder (entity_indexer.py:34) would load its client here
    in __init__ and batch `embed_documents` calls in __call__."""

    def __init__(self, cfg: KGConfig | None = None) -> None:
        self.cfg = cfg or KGConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch.column("norm_surface").to_pylist()
        vecs = embed_texts(surfaces, dim=self.cfg.embed_dim)
        offsets = pa.array(
            np.arange(0, (len(surfaces) + 1) * self.cfg.embed_dim, self.cfg.embed_dim,
                      dtype=np.int32)
        )
        emb = pa.ListArray.from_arrays(offsets, pa.array(vecs.ravel(), pa.float32()))
        return batch.append_column("embedding", emb)


def embed_entities(entities: "ray.data.Dataset", cfg: KGConfig | None = None) -> "ray.data.Dataset":
    cfg = cfg or KGConfig()
    # autoscaling (min 1) so the pool never starves upstream read tasks
    return entities.map_batches(
        EmbedEntities,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.embed_batch_size,
        concurrency=(1, cfg.embed_concurrency),
        num_cpus=1,
    )


N_LSH_TABLES = 8


def _blocking_keys(batch: pa.Table, cfg: KGConfig) -> pa.Table:
    """Explode each entity to its blocking keys: N_LSH_TABLES LSH buckets +
    one normalized-prefix key (catches suffix/typo variants whose embeddings
    straddle a hyperplane). Output: (block_key, norm_surface, embedding)."""
    surfaces = batch.column("norm_surface").to_pylist()
    vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float32)
    keys: List[str] = []
    surf_out: List[str] = []
    vec_out: List[int] = []  # row indices, to avoid copying vectors per key
    for t in range(N_LSH_TABLES):
        buckets = lsh_bucket(vecs, cfg.lsh_bits, seed=cfg.seed + t)
        for i, b in enumerate(buckets):
            keys.append(f"lsh{t}:{b}")
            surf_out.append(surfaces[i])
            vec_out.append(i)
    for i, s in enumerate(surfaces):
        keys.append("pfx:" + s[:4])
        surf_out.append(s)
        vec_out.append(i)
    emb = [vecs[i].tolist() for i in vec_out]
    return pa.table({
        "block_key": pa.array(keys, pa.string()),
        "norm_surface": pa.array(surf_out, pa.string()),
        "embedding": pa.array(emb, pa.list_(pa.float32())),
    })


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


SORTED_NEIGHBOUR_WINDOW = 20


def _pairs_in_block(group: pd.DataFrame, cfg: KGConfig) -> pd.DataFrame:
    """Within one block, two candidate generators feed the merge judge —
    mirroring the reference's two gates (embedding KNN, similar_entity.py:
    147-222; textual distance grouping, similar_entity.py:288-365):

    1. exact cosine top-k (cutoff 0.9 / k 10, the GDS KNN parameters);
    2. sorted-neighbourhood window over the lexicographically ordered
       surfaces (suffix/typo variants sort adjacently even when their hash
       embeddings dip under the cosine cutoff).

    Emits judge-surviving (a, b) pairs with a < b."""
    dedup = group.drop_duplicates("norm_surface")
    if len(dedup) > MAX_BLOCK_COMPARE:
        logger.warning(
            "block %s truncated: %d > %d entities",
            group["block_key"].iloc[0], len(dedup), MAX_BLOCK_COMPARE,
        )
        dedup = dedup.iloc[:MAX_BLOCK_COMPARE]
    if len(dedup) < 2:
        return pd.DataFrame({"a": [], "b": []})
    surfaces = dedup["norm_surface"].tolist()
    vecs = np.array(dedup["embedding"].tolist(), dtype=np.float32)

    candidates: Set[Tuple[str, str]] = set()
    for i, neighbours in enumerate(cosine_topk(vecs, cfg.knn_top_k, cfg.knn_similarity_cutoff)):
        for j, _score in neighbours:
            a, b = sorted((surfaces[i], surfaces[j]))
            candidates.add((a, b))
    ordered = sorted(surfaces)
    for i in range(len(ordered)):
        for j in range(i + 1, min(i + 1 + SORTED_NEIGHBOUR_WINDOW, len(ordered))):
            candidates.add((ordered[i], ordered[j]))

    out = sorted(p for p in candidates if judge_pair(p[0], p[1], cfg))
    if not out:
        return pd.DataFrame({"a": [], "b": []})
    return pd.DataFrame({"a": [p[0] for p in out], "b": [p[1] for p in out]})


def candidate_pairs(embedded: "ray.data.Dataset", cfg: KGConfig | None = None) -> "ray.data.Dataset":
    cfg = cfg or KGConfig()
    blocks = embedded.map_batches(
        lambda b: _blocking_keys(b, cfg), batch_format="pyarrow", batch_size=4096
    )
    return blocks.groupby("block_key").map_groups(
        lambda g: _pairs_in_block(g, cfg), batch_format="pandas"
    )


# --------------------------------------------------------------------------
# 3-4. union-find → alias map
# --------------------------------------------------------------------------

def build_alias_map(
    pairs: "ray.data.Dataset",
    mention_counts: Dict[str, int],
) -> Dict[str, str]:
    """Driver-side union-find over judged pairs (size-guarded: pairs are the
    *merge decisions*, not the corpus). canonical = max mention count, tie →
    lexicographic min."""
    pdf = pairs.to_pandas()
    if len(pdf) > MAX_DRIVER_PAIRS:
        raise RuntimeError(
            f"{len(pdf)} candidate pairs exceed driver guard {MAX_DRIVER_PAIRS}; "
            "switch to distributed min-label propagation"
        )
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

def _merge_entity_group(group: pd.DataFrame) -> pd.DataFrame:
    group = group.sort_values(["n_mentions", "norm_surface"],
                              ascending=[False, True], kind="stable")
    rep = group.iloc[0]
    surfaces = sorted({s for lst in group["surface_forms"] for s in lst})[:32]
    by_type = group.groupby("entity_type")["n_mentions"].sum().sort_values(ascending=False, kind="stable")
    top = by_type.iloc[0]
    etype = sorted(by_type[by_type == top].index)[0]
    return pd.DataFrame([{
        "entity_id": group["entity_id"].iloc[0],
        "surface_forms": surfaces,
        "entity_type": etype,
        "description": rep["description"],
        "embedding": rep["embedding"],
        "n_mentions": int(group["n_mentions"].sum()),
    }])


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
    return with_id.groupby("entity_id").map_groups(_merge_entity_group, batch_format="pandas")


def canonical_triples(
    triples: "ray.data.Dataset", alias_ref: "ray.ObjectRef", cfg: KGConfig | None = None
) -> "ray.data.Dataset":
    """Normalize + canonical-remap subj/obj. Broadcast alias map (ray.put once,
    ray.get per task from local object store — never re-shipped per batch)."""

    def remap(batch: pa.Table) -> pa.Table:
        alias = ray.get(alias_ref)
        subj = [alias.get(n, n) for n in (normalize_surface(s) for s in batch.column("subj").to_pylist())]
        obj = [alias.get(n, n) for n in (normalize_surface(s) for s in batch.column("obj").to_pylist())]
        return (
            batch.drop_columns(["subj", "obj"])
            .append_column("subj", pa.array(subj, pa.string()))
            .append_column("obj", pa.array(obj, pa.string()))
        )

    return triples.map_batches(remap, batch_format="pyarrow", batch_size=8192)


def _merge_edge_group(group: pd.DataFrame) -> pd.DataFrame:
    group = group.sort_values("chunk_id", kind="stable")  # deterministic "first"
    first = group.iloc[0]
    chunk_ids = sorted(set(group["chunk_id"]))
    return pd.DataFrame([{
        "src": first["subj"], "dst": first["obj"], "pred": first["pred"],
        "description": first["description"],
        "weight": np.float32(first["weight"]),
        "n_sources": np.int32(len(chunk_ids)),
        "chunk_ids": chunk_ids[:64],
    }])


def dedupe_edges(triples_canon: "ray.data.Dataset", cfg: KGConfig | None = None) -> "ray.data.Dataset":
    """groupby(src,dst,pred) keep-first — entity_merger.py:409-450 semantics
    (duplicate same-direction relationships collapse to rels[0]), with
    deterministic ordering by chunk_id instead of arrival order."""
    return triples_canon.groupby(["subj", "pred", "obj"]).map_groups(
        _merge_edge_group, batch_format="pandas"
    )
