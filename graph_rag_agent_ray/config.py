"""Typed configuration for the KG-construction engine.

Mirrors the knobs the reference keeps in ``config/settings.py`` (reference:
/root/reference/config/settings.py:14-79) — chunk window, thresholds, batch
sizes — as one frozen dataclass injected into every stage, instead of module
globals. All sizes are tuned for Ray Data blocks, not Neo4j UNWIND batches.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Tuple


@dataclass(frozen=True)
class KGConfig:
    # ---- chunking (reference: config/settings.py:35-37) ----
    chunk_size: int = 500          # tokens per chunk
    chunk_overlap: int = 100       # token overlap between chunks
    max_text_length: int = 500_000  # pre-split threshold (chars)
    sentence_snap_slack: int = 100  # forward sentence-snap allowance (tokens)

    # ---- extraction ----
    tuple_delimiter: str = " : "   # reference: graph/extraction/entity_extractor.py:44
    record_delimiter: str = "\n"
    completion_delimiter: str = "\n\n"
    glean_rounds: int = 1          # GraphRAG-style re-prompt rounds (mock: no-op extra pass)
    model_tag: str = "mock-deterministic-v1"
    # exact work-dedup: identical chunk text hits the model once
    # (entity_extractor.py:89-143 cache semantics); costs a join shuffle, so
    # enable when the extractor is expensive (a real LLM)
    dedupe_extraction: bool = False
    llm_retries: int = 3           # reference @retry(times=3) (core/utils.py:77-102)
    llm_backoff_s: float = 1.0     # linear backoff between attempts (0 in tests)

    # ---- entity linking / canonicalization ----
    knn_similarity_cutoff: float = 0.9   # reference: config/settings.py:38
    knn_top_k: int = 10                  # reference: graph/processing/similar_entity.py:169-180
    word_edit_distance: int = 3          # reference: graph/processing/similar_entity.py:17
    embed_dim: int = 64                  # deterministic hash-embedding dimensionality
    lsh_bits: int = 8                    # random-hyperplane bits for similarity blocking
    salt_buckets: int = 16               # canonicalization shuffle salt fan-out
    # suffixes the deterministic merge-judge treats as formatting noise
    # (mirrors the semantics of the LLM merge prompt, config/prompt.py:103-137)
    company_suffixes: Tuple[str, ...] = ("INC", "CORP", "LTD", "LLC", "CO", "公司", "集团")
    # alias maps up to this size broadcast via ray.put; larger ones remap
    # through distributed hash joins (canonical_triples_distributed)
    broadcast_alias_limit: int = 5_000_000

    # ---- communities ----
    community_algorithm: str = "leiden"  # real seeded Leiden (functions/leiden.py);
    #                                      "louvain"/"sllpa" remain pluggable options
    # SLPA (sllpa) knobs — reference small-memory tier (sllpa.py:75-80)
    sllpa_max_iterations: int = 50
    sllpa_min_association: float = 0.1
    community_seed: int = 42
    community_max_levels: int = 3        # reference leiden.py:67-89 (maxLevels tiers)
    community_gamma: float = 0.08        # CPM resolution (no resolution limit);
    #   recovery window for the planted corpus is ~(inter-pair density, k_min/(K-1))
    #   — 0.06..0.10 verified exact at 60..2000 docs, 0.08 is the centre
    community_objective: str = "cpm"     # "cpm" | "modularity" (GDS parity)
    community_top_n_summaries: int = 200  # reference: community/summary/leiden.py:36-39
    driver_graph_guard: int = 2_000_000  # max entities for driver-local community detection

    # ---- batching / parallelism ----
    chunk_batch_size: int = 256
    extract_batch_size: int = 128
    embed_batch_size: int = 1024
    extract_concurrency: int = 8
    embed_concurrency: int = 4

    # ---- incremental updates ----
    # persist the per-doc graph-side tables (mentions, mentions_canon,
    # entities_embedded, alias_map) so a later incremental_build_kg can
    # delta-scope the graph side (reference dirty-flag propagation,
    # build/incremental_graph_builder.py:520-560). Costs extra async
    # snapshot writes off the critical path; disable for one-shot builds.
    incremental_snapshots: bool = True
    # dense-vocabulary bypass: when a tick's touched-surface set covers at
    # least this fraction of the previous vocabulary (and at least the min),
    # the per-key carry-over machinery for the entity/edge aggregates costs
    # more than it saves (the filter scans touch every row only to keep
    # ~everything) — re-aggregate those two stages in full instead, exactly
    # as a fresh build would. Per-doc stages stay delta-scoped either way.
    incremental_dense_fraction: float = 0.5
    incremental_dense_min: int = 256

    # ---- misc ----
    seed: int = 42
    unknown_entity_type: str = "未知"    # reference: graph/extraction/graph_writer.py:81
    unknown_description: str = "No additional data"

    def with_(self, **kw) -> "KGConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = KGConfig()
