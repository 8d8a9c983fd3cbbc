"""Evaluation helpers — the shape of the reference's evaluator framework
(/root/reference/evaluator/metrics/answer_metrics.py:7-285 computes EM/F1
token metrics; our build-side gates are triple-set P/R and the per-row
span-sequence invariant, per BASELINE.json)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Set, Tuple

import pandas as pd


@dataclass(frozen=True)
class PRF:
    precision: float
    recall: float
    f1: float
    tp: int
    n_ours: int
    n_truth: int


def triple_prf(ours: pd.DataFrame, truth: pd.DataFrame) -> PRF:
    """Exact-match P/R/F1 on distinct (subj, pred, obj) tuples."""
    a: Set[Tuple] = set(zip(ours["subj"], ours["pred"], ours["obj"]))
    b: Set[Tuple] = set(zip(truth["subj"], truth["pred"], truth["obj"]))
    tp = len(a & b)
    p = tp / len(a) if a else 0.0
    r = tp / len(b) if b else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return PRF(p, r, f1, tp, len(a), len(b))


def span_sequences_equal(
    input_docs: Iterable[dict], rebuilt: dict
) -> Tuple[bool, list]:
    """Per-row (kind, text, media_ref, order) equality; returns (ok, failures)."""
    failures = []
    for row in input_docs:
        expected = [
            (s["kind"], s["text"], s["media_ref"])
            for s in sorted(row["spans"], key=lambda s: s["offset"])
        ]
        got = rebuilt.get(row["doc_id"])
        if got != expected:
            failures.append(row["doc_id"])
    return (not failures, failures)


def entity_coverage_stats(built: pd.DataFrame, truth: pd.DataFrame) -> pd.DataFrame:
    """Per-type entity coverage of the built KG against a golden entity set —
    the build-side analogue of the reference's EntityCoverageMetric
    (evaluator/metrics/graph_metrics.py:1009-1062: known-entity hit rate,
    here exact id+type matching instead of question-keyword lookup).

    ``built``: (entity_id, entity_type) from the built entities table.
    ``truth``: (entity_id, entity_type) golden rows.
    Returns (entity_type, n_truth, n_built, n_matched) — integer counts so
    the result is hash-comparable against a SQL oracle; coverage ratios are
    n_matched / n_truth downstream."""
    b = built[["entity_id", "entity_type"]].drop_duplicates()
    t = truth[["entity_id", "entity_type"]].drop_duplicates()
    n_truth = t.groupby("entity_type").size()
    n_built = b.groupby("entity_type").size()
    matched = t.merge(b, on=["entity_id", "entity_type"])
    n_matched = matched.groupby("entity_type").size()
    types = sorted(set(n_truth.index) | set(n_built.index))
    out = pd.DataFrame({
        "entity_type": types,
        "n_truth": [int(n_truth.get(ty, 0)) for ty in types],
        "n_built": [int(n_built.get(ty, 0)) for ty in types],
        "n_matched": [int(n_matched.get(ty, 0)) for ty in types],
    })
    return out


def relationship_coverage(built_edges: pd.DataFrame,
                          truth_edges: pd.DataFrame) -> PRF:
    """Exact-match P/R/F1 on distinct (src, pred, dst) edges — the
    relationship side of the reference's graph-coverage metrics
    (evaluator/metrics/graph_metrics.py:635-720)."""
    ours = built_edges.rename(columns={"src": "subj", "dst": "obj"})
    tr = truth_edges.rename(columns={"src": "subj", "dst": "obj"})
    return triple_prf(ours, tr)


def subgraph_quality_stats(membership: pd.DataFrame,
                           edges: pd.DataFrame) -> pd.DataFrame:
    """Per-community structure stats — the deterministic core of the
    reference's SubgraphQualityMetric (evaluator/metrics/graph_metrics.py:
    242-330 scores density 0.5 / connectivity 0.5 over retrieved subgraphs;
    here the same density inputs over the BUILT communities, as exact
    integers so a SQL oracle can reproduce them).

    ``membership``: (entity_id, community_number) at one detection level.
    ``edges``: (src, pred, dst) canonical edge rows.
    Returns (community_number, n_members, n_intra_edges, n_possible_pairs);
    density = n_intra_edges / n_possible_pairs downstream."""
    m = membership[["entity_id", "community_number"]].drop_duplicates()
    members = m.groupby("community_number").size()
    e = edges[["src", "pred", "dst"]].drop_duplicates()
    tagged = (e.merge(m.rename(columns={"entity_id": "src",
                                        "community_number": "_c_src"}), on="src")
              .merge(m.rename(columns={"entity_id": "dst",
                                       "community_number": "_c_dst"}), on="dst"))
    intra = tagged[tagged["_c_src"] == tagged["_c_dst"]]
    n_intra = intra.groupby("_c_src").size()
    nums = sorted(members.index)
    out = pd.DataFrame({
        "community_number": [int(c) for c in nums],
        "n_members": [int(members[c]) for c in nums],
        "n_intra_edges": [int(n_intra.get(c, 0)) for c in nums],
        "n_possible_pairs": [int(members[c] * (members[c] - 1) // 2)
                             for c in nums],
    })
    return out
