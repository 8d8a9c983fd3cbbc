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
