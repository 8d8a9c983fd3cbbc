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


# ---------------------------------------------------------------------------
# answer-side metrics (reference evaluator/metrics/answer_metrics.py parity)
# ---------------------------------------------------------------------------

def normalize_answer(s: str) -> str:
    """Reference evaluator text normalization — the exact op ORDER of
    text_utils.py:28: lower → remove punctuation → remove articles →
    whitespace fix. Order matters: stripping punctuation first fuses
    "a.m." into "am" so the article regex does not mistake its "a" for an
    article ("a.m. meeting" → "am meeting", not "m meeting")."""
    import re
    import string

    s = s.lower()
    exclude = set(string.punctuation + "，。！？《》【】""''：；（）、")
    s = "".join(ch for ch in s if ch not in exclude)
    s = re.sub(r"\b(a|an|the|一个|一种|这个|那个)\b", " ", s)
    return " ".join(s.split())


def _clean_markdown(pred: str) -> str:
    """The evaluator's system-answer preprocessing
    (answer_metrics.py:56-60): drop markdown headings + blank runs."""
    import re

    cleaned = re.sub(r"^###.*?\n+", "", pred, flags=re.MULTILINE)
    cleaned = re.sub(r"\n\s*\n", "\n", cleaned)
    return cleaned.strip()


def exact_match(prediction: str, golden: str) -> float:
    """ExactMatch.calculate_em (answer_metrics.py:16-36): 1.0 iff the
    normalized texts are identical; empty either side → 0.0."""
    if not prediction or not golden:
        return 0.0
    return 1.0 if (normalize_answer(_clean_markdown(prediction))
                   == normalize_answer(golden)) else 0.0


def answer_f1(prediction: str, golden: str, tokenizer=None) -> float:
    """F1Score's rule path (answer_metrics.py:160-240): normalize both
    texts, tokenize (injectable — the reference uses jieba, absent here;
    default is the repo's regex tokenizer), drop 1-char tokens and the
    reference stopword set, then token-SET F1. Both empty → 1.0; one empty
    → 0.0."""
    from .functions.text import tokenize

    tok = tokenizer or tokenize
    stop = {"的", "了", "和", "在", "是", "为", "以", "与", "或", "且"}
    p = [t for t in tok(normalize_answer(_clean_markdown(prediction)))
         if len(t) > 1 and t not in stop]
    g = [t for t in tok(normalize_answer(golden))
         if len(t) > 1 and t not in stop]
    if not p and not g:
        return 1.0
    if not p or not g:
        return 0.0
    # reference divides the common SET size by the token LIST lengths
    # (answer_metrics.py:227-229) — duplicates penalize, mirror that
    common = set(p) & set(g)
    precision = len(common) / len(p)
    recall = len(common) / len(g)
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


# ---------------------------------------------------------------------------
# retrieval-side metrics (reference evaluator/metrics/retrieval_metrics.py —
# the DETERMINISTIC rule paths; the LLM-fallback branches are env-blocked
# here and the registry seam is where they would plug in)
# ---------------------------------------------------------------------------

def retrieval_match_counts(retrieved, referenced) -> Tuple[int, int]:
    """The shared matching core of RetrievalPrecision/_Utilization
    (retrieval_metrics.py:103-129, 283-305): lowercase both entity lists,
    count referenced ids appearing as substrings of any retrieved entity
    (direct), and referenced ids whose first digit run appears in any
    retrieved entity (num). Callers take max(direct, num)."""
    import re

    retr = [str(e).lower() for e in retrieved or []]
    ref = [str(e).lower() for e in referenced or []]
    direct = sum(1 for r in ref if any(r in t for t in retr))
    num = 0
    for r in ref:
        m = re.search(r"\d+", r)
        if m and any(m.group() in t for t in retr):
            num += 1
    return direct, num


def retrieval_precision(retrieved, referenced) -> float:
    """RetrievalPrecision's rule path (retrieval_metrics.py:54-129): base
    score 0.3 when either side is empty or nothing matches; otherwise
    0.3 + 0.7 * matched / n_referenced (floored at 0.3)."""
    if not retrieved or not referenced:
        return 0.3
    direct, num = retrieval_match_counts(retrieved, referenced)
    matched = max(direct, num)
    if matched > 0:
        return max(0.3, 0.3 + 0.7 * (matched / len(referenced)))
    return 0.3


def retrieval_utilization(retrieved, referenced) -> float:
    """RetrievalUtilization's rule path (retrieval_metrics.py:283-330):
    same scoring as precision, plus the partial-token branch — when no id
    matches but any >3-char token of a referenced id appears in the joined
    retrieved text, score 0.4."""
    if not retrieved or not referenced:
        return 0.3
    direct, num = retrieval_match_counts(retrieved, referenced)
    matched = max(direct, num)
    if matched > 0:
        return max(0.3, 0.3 + 0.7 * (matched / len(referenced)))
    combined = " ".join(str(e).lower() for e in retrieved)
    for r in (str(e).lower() for e in referenced):
        if any(tok in combined for tok in r.split() if len(tok) > 3):
            return 0.4
    return 0.3


def retrieval_latency(retrieval_times) -> float:
    """RetrievalLatency (retrieval_metrics.py:359-401): mean retrieval time
    over samples (lower is better — reported raw, not scored)."""
    times = list(retrieval_times or [])
    return (sum(times) / len(times)) if times else 0.0


def chunk_key_phrases(chunk_text: str) -> list:
    """ChunkUtilization's phrase extraction (retrieval_metrics.py:496-500):
    word/CJK runs of length ≥4, deduplicated."""
    import re

    phrases = re.findall(r"\b[\w一-龥]{4,}\b", chunk_text or "")
    return sorted(set(p for p in phrases if len(p) > 3))


def chunk_utilization(answer_text: str, chunk_texts) -> float:
    """ChunkUtilization's deterministic core (retrieval_metrics.py:404-520):
    per retrieved chunk, the fraction of its key phrases appearing in the
    answer; score = mean over chunks with phrases. No chunks → base 0.3
    (the reference's no-chunk-ids branch)."""
    chunks = [c for c in (chunk_texts or []) if c]
    if not chunks:
        return 0.3
    answer = (answer_text or "").lower()
    ratios = []
    for text in chunks:
        phrases = chunk_key_phrases(text)
        if phrases:
            ratios.append(sum(1 for p in phrases if p.lower() in answer)
                          / len(phrases))
    return (sum(ratios) / len(ratios)) if ratios else 0.3


# ---------------------------------------------------------------------------
# deep-search metrics (reference evaluator/metrics/deep_search_metrics.py —
# deterministic structure-rule paths; each metric's LLM branch takes
# max(rule, llm) in the reference, so the rule path is its floor)
# ---------------------------------------------------------------------------

def _extract_thinking(answer: str, thinking_process: str | None = None) -> str:
    """The shared thinking-process accessor (deep_search_metrics.py:22-31):
    explicit field first, else the <think>...</think> block in the answer."""
    import re

    if thinking_process:
        return thinking_process
    m = re.search(r"<think>(.*?)</think>", answer or "", re.DOTALL)
    return m.group(1).strip() if m else ""


def _thinking_queries(thinking: str) -> list:
    import re

    return re.findall(r">\s*\d+\.\s*(.*?)\n", thinking)


def reasoning_coherence(answer: str, thinking_process: str | None = None) -> float:
    """ReasoningCoherence's structure rule (deep_search_metrics.py:14-132):
    base 0.6 + 0.1 per search query (≤3) + 0.1 for >3 paragraphs, capped at
    1.0; no thinking process → the 0.6 default."""
    import re

    thinking = _extract_thinking(answer, thinking_process)
    if not thinking:
        return 0.6
    score = 0.6
    queries = _thinking_queries(thinking)
    if queries:
        score += 0.1 * min(3, len(queries))
    if len(re.split(r"\n\n+", thinking)) > 3:
        score += 0.1
    return min(1.0, score)


def reasoning_depth(answer: str, thinking_process: str | None = None) -> float:
    """ReasoningDepth's feature rule (deep_search_metrics.py:179-325):
    base 0.6 + query count (0.05 each ≤0.2) + paragraph depth (0.02 each
    ≤0.1) + Final-Information sections (0.05 each ≤0.1); no thinking → 0.6."""
    import re

    thinking = _extract_thinking(answer, thinking_process)
    if not thinking:
        return 0.6
    q = len(_thinking_queries(thinking))
    paras = len(re.split(r"\n\n+", thinking))
    infos = len(re.findall(r"\*\*Final Information\*\*(.*?)(?=\n\n|\Z)",
                           thinking, re.DOTALL))
    return min(1.0, 0.6 + min(0.2, 0.05 * q) + min(0.1, 0.02 * paras)
               + min(0.1, 0.05 * infos))


def iterative_improvement(answer: str,
                          thinking_process: str | None = None) -> float:
    """IterativeImprovementMetric's rule (deep_search_metrics.py:344-500):
    base 0.5 + 0.1 per numbered query iteration (≤0.3); no thinking → 0.5."""
    thinking = _extract_thinking(answer, thinking_process)
    if not thinking:
        return 0.5
    n_iter = len(_thinking_queries(thinking))
    score = 0.5
    if n_iter >= 1:
        score += min(0.3, 0.1 * n_iter)
    return min(1.0, score)


def knowledge_graph_utilization(answer: str,
                                thinking_process: str | None = None) -> float:
    """KnowledgeGraphUtilizationMetric's rule (deep_search_metrics.py:
    523-698): base 0.2 + 0.03 per graph-term mention in the thinking (≤0.3)
    + 0.25 each for the 核心相关实体 / 相关知识社区 answer sections; without
    a thinking process only the section bonuses apply."""
    import re

    answer = answer or ""
    has_entity = bool(re.search(r"核心相关实体[：:]\s*(.*?)(?=\n|$)", answer,
                                re.IGNORECASE))
    has_community = bool(re.search(r"相关知识社区[：:]\s*(.*?)(?=\n|$)", answer,
                                   re.IGNORECASE))
    thinking = _extract_thinking(answer, thinking_process)
    mention_score = 0.0
    if thinking:
        mentions = re.findall(r"知识图谱|实体|关系|社区", thinking,
                              re.IGNORECASE)
        mention_score = min(0.3, len(mentions) * 0.03)
    return min(1.0, 0.2 + mention_score + (0.25 if has_entity else 0.0)
               + (0.25 if has_community else 0.0))


# ---------------------------------------------------------------------------
# metric registry (reference evaluator/core/base_evaluator.py:47-66 pattern:
# metrics auto-register under a name and an evaluator computes a selected
# subset by name — here a decorator registry instead of a subclass scan)
# ---------------------------------------------------------------------------

METRICS: dict = {}


def register_metric(name: str):
    def deco(fn):
        METRICS[name] = fn
        return fn
    return deco


register_metric("em")(exact_match)
register_metric("f1")(answer_f1)
register_metric("retrieval_precision")(retrieval_precision)
register_metric("retrieval_utilization")(retrieval_utilization)
register_metric("retrieval_latency")(retrieval_latency)
register_metric("chunk_utilization")(chunk_utilization)
register_metric("reasoning_coherence")(reasoning_coherence)
register_metric("reasoning_depth")(reasoning_depth)
register_metric("iterative_improvement")(iterative_improvement)
register_metric("knowledge_graph_utilization")(knowledge_graph_utilization)

# per-sample argument extraction for the retrieval metrics (the reference
# reads these fields off RetrievalEvaluationData samples)
_RETRIEVAL_INPUTS = {
    "retrieval_precision": lambda s: (s.get("retrieved_entities"),
                                      s.get("referenced_entities")),
    "retrieval_utilization": lambda s: (s.get("retrieved_entities"),
                                        s.get("referenced_entities")),
    "retrieval_latency": lambda s: ([s.get("retrieval_time", 0.0)],),
    "chunk_utilization": lambda s: (s.get("system_answer"),
                                    s.get("chunk_texts")),
}


def evaluate_retrieval(samples, metrics=("retrieval_precision",
                                         "retrieval_utilization",
                                         "retrieval_latency",
                                         "chunk_utilization")) -> dict:
    """Retrieval-side composite evaluation: ``samples`` are dicts carrying
    retrieved_entities / referenced_entities / retrieval_time /
    system_answer / chunk_texts; returns per-metric mean + per-sample
    scores (the (overall, per-sample) shape of BaseMetric.calculate_metric)."""
    out = {}
    for name in metrics:
        fn = METRICS[name]
        extract = _RETRIEVAL_INPUTS[name]
        scores = [fn(*extract(s)) for s in samples]
        out[name] = {
            "mean": (sum(scores) / len(scores)) if scores else 0.0,
            "scores": scores,
        }
    return out


def evaluate_answers(system_answers, golden_answers,
                     metrics=("em", "f1")) -> dict:
    """Composite answer evaluation (composite_evaluator.py shape): per-metric
    mean over aligned (system, golden) pairs + per-sample scores."""
    if len(system_answers) != len(golden_answers):
        raise ValueError(
            f"answer lists must align: {len(system_answers)} system vs "
            f"{len(golden_answers)} golden (a silent zip would report "
            "complete-looking means over a truncated sample)")
    out = {}
    for name in metrics:
        fn = METRICS[name]
        scores = [fn(p, g) for p, g in zip(system_answers, golden_answers)]
        out[name] = {
            "mean": (sum(scores) / len(scores)) if scores else 0.0,
            "scores": scores,
        }
    return out
