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
# graph-side metrics (reference evaluator/metrics/graph_metrics.py — the
# DETERMINISTIC rule paths; Neo4j lookups become optional precomputed data
# arguments and the LLM-fallback branches are the registry's injectable
# seam, exactly as in the retrieval family above)
# ---------------------------------------------------------------------------

def eval_keywords(question: str) -> list:
    """Question-keyword extraction shared by every graph metric
    (graph_metrics.py:34-35, 1110-1114): word/CJK runs of length ≥2 over the
    normalized question, keeping 1 < len < 15."""
    import re

    kws = re.findall(r"\b[\w一-龥]{2,}\b", normalize_answer(question or ""))
    return [k for k in kws if 1 < len(k) < 15]


def _keyword_match_rate(keywords, text: str) -> float:
    if not keywords:
        return 0.0
    low = (text or "").lower()
    return sum(1 for k in keywords if k.lower() in low) / len(keywords)


def community_relevance(question: str, agent_type: str = "",
                        community_text: str = "",
                        chunks=None) -> float:
    """CommunityRelevanceMetric's rule path (graph_metrics.py:15-190).

    ``community_text`` is the joined summary/full_content of the communities
    the sample touched (the reference fetches it from Neo4j; callers here
    pass it from the communities table). naive agents score on community
    keyword match (0.3 + 0.4·rate) or chunk count (0.3 + 0.1·n/3 capped
    0.4); other agents get an agent-type base (graph 0.4 with rate×1.2,
    hybrid 0.35 with rate×1.1, else 0.3) + 0.5·rate capped at 1.0."""
    agent = (agent_type or "").lower()
    keywords = eval_keywords(question)
    if agent == "naive":
        if community_text and keywords:
            return 0.3 + 0.4 * _keyword_match_rate(keywords, community_text)
        n_chunks = len(chunks or [])
        return min(0.4, 0.3 + 0.1 * n_chunks / 3)
    if community_text and keywords:
        rate = _keyword_match_rate(keywords, community_text)
        if agent == "graph":
            base, rate = 0.4, rate * 1.2
        elif agent == "hybrid":
            base, rate = 0.35, rate * 1.1
        else:
            base = 0.3
        return min(1.0, base + 0.5 * rate)
    return {"graph": 0.4, "hybrid": 0.35}.get(agent, 0.3)


def processed_relationships(relationships) -> list:
    """The relationship normalizer (graph_metrics.py:444-487 minus the
    Neo4j id-resolution branch): tuples/lists of ≥3 become (src, rel, dst);
    dicts need source+target; bare string ids are dropped (the caller
    resolves them against its edges table if it wants them counted)."""
    out = []
    if not isinstance(relationships, list):
        return out
    for rel in relationships:
        if isinstance(rel, tuple) and len(rel) >= 3:
            out.append(rel[:3])
        elif isinstance(rel, list) and len(rel) >= 3:
            out.append(tuple(rel[:3]))
        elif isinstance(rel, dict) and rel.get("source") and rel.get("target"):
            out.append((rel["source"],
                        rel.get("relation", "") or rel.get("type", ""),
                        rel["target"]))
    return out


def subgraph_quality(entities, relationships, agent_type: str = "") -> float:
    """SubgraphQualityMetric's rule path (graph_metrics.py:255-377):
    no entities+rels → 0.3; entities only → 0.3 + min(0.2, 0.01·n);
    unresolvable rel ids → 0.3 + min(0.2, 0.02·n); else density·0.5 +
    connectivity·0.5 (density = edges / C(n,2); connectivity = fraction of
    entities appearing in a relation), ×1.05 for graph agents, floored at
    0.3."""
    entities = entities or []
    relationships = relationships or []
    if not entities and not relationships:
        return 0.3
    if entities and not relationships:
        return 0.3 + min(0.2, 0.01 * len(entities))
    rels = processed_relationships(relationships)
    if not rels:
        n = len(relationships) if isinstance(relationships, list) else 0
        return 0.3 + min(0.2, 0.02 * n)
    n_nodes = len(entities)
    max_edges = n_nodes * (n_nodes - 1) / 2 if n_nodes > 1 else 1
    density = len(rels) / max_edges if max_edges > 0 else 0.0
    in_rel = {str(r[0]) for r in rels} | {str(r[2]) for r in rels}
    connectivity = len(in_rel) / n_nodes if n_nodes else 0.0
    quality = 0.5 * density + 0.5 * connectivity
    if (agent_type or "").lower() == "graph":
        quality = min(1.0, quality * 1.05)
    return max(0.3, quality)


def graph_coverage(question: str, agent_type: str = "",
                   entities=None, relationships=None,
                   entity_info: dict | None = None,
                   rel_info: list | None = None,
                   chunk_texts=None) -> float:
    """GraphCoverageMetric's rule path (graph_metrics.py:644-1007).

    naive agents (chunk-based, :757-802): 0.3 base + 0.4·keyword-match over
    the chunk texts + min(0.2, 0.05·n_chunks); without texts the count-only
    branch min(0.3, 0.1·n). Graph/hybrid (:803-1007): 0.3 + 0.7·(0.3·
    structure + 0.4·relevance + 0.3·connectedness) where structure =
    min(0.6, 0.05·(entities+rel_ids)) + 0.2·described-entity ratio +
    0.2·described-rel ratio; relevance = keyword match over the joined
    entity/relation text ×1.2 (0.5 when no keywords); connectedness = 0.4 +
    0.6·(referenced entities appearing in relations), 0.4 under 2 entities.

    ``entity_info`` maps entity id → description and ``rel_info`` is a list
    of {source, relation, target, description} dicts — the data the
    reference pulls from Neo4j, supplied here from the built tables."""
    keywords = eval_keywords(question)
    agent = (agent_type or "").lower()
    entities = entities or []
    if agent == "naive":
        chunks = entities  # the reference stores chunk ids in this field
        texts = [t for t in (chunk_texts or []) if t]
        if chunks and texts and keywords:
            rate = _keyword_match_rate(keywords, " ".join(texts))
            return 0.3 + 0.4 * rate + min(0.2, 0.05 * len(chunks))
        return 0.3 + min(0.3, 0.1 * len(chunks))
    rel_ids = [r for r in (relationships or []) if isinstance(r, str)]
    entity_info = entity_info or {}
    rel_info = rel_info or []
    structure = min(0.6, 0.05 * len(entities) + 0.05 * len(rel_ids))
    if entity_info:
        described = sum(1 for d in entity_info.values() if str(d or "").strip())
        structure += 0.2 * described / len(entity_info)
    if rel_info:
        described = sum(1 for r in rel_info
                        if str(r.get("description", "") or "").strip())
        structure += 0.2 * described / len(rel_info)
    if keywords:
        entity_text = " ".join(f"{k} {v}" for k, v in entity_info.items())
        rel_text = " ".join(
            f"{r.get('source', '')} {r.get('relation', '')} "
            f"{r.get('target', '')} {r.get('description', '')}"
            for r in rel_info)
        relevance = min(1.0, 1.2 * _keyword_match_rate(
            keywords, entity_text + " " + rel_text))
    else:
        relevance = 0.5
    if not entities or len(entities) < 2:
        connectedness = 0.4
    else:
        in_rel = set()
        for r in rel_info:
            if r.get("source"):
                in_rel.add(str(r["source"]))
            if r.get("target"):
                in_rel.add(str(r["target"]))
        eset = {str(e) for e in entities}
        ratio = len(in_rel & eset) / len(eset) if eset else 0.0
        connectedness = min(1.0, 0.4 + 0.6 * ratio)
    return min(1.0, 0.3 + 0.7 * (0.3 * structure + 0.4 * relevance
                                 + 0.3 * connectedness))


def entity_coverage(question: str, agent_type: str = "",
                    entities=None, entity_texts=None) -> float:
    """EntityCoverageMetric's rule path (graph_metrics.py:1018-1270 minus
    the Neo4j neighbor-description half-credit loop): keyword match over the
    joined entity texts (ids + descriptions when provided, raw ids
    otherwise) scored 0.4 + 0.6·rate·min(1, n/5); graph/hybrid agents with
    ids but no keywords get 0.4 + min(0.3, 0.05·n); base 0.4."""
    keywords = eval_keywords(question)
    entity_ids = entities or []
    texts = [str(t) for t in (entity_texts or [])] or \
        [str(e) for e in entity_ids]
    if keywords and texts and entity_ids:
        rate = _keyword_match_rate(keywords, " ".join(texts))
        factor = min(1.0, len(texts) / 5)
        return min(1.0, 0.4 + 0.6 * rate * factor)
    if (agent_type or "").lower() in ("graph", "hybrid") and entity_ids:
        return 0.4 + min(0.3, 0.05 * len(entity_ids))
    return 0.4


def relationship_utilization(entities=None, relationships=None,
                             rel_info: list | None = None) -> float:
    """RelationshipUtilizationMetric's rule path (graph_metrics.py:
    1304-1698): nothing referenced → 0.3; rel ids without resolvable info →
    min(0.4, 0.3 + 0.02·n); else 0.3 + 0.7·(0.3·quantity + 0.4·quality +
    0.3·relevance) where quantity = min(1, 0.1·n_rels); quality mixes
    description ratio, type diversity (/5) and src/dst validity (0.4/0.3/
    0.3, or 0.3/0.3/0.2/0.2 with weights normalized /10); relevance =
    min(1, 1.2·overlap of relation endpoints with referenced entities)."""
    entities = entities or []
    relationships = relationships or []
    rel_info = rel_info if rel_info is not None else []
    if not relationships and not entities:
        return 0.3
    if not rel_info and relationships:
        return min(0.4, 0.3 + 0.02 * len(relationships))
    if not rel_info:
        return 0.3
    quantity = min(1.0, 0.1 * len(rel_info))
    described = sum(
        1 for r in rel_info
        if str(r.get("description", "") or "").strip()
        or str(r.get("relation", "") or "").strip()) / len(rel_info)
    types = {r["relation"] for r in rel_info
             if str(r.get("relation", "") or "").strip()}
    diversity = min(1.0, len(types) / 5)
    valid = sum(1 for r in rel_info
                if r.get("source") and r.get("source") != "unknown"
                and r.get("target") and r.get("target") != "unknown") \
        / len(rel_info)
    weights = [float(r["weight"]) for r in rel_info
               if isinstance(r.get("weight"), (int, float))]
    if weights:
        wscore = min(1.0, (sum(weights) / len(weights)) / 10.0)
        quality = (0.3 * described + 0.3 * diversity + 0.2 * valid
                   + 0.2 * wscore)
    else:
        quality = 0.4 * described + 0.3 * diversity + 0.3 * valid
    if entities:
        in_rel = set()
        for r in rel_info:
            if r.get("source") and r["source"] != "unknown":
                in_rel.add(str(r["source"]))
            if r.get("target") and r["target"] != "unknown":
                in_rel.add(str(r["target"]))
        eset = {str(e) for e in entities}
        relevance = min(1.0, 1.2 * (len(in_rel & eset) / len(eset))) \
            if eset else 0.0
    else:
        relevance = 0.0
    return min(1.0, 0.3 + 0.7 * (0.3 * quantity + 0.4 * quality
                                 + 0.3 * relevance))


# ---------------------------------------------------------------------------
# LLM-judge metrics (reference evaluator/metrics/llm_metrics.py — pure
# LLM-scored; the client is injectable like the extractor/summarizer seams,
# and every reference error branch falls back to the 0.5 default)
# ---------------------------------------------------------------------------

def _llm_scalar_score(llm, prompt: str, default: float = 0.5) -> float:
    """Invoke → first number → clamp to [0, 1]; any failure → ``default``
    (llm_metrics.py:72-96 contract, shared by the three scalar judges)."""
    import re

    if llm is None:
        return default
    try:
        resp = llm.invoke(prompt)
        text = resp.content if hasattr(resp, "content") else str(resp)
        m = re.search(r"(\d+(\.\d+)?)", text)
        return max(0.0, min(1.0, float(m.group(1)))) if m else default
    except Exception:  # noqa: BLE001 — the reference catches everything
        return default


def answer_key_facts(answer: str) -> list:
    """FactualConsistency's key-information extraction
    (llm_metrics.py:163-175): non-heading lines, '- *' stripped, length
    > 10, first 10 kept."""
    facts = []
    for line in (answer or "").split("\n"):
        if line.strip() and not line.startswith("#"):
            stripped = line.strip("- *")
            if len(stripped) > 10:
                facts.append(stripped)
    return facts[:10]


def response_coherence(question: str, answer: str, llm=None) -> float:
    """ResponseCoherence (llm_metrics.py:7-110): LLM judges structure and
    logical flow of the answer; 0.5 without a client."""
    prompt = (f"评估以下回答的连贯性和结构，给出0到1的分数。\n"
              f"问题: {question}\n回答: {answer}\n"
              "只返回一个0到1之间的数字表示分数，不要有任何其他文字。")
    return _llm_scalar_score(llm, prompt)


def factual_consistency(question: str, answer: str, llm=None) -> float:
    """FactualConsistency (llm_metrics.py:113-231): key facts extracted
    deterministically, then LLM judges internal consistency; 0.5 without a
    client."""
    facts = "\n".join(f"- {f}" for f in answer_key_facts(answer))
    prompt = (f"评估以下回答对问题的事实一致性，给出0到1的分数。\n"
              f"问题: {question}\n回答的关键信息点:\n{facts}\n"
              f"完整回答:\n{answer}\n"
              "只返回一个0到1之间的数字表示分数，不要有任何其他文字。")
    return _llm_scalar_score(llm, prompt)


def answer_comprehensiveness(question: str, answer: str, llm=None) -> float:
    """ComprehensiveAnswerMetric (llm_metrics.py:233-327): LLM judges how
    completely the answer addresses the question; 0.5 without a client."""
    prompt = (f"评估以下回答解决问题的全面性，给出0到1的分数。\n"
              f"问题: {question}\n回答: {answer}\n"
              "只返回一个0到1之间的数字表示分数，不要有任何其他文字。")
    return _llm_scalar_score(llm, prompt)


_LLM_EVAL_ASPECTS = {"comprehensiveness": 0.3, "relativeness": 0.25,
                     "empowerment": 0.25, "directness": 0.2}


def clean_answer_references(answer: str) -> str:
    """LLMGraphRagEvaluator._clean_references (llm_metrics.py:471-484):
    strips the trailing 引用数据 section before judging."""
    import re

    cleaned = re.sub(r"#{1,4}\s*引用数据[\s\S]*?(\{[\s\S]*?\})\s*$", "",
                     answer or "")
    return cleaned.rstrip()


def llm_evaluation(question: str, answer: str, llm=None) -> dict:
    """LLMGraphRagEvaluator (llm_metrics.py:329-565): one JSON-returning
    judge call scored on 4 weighted aspects (comprehensiveness 0.3,
    relativeness 0.25, empowerment 0.25, directness 0.2) + the weighted
    total. Unparseable/missing aspects default to 0.5; no client → all
    0.5 with total 0.5 (the reference's no-LLM path returns zeros, but its
    per-sample error path is 0.5 — we follow the per-sample contract so a
    missing client is indistinguishable from a failed call)."""
    import json as _json
    import re

    scores = {a: 0.5 for a in _LLM_EVAL_ASPECTS}
    if llm is not None:
        cleaned = clean_answer_references(answer)
        prompt = (f"请评估以下回答相对于问题的质量。\n问题: {question}\n"
                  f"回答: {cleaned}\n请以JSON格式返回评分结果："
                  '{"comprehensiveness": 0.X, "relativeness": 0.X, '
                  '"empowerment": 0.X, "directness": 0.X, '
                  '"reasoning": "简短解释评分理由"}')
        try:
            resp = llm.invoke(prompt)
            text = resp.content if hasattr(resp, "content") else str(resp)
            m = re.search(r"(\{[\s\S]*\})", text)
            if m:
                data = _json.loads(m.group(1))
                for a in _LLM_EVAL_ASPECTS:
                    if isinstance(data.get(a), (int, float)):
                        scores[a] = max(0.0, min(1.0, float(data[a])))
        except Exception:  # noqa: BLE001 — reference defaults on any error
            pass
    out = {f"llm_{a}": s for a, s in scores.items()}
    out["llm_total"] = sum(w * scores[a]
                           for a, w in _LLM_EVAL_ASPECTS.items())
    return out


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
register_metric("community_relevance")(community_relevance)
register_metric("subgraph_quality")(subgraph_quality)
register_metric("graph_coverage")(graph_coverage)
register_metric("entity_coverage")(entity_coverage)
register_metric("relationship_utilization")(relationship_utilization)
register_metric("response_coherence")(response_coherence)
register_metric("factual_consistency")(factual_consistency)
register_metric("answer_comprehensiveness")(answer_comprehensiveness)
register_metric("llm_evaluation")(llm_evaluation)

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


# per-sample argument extraction for the graph metrics (the reference reads
# these fields off GraphEvaluationData samples; neo4j-fetched data arrives
# precomputed under community_text / entity_info / rel_info / chunk_texts)
_GRAPH_INPUTS = {
    "community_relevance": lambda s: (
        s.get("question"), s.get("agent_type", ""),
        s.get("community_text", ""), s.get("referenced_entities")),
    "subgraph_quality": lambda s: (
        s.get("referenced_entities"), s.get("referenced_relationships"),
        s.get("agent_type", "")),
    "graph_coverage": lambda s: (
        s.get("question"), s.get("agent_type", ""),
        s.get("referenced_entities"), s.get("referenced_relationships"),
        s.get("entity_info"), s.get("rel_info"), s.get("chunk_texts")),
    "entity_coverage": lambda s: (
        s.get("question"), s.get("agent_type", ""),
        s.get("referenced_entities"), s.get("entity_texts")),
    "relationship_utilization": lambda s: (
        s.get("referenced_entities"), s.get("referenced_relationships"),
        s.get("rel_info")),
}


def evaluate_graph_samples(samples,
                           metrics=tuple(_GRAPH_INPUTS)) -> dict:
    """Graph-side composite evaluation (the reference's graph metric family
    over GraphEvaluationData): same (mean, per-sample scores) shape as
    :func:`evaluate_retrieval`."""
    out = {}
    for name in metrics:
        fn = METRICS[name]
        extract = _GRAPH_INPUTS[name]
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
