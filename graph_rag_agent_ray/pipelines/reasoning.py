"""Deep-research reasoning auxiliaries: the evidence-chain ledger, the
query-local KG builder, and the answer validator.

Reference parity (semantic contracts, re-implemented deterministic):

- :class:`EvidenceChainTracker` ⇔ ``search/tool/reasoning/evidence.py``
  (710 LoC): a ledger of reasoning steps and the evidence each consumed,
  with confidence scores, a key-phrase citation index, numerical
  contradiction detection, and citation-annotated answers. Divergences:
  ids derive from content + a monotonic ordinal (the reference salts with
  ``time.time()``, which breaks replay), and the LLM fallbacks (semantic
  contradiction check, evidence.py:358-409) are an injectable-client seam
  instead of a hard model dependency.
- :class:`QueryKGBuilder` ⇔ ``search/tool/reasoning/kg_builder.py``
  (DynamicKnowledgeGraphBuilder): a per-question subgraph assembled by
  frontier expansion. The reference walks Neo4j with a per-level
  ``LIMIT 100`` Cypher; here each hop is ONE broadcast ``pc.is_in``
  filter over the distributed canonical edges Dataset (frontier ids via
  ``ray.put``; only the ≤100-row hop result reaches the driver), so the
  subgraph stays bounded while the edge table scales.
- :class:`AnswerValidator` / :func:`complexity_estimate` ⇔
  ``search/tool/reasoning/validator.py``: rule checks (length, error
  patterns, keyword relevance) and the length/question-mark/indicator
  complexity heuristic.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List

import numpy as np
import pandas as pd

import ray

_NUMBER_PAT = re.compile(r"(\d+(?:[.,]\d+)?(?:\s*%|\s*元|\s*美元|\s*人民币)?)")


class EvidenceChainTracker:
    """Ledger of (reasoning step → evidence items) for a research loop.

    All ids are deterministic functions of the recorded content plus a
    per-tracker ordinal, so a replayed run produces an identical ledger
    (the property the scripted-client tests pin)."""

    def __init__(self, client=None):
        self.client = client  # optional chat client for semantic checks
        self.reasoning_steps: List[dict] = []
        self.evidence_items: Dict[str, dict] = {}
        self.query_contexts: Dict[str, dict] = {}
        self.step_counter = 0
        self.confidence_scores: Dict[str, float] = {}
        self.contradictions: Dict[str, dict] = {}
        self.citation_index: Dict[str, List[str]] = {}
        self._ordinal = 0  # replaces the reference's time.time() stamps

    def _tick(self) -> int:
        self._ordinal += 1
        return self._ordinal

    # -- recording ---------------------------------------------------------

    def start_new_query(self, query: str, keywords: Dict[str, List[str]]) -> str:
        query_id = hashlib.sha1(
            f"{query}|{len(self.query_contexts)}".encode()).hexdigest()[:10]
        self.query_contexts[query_id] = {
            "query": query, "keywords": keywords,
            "start_ordinal": self._tick(), "step_ids": [],
        }
        return query_id

    def add_reasoning_step(self, query_id: str, search_query: str,
                           reasoning: str) -> str:
        step_id = f"step_{self.step_counter}"
        self.step_counter += 1
        step = {
            "step_id": step_id, "query_id": query_id,
            "search_query": search_query, "reasoning": reasoning,
            "evidence_ids": [], "ordinal": self._tick(),
        }
        self.reasoning_steps.append(step)
        if query_id in self.query_contexts:
            self.query_contexts[query_id]["step_ids"].append(step_id)
        return step_id

    def add_evidence(self, step_id: str, source_id: str, content: str,
                     source_type: str) -> str:
        # same id recipe as the reference (md5 of source + content head)
        evidence_id = hashlib.md5(
            f"{source_id}:{content[:50]}".encode()).hexdigest()[:10]
        self.evidence_items[evidence_id] = {
            "evidence_id": evidence_id, "source_id": source_id,
            "content": content, "source_type": source_type,
            "ordinal": self._tick(),
        }
        for step in self.reasoning_steps:
            if step["step_id"] == step_id:
                if evidence_id not in step["evidence_ids"]:
                    step["evidence_ids"].append(evidence_id)
                break
        return evidence_id

    def add_evidence_with_confidence(self, step_id: str, source_id: str,
                                     content: str, source_type: str,
                                     confidence: float = 0.5,
                                     metadata: dict | None = None) -> str:
        evidence_id = self.add_evidence(step_id, source_id, content, source_type)
        self.confidence_scores[evidence_id] = confidence
        if metadata and evidence_id in self.evidence_items:
            self.evidence_items[evidence_id]["metadata"] = metadata
        self._update_citation_index(evidence_id, content)
        return evidence_id

    # -- citation index ------------------------------------------------------

    def _update_citation_index(self, evidence_id: str, content: str) -> None:
        for phrase in self._extract_key_phrases(content):
            bucket = self.citation_index.setdefault(phrase, [])
            if evidence_id not in bucket:
                bucket.append(evidence_id)

    @staticmethod
    def _extract_key_phrases(content: str) -> List[str]:
        """Numbers, capitalized noun runs, and CJK 4-grams (evidence.py:
        186-226's heuristic), deduplicated deterministically."""
        phrases: List[str] = []
        for sentence in re.split(r"[.!?。！？]", content or ""):
            phrases.extend(_NUMBER_PAT.findall(sentence))
            phrases.extend(
                re.findall(r"[A-Z][a-z]+\s+(?:[a-z]+\s+){0,2}[a-z]+", sentence))
            cjk = re.findall(r"[一-龥]{2,}", sentence)
            for run in cjk:
                for i in range(max(1, len(run) - 3)):
                    phrases.append(run[i:i + 4])
        return sorted(set(p.strip() for p in phrases if len(p.strip()) > 1))

    # -- contradiction detection ---------------------------------------------

    @staticmethod
    def _extract_numbers_with_context(text: str) -> List[dict]:
        results = []
        for m in _NUMBER_PAT.finditer(text or ""):
            clean = re.sub(r"[^\d.,]", "", m.group(1)).replace(",", ".")
            try:
                value = float(clean)
            except ValueError:
                continue
            start = max(0, m.start() - 20)
            end = min(len(text), m.end() + 20)
            results.append({"value": value, "original": m.group(1),
                            "context": text[start:end]})
        return results

    @staticmethod
    def _context_similarity(c1: str, c2: str) -> float:
        w1 = set(re.sub(_NUMBER_PAT, " ", c1).lower().split())
        w2 = set(re.sub(_NUMBER_PAT, " ", c2).lower().split())
        if not w1 or not w2:
            return 0.0
        return len(w1 & w2) / len(w1 | w2)

    def detect_contradictions(self, evidence_ids: List[str]) -> List[dict]:
        """Numerical-conflict rule (evidence.py:231-289): two evidence items
        whose number contexts overlap (Jaccard > 0.7) but whose values
        differ by > 0.1% contradict. The reference's LLM semantic pass runs
        only when a client was injected."""
        if len(evidence_ids) < 2:
            return []
        found: List[dict] = []
        evidences = [self.evidence_items[eid] for eid in evidence_ids
                     if eid in self.evidence_items]
        ids = [e["evidence_id"] for e in evidences]
        for i in range(len(evidences)):
            nums1 = self._extract_numbers_with_context(evidences[i]["content"])
            for j in range(i + 1, len(evidences)):
                nums2 = self._extract_numbers_with_context(
                    evidences[j]["content"])
                for n1 in nums1:
                    for n2 in nums2:
                        if self._context_similarity(
                                n1["context"], n2["context"]) <= 0.7:
                            continue
                        if abs(n1["value"] - n2["value"]) > 0.001 * max(
                                n1["value"], n2["value"]):
                            found.append({
                                "type": "numerical",
                                "evidence1": ids[i], "evidence2": ids[j],
                                "context": n1["context"],
                                "value1": n1["value"], "value2": n2["value"],
                            })
        if self.client is not None:
            from ..stages.llm import call_with_retry
            for i in range(len(evidences)):
                for j in range(i + 1, len(evidences)):
                    if any(c["evidence1"] == ids[i] and c["evidence2"] == ids[j]
                           for c in found):
                        continue
                    reply = call_with_retry(self.client, [{
                        "role": "user", "content":
                            "分析以下两段内容，判断它们之间是否存在矛盾："
                            f"\n内容1:\n{evidences[i]['content']}\n"
                            f"内容2:\n{evidences[j]['content']}\n"
                            "如果不存在矛盾，请回答\"没有矛盾\"。"}], retries=1)
                    if reply and "没有矛盾" not in reply:
                        found.append({
                            "type": "semantic",
                            "evidence1": ids[i], "evidence2": ids[j],
                            "analysis": reply[:300],
                        })
        for c in found:
            self.contradictions[f"contradiction_{len(self.contradictions)}"] = c
        return found

    # -- citations -----------------------------------------------------------

    @staticmethod
    def _extract_key_statements(text: str) -> List[str]:
        parts = re.split(r"([.!?。！？]\s*)", text or "")
        merged = [parts[i] + (parts[i + 1] if i + 1 < len(parts) else "")
                  for i in range(0, len(parts), 2)]
        return [s.strip() for s in merged if len(s.strip()) > 10]

    def _find_matching_evidence(self, statement: str) -> dict | None:
        candidates: List[str] = []
        for phrase in self._extract_key_phrases(statement):
            candidates.extend(self.citation_index.get(phrase, []))
        if not candidates:
            return None
        scores = {}
        for eid in set(candidates):
            if eid in self.evidence_items:
                scores[eid] = (candidates.count(eid)
                               * self.confidence_scores.get(eid, 0.5))
        if not scores:
            return None
        best = max(sorted(scores), key=scores.get)  # sorted → ties stable
        return self.evidence_items[best]

    def generate_citations(self, answer: str) -> dict:
        """[n]-annotated answer + citation list (evidence.py:409-150)."""
        citations = []
        for statement in self._extract_key_statements(answer):
            ev = self._find_matching_evidence(statement)
            if ev:
                citations.append({
                    "statement": statement,
                    "evidence_id": ev["evidence_id"],
                    "source_id": ev["source_id"],
                    "confidence": self.confidence_scores.get(
                        ev["evidence_id"], 0.5),
                })
        cited = answer
        for i, c in enumerate(sorted(citations,
                                     key=lambda x: len(x["statement"]),
                                     reverse=True)):
            mark = f"[{citations.index(c) + 1}]"
            if c["statement"] in cited:
                cited = cited.replace(c["statement"],
                                      f"{c['statement']}{mark}", 1)
        if citations:
            cited += "\n\n#### 引用\n" + "".join(
                f"[{i + 1}] {c['source_id']}\n"
                for i, c in enumerate(citations))
        return {"cited_answer": cited, "citations": citations}

    # -- readouts ------------------------------------------------------------

    def get_reasoning_chain(self, query_id: str) -> dict:
        if query_id not in self.query_contexts:
            return {}
        ctx = self.query_contexts[query_id]
        by_id = {s["step_id"]: s for s in self.reasoning_steps}
        steps = []
        for step_id in ctx["step_ids"]:
            step = dict(by_id[step_id])
            step["evidence"] = [
                {**self.evidence_items[eid],
                 "confidence": self.confidence_scores.get(eid, 0.5)}
                for eid in step["evidence_ids"] if eid in self.evidence_items]
            steps.append(step)
        steps.sort(key=lambda s: s["ordinal"])
        used = {e for s in steps for e in s["evidence_ids"]}
        return {
            "query": ctx["query"], "keywords": ctx["keywords"],
            "steps": steps,
            "contradiction_count": sum(
                1 for c in self.contradictions.values()
                if c.get("evidence1") in used or c.get("evidence2") in used),
        }

    def get_step_evidence(self, step_id: str) -> List[dict]:
        for step in self.reasoning_steps:
            if step["step_id"] == step_id:
                return [self.evidence_items[eid]
                        for eid in step["evidence_ids"]
                        if eid in self.evidence_items]
        return []

    def summarize_reasoning(self, query_id: str) -> dict:
        chain = self.get_reasoning_chain(query_id)
        if not chain:
            return {"summary": "没有找到相关推理链"}
        steps = chain.get("steps", [])
        key_steps = sorted(steps, key=lambda s: len(s.get("evidence", [])),
                           reverse=True)[:3]
        return {
            "query": chain["query"],
            "steps_count": len(steps),
            "evidence_count": sum(len(s.get("evidence", [])) for s in steps),
            "contradiction_count": chain["contradiction_count"],
            "key_steps": [{"step_id": s["step_id"],
                           "search_query": s["search_query"],
                           "evidence_count": len(s.get("evidence", []))}
                          for s in key_steps],
        }

    def get_evidence_source_stats(self, query_id: str) -> dict:
        chain = self.get_reasoning_chain(query_id)
        if not chain:
            return {"sources": {}}
        sources: Dict[str, int] = {}
        for step in chain.get("steps", []):
            for ev in step.get("evidence", []):
                st = ev.get("source_type", "unknown")
                sources[st] = sources.get(st, 0) + 1
        return {"sources": sources,
                "total": int(sum(sources.values()))}


class QueryKGBuilder:
    """Per-question subgraph over the canonical edges Dataset.

    ``build_query_graph`` seeds from the given entities and expands
    ``depth`` hops; each hop is one broadcast ``pc.is_in`` filter over the
    DISTRIBUTED edge table (kg_builder.py:75-146's Cypher loop, Ray-shaped)
    with the reference's per-level 100-edge cap applied deterministically
    (sort by (src, pred, dst) before the cut)."""

    PER_LEVEL_LIMIT = 100

    def __init__(self, edges: "ray.data.Dataset"):
        self._edges = edges
        self.nodes: Dict[str, dict] = {}
        self.edges: List[dict] = []
        self.seed_entities: set = set()
        self.meta: dict = {}

    def build_query_graph(self, query: str, entities: List[str],
                          depth: int = 2) -> "QueryKGBuilder":
        self.nodes, self.edges = {}, []
        self.seed_entities = set(entities or [])
        if not entities:
            self.meta = {"query": query, "entity_count": 0,
                         "relation_count": 0}
            return self
        for e in sorted(self.seed_entities):
            self.nodes[e] = {"type": "seed_entity",
                             "properties": {"source": "query"}}
        frontier = sorted(self.seed_entities)
        seen_edges: set = set()
        for _level in range(depth):
            if not frontier:
                break
            import pyarrow as pa
            import pyarrow.compute as pc
            fref = ray.put(pa.array(frontier, pa.string()))

            def outgoing(batch: "pa.Table") -> "pa.Table":
                fr = ray.get(fref)
                return batch.filter(pc.is_in(batch.column("src"),
                                             value_set=fr))

            hop = (self._edges.select_columns(["src", "pred", "dst"])
                   .map_batches(outgoing, batch_format="pyarrow")
                   .to_pandas())
            if hop.empty:
                break
            hop = (hop.drop_duplicates()
                   .sort_values(["src", "pred", "dst"])
                   .head(self.PER_LEVEL_LIMIT))
            new_entities = []
            for src, pred, dst in hop.itertuples(index=False):
                if dst not in self.nodes:
                    self.nodes[dst] = {"type": "entity", "properties": {}}
                    new_entities.append(dst)
                key = (src, pred, dst)
                if key not in seen_edges:
                    seen_edges.add(key)
                    self.edges.append({"src": src, "pred": pred, "dst": dst})
            frontier = sorted(new_entities)
        self.meta = {"query": query,
                     "entity_count": len(self.nodes),
                     "relation_count": len(self.edges)}
        return self

    def get_central_entities(self, limit: int = 5) -> List[dict]:
        """Top entities by PageRank over the local subgraph
        (kg_builder.py:279-318's nx.pagerank, as a numpy power iteration;
        degree fallback when the graph has no edges)."""
        if not self.nodes:
            return []
        ids = sorted(self.nodes)
        idx = {e: i for i, e in enumerate(ids)}
        n = len(ids)
        if self.edges:
            out_deg = np.zeros(n)
            for e in self.edges:
                out_deg[idx[e["src"]]] += 1
            rank = np.full(n, 1.0 / n)
            for _ in range(20):
                nxt = np.full(n, (1 - 0.85) / n)
                # dangling mass spreads uniformly (nx.pagerank semantics)
                dangling = rank[out_deg == 0].sum()
                nxt += 0.85 * dangling / n
                for e in self.edges:
                    s, d = idx[e["src"]], idx[e["dst"]]
                    nxt[d] += 0.85 * rank[s] / out_deg[s]
                rank = nxt
            scores = {e: float(rank[idx[e]]) for e in ids}
            key = "centrality"
        else:
            scores = {e: 0.0 for e in ids}
            key = "degree"
        top = sorted(ids, key=lambda e: (-scores[e], e))[:limit]
        return [{"id": e, key: scores[e],
                 "type": self.nodes[e]["type"],
                 "properties": self.nodes[e].get("properties", {})}
                for e in top]


class CommunityAwareSearchEnhancer:
    """Community-aware search enhancement over the built tables — reference
    ``search/tool/reasoning/community_enhance.py`` (CommunityAwareSearch-
    Enhancer) with its deterministic scoring intact and the LLM strategy
    step behind the injectable-client seam:

    - :meth:`find_relevant_communities`: top-20 communities by rank
      (distributed per-batch partial top-k, 20-row driver collect), scored
      0.6·cosine(query, summary) + 0.3·min(kw_score, 5)/5 +
      0.1·min(rank/10, 1); kw_score = 2.0 per high-level + 0.5 per
      low-level keyword substring (community_enhance.py:96-143).
    - :meth:`extract_community_knowledge`: core entities = community
      members ordered by mention count (≤50); relationships = edges with
      BOTH endpoints in that set, ordered by path_importance =
      mentions(src)+mentions(dst) (≤100) — one broadcast edge filter
      (:158-235).
    - :meth:`generate_search_strategy`: <3 entities → basic; with a client,
      the reference's parsing ladder (quoted queries → sentence fallback,
      key-value entity lines, tokenizer keywords); client errors →
      fallback strategy (:254-332)."""

    def __init__(self, tables: Dict[str, "ray.data.Dataset"],
                 cfg=None, client=None):
        from ..config import KGConfig
        self.tables = tables
        self.cfg = cfg or KGConfig()
        self.client = client
        self.cache: Dict[str, dict] = {}

    def enhance_search(self, query: str,
                       keywords: Dict[str, List[str]]) -> dict:
        cache_key = f"comm_search:{query}"
        if cache_key in self.cache:
            return self.cache[cache_key]
        communities = self.find_relevant_communities(query, keywords)
        if communities:
            knowledge = self.extract_community_knowledge(communities)
        else:
            knowledge = {"entities": [], "relationships": [], "summaries": []}
        ctx = {
            "community_info": knowledge,
            "search_strategy": self.generate_search_strategy(query, knowledge),
        }
        self.cache[cache_key] = ctx
        return ctx

    def find_relevant_communities(self, query: str,
                                  keywords: Dict[str, List[str]],
                                  top_k: int = 3) -> List[dict]:
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..functions.embed import embed_texts
        from ..functions.text import normalize_surface

        def part(batch: "pa.Table") -> "pa.Table":
            t = batch.select(["community_id", "summary", "rank", "members"])
            mask = pc.and_(pc.is_valid(t.column("summary")),
                           pc.not_equal(t.column("summary"), ""))
            t = t.filter(mask)
            order = pc.sort_indices(t, sort_keys=[("rank", "descending")])
            return t.take(order[:20])

        cand = (self.tables["communities"]
                .map_batches(part, batch_format="pyarrow")
                .to_pandas())
        if cand.empty:
            return []
        cand = cand.sort_values(["rank", "community_id"],
                                ascending=[False, True]).head(20)
        qv = embed_texts([normalize_surface(query)],
                         dim=self.cfg.embed_dim)[0].astype(np.float64)
        svs = embed_texts([normalize_surface(s) for s in cand["summary"]],
                          dim=self.cfg.embed_dim).astype(np.float64)
        sims = svs @ qv  # both sides unit-norm
        high = [str(k).lower() for k in keywords.get("high_level", [])]
        low = [str(k).lower() for k in keywords.get("low_level", [])]
        scored = []
        for (cid, summary, rank, members), sim in zip(
                cand[["community_id", "summary", "rank", "members"]]
                .itertuples(index=False), sims):
            text = summary.lower()
            kw_score = (sum(2.0 for k in high if k in text)
                        + sum(0.5 for k in low if k in text))
            importance = min(float(rank or 1) / 10.0, 1.0)
            final = (float(sim) * 0.6 + (min(kw_score, 5) / 5.0) * 0.3
                     + importance * 0.1)
            scored.append({"community_id": cid, "score": final,
                           "summary": summary, "members": list(members)})
        return sorted(scored, key=lambda x: (-x["score"],
                                             x["community_id"]))[:top_k]

    def extract_community_knowledge(self, communities: List[dict]) -> dict:
        import pyarrow as pa
        import pyarrow.compute as pc

        if not communities:
            return {"entities": [], "relationships": [], "summaries": []}
        member_ids = sorted({m for c in communities for m in c["members"]})
        by_comm = {m: c["community_id"]
                   for c in reversed(communities) for m in c["members"]}
        mref = ray.put(pa.array(member_ids, pa.string()))

        def keep_members(batch: "pa.Table") -> "pa.Table":
            keep = ray.get(mref)
            return batch.filter(pc.is_in(batch.column("entity_id"),
                                         value_set=keep))

        ents = (self.tables["entities"]
                .select_columns(["entity_id", "description", "n_mentions"])
                .map_batches(keep_members, batch_format="pyarrow")
                .to_pandas())
        ents = ents.sort_values(["n_mentions", "entity_id"],
                                ascending=[False, True]).head(50)
        mentions = dict(zip(ents["entity_id"], ents["n_mentions"]))
        entity_rows = [
            {"entity_id": e, "description": d, "community_id": by_comm.get(e),
             "mention_count": int(n)}
            for e, d, n in zip(ents["entity_id"], ents["description"],
                               ents["n_mentions"])]
        eref = ray.put(pa.array(sorted(mentions), pa.string()))

        def both_ends(batch: "pa.Table") -> "pa.Table":
            keep = ray.get(eref)
            mask = pc.and_(pc.is_in(batch.column("src"), value_set=keep),
                           pc.is_in(batch.column("dst"), value_set=keep))
            return batch.filter(mask)

        rels = (self.tables["edges"]
                .select_columns(["src", "pred", "dst", "weight"])
                .map_batches(both_ends, batch_format="pyarrow")
                .to_pandas())
        if len(rels):
            rels["path_importance"] = (rels["src"].map(mentions).fillna(0)
                                       + rels["dst"].map(mentions).fillna(0)
                                       ).astype(int)
            rels = rels.sort_values(
                ["path_importance", "src", "dst"],
                ascending=[False, True, True]).head(100)
            rel_rows = rels.rename(columns={
                "pred": "relation_type"}).to_dict("records")
        else:
            rel_rows = []
        return {"entities": entity_rows, "relationships": rel_rows,
                "summaries": [c["summary"] for c in communities]}

    def generate_search_strategy(self, query: str,
                                 community_knowledge: dict) -> dict:
        entities = community_knowledge.get("entities", [])
        if len(entities) < 3:
            return {"strategy_type": "basic", "follow_up_queries": [],
                    "focus_entities": []}
        if self.client is None:
            # no model: deterministic fallback strategy over the core set
            return {"strategy_type": "fallback", "follow_up_queries": [],
                    "focus_entities": [e["entity_id"] for e in entities[:5]]}
        from ..functions.text import tokenize
        from ..stages.llm import call_with_retry
        content = call_with_retry(self.client, [{
            "role": "user", "content":
                "基于用户查询和社区知识，生成一个最多3个后续搜索查询的列表。\n"
                f"用户查询: {query}\n社区中的关键实体:\n"
                + ", ".join(e["entity_id"] for e in entities[:10])
                + "\n返回JSON格式的后续查询和关注实体。"}], retries=1)
        if not content:
            return {"strategy_type": "fallback", "follow_up_queries": [],
                    "focus_entities": [e["entity_id"] for e in entities[:5]]}
        keywords = [t for t in tokenize(content) if len(t) > 1][:10]
        queries = re.findall(r'"([^"]+)"', content)
        if not queries:
            sentences = re.findall(
                r"[？?!！。；;][^？?!！。；;]{5,50}[？?!！。；;]", content)
            queries = [s.strip() for s in sentences if len(s.strip()) > 10][:3]
        focus = []
        for line in content.split("\n"):
            if ":" in line or "：" in line:
                parts = re.split(r"[：:]", line, 1)
                if len(parts) == 2 and parts[1].strip():
                    focus.append(parts[1].strip())
        return {
            "strategy_type": "extracted",
            "follow_up_queries": queries[:3],
            "focus_entities": focus[:5] if focus else keywords[:5],
            "keywords": keywords,
        }


class AnswerValidator:
    """Rule-based answer gate (validator.py:1-97): minimum length, error
    patterns, keyword relevance (≥1 high-level keyword present; ≥half of
    low-level keywords present)."""

    ERROR_PATTERNS = [
        "抱歉，处理您的问题时遇到了错误", "技术原因:", "无法获取",
        "无法回答这个问题", "没有找到相关信息", "对不起，我不能",
    ]

    def __init__(self, keyword_extractor=None):
        self.keyword_extractor = keyword_extractor

    def validate(self, query: str, answer: str) -> Dict[str, bool]:
        answer = answer or ""
        results = {
            "length": len(answer) >= 50,
            "no_error_patterns": not any(p in answer
                                         for p in self.ERROR_PATTERNS),
            "keyword_relevance": self._check_keyword_relevance(query, answer),
        }
        results["passed"] = all(results.values())
        return results

    def _check_keyword_relevance(self, query: str, answer: str) -> bool:
        if not self.keyword_extractor:
            return True
        keywords = self.keyword_extractor(query)
        if not keywords:
            return True
        low = answer.lower()
        high_kw = keywords.get("high_level", [])
        if high_kw and not any(str(k).lower() in low for k in high_kw):
            return False
        low_kw = keywords.get("low_level", [])
        if low_kw and len(low_kw) > 1:
            matches = sum(1 for k in low_kw if str(k).lower() in low)
            if matches < len(low_kw) / 2:
                return False
        return True


_COMPLEXITY_INDICATORS = [
    "为什么", "如何", "机制", "原因", "关系", "比较", "区别", "影响",
    "分析", "评估", "预测", "如果", "假设", "还是", "多少", "怎样",
    "多大", "是否", "哪些", "优缺点",
]


def complexity_estimate(query) -> float:
    """validator.py:100-148 — length 0.3 + question marks 0.3 + complexity
    indicators 0.4, clamped to [0, 1]."""
    if query is None:
        return 0.0
    query = str(query)
    if not query.strip():
        return 0.0
    length_factor = min(1.0, len(query) / 100)
    question_factor = min(1.0, (query.count("?") + query.count("？")) * 0.2)
    indicator_factor = min(1.0, sum(
        1 for ind in _COMPLEXITY_INDICATORS if ind in query) * 0.15)
    return min(1.0, max(0.0, length_factor * 0.3 + question_factor * 0.3
                        + indicator_factor * 0.4))
