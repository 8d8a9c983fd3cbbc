"""Query-side reads over the materialized tables (SURVEY.md §2.10).

The reference serves these from Neo4j + vector indexes
(/root/reference/search/local_search.py:10-239, search/global_search.py:9-157,
search/tool/naive_search_tool.py): LocalSearch fans out from entity-vector
top-k to mention-weighted chunks, rank-ordered communities and weight-ordered
relationships; GlobalSearch maps over every level-N community summary;
NaiveSearch is chunk-vector top-k. Here each is a read over the Lance/Parquet
tables: brute-force cosine against the embedding columns (ops/similarity.py
provides the same as a scaled Dataset op) plus broadcast-filtered fan-outs.
The retrieval functions return the context tables the reference feeds its
prompts; :func:`global_search_mapreduce` additionally runs the reference's
full Map-Reduce answer chain through the injectable chat-client seam
(actor-pool map over community summaries, one driver reduce call) — the
production client is env-gated, the offline GlobalPointsClient replays it
deterministically.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..config import KGConfig
from ..functions.embed import embed_texts
from ..functions.text import normalize_surface


def _topk_by_embedding(pdf: pd.DataFrame, query_vec: np.ndarray, k: int,
                       id_col: str) -> pd.DataFrame:
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    sims = (mat / norms[:, None]) @ query_vec
    pdf = pdf.assign(score=np.round(sims, 9))
    return pdf.sort_values(["score", id_col], ascending=[False, True]).head(k)


def _distributed_topk(ds: "ray.data.Dataset", query_vec: np.ndarray, k: int,
                      id_col: str) -> pd.DataFrame:
    """Single-query cosine top-k over a Dataset with an ``embedding`` column
    WITHOUT collecting the table: each batch computes a partial top-k (one
    numpy matmul against the broadcast query vector, same (score desc,
    id asc) total order as :func:`_topk_by_embedding`), so only
    num_blocks × k rows ever reach the driver merge. This is the
    ops/similarity.knn_bruteforce partial/merge shape specialised to one
    query — the scale path for corpus-sized tables (chunk_embeddings) and
    entity seeding (naive_search_tool.py / local_search.py:40-133 parity)."""
    q_ref = ray.put(np.asarray(query_vec, dtype=np.float64))

    def partial(batch: pa.Table) -> pd.DataFrame:
        pdf = batch.to_pandas()
        if pdf.empty:
            return pdf.assign(score=pd.Series(dtype="float64"))
        return _topk_by_embedding(pdf, ray.get(q_ref), k, id_col)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=4096).to_pandas()
    return (partials.sort_values(["score", id_col], ascending=[False, True],
                                 kind="stable").head(k).reset_index(drop=True))


def local_search(
    tables: Dict[str, "ray.data.Dataset"], query: str,
    k_entities: int = 10, k_chunks: int = 3, k_communities: int = 3,
    k_edges: int = 10, cfg: KGConfig | None = None,
    ppr_expand: bool = False, ppr_iters: int = 10,
) -> Dict[str, pd.DataFrame]:
    """Entity-vector top-k → fan out (local_search.py:40-133 parity):
    chunks by mention frequency, communities by rank, edges by weight.

    ``ppr_expand``: additionally rank the whole graph by PERSONALIZED
    PageRank seeded at the vector-matched entities and widen the entity
    set to the PPR top-k — multi-hop relevance the pure vector seed
    misses (the reference fans out along SIMILAR/relationship edges for
    the same reason). Batch-context cost: 2·ppr_iters scalar shuffles
    over the edge table per query — the offline context-builder path,
    not the interactive one (there you precompute PPR per hub seed)."""
    cfg = cfg or KGConfig()
    qv = embed_texts([normalize_surface(query)], dim=cfg.embed_dim)[0].astype(np.float64)

    top_ents = _distributed_topk(
        tables["entities"].select_columns(
            ["entity_id", "embedding", "entity_type", "description", "degree"]),
        qv, k_entities, "entity_id")
    eset = set(top_ents["entity_id"])
    if ppr_expand and eset:
        from ..ops.graphstats import personalized_pagerank
        ppr = personalized_pagerank(
            tables["edges"], seeds=sorted(eset), iters=ppr_iters)

        # partial top-k per batch — blocks × k rows to the driver, never
        # the node-scale score table (the _distributed_topk shape). Seeds
        # hold most restart mass, so over-fetch k + |seeds| per block and
        # pick the top k NON-seed nodes at the merge.
        fetch = k_entities + len(eset)

        def _ppr_part(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "node" not in df.columns:
                return pd.DataFrame({"node": pd.Series(dtype="object"),
                                     "ppr_ppb": pd.Series(dtype="int64")})
            return df.sort_values(["ppr_ppb", "node"],
                                  ascending=[False, True]).head(fetch)

        ppr_merged = (ppr.map_batches(_ppr_part, batch_format="pandas")
                      .to_pandas()
                      .sort_values(["ppr_ppb", "node"],
                                   ascending=[False, True]))
        ppr_top = ppr_merged[~ppr_merged["node"].isin(eset)].head(k_entities)
        added = list(ppr_top["node"])
        eset |= set(added)
        if added:
            aref = ray.put(set(added))

            def keep_added(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                keep = pa.array(sorted(ray.get(aref)), pa.string())
                return batch.filter(
                    pc.is_in(batch.column("entity_id"), value_set=keep))

            added_meta = (tables["entities"].select_columns(
                ["entity_id", "embedding", "entity_type", "description",
                 "degree"]).map_batches(keep_added, batch_format="pyarrow")
                .to_pandas())
            rank = {n: i for i, n in enumerate(ppr_top["node"])}
            added_meta = (added_meta.assign(score=np.nan)
                          .sort_values("entity_id", key=lambda s: s.map(rank))
                          .reset_index(drop=True))
            top_ents = pd.concat([top_ents, added_meta], ignore_index=True)
    eref = ray.put(eset)

    def touching(batch, cols):
        import pyarrow as pa
        import pyarrow.compute as pc
        keep = pa.array(sorted(ray.get(eref)), pa.string())
        mask = pc.is_in(batch.column(cols[0]), value_set=keep)
        for c in cols[1:]:
            mask = pc.or_(mask, pc.is_in(batch.column(c), value_set=keep))
        return batch.filter(mask)

    edges = tables["edges"].map_batches(
        lambda b: touching(b, ["src", "dst"]), batch_format="pyarrow"
    ).to_pandas()
    top_edges = edges.sort_values(["weight", "src", "dst"],
                                  ascending=[False, True, True]).head(k_edges)

    mentions = tables["mentions_canon"].map_batches(
        lambda b: touching(b, ["entity_id"]), batch_format="pyarrow"
    ).to_pandas()
    chunk_freq = mentions.groupby("chunk_id").size().sort_values(
        ascending=False, kind="stable").head(k_chunks)
    chunk_ids = set(chunk_freq.index)
    cref = ray.put(chunk_ids)

    def chunk_keep(batch):
        import pyarrow as pa
        import pyarrow.compute as pc
        keep = ray.get(cref)
        return batch.filter(pc.is_in(batch.column("chunk_id"),
                                     value_set=pa.array(sorted(keep), pa.string())))

    chunks = tables["chunks"].map_batches(chunk_keep, batch_format="pyarrow").to_pandas()

    # distributed member-intersection filter (explode + isin against the
    # broadcast seed set) — only hit communities reach the driver
    def member_hit(batch: "pa.Table") -> pd.DataFrame:
        pdf = batch.to_pandas()
        if pdf.empty:
            return pdf
        ex = pdf["members"].explode()
        hit = ex[ex.isin(ray.get(eref))].index.unique()
        return pdf.loc[hit]

    comm = tables["communities"].map_batches(
        member_hit, batch_format="pyarrow").to_pandas()
    top_comm = comm.sort_values(["rank", "community_id"],
                                ascending=[False, True]).head(k_communities)

    return {
        "entities": top_ents.drop(columns=["embedding"]),
        "edges": top_edges,
        "chunks": chunks,
        "communities": top_comm,
    }


def global_search(
    tables: Dict[str, "ray.data.Dataset"], level: int = 0, limit: int | None = None
) -> pd.DataFrame:
    """Every level-N community's summary/full_content ordered by rank
    (global_search.py:9-157 map-phase input)."""
    def level_only(batch: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc
        return batch.filter(pc.equal(batch.column("level"), level))

    comm = tables["communities"].map_batches(
        level_only, batch_format="pyarrow").to_pandas()
    comm = comm.sort_values(["rank", "community_id"], ascending=[False, True])
    if limit:
        comm = comm.head(limit)
    return comm[["community_id", "rank", "summary", "full_content"]]


KEYWORD_PROMPT = (
    "提取查询中的关键词，返回JSON：{{\"high_level\": [主题级关键词], "
    "\"low_level\": [实体级关键词]}}。\n查询：{query}"
)

KEYWORD_STOPWORDS = {
    "a", "an", "the", "is", "are", "was", "were", "be", "been", "being",
    "in", "on", "at", "to", "for", "with", "by", "about", "of", "and", "or",
}


class KeywordExtractor:
    """LLM dual-level keyword extraction with the reference's JSON repair
    ladder (search/tool/hybrid_tool.py:88-185): direct ``json.loads`` when
    the reply is a clean object → first-``{``/last-``}`` slice when the model
    wrapped it in prose → stopword-filtered token split of the QUERY when no
    JSON survives → whole-query default when even the client call fails.
    Key/type normalization (``low_level``/``high_level`` always list-valued)
    matches :155-175. The chat client is injectable — ReplayClient offline,
    OpenAI-compatible in production (same seam as GlobalMapStage)."""

    def __init__(self, client=None, retries: int = 3, backoff_s: float = 0.0):
        self._client = client
        self._retries = retries
        self._backoff = backoff_s

    def _fallback(self, query: str) -> Dict[str, list]:
        import re
        words = re.findall(r"\w+", query.lower())
        words = [w for w in words if w not in KEYWORD_STOPWORDS]
        return {
            "high_level": [w for w in words if len(w) > 5][:3],
            "low_level": [w for w in words if 3 <= len(w) <= 5][:5],
        }

    def _parse(self, result, query: str) -> Dict[str, list]:
        import json
        if isinstance(result, dict):
            return result
        if isinstance(result, str):
            s = result.strip()
            try:
                if s.startswith("{") and s.endswith("}"):
                    return json.loads(s)
                lo, hi = s.find("{"), s.rfind("}")
                if 0 <= lo < hi:
                    return json.loads(s[lo:hi + 1])
            except json.JSONDecodeError:
                pass
        return self._fallback(query)

    def extract(self, query: str) -> Dict[str, list]:
        keywords: Dict[str, list]
        if self._client is None:
            keywords = self._fallback(query)
        else:
            try:
                from ..stages.llm import call_with_retry
                reply = call_with_retry(
                    self._client,
                    [{"role": "user",
                      "content": KEYWORD_PROMPT.format(query=query)}],
                    retries=self._retries, backoff_s=self._backoff)
                keywords = self._parse(reply, query)
            except Exception:  # noqa: BLE001 — reference :181-185 default
                words = query.split()
                keywords = {"low_level": [query],
                            "high_level": [words[0] if words else query]}
        if not isinstance(keywords, dict):
            keywords = {}
        for key in ("low_level", "high_level"):
            if key not in keywords:
                keywords[key] = []
            if not isinstance(keywords[key], list):
                keywords[key] = [str(keywords[key])]
        return keywords


def hybrid_search(
    tables: Dict[str, "ray.data.Dataset"], query: str,
    k_low: int = 10, k_high: int = 3, k_chunks: int = 5,
    cfg: KGConfig | None = None,
    keyword_extractor: "KeywordExtractor | None" = None,
) -> Dict[str, pd.DataFrame]:
    """LightRAG-style dual-level retrieval (hybrid_tool.py:88-409 parity):
    low-level = keyword/vector entity lookup + their 1-hop relationships +
    top chunks; high-level = community summaries matched to the query.
    Keyword extraction: pass a :class:`KeywordExtractor` (LLM split with the
    JSON repair ladder) to use the reference's dual-level keywords — its
    low_level terms drive the entity lookup and high_level terms join the
    community match; default is deterministic extraction (query tokens,
    normalized) + embedding similarity."""
    cfg = cfg or KGConfig()
    if keyword_extractor is not None:
        kw = keyword_extractor.extract(query)
        # str() both in the guard AND the normalize: the LLM list may hold
        # non-string elements (e.g. a bare year) — degrade, don't crash
        keywords = {normalize_surface(str(w))
                    for w in (kw["low_level"] + kw["high_level"])
                    if len(str(w)) > 2}
    else:
        keywords = {normalize_surface(w) for w in query.split() if len(w) > 2}
    qv = embed_texts([normalize_surface(query)], dim=cfg.embed_dim)[0].astype(np.float64)

    ents_ds = tables["entities"].select_columns(
        ["entity_id", "embedding", "entity_type", "description", "degree"])
    # low-level: exact keyword hits (CONTAINS-substring analog,
    # hybrid_tool.py:275-283) as a DISTRIBUTED substring filter (hit-sized
    # collect), unioned with the distributed vector top-k — the full entity
    # table never reaches the driver
    kw_list = sorted(keywords)

    def kw_filter(batch: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc
        if not kw_list:
            return batch.slice(0, 0)
        col = batch.column("entity_id")
        mask = pc.match_substring(col, kw_list[0])
        for kw in kw_list[1:]:
            mask = pc.or_(mask, pc.match_substring(col, kw))
        return batch.filter(mask)

    kw_hits = ents_ds.map_batches(kw_filter, batch_format="pyarrow").to_pandas()
    vec_hits = _distributed_topk(ents_ds, qv, k_low, "entity_id")
    low = pd.concat([kw_hits.assign(score=1.0), vec_hits]).drop_duplicates(
        "entity_id").head(k_low * 2)
    eset = set(low["entity_id"])
    eref = ray.put(eset)

    def touching(batch):
        import pyarrow as pa
        import pyarrow.compute as pc
        keep = pa.array(sorted(ray.get(eref)), pa.string())
        mask = pc.or_(pc.is_in(batch.column("src"), value_set=keep),
                      pc.is_in(batch.column("dst"), value_set=keep))
        return batch.filter(mask)

    one_hop = tables["edges"].map_batches(touching, batch_format="pyarrow").to_pandas()

    def hit_mentions(batch):
        import pyarrow as pa
        import pyarrow.compute as pc
        keep = pa.array(sorted(ray.get(eref)), pa.string())
        return batch.filter(pc.is_in(batch.column("entity_id"), value_set=keep))

    # collect only the matched entities' mention rows, never the full table
    mentions = tables["mentions_canon"].map_batches(
        hit_mentions, batch_format="pyarrow").to_pandas()
    rel_chunks = (
        mentions.groupby("chunk_id").size()
        .sort_values(ascending=False, kind="stable").head(k_chunks)
    )
    cset = set(rel_chunks.index)
    cref = ray.put(cset)

    def chunk_keep(batch):
        import pyarrow as pa
        import pyarrow.compute as pc
        ks = ray.get(cref)
        return batch.filter(pc.is_in(batch.column("chunk_id"),
                                     value_set=pa.array(sorted(ks), pa.string())))

    chunks = tables["chunks"].map_batches(chunk_keep, batch_format="pyarrow").to_pandas()

    # high-level: community summaries containing any keyword member, by
    # rank — DISTRIBUTED member filter + per-batch partial top-k (at
    # corpus scale the communities table is itself large; only
    # blocks × k_high rows reach the driver). Keyword misses fall back to
    # the global rank top-k through the same partial/merge shape.
    kw_ref = ray.put(sorted(keywords))

    def _comm_part(hit_only: bool):
        def part(batch: "pa.Table") -> pd.DataFrame:
            pdf = batch.to_pandas()
            if pdf.empty:
                return pdf
            if hit_only:
                kws = ray.get(kw_ref)
                mask = pdf["members"].map(
                    lambda ms: any(any(k in m for k in kws) for m in ms))
                pdf = pdf[mask]
            return (pdf.sort_values(["rank", "community_id"],
                                    ascending=[False, True]).head(k_high))
        return part

    high = (tables["communities"]
            .map_batches(_comm_part(True), batch_format="pyarrow")
            .to_pandas())
    if high.empty:
        high = (tables["communities"]
                .map_batches(_comm_part(False), batch_format="pyarrow")
                .to_pandas())
    high = (high.sort_values(["rank", "community_id"],
                             ascending=[False, True]).head(k_high))

    return {
        "low_entities": low.drop(columns=["embedding"]),
        "low_edges": one_hop,
        "low_chunks": chunks,
        "high_communities": high[["community_id", "rank", "summary", "full_content"]],
    }


def naive_search(
    tables: Dict[str, "ray.data.Dataset"], query: str, k: int = 3,
    cfg: KGConfig | None = None,
) -> pd.DataFrame:
    """Chunk-vector top-k (naive_search_tool.py parity) over the
    chunk_embeddings table."""
    cfg = cfg or KGConfig()
    qv = embed_texts([query], dim=cfg.embed_dim)[0].astype(np.float64)
    # corpus-scaled table: partial top-k per batch, merge num_blocks × k rows
    # on the driver — never a full-table collect
    top = _distributed_topk(tables["chunk_embeddings"], qv, k, "chunk_id")
    chunk_ids = set(top["chunk_id"])
    cref = ray.put(chunk_ids)

    def keep(batch):
        import pyarrow as pa
        import pyarrow.compute as pc
        ks = ray.get(cref)
        return batch.filter(pc.is_in(batch.column("chunk_id"),
                                     value_set=pa.array(sorted(ks), pa.string())))

    chunks = tables["chunks"].map_batches(keep, batch_format="pyarrow").to_pandas()
    return top[["chunk_id", "score"]].merge(chunks[["chunk_id", "doc_id", "text"]],
                                            on="chunk_id")


def chain_of_exploration(
    tables: Dict[str, "ray.data.Dataset"], query: str,
    start_entities: list | None = None, max_hops: int = 3,
    beam_width: int = 5, cfg: KGConfig | None = None,
) -> Dict[str, object]:
    """Beam exploration over the canonical graph (DeepResearch's
    Chain-of-Exploration, reference search/tool/reasoning/
    chain_of_exploration.py:33-173): seed from entity-vector top-k (or given
    ids), then per hop gather 1-hop neighbours of the frontier (broadcast
    frontier filter over the distributed edges table — never a driver-side
    adjacency build), score candidates by embedding similarity to the query,
    keep the top ``beam_width`` unvisited, and record the evidence edges.
    The LLM relevance re-scoring of the reference is replaced by the
    deterministic embedding score (the injectable-judge pattern used across
    this engine)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cfg = cfg or KGConfig()
    qv = embed_texts([normalize_surface(query)], dim=cfg.embed_dim)[0].astype(np.float64)

    ents = tables["entities"].select_columns(["entity_id", "embedding"])
    if start_entities is None:
        seed = _distributed_topk(ents, qv, beam_width, "entity_id")
        frontier = list(seed["entity_id"])
    else:
        frontier = list(start_entities)

    visited = set(frontier)
    hops = [{"hop": 0, "frontier": sorted(frontier), "scores": {}}]
    evidence = []

    for hop in range(1, max_hops + 1):
        if not frontier:
            break
        fref = ray.put(pa.array(sorted(frontier), pa.string()))

        def touching(batch: pa.Table) -> pa.Table:
            fr = ray.get(fref)
            mask = pc.or_(pc.is_in(batch.column("src"), value_set=fr),
                          pc.is_in(batch.column("dst"), value_set=fr))
            return batch.filter(mask)

        hop_edges = tables["edges"].select_columns(
            ["src", "dst", "pred", "weight"]).map_batches(
            touching, batch_format="pyarrow").to_pandas()
        if hop_edges.empty:
            break
        evidence.append(hop_edges.assign(hop=hop))
        neighbours = (set(hop_edges["src"]) | set(hop_edges["dst"])) - visited
        if not neighbours:
            break
        nref = ray.put(pa.array(sorted(neighbours), pa.string()))

        def keep_n(batch: pa.Table) -> pa.Table:
            ns = ray.get(nref)
            return batch.filter(pc.is_in(batch.column("entity_id"), value_set=ns))

        cand = ents.map_batches(keep_n, batch_format="pyarrow").to_pandas()
        if cand.empty:
            break
        top = _topk_by_embedding(cand, qv, beam_width, "entity_id")
        frontier = list(top["entity_id"])
        visited.update(frontier)
        hops.append({
            "hop": hop, "frontier": sorted(frontier),
            "scores": dict(zip(top["entity_id"], top["score"])),
        })

    evidence_pdf = (pd.concat(evidence, ignore_index=True)
                    .drop_duplicates(["src", "dst", "pred"])
                    if evidence else pd.DataFrame(
                        columns=["src", "dst", "pred", "weight", "hop"]))
    return {"visited": sorted(visited), "hops": hops, "evidence": evidence_pdf}


class GlobalMapStage:
    """Map phase of GraphRAG global search as an actor-pool stage —
    reference ``search/global_search.py:56-92``: every level-N community's
    ``full_content`` is sent to the chat model with the MAP prompt contract
    (``config/prompt.py:230-265``: answer ONLY from the provided data
    table, emit a points list, say 不知道 when the table lacks the answer)
    and yields an intermediate points text per community.

    Callable-class pattern (OpenAIExtractor/ModelSummarizer analog): the
    chat client builds once per actor in ``__init__``; batches of
    communities map concurrently in ``__call__`` — the Ray-native
    replacement for the reference's sequential tqdm loop. Retry ladder via
    ``call_with_retry``; exhaustion yields the empty-string sentinel row
    (the reduce phase drops it) instead of failing the job."""

    SYSTEM_PROMPT = (
        "---角色--- 你是一位有用的助手，可以回答有关所提供表格中数据的问题。"
        "---任务描述--- 生成一个回答用户问题所需的要点列表，总结输入数据表格中"
        "的所有相关信息。严格根据提供的数据表格回答；信息不足时回答：不知道。"
    )

    def __init__(self, query: str, client=None, client_factory=None,
                 retries: int = 3, backoff_s: float = 0.0):
        from ..stages.llm import OpenAIChatClient
        if client is not None:
            self._client = client
        elif client_factory is not None:
            self._client = client_factory()
        else:
            self._client = OpenAIChatClient()  # raises in sealed sandboxes
        self._query = query
        self._retries = retries
        self._backoff = backoff_s

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        from ..stages.llm import call_with_retry
        pdf = batch.to_pandas()
        if pdf.empty:
            return pd.DataFrame({"community_id": pd.Series(dtype="object"),
                                 "points": pd.Series(dtype="object")})
        outs = []
        for fc in pdf["full_content"]:
            msgs = [
                {"role": "system", "content": self.SYSTEM_PROMPT},
                {"role": "user", "content":
                    f"---数据表格---\n{fc}\n\n用户的问题是：\n{self._query}"},
            ]
            outs.append(call_with_retry(
                self._client, msgs, retries=self._retries,
                backoff_s=self._backoff))
        return pd.DataFrame({"community_id": pdf["community_id"],
                             "points": outs})


def global_search_mapreduce(
    tables: Dict[str, "ray.data.Dataset"], query: str, level: int = 0,
    client=None, client_factory=None, concurrency=(1, 8),
    retries: int = 3,
) -> Dict[str, object]:
    """Full Map-Reduce global search (``search/global_search.py:126-146``):
    map every level-N community summary against the query (actor pool,
    distributed), then one driver-side REDUCE call folds the intermediate
    points lists into the final answer (``REDUCE_SYSTEM_PROMPT``,
    ``config/prompt.py:267-…``: synthesize strictly from the points lists).

    The map output is intermediate-points-sized (one short text per
    community); the reduce input concatenates them in community_id order so
    the answer is a pure function of the table + query + client."""
    from ..stages.llm import call_with_retry

    def level_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.equal(batch.column("level"), level))

    comm = tables["communities"].map_batches(level_only,
                                             batch_format="pyarrow")
    stage = GlobalMapStage  # actor-pool callable class
    inter = comm.select_columns(["community_id", "full_content"]).map_batches(
        stage,
        fn_constructor_kwargs={"query": query, "client": client,
                               "client_factory": client_factory,
                               "retries": retries},
        batch_format="pyarrow", batch_size=16,
        concurrency=concurrency,
    ).to_pandas()  # intermediate-points-sized
    inter = inter.sort_values("community_id").reset_index(drop=True)
    kept = inter[inter["points"].astype(str).str.len() > 0]

    reduce_client = client if client is not None else (
        client_factory() if client_factory is not None else None)
    if reduce_client is None:
        from ..stages.llm import OpenAIChatClient
        reduce_client = OpenAIChatClient()
    report = "\n\n".join(
        f"[{cid}] {pts}" for cid, pts in
        zip(kept["community_id"], kept["points"]))
    msgs = [
        {"role": "system", "content":
            "---角色--- 你是一个有用的助手，请综合上下文中多个要点列表的数据来"
            "回答问题。严格根据要点列表的内容回答；列表无相关内容时回答：不知道。"},
        {"role": "user", "content":
            f"---分析报告---\n{report}\n\n用户的问题是：\n{query}"},
    ]
    answer = call_with_retry(reduce_client, msgs, retries=retries,
                             backoff_s=0.0)
    return {"answer": answer, "intermediate": inter}


# ---------------------------------------------------------------------------
# DeepResearch think-search-reason loop
# ---------------------------------------------------------------------------

BEGIN_SEARCH_QUERY = "<|begin_search_query|>"
END_SEARCH_QUERY = "<|end_search_query|>"
BEGIN_SEARCH_RESULT = "<|begin_search_result|>"
END_SEARCH_RESULT = "<|end_search_result|>"

REASON_SYSTEM_PROMPT = (
    "你是一个推理助手，可以使用搜索工具搜索知识库来回答用户的问题。\n"
    f"- 要执行搜索：请写 {BEGIN_SEARCH_QUERY} 你的查询内容 {END_SEARCH_QUERY}。\n"
    f"系统会以 {BEGIN_SEARCH_RESULT} ...搜索结果... {END_SEARCH_RESULT} 提供有用信息。\n"
    "获得足够的信息后，继续你的推理并给出 **回答**。"
)


def _extract_tagged_queries(text: str) -> list:
    import re
    pat = re.escape(BEGIN_SEARCH_QUERY) + r"(.*?)" + re.escape(END_SEARCH_QUERY)
    return [q.strip() for q in re.findall(pat, text, flags=re.DOTALL)
            if q.strip()]


def deep_research(
    tables: Dict[str, "ray.data.Dataset"], query: str, client,
    max_iterations: int = 5, k_chunks: int = 3,
    cfg: KGConfig | None = None, retries: int = 3, backoff_s: float = 0.0,
    tracker: "object | None" = None, build_local_kg: bool = True,
) -> Dict[str, object]:
    """The DeepResearch think-search-reason loop re-expressed over the built
    tables (reference: search/tool/deep_research_tool.py:433-660 driving
    reasoning/thinking.py:626-680, tag contract config/reasoning_prompts.py:
    3-14). Per iteration the chat client continues the reasoning; tagged
    ``<|begin_search_query|>`` queries are extracted, deduplicated against
    already-executed ones (:553-557), answered by hybrid retrieval over the
    KG tables (the kb_retrieve analog, :185-316), condensed by an
    info-extraction call (:403-420), and fed back as tagged results. The
    loop stops on answer-ready markers (thinking.py:654-661: no queries +
    ``**回答**``/``足够的信息``), on no-new-queries, or at max_iterations;
    a final call produces the answer from the accumulated evidence
    (:357-385). The client is injectable (scripted/offline in tests).

    Every run threads an :class:`~.reasoning.EvidenceChainTracker` (the
    reference's evidence.py ledger): each iteration records a reasoning
    step, each retrieved chunk becomes a confidence-scored evidence item,
    and per-step numerical contradictions are detected; the result carries
    the full ledger under ``evidence``. ``build_local_kg`` additionally
    assembles the per-question subgraph (kg_builder.py parity) seeded from
    the entities retrieval surfaced — one broadcast edge-filter per hop."""
    from ..stages.llm import call_with_retry
    from .reasoning import EvidenceChainTracker, QueryKGBuilder

    cfg = cfg or KGConfig()
    if tracker is None:
        tracker = EvidenceChainTracker()
    query_id = tracker.start_new_query(
        query, {"low_level": [w for w in query.split() if len(w) > 2],
                "high_level": []})
    seed_entities: set = set()
    history: list = [{"role": "user", "content": f"问题: {query}"}]
    thinking: list = []
    executed: set = set()
    all_retrieved: list = []
    executed_order: list = []
    status = "max_iterations"

    for _iteration in range(max_iterations):
        msgs = [{"role": "system", "content": REASON_SYSTEM_PROMPT}] + history
        reply = call_with_retry(client, msgs, retries=retries,
                                backoff_s=backoff_s)
        if not reply:
            status = "empty"
            break
        thinking.append(reply)
        history.append({"role": "assistant", "content": reply})
        queries = _extract_tagged_queries(reply)
        if not queries:
            if "**回答**" in reply or "足够的信息" in reply:
                status = "answer_ready"
            else:
                status = "no_query"
            break
        for q in queries:
            if q in executed:
                note = (f"\n{BEGIN_SEARCH_RESULT}\n已搜索过该查询。"
                        f"请参考前面的结果。\n{END_SEARCH_RESULT}\n")
                history.append({"role": "user", "content": note})
                continue
            executed.add(q)
            executed_order.append(q)
            step_id = tracker.add_reasoning_step(query_id, q, reply)
            hits = hybrid_search(tables, q, k_chunks=k_chunks, cfg=cfg)
            chunks = hits.get("low_chunks")
            ents = hits.get("low_entities")
            if ents is not None and "entity_id" in ents:
                seed_entities.update(str(e) for e in ents["entity_id"])
            step_evidence_ids = []
            if chunks is not None and "text" in chunks:
                for row in chunks.head(k_chunks).itertuples(index=False):
                    conf = float(min(1.0, max(0.0, getattr(row, "score", 0.5))))
                    step_evidence_ids.append(
                        tracker.add_evidence_with_confidence(
                            step_id, str(getattr(row, "chunk_id", "")),
                            str(row.text), "chunk", confidence=conf,
                            metadata={"doc_id": str(getattr(row, "doc_id", ""))}))
            tracker.detect_contradictions(step_evidence_ids)
            evidence = "\n".join(
                str(t) for t in (chunks["text"] if chunks is not None
                                 and "text" in chunks else [])[:k_chunks])
            recent_thinking = "\n".join(thinking[-2:])
            info = call_with_retry(client, [
                {"role": "user", "content":
                    f'基于当前的搜索查询"{q}"和前面的推理步骤，'
                    f"分析每个知识来源并找出有用信息。\n"
                    f"前面的推理步骤：\n{recent_thinking}\n"
                    f"知识来源：\n{evidence}"},
            ], retries=retries, backoff_s=backoff_s)
            all_retrieved.append(info or evidence)
            history.append({"role": "user", "content":
                            f"\n{BEGIN_SEARCH_RESULT}\n{info or evidence}\n"
                            f"{END_SEARCH_RESULT}\n"})

    final = call_with_retry(client, [
        {"role": "user", "content":
            f"问题：{query}\n\n检索到的信息：\n" + "\n".join(all_retrieved)
            + "\n\n思考过程：\n" + "\n".join(thinking)
            + "\n\n请给出最终回答。"},
    ], retries=retries, backoff_s=backoff_s)
    local_kg = None
    if build_local_kg and seed_entities:
        builder = QueryKGBuilder(tables["edges"]).build_query_graph(
            query, sorted(seed_entities)[:10], depth=2)
        local_kg = {**builder.meta,
                    "central_entities": builder.get_central_entities(5)}
    return {
        "answer": final,
        "thinking": "\n".join(thinking),
        "retrieved": all_retrieved,
        "queries": executed_order,
        "status": status,
        "evidence": {
            "query_id": query_id,
            "chain": tracker.get_reasoning_chain(query_id),
            "summary": tracker.summarize_reasoning(query_id),
            "source_stats": tracker.get_evidence_source_stats(query_id),
            "citations": tracker.generate_citations(final or ""),
        },
        "local_kg": local_kg,
    }


class QueryGenerator:
    """Sub-query / follow-up / hypothesis generation for the research loop
    (reference: search/tool/reasoning/search.py:218-350), with its parsing
    ladders made safe: the bracketed python-list reply parses via
    ``ast.literal_eval`` (the reference uses ``eval``), numbered / dashed /
    line-split fallbacks for hypotheses, original-query / empty-list
    defaults on any failure. Chat client injectable as everywhere else."""

    SUB_QUERY_PROMPT = (
        "将下面的问题分解为2-4个可独立检索的子问题，"
        "以python列表形式返回（如 [\"子问题1\", \"子问题2\"]）。\n问题: {q}"
    )
    FOLLOWUP_PROMPT = (
        "原始问题: {q}\n已检索到的信息:\n{info}\n\n"
        "若仍有缺口，给出1-3个跟进查询，以python列表形式返回；"
        "信息已充分则返回 []。"
    )
    HYPOTHESIS_PROMPT = (
        "为以下问题生成2-3个可能的假设，代表不同角度或思路，"
        "每个假设简短明了，以列表形式返回。\n问题: \"{q}\""
    )

    def __init__(self, client, retries: int = 3, backoff_s: float = 0.0):
        self._client = client
        self._retries = retries
        self._backoff = backoff_s

    def _ask(self, prompt: str) -> str:
        from ..stages.llm import call_with_retry
        return call_with_retry(
            self._client, [{"role": "user", "content": prompt}],
            retries=self._retries, backoff_s=self._backoff)

    @staticmethod
    def _parse_list(content: str):
        import ast
        import re
        # greedy first (the reference's regex), then non-greedy — a reply
        # with bracketed text AFTER the list ('[...] 注：[仅供参考]') makes
        # the greedy span unparseable while the non-greedy one is the list
        for pat in (r"\[.*\]", r"\[.*?\]"):
            m = re.search(pat, content or "", re.DOTALL)
            if not m:
                return None
            try:
                out = ast.literal_eval(m.group(0))
            except (ValueError, SyntaxError):
                continue
            return [str(q) for q in out] if isinstance(out, list) else None
        return None

    def generate_sub_queries(self, original_query: str) -> list:
        """search.py:218-247 — bracketed-list parse, else [original]."""
        out = self._parse_list(self._ask(
            self.SUB_QUERY_PROMPT.format(q=original_query)))
        return out if out else [original_query]

    def generate_followup_queries(self, original_query: str,
                                  retrieved_info: list) -> list:
        """search.py:304-350 — needs ≥2 retrieved snippets (else []); uses
        the most recent 3; deduped bracketed-list parse, else []."""
        if not retrieved_info or len(retrieved_info) < 2:
            return []
        info = "\n\n".join(str(x) for x in retrieved_info[-3:])
        out = self._parse_list(self._ask(
            self.FOLLOWUP_PROMPT.format(q=original_query, info=info)))
        if not out:
            return []
        seen, uniq = set(), []
        for q in out:
            if q not in seen:
                seen.add(q)
                uniq.append(q)
        return uniq

    def generate_multiple_hypotheses(self, query: str) -> list:
        """search.py:249-300 — numbered list → dashed list → long-line
        fallback, max 3."""
        import re
        content = self._ask(self.HYPOTHESIS_PROMPT.format(q=query)) or ""
        # list markers must be followed by whitespace (and dashes preceded
        # by start/whitespace): an in-text decimal ('增长3.5倍') or hyphen
        # ('state-of-the-art') is content, not a new item
        numbered = [m.strip() for m in
                    re.findall(r"\d+\.\s+(.*?)(?=\d+\.\s|$)", content,
                               re.DOTALL)
                    if m.strip()]
        if numbered:
            return numbered[:3]
        dashed = [m.strip() for m in
                  re.findall(r"(?:^|\s)-\s+(.*?)(?=\s-\s|$)", content,
                             re.DOTALL)
                  if m.strip()]
        if dashed:
            return dashed[:3]
        lines = [ln.strip() for ln in content.split("\n") if ln.strip()]
        return [ln for ln in lines
                if len(ln) > 10 and not ln.startswith(("假设", "以下是"))][:3]
