"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``: exact cosine top-k per query — queries broadcast once
  via ray.put; each batch computes a partial top-k (numpy matmul), then a
  tiny groupby(query_id) merges partials. Wall-clock scales with corpus/batch
  count, memory with k × queries — the correct brute-force baseline shape.
- ``knn_ivf``: IVF-style scale path — vectors assigned to coarse buckets by
  seeded random-projection LSH; queries probe only their own bucket (plus
  multi-probe neighbours), trading recall for a groupby instead of a scan.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.embed import list_column_to_matrix, lsh_bucket


def _query_matrix(emb: "ray.data.Dataset", query_ids: Sequence[int]):
    q_ref = ray.put(pa.array(sorted(int(q) for q in query_ids), pa.int64()))

    def keep(batch: pa.Table) -> pa.Table:
        value_set = ray.get(q_ref)
        mask = pc.is_in(pc.cast(batch.column("vec_id"), pa.int64()),
                        value_set=value_set)
        return batch.filter(mask)

    q_pdf = emb.select_columns(["vec_id", "embedding"]).map_batches(
        keep, batch_format="pyarrow").to_pandas().sort_values("vec_id")
    q_ids = q_pdf["vec_id"].to_numpy()
    q_mat = np.array(q_pdf["embedding"].tolist(), dtype=np.float64)
    q_norms = np.linalg.norm(q_mat, axis=1)
    q_norms[q_norms == 0] = 1.0
    return q_ids, q_mat / q_norms[:, None]


def knn_bruteforce(
    emb: "ray.data.Dataset", query_ids: Sequence[int], k: int = 10,
    round_digits: int = 6, exclude_self: bool = True,
) -> "ray.data.Dataset":
    """(query_id, neighbor_id, rank, sim) exact top-k by cosine; ordering by
    (round(sim,6) desc, neighbor_id asc) so results are total-ordered and
    SQL-reproducible."""
    q_ids, q_unit = _query_matrix(emb, query_ids)
    q_ref = ray.put((q_ids, q_unit))

    def partial_topk(batch: pa.Table) -> pd.DataFrame:
        ids, qm = ray.get(q_ref)
        if len(batch) == 0:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "neighbor_id": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        b_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        b_mat = list_column_to_matrix(batch.column("embedding")).astype(np.float64)
        b_norms = np.linalg.norm(b_mat, axis=1)
        b_norms[b_norms == 0] = 1.0
        sims = np.round(qm @ (b_mat / b_norms[:, None]).T, round_digits)
        frames = []
        for qi, qid in enumerate(ids):
            row = sims[qi]
            order = np.lexsort((b_ids, -row))[: k + (1 if exclude_self else 0)]
            frames.append(pd.DataFrame({
                "query_id": int(qid), "neighbor_id": b_ids[order], "sim": row[order],
            }))
        return pd.concat(frames, ignore_index=True)

    partials = emb.select_columns(["vec_id", "embedding"]).map_batches(
        partial_topk, batch_format="pyarrow", batch_size=4096
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group
        if exclude_self:
            g = g[g["neighbor_id"] != g["query_id"]]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank", "sim"]]

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def knn_ivf(
    emb: "ray.data.Dataset", query_ids: Sequence[int], k: int = 10,
    n_bits: int | None = 2, seed: int = 42, round_digits: int = 6,
    n_probes: int | None = None,
) -> "ray.data.Dataset":
    """Approximate top-k: vectors bucketed by random-projection LSH
    (2^n_bits coarse cells); each query probes its own cell plus the
    ``n_probes-1`` nearest cells (Hamming-adjacent codes — multi-probe LSH,
    Lv et al. 2007), partial top-k per probed cell merged per query. The
    100 TB path — the scan becomes a groupby(bucket) instead of all-pairs.
    Recall vs knn_bruteforce is measured by :func:`knn_recall` and reported
    in bench; n_probes defaults to 1+n_bits (all Hamming-1 neighbours) and
    may extend into Hamming-2 cells. Defaults (n_bits=2, 3 probes) are tuned
    to recall@10 >= 0.9 on the driver's embeddings table; larger corpora
    raise n_bits (more, smaller cells) and n_probes together —
    ``n_bits=None`` applies the :func:`auto_n_bits` corpus-size rule."""
    if n_bits is None:
        n_bits = auto_n_bits(emb.count())
    q_ids, q_unit = _query_matrix(emb, query_ids)
    q_buckets = lsh_bucket(q_unit.astype(np.float32), n_bits, seed)
    n_probes = (1 + n_bits) if n_probes is None else n_probes
    q_by_bucket = {}
    for qid, qv, qb in zip(q_ids, q_unit, q_buckets):
        probes = [int(qb)] + [int(qb) ^ (1 << b) for b in range(n_bits)]
        for b1 in range(n_bits):          # Hamming-2 ring, deterministic order
            for b2 in range(b1 + 1, n_bits):
                probes.append(int(qb) ^ (1 << b1) ^ (1 << b2))
        for cell in probes[:n_probes]:
            q_by_bucket.setdefault(cell, []).append((int(qid), qv))
    q_ref = ray.put(q_by_bucket)

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = list_column_to_matrix(batch.column("embedding")).astype(np.float32)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        buckets = lsh_bucket(mat / norms, n_bits, seed)
        return batch.append_column("bucket", pa.array(buckets, pa.int64()))

    bucketed = emb.select_columns(["vec_id", "embedding"]).map_batches(
        bucketize, batch_format="pyarrow", batch_size=4096
    )
    return _probe_and_merge(bucketed, q_ref, k, round_digits)


def _probe_and_merge(bucketed: "ray.data.Dataset", q_ref, k: int,
                     round_digits: int) -> "ray.data.Dataset":
    """Shared IVF tail, SHUFFLE-FREE: ``q_ref`` = ray.put'd
    {cell: [(query_id, unit_vec), ...]}. Each batch computes a partial top-k
    for every (probed cell ∩ batch rows) slice — one matmul per cell present
    in the batch against that cell's stacked query matrix — so the corpus is
    never grouped by cell. The old groupby(bucket).map_groups materialized an
    entire coarse cell (n/n_cells vectors) as ONE pandas task, a
    corpus-fraction-sized group at 100 TB; here only
    (blocks × queries × k)-sized partials shuffle to the per-query merge, and
    rows whose cell no query probes are skipped without ever decoding their
    embeddings. Result set is identical: the union of per-batch top-ks
    contains each (query, cell) top-k, and each vector lives in exactly one
    cell, so the per-query merge recovers the same ranking."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        by_bucket = ray.get(q_ref)
        empty = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                              "neighbor_id": pd.Series(dtype="int64"),
                              "sim": pd.Series(dtype="float64")})
        if len(batch) == 0:
            return empty
        buckets = np.asarray(batch.column("bucket").to_pylist(), dtype=np.int64)
        b_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        mat = None  # decoded lazily — only if some cell in this batch is probed
        frames = []
        for cell in np.unique(buckets):
            queries = by_bucket.get(int(cell))
            if not queries:
                continue
            rows = np.nonzero(buckets == cell)[0]
            if mat is None:
                mat = list_column_to_matrix(
                    batch.column("embedding")).astype(np.float64)
            sub = mat[rows]
            norms = np.linalg.norm(sub, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            unit = sub / norms
            qm = np.asarray([qv for _, qv in queries], dtype=np.float64)
            sims = np.round(unit @ qm.T, round_digits)  # (n_rows, n_queries)
            ids = b_ids[rows]
            for qi, (qid, _qv) in enumerate(queries):
                col = sims[:, qi]
                mask = ids != qid
                order = np.lexsort((ids[mask], -col[mask]))[:k]
                frames.append(pd.DataFrame({
                    "query_id": qid, "neighbor_id": ids[mask][order],
                    "sim": col[mask][order],
                }))
        return pd.concat(frames, ignore_index=True) if frames else empty

    partials = bucketed.map_batches(partial, batch_format="pyarrow",
                                    batch_size=4096)
    return _merge_topk(partials, k)


def _merge_topk(partials: "ray.data.Dataset", k: int) -> "ray.data.Dataset":
    """Per-query merge of (query_id, neighbor_id, sim) partials into the
    final (query_id, neighbor_id, rank, sim) top-k — the shared tail of
    every IVF variant. The shuffle moves only partial-top-k rows."""

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["query_id", "neighbor_id"])
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank", "sim"]]

    return partials.groupby("query_id").map_groups(final_topk,
                                                   batch_format="pandas")


def auto_n_centroids(n: int) -> int:
    """Corpus-size rule for the IVF coarse-cell count: ``4·sqrt(n)`` (the
    standard IVF guideline — cells shrink RELATIVE to the corpus as it grows,
    so no cell is ever a corpus-fraction-sized scan), clamped to [8, 65536].
    sf0.01 (500 vecs) → 88 cells of ~6 vectors; 1e9 vectors → 65536 cells of
    ~15k vectors — each cell slice stays batch-sized. Pass
    ``n_centroids=None`` to :func:`knn_ivf_trained` (or ``n_bits=None`` to
    :func:`knn_ivf`) to apply it."""
    import math
    return int(min(65536, max(8, 4 * math.isqrt(max(int(n), 1)))))


def auto_n_bits(n: int) -> int:
    """LSH analog of :func:`auto_n_centroids`: hyperplane count giving
    ~auto_n_centroids(n) cells (2^bits ≈ 4·sqrt(n)), clamped to [2, 16]."""
    import math
    return int(min(16, max(2, round(math.log2(auto_n_centroids(n))))))


def train_centroids(
    emb: "ray.data.Dataset", n_centroids: int = 16, sample_cap: int = 16384,
    n_iters: int = 10, seed: int = 42,
) -> np.ndarray:
    """Deterministic spherical k-means coarse quantizer.

    Training reads a BOUNDED sample — each row is kept by a multiplicative
    hash of its vec_id (layout-independent, so the sample and hence the
    centroids are identical across block orders and parallelism levels) — and
    runs seeded k-means++ on the driver over ≤ ``sample_cap`` unit vectors.
    The returned (n_centroids × dim) matrix is tiny and broadcast once.
    Replaces random-hyperplane LSH cells when the corpus is clustered (the
    IVF literature's standard coarse quantizer, Jégou et al. 2011)."""
    n = emb.count()
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    keep_below = np.uint32(min(1.0, sample_cap / n) * 0xFFFFFFFF)

    def sample(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.uint64)
        h = (ids * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        return batch.filter(pa.array(h <= keep_below))

    pdf = emb.select_columns(["vec_id", "embedding"]).map_batches(
        sample, batch_format="pyarrow").to_pandas().sort_values("vec_id")
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    k_eff = min(n_centroids, len(unit))
    if k_eff == 0:
        return np.zeros((0, mat.shape[1] if mat.ndim == 2 else 0))

    # seeded k-means++ init over cosine distance, then Lloyd iterations with
    # re-normalized means (spherical k-means); empty cells re-seed to the
    # farthest point so k stays constant
    rng = np.random.default_rng(seed)
    cents = [unit[int(rng.integers(0, len(unit)))]]
    for _ in range(1, k_eff):
        sims = np.max(unit @ np.asarray(cents).T, axis=1)
        d2 = np.maximum(1.0 - sims, 1e-12) ** 2
        cents.append(unit[int(rng.choice(len(unit), p=d2 / d2.sum()))])
    cents = np.asarray(cents)
    for _ in range(n_iters):
        assign = np.argmax(unit @ cents.T, axis=1)
        for c in range(k_eff):
            members = unit[assign == c]
            if len(members) == 0:
                far = int(np.argmin(np.max(unit @ cents.T, axis=1)))
                cents[c] = unit[far]
                continue
            m = members.mean(axis=0)
            nrm = np.linalg.norm(m)
            cents[c] = m / nrm if nrm > 0 else m
    return cents


def knn_ivf_trained(
    emb: "ray.data.Dataset", query_ids: Sequence[int], k: int = 10,
    n_centroids: int | None = 16, n_probes: int = 4, round_digits: int = 6,
    sample_cap: int = 16384, seed: int = 42,
    centroids: np.ndarray | None = None,
) -> "ray.data.Dataset":
    """IVF top-k with TRAINED coarse cells: vectors assign to their nearest
    k-means centroid (one matmul per batch against the broadcast centroid
    matrix); each query probes its ``n_probes`` nearest cells. Same partial
    top-k / merge machinery as :func:`knn_ivf` — only the cell geometry
    differs, which is what lifts recall on clustered embeddings. With
    ``n_probes >= n_centroids`` every cell is probed and the result is EXACT
    (the driver-oracle configuration). ``n_centroids=None`` applies the
    :func:`auto_n_centroids` corpus-size rule (4·sqrt(n), clamped)."""
    if n_centroids is None:
        n_centroids = auto_n_centroids(emb.count())
        # k-means needs ~tens of training points per centroid (faiss
        # guideline); grow the bounded sample with the auto cell count
        sample_cap = max(sample_cap, 32 * n_centroids)
    if centroids is None:
        centroids = train_centroids(emb, n_centroids, sample_cap, seed=seed)
    if centroids.size == 0:
        return knn_bruteforce(emb, query_ids, k=k, round_digits=round_digits)
    n_probes = min(n_probes, len(centroids))
    q_ids, q_unit = _query_matrix(emb, query_ids)
    q_by_cell: dict = {}
    q_cells = np.argsort(-(q_unit @ centroids.T), axis=1)[:, :n_probes]
    for qid, qv, cells in zip(q_ids, q_unit, q_cells):
        for cell in cells:
            q_by_cell.setdefault(int(cell), []).append((int(qid), qv))
    q_ref = ray.put(q_by_cell)
    cent_ref = ray.put(centroids)

    def assign_cells(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        mat = list_column_to_matrix(batch.column("embedding")).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cells = np.argmax((mat / norms) @ cents.T, axis=1)
        return batch.append_column("bucket", pa.array(cells, pa.int64()))

    bucketed = emb.select_columns(["vec_id", "embedding"]).map_batches(
        assign_cells, batch_format="pyarrow", batch_size=4096
    )
    return _probe_and_merge(bucketed, q_ref, k, round_digits)


def train_pq(
    emb: "ray.data.Dataset", centroids: np.ndarray, m: int = 8,
    n_codes: int = 256, sample_cap: int = 16384, n_iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Product-quantization codebooks over coarse-cell RESIDUALS
    (Jégou et al. 2011): the unit vector minus its nearest coarse centroid,
    split into ``m`` subvectors, each k-means'd to ``n_codes`` codes.
    Training uses the same bounded multiplicative-hash sample as
    :func:`train_centroids` (layout-independent, driver-local, ≤ sample_cap
    rows). Returns ``(m, n_codes_eff, dim/m)`` float64 — a few hundred KB,
    broadcast once."""
    n = emb.count()
    if n == 0 or centroids.size == 0:
        return np.zeros((m, 0, 0), dtype=np.float64)
    keep_below = np.uint32(min(1.0, sample_cap / n) * 0xFFFFFFFF)

    def sample(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.uint64)
        h = (ids * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        return batch.filter(pa.array(h <= keep_below))

    pdf = emb.select_columns(["vec_id", "embedding"]).map_batches(
        sample, batch_format="pyarrow").to_pandas().sort_values("vec_id")
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    resid = unit - centroids[np.argmax(unit @ centroids.T, axis=1)]
    d = resid.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    d_sub = d // m
    k_eff = min(n_codes, len(resid))
    rng = np.random.default_rng(seed)
    books = []
    for s in range(m):
        sub = resid[:, s * d_sub:(s + 1) * d_sub]
        # seeded k-means++ on euclidean distance, then Lloyd iterations
        cents = [sub[int(rng.integers(0, len(sub)))]]
        for _ in range(1, k_eff):
            d2 = np.min(((sub[:, None, :] - np.asarray(cents)[None]) ** 2)
                        .sum(-1), axis=1)
            tot = d2.sum()
            if tot <= 0:
                cents.append(sub[int(rng.integers(0, len(sub)))])
                continue
            cents.append(sub[int(rng.choice(len(sub), p=d2 / tot))])
        cents = np.asarray(cents)
        for _ in range(n_iters):
            assign = np.argmin(((sub[:, None, :] - cents[None]) ** 2).sum(-1),
                               axis=1)
            for c in range(k_eff):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents)
    return np.asarray(books)


def knn_ivf_pq(
    emb: "ray.data.Dataset", query_ids: Sequence[int], k: int = 10,
    n_centroids: int | None = 16, m: int = 8, n_codes: int = 64,
    n_probes: int = 4, rerank: int | None = None, round_digits: int = 6,
    sample_cap: int = 16384, seed: int = 42,
) -> "ray.data.Dataset":
    """IVF-PQ (Jégou et al. 2011) — the extreme-scale path where even one
    float row per vector is too much state: vectors compress to ``m`` uint8
    codes (e.g. 64-dim float32 = 256 B → 8 B), queries scan probed cells via
    ADC table lookups (no per-vector float math), and only the ADC-top
    ``rerank`` candidates per (batch, query) get an exact-cosine rerank —
    the emitted sims are TRUE cosines, so errors are recall-only (a true
    neighbour pruned by ADC), never wrong scores. Approximate by
    construction: no SQL oracle; recall@k vs :func:`knn_bruteforce` is the
    measured contract (bench + tests). ``rerank=None`` → 4k. At 100 TB the
    encode pass runs once and persists (vec_id, cell, codes); this op fuses
    encode+scan for the in-repo benchmark shape."""
    if n_centroids is None:
        n_centroids = auto_n_centroids(emb.count())
        sample_cap = max(sample_cap, 32 * n_centroids)
    rerank = 4 * k if rerank is None else rerank
    centroids = train_centroids(emb, n_centroids, sample_cap, seed=seed)
    if centroids.size == 0:
        return knn_bruteforce(emb, query_ids, k=k, round_digits=round_digits)
    books = train_pq(emb, centroids, m=m, n_codes=n_codes,
                     sample_cap=sample_cap, seed=seed)
    n_probes = min(n_probes, len(centroids))
    q_ids, q_unit = _query_matrix(emb, query_ids)
    q_cells = np.argsort(-(q_unit @ centroids.T), axis=1)[:, :n_probes]
    q_by_cell: dict = {}
    for qi, (qid, cells) in enumerate(zip(q_ids, q_cells)):
        for cell in cells:
            q_by_cell.setdefault(int(cell), []).append(qi)
    # ADC tables: T[qi, cell_rank-independent] — per query, per subspace,
    # per code: q_sub · code. Shape (n_queries, m, n_codes) — tiny; plus the
    # q·centroid term per (query, cell).
    d_sub = q_unit.shape[1] // m
    adc = np.einsum("qsd,scd->qsc",
                    q_unit.reshape(len(q_unit), m, d_sub), books)
    qcent = q_unit @ centroids.T  # (n_queries, n_cells)
    state_ref = ray.put((q_ids, q_unit, q_by_cell, centroids, books, adc,
                         qcent))

    def partial(batch: pa.Table) -> pd.DataFrame:
        (ids_q, qm, by_cell, cents, bks, adc_t, qc) = ray.get(state_ref)
        empty = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                              "neighbor_id": pd.Series(dtype="int64"),
                              "sim": pd.Series(dtype="float64")})
        if len(batch) == 0:
            return empty
        b_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        mat = list_column_to_matrix(batch.column("embedding")).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        cells = np.argmax(unit @ cents.T, axis=1)
        resid = unit - cents[cells]
        codes = np.empty((len(unit), len(bks)), dtype=np.int64)
        ds = unit.shape[1] // len(bks)
        for s in range(len(bks)):
            sub = resid[:, s * ds:(s + 1) * ds]
            codes[:, s] = np.argmin(
                ((sub[:, None, :] - bks[s][None]) ** 2).sum(-1), axis=1)
        frames = []
        for cell in np.unique(cells):
            q_idx = by_cell.get(int(cell))
            if not q_idx:
                continue
            rows = np.nonzero(cells == cell)[0]
            row_codes = codes[rows]  # (n_rows, m)
            ids = b_ids[rows]
            for qi in q_idx:
                # ADC score: q·centroid + Σ_s T[qi, s, code_s]
                score = qc[qi, cell] + adc_t[qi][
                    np.arange(len(bks))[:, None], row_codes.T
                ].sum(axis=0)
                mask = ids != ids_q[qi]
                cand = np.nonzero(mask)[0]
                if len(cand) > rerank:
                    cand = cand[np.argpartition(-score[cand], rerank)[:rerank]]
                # exact rerank of the ADC survivors (batch-local vectors)
                exact = np.round(unit[rows[cand]] @ qm[qi], round_digits)
                order = np.lexsort((ids[cand], -exact))[:k]
                frames.append(pd.DataFrame({
                    "query_id": int(ids_q[qi]),
                    "neighbor_id": ids[cand][order],
                    "sim": exact[order],
                }))
        return pd.concat(frames, ignore_index=True) if frames else empty

    partials = emb.select_columns(["vec_id", "embedding"]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096)
    return _merge_topk(partials, k)


def knn_recall(emb: "ray.data.Dataset", query_ids: Sequence[int], k: int = 10,
               method=None, **ivf_kwargs) -> float:
    """recall@k of an approximate method (default :func:`knn_ivf`; pass
    ``method=knn_ivf_trained`` for the trained quantizer) vs the exact
    brute-force baseline (same ordering rules). The bench harness reports
    this next to the ivf timings."""
    method = method or knn_ivf
    exact = knn_bruteforce(emb, query_ids, k=k).to_pandas()
    approx = method(emb, query_ids, k=k, **ivf_kwargs).to_pandas()
    ex = set(zip(exact["query_id"], exact["neighbor_id"]))
    ap = set(zip(approx["query_id"], approx["neighbor_id"]))
    return len(ex & ap) / len(ex) if ex else 1.0
