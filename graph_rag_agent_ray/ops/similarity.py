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

import ray
import ray.data

from ..functions.embed import list_column_to_matrix, lsh_bucket


def _query_matrix(emb: "ray.data.Dataset", query_ids: Sequence[int]):
    qset = set(int(q) for q in query_ids)
    q_ref = ray.put(qset)

    def keep(batch: pa.Table) -> pa.Table:
        ids = ray.get(q_ref)
        mask = pa.array([v in ids for v in batch.column("vec_id").to_pylist()])
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
    n_bits: int = 4, seed: int = 42, round_digits: int = 6,
) -> "ray.data.Dataset":
    """Approximate top-k: vectors bucketed by random-projection LSH
    (2^n_bits coarse cells); each query searched only within its cell. The
    100 TB path — the scan becomes a groupby(bucket) instead of all-pairs."""
    q_ids, q_unit = _query_matrix(emb, query_ids)
    q_buckets = lsh_bucket(q_unit.astype(np.float32), n_bits, seed)
    q_by_bucket = {}
    for qid, qv, qb in zip(q_ids, q_unit, q_buckets):
        q_by_bucket.setdefault(int(qb), []).append((int(qid), qv))
    q_ref = ray.put(q_by_bucket)

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = list_column_to_matrix(batch.column("embedding")).astype(np.float32)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        buckets = lsh_bucket(mat / norms, n_bits, seed)
        return batch.append_column("bucket", pa.array(buckets, pa.int64()))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        by_bucket = ray.get(q_ref)
        bucket = int(group["bucket"].iloc[0])
        queries = by_bucket.get(bucket, [])
        if not queries:
            return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                 "neighbor_id": pd.Series(dtype="int64"),
                                 "rank": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        b_ids = group["vec_id"].to_numpy(dtype=np.int64)
        b_mat = np.array(group["embedding"].tolist(), dtype=np.float64)
        b_norms = np.linalg.norm(b_mat, axis=1)
        b_norms[b_norms == 0] = 1.0
        unit = b_mat / b_norms[:, None]
        frames = []
        for qid, qv in queries:
            sims = np.round(unit @ qv, round_digits)
            mask = b_ids != qid
            order = np.lexsort((b_ids[mask], -sims[mask]))[:k]
            sel_ids, sel_sims = b_ids[mask][order], sims[mask][order]
            frames.append(pd.DataFrame({
                "query_id": qid, "neighbor_id": sel_ids,
                "rank": np.arange(1, len(sel_ids) + 1, dtype=np.int64),
                "sim": sel_sims,
            }))
        return pd.concat(frames, ignore_index=True)

    bucketed = emb.select_columns(["vec_id", "embedding"]).map_batches(
        bucketize, batch_format="pyarrow", batch_size=4096
    )
    return bucketed.groupby("bucket").map_groups(per_bucket, batch_format="pandas")
