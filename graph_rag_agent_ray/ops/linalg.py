"""Distributed linear algebra over embedding columns: exact quantized
Gram/covariance accumulation and PCA projection.

The reference's query stack scores entities by embedding similarity
(``graph/indexing/embedding_manager.py``, ``search/local_search.py``); a
training-data pipeline additionally needs corpus-level second-moment
statistics — whitening / PCA for dimensionality reduction before ANN, and
covariance diagnostics for embedding-drift checks. Both reduce to the Gram
matrix G = X^T X, which is the one distributed step: everything downstream
(eigendecomposition, component selection) happens on the driver over a
d x d matrix.

Scale shape: each batch contributes a LOCAL d x d integer matmul (map-side
combine); only d*(d+1)/2 scalar partial rows per batch move through ONE
bucketed shuffle. No vector leaves its block, nothing corpus-sized reaches
the driver. At 100 TB the partial-row volume is (blocks x d^2), independent
of row count.

Exactness: inputs are quantized to integers (round-half-away at 2^q_bits,
the same rounding DuckDB's round() applies), so the accumulated sums are
INTEGER-exact and hash-stable against the SQL oracle — no float summation
order can perturb them. Per-batch products are bounded by
batch_size * 2^(2*q_bits) (< 2^52 at the defaults, exact in int64); the
cross-batch reduce accumulates as Python ints (unbounded) and verifies the
final sums fit int64, raising instead of wrapping.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.embed import list_column_to_matrix
from ..functions.shuffle import hash_partitioned_groupby

_INT64_MAX = np.iinfo(np.int64).max


def _quantize(x: np.ndarray, scale: int) -> np.ndarray:
    """Round-half-away-from-zero — matches DuckDB's round(), unlike
    np.rint (bankers' rounding), so quantized inputs agree bit-for-bit."""
    return (np.sign(x) * np.floor(np.abs(x) * scale + 0.5)).astype(np.int64)


def gram_matrix(
    ds: "ray.data.Dataset",
    col: str = "embedding",
    q_bits: int = 20,
    n_buckets: int = 8,
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """(i, j, s): upper triangle of the quantized Gram matrix —
    s = sum_rows xq_i * xq_j with xq = round_half_away(x * 2^q_bits).

    Divide by (n * 2^(2*q_bits)) for the second-moment matrix; subtract the
    outer product of the (equally recoverable) quantized mean for the
    covariance. Kept integer so the driver gate is hash-exact.
    """
    scale = 1 << q_bits

    def partial(batch: pa.Table) -> pd.DataFrame:
        if batch.num_rows == 0:
            return pd.DataFrame({"i": pd.Series(dtype="int64"),
                                 "j": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="int64")})
        X = list_column_to_matrix(batch.column(col)).astype(np.float64)
        Xq = _quantize(X, scale)
        G = Xq.T @ Xq
        iu = np.triu_indices(G.shape[0])
        return pd.DataFrame({"i": iu[0].astype("int64"),
                             "j": iu[1].astype("int64"),
                             "s": G[iu]})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size)

    def reduce_exact(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "i" not in df.columns:
            return pd.DataFrame({"i": pd.Series(dtype="int64"),
                                 "j": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="int64")})
        # Python-int accumulation: exact beyond int64, then a fit check
        sums = (df.groupby(["i", "j"], sort=False)["s"]
                .agg(lambda s: sum(int(v) for v in s)))
        if any(abs(v) > _INT64_MAX for v in sums):
            raise OverflowError(
                "gram_matrix sums exceed int64 — lower q_bits for this "
                "corpus size (bound: n_rows * 2^(2*q_bits) <= 2^63)")
        out = sums.reset_index()
        out["s"] = out["s"].astype("int64")
        return out

    return hash_partitioned_groupby(partials, ["i", "j"], reduce_exact,
                                    n_buckets=n_buckets)


def gram_matrix_sql(table: str = "embeddings", col: str = "embedding",
                    id_col: str = "vec_id", q_bits: int = 20) -> str:
    """DuckDB oracle for :func:`gram_matrix` — HUGEINT-exact sums over the
    identically quantized inputs (generate_subscripts pairs positionally
    with unnest, giving (row id, dimension index, value) triples)."""
    scale = 1 << q_bits
    return f"""
WITH flat AS (
  SELECT {id_col} AS rid, generate_subscripts({col}, 1) AS i,
         CAST(round(CAST(unnest({col}) AS DOUBLE) * {scale}.0) AS HUGEINT) AS x
  FROM {table}
)
SELECT CAST(a.i - 1 AS BIGINT) AS i, CAST(b.i - 1 AS BIGINT) AS j,
       CAST(sum(a.x * b.x) AS BIGINT) AS s
FROM flat a JOIN flat b ON a.rid = b.rid AND a.i <= b.i
GROUP BY 1, 2
"""


def pca_components(
    ds: "ray.data.Dataset",
    col: str = "embedding",
    n_components: int = 8,
    q_bits: int = 20,
) -> tuple[np.ndarray, np.ndarray, int]:
    """(components [k x d], eigenvalues [k], n_rows): principal axes of the
    UNcentered second-moment matrix recovered from the distributed integer
    Gram sums. The only driver-side object is the d x d matrix; the corpus
    never leaves the cluster. Deterministic: integer Gram + a fixed sign
    convention (largest-|coord| entry made positive per component)."""
    gram = gram_matrix(ds, col=col, q_bits=q_bits).to_pandas()
    n = ds.count()
    if gram.empty or n == 0:
        return np.zeros((0, 0)), np.zeros(0), 0
    d = int(gram["i"].max()) + 1
    G = np.zeros((d, d), dtype=np.float64)
    G[gram["i"], gram["j"]] = gram["s"]
    G[gram["j"], gram["i"]] = gram["s"]
    M = G / (n * float(1 << (2 * q_bits)))
    vals, vecs = np.linalg.eigh(M)
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T
    # sign convention so the basis is a pure function of the data
    for r in range(comps.shape[0]):
        k = int(np.argmax(np.abs(comps[r])))
        if comps[r, k] < 0:
            comps[r] = -comps[r]
    return comps, vals[order], n


def pca_project(
    ds: "ray.data.Dataset",
    components: np.ndarray,
    col: str = "embedding",
    out_col: str = "pca",
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """Project the embedding column onto driver-computed components — the
    components matrix (k x d, tiny) ships once in the task closure; the
    projection is a per-batch matmul, streaming."""
    comps = np.ascontiguousarray(components, dtype=np.float64)

    def project(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                out_col, pa.array([], pa.list_(pa.float64())))
        X = list_column_to_matrix(batch.column(col)).astype(np.float64)
        P = X @ comps.T
        return batch.append_column(
            out_col, pa.array(list(P), pa.list_(pa.float64())))

    return ds.map_batches(project, batch_format="pyarrow",
                          batch_size=batch_size)
