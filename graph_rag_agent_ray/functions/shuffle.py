"""Hash-partitioned grouped aggregation — the engine's workhorse shuffle.

``ray.data.Dataset.groupby(...).map_groups(fn)`` invokes ``fn`` once per
GROUP; with millions of distinct keys that is millions of Python calls and
dominates wall-clock. This helper instead partitions by ``hash(key) %
n_buckets`` and invokes a VECTORIZED callable once per BUCKET — the callable
does its own pandas groupby over the (many) keys inside the bucket. Same
semantics, O(n_buckets) task invocations instead of O(n_keys).

Skew note: callers pre-aggregate per batch before this shuffle (map-side
combine), which bounds any hot key's row count to the number of input blocks
— this is the salting strategy the north rule requires for Zipf-skewed
canonicalization keys, applied as combine-then-shuffle rather than an
explicit salt column. Bucket count is the partition fan-out knob: raise it
for bigger clusters (it is the reduce parallelism).
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd

import ray.data

BUCKET_COL = "_bucket"


def hash_partitioned_groupby(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
    n_buckets: int = 64,
    batch_size: int = 16384,
) -> "ray.data.Dataset":
    """Group ``ds`` by ``keys`` with a per-bucket vectorized reducer.

    ``bucket_fn`` receives ALL rows of one hash bucket (multiple complete key
    groups; never a partial group) and must return its aggregated frame. Key
    hashing uses pd.util.hash_pandas_object (stable across processes)."""
    keys = list(keys)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        combined = df[keys[0]].astype(str)
        for k in keys[1:]:
            combined = combined + "\x1f" + df[k].astype(str)
        h = pd.util.hash_pandas_object(combined, index=False)
        df = df.copy()
        df[BUCKET_COL] = (h % n_buckets).astype("int64")
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return bucket_fn(df.drop(columns=[BUCKET_COL]))

    withb = ds.map_batches(add_bucket, batch_format="pandas", batch_size=batch_size)
    return withb.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")


def drop_duplicate_keys(
    ds: "ray.data.Dataset", keys: Sequence[str], n_buckets: int = 32
) -> "ray.data.Dataset":
    """Distributed drop_duplicates on key columns (keeps an arbitrary but
    deterministic-first-after-sort row per key)."""
    keys = list(keys)
    return hash_partitioned_groupby(
        ds, keys,
        lambda df: df.sort_values(keys, kind="stable").drop_duplicates(keys),
        n_buckets=n_buckets,
    )
