"""Stream-shaped operators over an ordered, partitioned event log.

The reference has no true streaming (SURVEY.md §2.9 — its incremental path is
batch + scheduler), but a large-scale training-data engine needs windowed
aggregation over event logs. Ray Data is a batch/streaming-batch engine with
no event-time watermarks, so windows are expressed per the documented
pattern: partition by key, order by ts within the group, window with pandas
inside a hash-bucket shuffle. Ordering assumption: windows are computed per
(user) partition after an in-group sort — global arrival order is never
relied on. Late data is a re-run concern (the batch recomputes the window),
not a watermark concern.

- tumbling: GROUP BY key, floor(ts / size) — exact SQL oracle.
- sliding: every tumbling hop of ``slide`` contributes to the enclosing
  ``size`` window — exact SQL oracle via hop expansion.
- session: gap-based sessionization (new session when the gap to the previous
  event exceeds ``gap``) — cumulative-sum-over-sorted-group; SQL-expressible
  with window functions (oracle included).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..functions.shuffle import hash_partitioned_groupby


def _epoch_us(series: pd.Series) -> pd.Series:
    return series.astype("datetime64[us]").astype("int64")


def tumbling_window(
    events: "ray.data.Dataset", size_s: int = 3600, key: str = "user_id",
) -> "ray.data.Dataset":
    """(key, window_start_us, n_events, sum_value) per tumbling window."""
    size_us = size_s * 1_000_000

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["window_start_us"] = (_epoch_us(df["ts"]) // size_us) * size_us
        out = (
            df.groupby([key, "window_start_us"], sort=False)
            .agg(n_events=("event_id", "size"), sum_value=("value", "sum"))
            .reset_index()
        )
        out["sum_value"] = out["sum_value"].round(6)  # order-insensitive compare
        return out

    return hash_partitioned_groupby(
        events.select_columns([key, "ts", "event_id", "value"]),
        [key], per_bucket, n_buckets=32,
    )


def sliding_window(
    events: "ray.data.Dataset", size_s: int = 3600, slide_s: int = 900,
    key: str = "user_id",
) -> "ray.data.Dataset":
    """(key, window_start_us, n_events, sum_value) for windows of ``size``
    sliding by ``slide``; each event lands in size/slide windows."""
    assert size_s % slide_s == 0
    size_us, slide_us = size_s * 1_000_000, slide_s * 1_000_000
    hops = size_us // slide_us

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        ts = _epoch_us(df["ts"])
        frames = []
        base_hop = (ts // slide_us) * slide_us
        for i in range(hops):
            w = df.copy()
            w["window_start_us"] = base_hop - i * slide_us
            frames.append(w)
        exploded = pd.concat(frames, ignore_index=True)
        out = (
            exploded.groupby([key, "window_start_us"], sort=False)
            .agg(n_events=("event_id", "size"), sum_value=("value", "sum"))
            .reset_index()
        )
        out["sum_value"] = out["sum_value"].round(6)
        return out

    return hash_partitioned_groupby(
        events.select_columns([key, "ts", "event_id", "value"]),
        [key], per_bucket, n_buckets=32,
    )


def session_window(
    events: "ray.data.Dataset", gap_s: int = 1800, key: str = "user_id",
) -> "ray.data.Dataset":
    """(key, session_start_us, n_events, sum_value, duration_us) — gap-based
    sessions per key (sorted in-group cumulative session ids)."""
    gap_us = gap_s * 1_000_000

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for k, g in df.groupby(key, sort=False):
            g = g.sort_values(["ts", "event_id"], kind="stable").copy()
            ts = _epoch_us(g["ts"]).to_numpy()
            new_session = np.ones(len(g), dtype=bool)
            new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
            g["session_id"] = np.cumsum(new_session)
            agg = g.groupby("session_id", sort=False).agg(
                session_start_us=("ts", lambda s: int(_epoch_us(s).min())),
                session_end_us=("ts", lambda s: int(_epoch_us(s).max())),
                n_events=("event_id", "size"),
                sum_value=("value", "sum"),
            ).reset_index(drop=True)
            agg[key] = k
            frames.append(agg)
        out = pd.concat(frames, ignore_index=True)
        out["sum_value"] = out["sum_value"].round(6)
        out["duration_us"] = out["session_end_us"] - out["session_start_us"]
        return out[[key, "session_start_us", "session_end_us",
                    "n_events", "sum_value", "duration_us"]]

    return hash_partitioned_groupby(
        events.select_columns([key, "ts", "event_id", "value"]),
        [key], per_bucket, n_buckets=32,
    )
