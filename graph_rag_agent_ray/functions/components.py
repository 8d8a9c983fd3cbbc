"""Distributed connected components — min-label propagation + pointer jumping.

The scale path for the union-find steps (SURVEY.md §7.3): the reference runs
WCC inside GDS (/root/reference/graph/processing/similar_entity.py:224-286)
and transitive closure in Cypher (:315-353). Driver-side union-find
(functions/unionfind.py) is used when the candidate-pair set fits the guard;
this module is the unbounded alternative: repeat
``label[v] = min(label[v], min(label[u] for (u,v) in edges))`` as
hash-partitioned shuffles. Each iteration ALSO applies one pointer-jumping
step (``label[v] = label[label[v]]``) so convergence is O(log diameter) —
long alias/near-dup chains cannot outrun the round budget; if the budget is
still exceeded the function raises instead of returning silently wrong
components. All per-bucket work is vectorized pandas merges (no per-node
Python loop)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from .shuffle import hash_partitioned_groupby


def _propagate(labels: "ray.data.Dataset", adj: "ray.data.Dataset",
               n_buckets: int) -> "ray.data.Dataset":
    """One delivery round: each node's current label is delivered along
    ``adj (node, other)`` rows; new label = min(own, delivered). Vectorized:
    group (labels ∪ adj) by node, merge, emit, then a min-reduce by node."""

    def tag(name: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "kind", pa.array([name] * len(batch), pa.string()))
        return fn

    mixed = labels.map_batches(tag("label"), batch_format="pyarrow").union(
        adj.map_batches(tag("adj"), batch_format="pyarrow"))

    def propose(df: pd.DataFrame) -> pd.DataFrame:
        lab = (df.loc[df["kind"] == "label", ["node", "label"]]
               .groupby("node", sort=False)["label"].min().reset_index())
        deliver = (df.loc[df["kind"] == "adj", ["node", "other"]]
                   .merge(lab, on="node")[["other", "label"]]
                   .rename(columns={"other": "node", "label": "candidate"}))
        own = lab.rename(columns={"label": "candidate"})
        return pd.concat([own, deliver], ignore_index=True)

    proposals = hash_partitioned_groupby(mixed, ["node"], propose,
                                         n_buckets=n_buckets)
    return hash_partitioned_groupby(
        proposals, ["node"],
        lambda df: df.groupby("node", sort=False)["candidate"].min()
        .reset_index().rename(columns={"candidate": "label"}),
        n_buckets=n_buckets,
    ).materialize()


def _count_changed(old: "ray.data.Dataset", new: "ray.data.Dataset",
                   n_buckets: int) -> int:
    """Distributed count of label changes (a scalar per round — the label
    table never materializes on the driver)."""

    def tag(name: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "side", pa.array([name] * len(batch), pa.string()))
        return fn

    both = old.map_batches(tag("old"), batch_format="pyarrow").union(
        new.map_batches(tag("new"), batch_format="pyarrow"))

    def count(df: pd.DataFrame) -> pd.DataFrame:
        piv = df.pivot_table(index="node", columns="side", values="label",
                             aggfunc="first")
        n = int((piv.get("old") != piv.get("new")).sum()) if len(piv) else 0
        return pd.DataFrame({"n": [n]})

    total = hash_partitioned_groupby(both, ["node"], count,
                                     n_buckets=n_buckets).sum("n")
    return int(total or 0)


def connected_components(
    pairs: "ray.data.Dataset", max_rounds: int = 20, n_buckets: int = 32
) -> "ray.data.Dataset":
    """(node, component) for every node in ``pairs (a, b)``; component id =
    lexicographically smallest member, matching UnionFind.alias_map.
    Raises RuntimeError if labels have not converged within ``max_rounds``
    (with pointer jumping that bounds reachable diameter at ~2^max_rounds,
    so a raise indicates a bug, not a big graph)."""

    def init_labels(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        return pa.table({
            "node": pa.array(a + b, pa.string()),
            "label": pa.array(a + b, pa.string()),
        })

    labels = hash_partitioned_groupby(
        pairs.map_batches(init_labels, batch_format="pyarrow"),
        ["node"],
        lambda df: df.groupby("node", sort=False)["label"].min().reset_index(),
        n_buckets=n_buckets,
    ).materialize()

    def edge_to_node_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        return pa.table({
            "node": pa.array(a + b, pa.string()),
            "other": pa.array(b + a, pa.string()),
        })

    adj = pairs.map_batches(edge_to_node_rows,
                            batch_format="pyarrow").materialize()

    converged = False
    for _ in range(max_rounds):
        new_labels = _propagate(labels, adj, n_buckets)
        n_changed = _count_changed(labels, new_labels, n_buckets)
        labels = new_labels
        if n_changed == 0:
            converged = True
            break
        # pointer jumping: deliver label[l] to every v labelled l —
        # label[v] := min(label[v], label[label[v]]) halves chain depth
        ptr_adj = labels.map_batches(
            lambda b: pa.table({"node": b.column("label"),
                                "other": b.column("node")}),
            batch_format="pyarrow")
        labels = _propagate(labels, ptr_adj, n_buckets)
    if not converged:
        raise RuntimeError(
            f"connected_components: labels still changing after {max_rounds} "
            "rounds (with pointer jumping) — refusing to return a possibly "
            "wrong partition")

    return labels.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "component": b.column("label")}),
        batch_format="pyarrow",
    )
