"""Distributed connected components — iterative min-label propagation.

The scale path for the union-find steps (SURVEY.md §7.3): the reference runs
WCC inside GDS (/root/reference/graph/processing/similar_entity.py:224-286)
and transitive closure in Cypher (:315-353). Driver-side union-find
(functions/unionfind.py) is used when the candidate-pair set fits the guard;
this module is the unbounded alternative: repeat
``label[v] = min(label[v], min(label[u] for (u,v) in edges))`` as
hash-partitioned shuffles until a fixpoint. Converges in O(diameter) rounds;
near-duplicate clusters have tiny diameters, so a handful of rounds suffice.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from .shuffle import hash_partitioned_groupby


def connected_components(
    pairs: "ray.data.Dataset", max_rounds: int = 20, n_buckets: int = 32
) -> "ray.data.Dataset":
    """(node, component) for every node in ``pairs (a, b)``; component id =
    lexicographically smallest member, matching UnionFind.alias_map."""
    # initial labels: every node labels itself; every edge proposes the
    # neighbour's label in both directions
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
    edges = pairs.materialize()

    for _ in range(max_rounds):
        # join labels onto both edge endpoints, propose min across the edge
        label_pdf_small = None
        # distributed join: tag label rows and edge rows, shuffle by node
        def edge_to_node_rows(batch: pa.Table) -> pa.Table:
            a = batch.column("a").to_pylist()
            b = batch.column("b").to_pylist()
            # one row per endpoint carrying the opposite endpoint
            return pa.table({
                "node": pa.array(a + b, pa.string()),
                "other": pa.array(b + a, pa.string()),
            })

        adj = edges.map_batches(edge_to_node_rows, batch_format="pyarrow")

        def tag(name):
            def fn(batch: pa.Table) -> pa.Table:
                return batch.append_column(
                    "kind", pa.array([name] * len(batch), pa.string()))
            return fn

        # phase 1: deliver each node's current label to its neighbours —
        # group (labels ∪ adjacency) by node, emit (other, candidate_label)
        mixed = labels.map_batches(tag("label"), batch_format="pyarrow").union(
            adj.map_batches(tag("adj"), batch_format="pyarrow")
        )

        def propose(df: pd.DataFrame) -> pd.DataFrame:
            out = []
            for node, g in df.groupby("node", sort=False):
                lab = g.loc[g["kind"] == "label", "label"]
                if lab.empty:
                    continue
                lab = lab.min()
                others = g.loc[g["kind"] == "adj", "other"]
                out.append(pd.DataFrame({
                    "node": [node] + others.tolist(),
                    "candidate": [lab] * (1 + len(others)),
                }))
            if not out:
                return pd.DataFrame({"node": pd.Series(dtype=object),
                                     "candidate": pd.Series(dtype=object)})
            return pd.concat(out, ignore_index=True)

        proposals = hash_partitioned_groupby(mixed, ["node"], propose,
                                             n_buckets=n_buckets)

        # phase 2: per node, new label = min(candidates)
        new_labels = hash_partitioned_groupby(
            proposals, ["node"],
            lambda df: df.groupby("node", sort=False)["candidate"].min()
            .reset_index().rename(columns={"candidate": "label"}),
            n_buckets=n_buckets,
        ).materialize()

        # convergence: distributed count of changed labels (a scalar per
        # round — never materializes the label table on the driver)
        def tag2(name):
            def fn(batch: pa.Table) -> pa.Table:
                return batch.append_column(
                    "side", pa.array([name] * len(batch), pa.string()))
            return fn

        both = labels.map_batches(tag2("old"), batch_format="pyarrow").union(
            new_labels.map_batches(tag2("new"), batch_format="pyarrow"))

        def count_changed(df: pd.DataFrame) -> pd.DataFrame:
            piv = df.pivot_table(index="node", columns="side", values="label",
                                 aggfunc="first")
            n = int((piv.get("old") != piv.get("new")).sum()) if len(piv) else 0
            return pd.DataFrame({"n": [n]})

        n_changed = hash_partitioned_groupby(
            both, ["node"], count_changed, n_buckets=n_buckets
        ).sum("n")
        labels = new_labels
        if not n_changed:
            break

    return labels.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "component": b.column("label")}),
        batch_format="pyarrow",
    )
