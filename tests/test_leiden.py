"""Seeded Leiden (functions/leiden.py): resolution-limit behaviour,
determinism, and planted-partition recovery on the synthetic corpus."""

from collections import defaultdict

import numpy as np
import pandas as pd

from graph_rag_agent_ray.functions.leiden import leiden_levels


def ring_of_cliques(n_cliques: int = 12, k: int = 5):
    nodes = [str(i) for i in range(n_cliques * k)]
    edges = []
    for c in range(n_cliques):
        base = c * k
        for i in range(k):
            for j in range(i + 1, k):
                edges.append((base + i, base + j, 1.0))
        edges.append((base, ((c + 1) % n_cliques) * k, 1.0))
    return nodes, edges


class TestLeidenCPM:
    def test_ring_of_cliques_no_resolution_limit(self):
        """The classic trap: modularity-Louvain merges cliques on large
        rings; CPM must keep every clique its own community."""
        nodes, edges = ring_of_cliques()
        final = leiden_levels(nodes, edges, gamma=0.7, seed=42)[-1]
        groups = defaultdict(set)
        for i, c in enumerate(final):
            groups[c].add(i // 5)
        assert len(groups) == 12
        assert all(len(s) == 1 for s in groups.values())

    def test_deterministic_across_runs(self):
        nodes, edges = ring_of_cliques()
        a = leiden_levels(nodes, edges, gamma=0.7, seed=42)
        b = leiden_levels(nodes, edges, gamma=0.7, seed=42)
        assert len(a) == len(b)
        assert all(np.array_equal(x, y) for x, y in zip(a, b))

    def test_modularity_objective(self):
        nodes, edges = ring_of_cliques()
        final = leiden_levels(nodes, edges, gamma=1.0, seed=42,
                              objective="modularity")[-1]
        assert 1 < len(set(final)) <= 60

    def test_empty_and_singleton(self):
        assert len(leiden_levels([], [], seed=1)[-1]) == 0
        assert list(leiden_levels(["a"], [], seed=1)[-1]) == [0]


class TestPlantedRecovery:
    def test_synth_clusters_recovered_exactly(self):
        """The generator plants a partition (synth.CLUSTER_SIZE clusters,
        INTRA_P intra-cluster facts); Leiden-CPM at the default gamma must
        recover it exactly — this property is what the driver's
        kg_communities oracle verifies end-to-end."""
        from graph_rag_agent_ray.config import KGConfig
        from graph_rag_agent_ray.synth import generate

        cfg = KGConfig()
        for n_docs in (60, 200):
            c = generate(n_docs=n_docs, seed=42)
            tr = c.triples_ref.to_pandas()
            pairs = {(min(s, o), max(s, o))
                     for s, o in zip(tr.subj, tr.obj) if s != o}
            nodes = sorted({x for p in pairs for x in p})
            idx = {s: i for i, s in enumerate(nodes)}
            edges = [(idx[a], idx[b], 1.0) for a, b in pairs]
            final = leiden_levels(nodes, edges, gamma=cfg.community_gamma,
                                  seed=cfg.community_seed,
                                  objective=cfg.community_objective)[-1]
            got = defaultdict(set)
            for i, cm in enumerate(final):
                got[cm].add(nodes[i])
            want = defaultdict(set)
            for n in nodes:
                want[c.cluster_of[n]].add(n)
            assert set(map(frozenset, got.values())) == \
                set(map(frozenset, want.values())), n_docs


class TestDetectCommunitiesDispatch:
    def test_leiden_default_and_louvain_option(self):
        from graph_rag_agent_ray.config import KGConfig
        from graph_rag_agent_ray.stages.communities import detect_communities

        edges = pd.DataFrame({
            "src": ["a", "b", "c", "x", "y", "z", "a"],
            "dst": ["b", "c", "a", "y", "z", "x", "x"],
            "weight": [1.0] * 7,
        })
        lev = detect_communities(edges, KGConfig())
        assert set(lev) == {"a", "b", "c", "x", "y", "z"}
        # two triangles joined by one edge → two communities at gamma=0.08?
        # CPM at low gamma may merge them; just require determinism + cover
        lev2 = detect_communities(edges, KGConfig())
        assert lev == lev2
        lou = detect_communities(edges, KGConfig(community_algorithm="louvain"))
        assert set(lou) == set(lev)
