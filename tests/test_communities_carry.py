"""Per-component community carry-over (stages/communities.py:
detect_communities_partitioned): content-addressed per-component caching —
unchanged components reuse stored local memberships verbatim, only dirty
components re-run detection, and the global renumbering makes the result a
pure function of the current graph regardless of cache state."""

import pandas as pd
import pytest

from graph_rag_agent_ray.config import KGConfig
from graph_rag_agent_ray.stages import communities as CM


def _edges(*triples):
    return pd.DataFrame(
        [{"src": a, "dst": b, "weight": w} for a, b, w in triples])


@pytest.fixture
def two_component_graph():
    # component 1: a clique {a,b,c} + pendant d; component 2: clique {x,y,z}
    return _edges(
        ("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0), ("c", "d", 1.0),
        ("x", "y", 1.0), ("y", "z", 1.0), ("x", "z", 1.0),
    )


class TestPartitionedDetection:
    def test_matches_whole_graph_final_level(self, two_component_graph):
        cfg = KGConfig()
        whole = CM.detect_communities(two_component_graph, cfg)
        part, parts_pdf, n_car, n_det = CM.detect_communities_partitioned(
            two_component_graph, cfg)
        assert n_car == 0 and n_det == 2
        assert set(whole) == set(part)
        # final-level partition identical (the kg_communities gate)
        def final_partition(ml):
            groups = {}
            for e, levels in ml.items():
                groups.setdefault(levels[-1], set()).add(e)
            return sorted(groups.values(), key=min)
        assert final_partition(whole) == final_partition(part)

    def test_single_component_exact_equality(self):
        cfg = KGConfig()
        g = _edges(("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 1.0),
                   ("d", "a", 1.0), ("a", "c", 1.0))
        whole = CM.detect_communities(g, cfg)
        part, _, _, n_det = CM.detect_communities_partitioned(g, cfg)
        assert n_det == 1
        assert whole == part  # same detection call, same numbering

    def test_full_carry_detects_nothing(self, two_component_graph):
        cfg = KGConfig()
        ml1, parts1, _, _ = CM.detect_communities_partitioned(
            two_component_graph, cfg)
        ml2, parts2, n_car, n_det = CM.detect_communities_partitioned(
            two_component_graph, cfg, carry_parts=parts1)
        assert n_car == 2 and n_det == 0
        assert ml1 == ml2

    def test_dirty_component_redetects_only_itself(self, two_component_graph):
        cfg = KGConfig()
        _, parts1, _, _ = CM.detect_communities_partitioned(
            two_component_graph, cfg)
        # mutate component 2 only (add a node to the x-y-z clique)
        g2 = pd.concat([two_component_graph,
                        _edges(("z", "w", 1.0))], ignore_index=True)
        ml2, _, n_car, n_det = CM.detect_communities_partitioned(
            g2, cfg, carry_parts=parts1)
        assert n_car == 1 and n_det == 1
        # result identical to a fresh (cache-less) partitioned run
        ml_fresh, _, _, _ = CM.detect_communities_partitioned(g2, cfg)
        assert ml2 == ml_fresh

    def test_weight_change_carries_for_unweighted_detector(
            self, two_component_graph):
        # default detector (leiden) runs unweighted: weight-only churn must
        # NOT dirty the component (TODO 20 — weight-insensitive tier)
        cfg = KGConfig()
        ml1, parts1, _, _ = CM.detect_communities_partitioned(
            two_component_graph, cfg)
        g2 = two_component_graph.copy()
        g2.loc[0, "weight"] = 9.0  # a-b weight change, same topology
        ml2, _, n_car, n_det = CM.detect_communities_partitioned(
            g2, cfg, carry_parts=parts1)
        assert n_car == 2 and n_det == 0
        assert ml1 == ml2  # carried result equals the (identical) detection

    def test_weight_change_dirties_component_for_louvain(
            self, two_component_graph):
        # louvain consumes weights: weight churn must re-detect
        cfg = KGConfig(community_algorithm="louvain")
        _, parts1, _, _ = CM.detect_communities_partitioned(
            two_component_graph, cfg)
        g2 = two_component_graph.copy()
        g2.loc[0, "weight"] = 9.0  # a-b weight change, same topology
        ml2, _, n_car, n_det = CM.detect_communities_partitioned(
            g2, cfg, carry_parts=parts1)
        assert n_car == 1 and n_det == 1
        ml_fresh, _, _, _ = CM.detect_communities_partitioned(g2, cfg)
        assert ml2 == ml_fresh

    def test_tiers_share_no_cache_entries(self, two_component_graph):
        # same topology, different algorithm -> disjoint fingerprints
        a = CM.component_fingerprints(two_component_graph, KGConfig())
        b = CM.component_fingerprints(
            two_component_graph, KGConfig(community_algorithm="louvain"))
        assert not (set(a["comp_fp"]) & set(b["comp_fp"]))

    def test_stale_parts_ignored(self, two_component_graph):
        cfg = KGConfig()
        stale = pd.DataFrame({
            "entity_id": ["a", "b"],
            "comp_fp": ["deadbeef", "deadbeef"],
            "levels": [[0], [0]],
        })
        ml, _, n_car, n_det = CM.detect_communities_partitioned(
            two_component_graph, cfg, carry_parts=stale)
        assert n_car == 0 and n_det == 2
        ml_fresh, _, _, _ = CM.detect_communities_partitioned(
            two_component_graph, cfg)
        assert ml == ml_fresh

    def test_empty_graph(self):
        ml, parts, n_car, n_det = CM.detect_communities_partitioned(
            pd.DataFrame(), KGConfig())
        assert ml == {} and len(parts) == 0 and n_car == 0 and n_det == 0

    def test_fingerprint_order_independent(self, two_component_graph):
        cfg = KGConfig()
        a = CM.component_fingerprints(two_component_graph, cfg)
        shuffled = two_component_graph.sample(frac=1.0, random_state=3)
        b = CM.component_fingerprints(shuffled, cfg)
        fa = dict(zip(a["component"], a["comp_fp"]))
        fb = dict(zip(b["component"], b["comp_fp"]))
        assert fa == fb


class TestBuildLevelCarry:
    def test_incremental_tick_carries_unchanged_components(
            self, ray_session, tmp_path):
        """On a disconnected entity graph (intra_p=1.0: planted clusters ARE
        the components), a 1-doc tick re-detects only the touched
        component(s); the rest carry over — and the result still equals a
        fresh build value-exactly."""
        import json

        import pyarrow as pa
        import ray.data as rd

        from graph_rag_agent_ray import build_kg
        from graph_rag_agent_ray import schema as S
        from graph_rag_agent_ray.pipelines.incremental import (
            incremental_build_kg,
            write_registry,
        )
        from graph_rag_agent_ray.synth import generate

        corpus = generate(n_docs=30, seed=5, doc_locality=True, intra_p=1.0)
        docs_v1 = rd.from_arrow(corpus.documents)
        d1 = str(tmp_path / "v1")
        build_kg(docs_v1, d1, input_token="v1")
        write_registry(docs_v1, d1, input_token="v1")

        rows = corpus.documents.to_pylist()
        # grammar-valid new fact: two brand-new entities form their own
        # component, leaving every planted-cluster component untouched
        rows[0]["spans"][0]["text"] += (
            " The organization Zephyrix Corp collaborates with "
            "the technology Quantaflux。")
        v2 = pa.Table.from_pylist(rows, schema=S.DOCUMENTS)
        d2 = str(tmp_path / "v2")
        t_inc, counts = incremental_build_kg(
            rd.from_arrow(v2), d2, d1, input_token="v2")
        assert counts["modified"] == 1

        with open(f"{d2}/_lineage.jsonl") as f:
            louvain = [json.loads(l) for l in f if '"louvain"' in l][-1]
        assert louvain["components_carried"] > 0
        assert louvain["components_detected"] <= 2
        assert (louvain["components_carried"]
                > louvain["components_detected"])

        t_full = build_kg(rd.from_arrow(v2), str(tmp_path / "full"),
                          input_token="v2f")
        a = t_inc["communities"].to_pandas().sort_values(
            "community_id").reset_index(drop=True)
        b = t_full["communities"].to_pandas().sort_values(
            "community_id").reset_index(drop=True)
        import pandas as pd_
        pd_.testing.assert_frame_equal(a, b, check_dtype=False)


class TestParallelDetection:
    def _many_components(self, n=24, seed=5):
        """n disconnected triangle/clique components with varied sizes."""
        import numpy as np
        rng = np.random.default_rng(seed)
        rows = []
        for c in range(n):
            size = int(rng.integers(3, 7))
            nodes = [f"c{c:02d}_n{i}" for i in range(size)]
            for i in range(size):
                for j in range(i + 1, size):
                    if j == i + 1 or rng.random() < 0.5:
                        rows.append((nodes[i], nodes[j],
                                     float(rng.integers(1, 4))))
        return pd.DataFrame(rows, columns=["src", "dst", "weight"])

    def test_parallel_equals_sequential(self, ray_session, monkeypatch):
        """>= _PARALLEL_DETECT_MIN dirty components take the Ray fan-out
        path; forcing the threshold above the count takes the sequential
        path — both must produce identical memberships and parts."""
        g = self._many_components(24)
        cfg = KGConfig()
        par_ml, par_parts, _, n_det_p = CM.detect_communities_partitioned(
            g, cfg)
        assert n_det_p == 24
        monkeypatch.setattr(CM, "_PARALLEL_DETECT_MIN", 10_000)
        seq_ml, seq_parts, _, n_det_s = CM.detect_communities_partitioned(
            g, cfg)
        assert n_det_s == 24
        assert par_ml == seq_ml
        pd.testing.assert_frame_equal(
            par_parts.reset_index(drop=True),
            seq_parts.reset_index(drop=True))

    def test_parallel_path_with_carry(self, ray_session):
        g = self._many_components(20, seed=7)
        cfg = KGConfig()
        _, parts, _, _ = CM.detect_communities_partitioned(g, cfg)
        ml2, _, n_car, n_det = CM.detect_communities_partitioned(
            g, cfg, carry_parts=parts)
        assert n_car == 20 and n_det == 0
        ml1, _, _, _ = CM.detect_communities_partitioned(g, cfg)
        assert ml1 == ml2
