"""Graph metrics: degree histogram + degree-oriented triangle counting."""

import pandas as pd
import pyarrow as pa
import pytest


def _edges(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "src": pa.array([r[0] for r in rows], pa.string()),
        "dst": pa.array([r[1] for r in rows], pa.string()),
    }))


class TestDegreeDistribution:
    def test_small_graph(self, ray_session):
        from graph_rag_agent_ray.ops.graphstats import degree_distribution
        # triangle a-b-c plus pendant d on a; duplicate + reversed +
        # self-loop edges must collapse
        ds = _edges([("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"),
                     ("a", "d"), ("c", "c")])
        out = (degree_distribution(ds).to_pandas()
               .sort_values("degree").reset_index(drop=True))
        # degrees: a=3, b=2, c=2, d=1 -> hist {1:1, 2:2, 3:1}
        assert dict(zip(out["degree"], out["n_nodes"])) == {1: 1, 2: 2, 3: 1}


class TestTriangleCount:
    def test_known_counts(self, ray_session):
        from graph_rag_agent_ray.ops.graphstats import triangle_count
        # K4 has 4 triangles; extra pendant edge adds none
        k4 = [(a, b) for i, a in enumerate("wxyz") for b in "wxyz"[i + 1:]]
        ds = _edges(k4 + [("w", "p")])
        n = triangle_count(ds).to_pandas()["n_triangles"].iloc[0]
        assert n == 4

    def test_no_triangles(self, ray_session):
        from graph_rag_agent_ray.ops.graphstats import triangle_count
        ds = _edges([("a", "b"), ("b", "c"), ("c", "d")])  # path
        assert triangle_count(ds).to_pandas()["n_triangles"].iloc[0] == 0

    def test_matches_bruteforce_random(self, ray_session):
        import itertools
        import numpy as np
        from graph_rag_agent_ray.ops.graphstats import triangle_count
        rng = np.random.default_rng(5)
        nodes = [f"n{i}" for i in range(24)]
        rows = [(a, b) for a, b in itertools.combinations(nodes, 2)
                if rng.random() < 0.25]
        adj = set(rows)
        brute = sum(
            1 for x, y, z in itertools.combinations(nodes, 3)
            if ((x, y) in adj) and ((y, z) in adj) and ((x, z) in adj))
        got = triangle_count(_edges(rows)).to_pandas()["n_triangles"].iloc[0]
        assert got == brute


class TestKgGraphOracles:
    def test_degree_and_triangles_vs_duckdb(self, ray_session, tmp_path):
        """The driver-query shape: Ray metrics over an edge table vs the
        SQL oracles over the same table written to parquet."""
        import duckdb
        import numpy as np
        import pyarrow.parquet as pq
        from graph_rag_agent_ray.ops.graphstats import (
            degree_distribution,
            degree_distribution_sql,
            triangle_count,
            triangle_count_sql,
        )

        rng = np.random.default_rng(11)
        n = 40
        src, dst = [], []
        for i in range(n):
            for j in range(i + 1, n):
                if rng.random() < 0.15:
                    # mixed orientation + occasional duplicate
                    if rng.random() < 0.5:
                        src.append(f"e{i}"); dst.append(f"e{j}")
                    else:
                        src.append(f"e{j}"); dst.append(f"e{i}")
                    if rng.random() < 0.1:
                        src.append(f"e{i}"); dst.append(f"e{j}")
        tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst),
                        "pred": pa.array(["r"] * len(src)),
                        "weight": pa.array([1.0] * len(src))})
        path = str(tmp_path / "edges.parquet")
        pq.write_table(tbl, path)
        import ray.data as rd
        ds = rd.from_arrow(tbl)
        con = duckdb.connect()

        got_deg = (degree_distribution(ds).to_pandas()
                   .sort_values("degree").reset_index(drop=True))
        want_deg = (con.execute(degree_distribution_sql(path)).df()
                    .sort_values("degree").reset_index(drop=True))
        pd.testing.assert_frame_equal(got_deg, want_deg, check_dtype=False)

        got_tri = triangle_count(ds).to_pandas()["n_triangles"].iloc[0]
        want_tri = con.execute(triangle_count_sql(path)).df()[
            "n_triangles"].iloc[0]
        assert got_tri == want_tri


class TestPageRank:
    def test_matches_dense_power_iteration(self, ray_session):
        """Exact match (at the ppb grid) against a dense numpy power
        iteration with the identical truncation."""
        import numpy as np
        from graph_rag_agent_ray.ops.graphstats import pagerank

        rng = np.random.default_rng(7)
        n = 30
        rows = [(f"n{i}", f"n{j}") for i in range(n) for j in range(i + 1, n)
                if rng.random() < 0.2]
        out = pagerank(_edges(rows), iters=20).to_pandas()

        nodes = sorted({x for r in rows for x in r})
        idx = {v: i for i, v in enumerate(nodes)}
        A = np.zeros((len(nodes), len(nodes)))
        for a, b in set(rows):
            A[idx[a], idx[b]] = 1.0
            A[idx[b], idx[a]] = 1.0
        deg = A.sum(axis=1)
        r = np.full(len(nodes), 1.0 / len(nodes))
        for _ in range(20):
            r = (1 - 0.85) / len(nodes) + 0.85 * (A.T @ (r / deg))
        want = {v: int(np.rint(r[i] * 1e9)) for v, i in idx.items()}
        got = dict(zip(out["node"], out["pr_ppb"]))
        assert got == want

    def test_truncation_converges(self, ray_session):
        """60 truncated iterations sit within 1e-8 of the CONVERGED
        PageRank (the reference's nx.pagerank measure, kg_builder.py:294;
        nx itself needs scipy, absent here, so the converged baseline is a
        500-step dense power iteration — far past the 0.85^k residual)."""
        import numpy as np
        from graph_rag_agent_ray.ops.graphstats import pagerank

        rng = np.random.default_rng(3)
        rows = [(f"e{i}", f"e{j}") for i in range(25) for j in range(i + 1, 25)
                if rng.random() < 0.25]
        out = pagerank(_edges(rows), iters=60).to_pandas()

        nodes = sorted({x for r in rows for x in r})
        idx = {v: i for i, v in enumerate(nodes)}
        A = np.zeros((len(nodes), len(nodes)))
        for a, b in set(rows):
            A[idx[a], idx[b]] = 1.0
            A[idx[b], idx[a]] = 1.0
        deg = A.sum(axis=1)
        r = np.full(len(nodes), 1.0 / len(nodes))
        for _ in range(500):
            r = (1 - 0.85) / len(nodes) + 0.85 * (A.T @ (r / deg))
        for _, row in out.iterrows():
            assert abs(row["pr_ppb"] / 1e9 - r[idx[row["node"]]]) < 1e-8

    def test_vs_duckdb_oracle(self, ray_session, tmp_path):
        """Driver-query shape: hash-exact ppb surrogates vs the unrolled
        SQL oracle, with a margin check on the rounding grid."""
        import duckdb
        import numpy as np
        import pyarrow.parquet as pq
        from graph_rag_agent_ray.ops.graphstats import pagerank, pagerank_sql

        rng = np.random.default_rng(13)
        src, dst = [], []
        for i in range(35):
            for j in range(i + 1, 35):
                if rng.random() < 0.18:
                    src.append(f"e{j}"); dst.append(f"e{i}")
        tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst),
                        "pred": pa.array(["r"] * len(src)),
                        "weight": pa.array([1.0] * len(src))})
        path = str(tmp_path / "edges.parquet")
        pq.write_table(tbl, path)
        import ray.data as rd

        got = (pagerank(rd.from_arrow(tbl)).to_pandas()
               .sort_values("node").reset_index(drop=True))
        want = (duckdb.connect().execute(pagerank_sql(path)).df()
                .sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestWeaklyConnected:
    def test_components_vs_oracle(self, ray_session, tmp_path):
        import duckdb
        import numpy as np
        import pyarrow.parquet as pq
        from graph_rag_agent_ray.ops.graphstats import (
            weakly_connected, weakly_connected_sql)

        # two clusters + an isolated edge + noise orientation/dups
        rows = [("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
                ("b1", "b2"), ("b2", "b3"),
                ("c1", "c2"), ("a2", "a1"), ("b3", "b3")]
        tbl = pa.table({"src": pa.array([r[0] for r in rows]),
                        "dst": pa.array([r[1] for r in rows]),
                        "pred": pa.array(["r"] * len(rows)),
                        "weight": pa.array([1.0] * len(rows))})
        path = str(tmp_path / "edges.parquet")
        pq.write_table(tbl, path)
        import ray.data as rd
        got = (weakly_connected(rd.from_arrow(tbl)).to_pandas()
               .sort_values("node").reset_index(drop=True))
        want = (duckdb.connect().execute(weakly_connected_sql(path)).df()
                .sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert dict(zip(got["node"], got["component"]))["a3"] == "a1"
        assert dict(zip(got["node"], got["component"]))["b3"] == "b1"


class TestKCore:
    def _nx_kcore(self, rows, k):
        """Reference peel in plain python: returns {node: core_degree}."""
        adj = {}
        for a, b in rows:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        changed = True
        while changed:
            changed = False
            for n in [n for n, nb in adj.items() if len(nb) < k]:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
        return {n: len(nb) for n, nb in adj.items()}

    def test_known_graph(self, ray_session):
        from graph_rag_agent_ray.ops.graphstats import kcore
        # K4 core survives k=3; the tail chain peels away entirely
        k4 = [(a, b) for i, a in enumerate("wxyz") for b in "wxyz"[i + 1:]]
        chain = [("w", "p"), ("p", "q"), ("q", "r")]
        got = kcore(_edges(k4 + chain), k=3).to_pandas()
        assert dict(zip(got["node"], got["core_deg"])) == {
            "w": 3, "x": 3, "y": 3, "z": 3}

    def test_empty_core(self, ray_session):
        from graph_rag_agent_ray.ops.graphstats import kcore
        got = kcore(_edges([("a", "b"), ("b", "c")]), k=2).to_pandas()
        assert len(got) == 0

    def test_matches_reference_peel_random(self, ray_session):
        import itertools
        import numpy as np
        from graph_rag_agent_ray.ops.graphstats import kcore
        rng = np.random.default_rng(17)
        nodes = [f"n{i}" for i in range(30)]
        rows = [(a, b) for a, b in itertools.combinations(nodes, 2)
                if rng.random() < 0.12]
        got = kcore(_edges(rows), k=3).to_pandas()
        want = self._nx_kcore(rows, 3)
        assert dict(zip(got["node"], got["core_deg"])) == want

    def test_vs_duckdb_oracle(self, ray_session, tmp_path):
        import duckdb
        import numpy as np
        import pyarrow.parquet as pq
        from graph_rag_agent_ray.ops.graphstats import kcore, kcore_sql

        rng = np.random.default_rng(23)
        src, dst = [], []
        for i in range(28):
            for j in range(i + 1, 28):
                if rng.random() < 0.15:
                    src.append(f"e{j}"); dst.append(f"e{i}")
        tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst),
                        "pred": pa.array(["r"] * len(src)),
                        "weight": pa.array([1.0] * len(src))})
        path = str(tmp_path / "edges.parquet")
        pq.write_table(tbl, path)
        import ray.data as rd
        got = (kcore(rd.from_arrow(tbl), k=3).to_pandas()
               .sort_values("node").reset_index(drop=True))
        want = (duckdb.connect().execute(kcore_sql(path, k=3)).df()
                .sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestPersonalizedPageRank:
    def test_matches_dense_power_iteration(self, ray_session):
        """Exact match (at the ppb grid) against a dense numpy PPR with
        the identical truncation and seed set (n_seeds smallest ids)."""
        import numpy as np
        from graph_rag_agent_ray.ops.graphstats import personalized_pagerank

        rng = np.random.default_rng(11)
        n = 28
        rows = [(f"n{i:02d}", f"n{j:02d}") for i in range(n)
                for j in range(i + 1, n) if rng.random() < 0.2]
        out = personalized_pagerank(_edges(rows), n_seeds=3,
                                    iters=20).to_pandas()

        nodes = sorted({x for r in rows for x in r})
        idx = {v: i for i, v in enumerate(nodes)}
        A = np.zeros((len(nodes), len(nodes)))
        for a, b in set(rows):
            A[idx[a], idx[b]] = 1.0
            A[idx[b], idx[a]] = 1.0
        deg = A.sum(axis=1)
        seeds = nodes[:3]
        s = np.zeros(len(nodes))
        for v in seeds:
            s[idx[v]] = 1.0 / len(seeds)
        r = s.copy()
        for _ in range(20):
            r = (1 - 0.85) * s + 0.85 * (A.T @ (r / deg))
        want = {v: int(np.rint(r[i] * 1e9)) for v, i in idx.items()}
        got = dict(zip(out["node"], out["ppr_ppb"]))
        assert got == want

    def test_mass_concentrates_near_seeds(self, ray_session):
        """On a barbell (two cliques joined by one bridge), seeding in
        clique A must rank every A node above every non-bridge B node."""
        from graph_rag_agent_ray.ops.graphstats import personalized_pagerank
        import itertools

        a = [f"a{i}" for i in range(5)]
        b = [f"b{i}" for i in range(5)]
        rows = (list(itertools.combinations(a, 2))
                + list(itertools.combinations(b, 2))
                + [("a0", "b0")])
        out = personalized_pagerank(_edges(rows), n_seeds=3,
                                    iters=40).to_pandas()
        score = dict(zip(out["node"], out["ppr_ppb"]))
        assert min(score[x] for x in a) > max(score[x] for x in b[1:])

    def test_vs_duckdb_oracle(self, ray_session, tmp_path):
        import duckdb
        import numpy as np
        import pyarrow.parquet as pq
        from graph_rag_agent_ray.ops.graphstats import (
            personalized_pagerank, personalized_pagerank_sql)

        rng = np.random.default_rng(17)
        src, dst = [], []
        for i in range(32):
            for j in range(i + 1, 32):
                if rng.random() < 0.17:
                    src.append(f"e{j:02d}"); dst.append(f"e{i:02d}")
        tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst),
                        "pred": pa.array(["r"] * len(src)),
                        "weight": pa.array([1.0] * len(src))})
        path = str(tmp_path / "edges.parquet")
        pq.write_table(tbl, path)
        import ray.data as rd
        got = (personalized_pagerank(rd.from_arrow(tbl)).to_pandas()
               .sort_values("node").reset_index(drop=True))
        want = (duckdb.connect().execute(
            personalized_pagerank_sql(path)).df()
            .sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestLandmarkHarmonic:
    def _bfs_truth(self, rows, n_landmarks, iters):
        """Dense BFS reference with the identical truncation + units."""
        from graph_rag_agent_ray.ops.graphstats import _lcm_upto
        from collections import deque
        adj = {}
        for a, b in rows:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        landmarks = sorted(adj)[:n_landmarks]
        unit = _lcm_upto(iters)
        harm = {}
        for lm in landmarks:
            dist = {lm: 0}
            q = deque([lm])
            while q:
                u = q.popleft()
                if dist[u] >= iters:
                    continue
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        q.append(v)
            for v, d in dist.items():
                harm[v] = harm.get(v, 0) + (unit // d if d > 0 else 0)
        return harm

    def test_matches_bfs(self, ray_session):
        import numpy as np
        from graph_rag_agent_ray.ops.graphstats import landmark_harmonic

        rng = np.random.default_rng(29)
        n = 26
        rows = [(f"n{i:02d}", f"n{j:02d}") for i in range(n)
                for j in range(i + 1, n) if rng.random() < 0.12]
        got = landmark_harmonic(_edges(rows), n_landmarks=3,
                                iters=8).to_pandas()
        want = self._bfs_truth(rows, 3, 8)
        assert dict(zip(got["node"], got["harm_units"])) == want

    def test_truncation_cuts_far_nodes(self, ray_session):
        """A 6-hop path with iters=3: nodes beyond 3 hops from the single
        landmark get harm_units 0 contribution (absent or zero)."""
        from graph_rag_agent_ray.ops.graphstats import (
            landmark_harmonic, _lcm_upto)

        rows = [(f"p{i}", f"p{i+1}") for i in range(6)]
        got = landmark_harmonic(_edges(rows), n_landmarks=1,
                                iters=3).to_pandas()
        score = dict(zip(got["node"], got["harm_units"]))
        unit = _lcm_upto(3)
        # landmark p0: p1 at 1, p2 at 2, p3 at 3; p4..p6 unreached
        assert score["p1"] == unit
        assert score["p2"] == unit // 2
        assert score["p3"] == unit // 3
        for far in ("p4", "p5", "p6"):
            assert score.get(far, 0) == 0

    def test_vs_duckdb_oracle(self, ray_session, tmp_path):
        import duckdb
        import numpy as np
        import pyarrow.parquet as pq
        from graph_rag_agent_ray.ops.graphstats import (
            landmark_harmonic, landmark_harmonic_sql)

        rng = np.random.default_rng(31)
        src, dst = [], []
        for i in range(30):
            for j in range(i + 1, 30):
                if rng.random() < 0.1:
                    src.append(f"e{j:02d}"); dst.append(f"e{i:02d}")
        tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst),
                        "pred": pa.array(["r"] * len(src)),
                        "weight": pa.array([1.0] * len(src))})
        path = str(tmp_path / "edges.parquet")
        pq.write_table(tbl, path)
        import ray.data as rd
        got = (landmark_harmonic(rd.from_arrow(tbl)).to_pandas()
               .sort_values("node").reset_index(drop=True))
        want = (duckdb.connect().execute(
            landmark_harmonic_sql(path)).df()
            .sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestPprExplicitSeeds:
    def test_explicit_seeds_shift_mass(self, ray_session):
        """Seeding clique B (instead of the default smallest-id clique A)
        must flip the ranking on a barbell graph — the query-personalized
        path local search uses."""
        from graph_rag_agent_ray.ops.graphstats import personalized_pagerank
        import itertools

        a = [f"a{i}" for i in range(5)]
        b = [f"b{i}" for i in range(5)]
        rows = (list(itertools.combinations(a, 2))
                + list(itertools.combinations(b, 2))
                + [("a0", "b0")])
        out = personalized_pagerank(
            _edges(rows), iters=40, seeds=["b1", "b2", "b3"]).to_pandas()
        score = dict(zip(out["node"], out["ppr_ppb"]))
        assert min(score[x] for x in b) > max(score[x] for x in a[1:])

    def test_empty_seed_list_raises(self, ray_session):
        from graph_rag_agent_ray.ops.graphstats import personalized_pagerank
        with pytest.raises(ValueError):
            personalized_pagerank(_edges([("x", "y")]), seeds=[])


class TestLocalGuardEquivalence:
    """The driver-local fast path (below local_guard_edges) must be
    value-identical to the distributed loop — same truncation, same ppb."""

    def _graph(self, seed, n=30, p=0.15):
        import numpy as np
        rng = np.random.default_rng(seed)
        return [(f"g{i:02d}", f"g{j:02d}") for i in range(n)
                for j in range(i + 1, n) if rng.random() < p]

    def test_pagerank_paths_agree(self, ray_session):
        from graph_rag_agent_ray.ops.graphstats import pagerank
        rows = self._graph(43)
        local = (pagerank(_edges(rows), iters=20).to_pandas()
                 .sort_values("node").reset_index(drop=True))
        dist = (pagerank(_edges(rows), iters=20, local_guard_edges=0)
                .to_pandas().sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(local, dist, check_dtype=False)

    def test_ppr_paths_agree(self, ray_session):
        from graph_rag_agent_ray.ops.graphstats import personalized_pagerank
        rows = self._graph(47)
        local = (personalized_pagerank(_edges(rows), iters=15).to_pandas()
                 .sort_values("node").reset_index(drop=True))
        dist = (personalized_pagerank(_edges(rows), iters=15,
                                      local_guard_edges=0)
                .to_pandas().sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(local, dist, check_dtype=False)

    def test_ppr_explicit_seed_paths_agree(self, ray_session):
        from graph_rag_agent_ray.ops.graphstats import personalized_pagerank
        rows = self._graph(53)
        seeds = ["g05", "g11", "not-in-graph"]
        local = (personalized_pagerank(_edges(rows), iters=15, seeds=seeds)
                 .to_pandas().sort_values("node").reset_index(drop=True))
        dist = (personalized_pagerank(_edges(rows), iters=15, seeds=seeds,
                                      local_guard_edges=0)
                .to_pandas().sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(local, dist, check_dtype=False)


class TestHarmonicLocalGuard:
    def test_paths_agree(self, ray_session):
        import numpy as np
        from graph_rag_agent_ray.ops.graphstats import landmark_harmonic
        rng = np.random.default_rng(59)
        rows = [(f"h{i:02d}", f"h{j:02d}") for i in range(28)
                for j in range(i + 1, 28) if rng.random() < 0.1]
        local = (landmark_harmonic(_edges(rows), iters=8).to_pandas()
                 .sort_values("node").reset_index(drop=True))
        dist = (landmark_harmonic(_edges(rows), iters=8,
                                  local_guard_edges=0)
                .to_pandas().sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(local, dist, check_dtype=False)

    def test_paths_agree_with_truncation(self, ray_session):
        """A long path graph exercises the truncated/unreached support
        semantics on both paths."""
        from graph_rag_agent_ray.ops.graphstats import landmark_harmonic
        rows = [(f"q{i:02d}", f"q{i+1:02d}") for i in range(12)]
        local = (landmark_harmonic(_edges(rows), n_landmarks=2, iters=4)
                 .to_pandas().sort_values("node").reset_index(drop=True))
        dist = (landmark_harmonic(_edges(rows), n_landmarks=2, iters=4,
                                  local_guard_edges=0)
                .to_pandas().sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(local, dist, check_dtype=False)


class TestLocalGuardsTriWccKcore:
    """Driver-local fast paths for the remaining graph ops must equal the
    distributed loops exactly."""

    def _graph(self, seed, n=32, p=0.13):
        import numpy as np
        rng = np.random.default_rng(seed)
        return [(f"v{i:02d}", f"v{j:02d}") for i in range(n)
                for j in range(i + 1, n) if rng.random() < p]

    def test_triangles_paths_agree(self, ray_session):
        from graph_rag_agent_ray.ops.graphstats import triangle_count
        rows = self._graph(61)
        local = triangle_count(_edges(rows)).to_pandas()
        dist = triangle_count(_edges(rows),
                              local_guard_edges=0).to_pandas()
        assert local["n_triangles"].iloc[0] == dist["n_triangles"].iloc[0]

    def test_wcc_paths_agree(self, ray_session):
        from graph_rag_agent_ray.ops.graphstats import weakly_connected
        # two clusters + isolated edge + dup/reversed/self-loop noise
        rows = (self._graph(67, n=14, p=0.3)
                + [("z1", "z2"), ("z2", "z1"), ("z3", "z3"), ("y1", "y2")])
        local = (weakly_connected(_edges(rows)).to_pandas()
                 .sort_values("node").reset_index(drop=True))
        dist = (weakly_connected(_edges(rows), local_guard_edges=0)
                .to_pandas().sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(local, dist, check_dtype=False)

    def test_kcore_paths_agree(self, ray_session):
        from graph_rag_agent_ray.ops.graphstats import kcore
        for seed, k in ((71, 2), (73, 3), (79, 4)):
            rows = self._graph(seed)
            local = kcore(_edges(rows), k=k).to_pandas()
            dist = kcore(_edges(rows), k=k,
                         local_guard_edges=0).to_pandas()
            if local.empty or dist.empty:
                # a fully peeled graph yields an empty (column-less)
                # frame on both paths — emptiness equality is the check
                assert local.empty and dist.empty
                continue
            pd.testing.assert_frame_equal(
                local.sort_values("node").reset_index(drop=True),
                dist.sort_values("node").reset_index(drop=True),
                check_dtype=False)

    def test_kcore_local_peels_pendants(self, ray_session):
        """Triangle + pendant chain: 2-core is exactly the triangle."""
        from graph_rag_agent_ray.ops.graphstats import kcore
        rows = [("a", "b"), ("b", "c"), ("a", "c"),
                ("c", "d"), ("d", "e")]
        out = kcore(_edges(rows), k=2).to_pandas()
        assert set(out["node"]) == {"a", "b", "c"}
        assert (out["core_deg"] == 2).all()
