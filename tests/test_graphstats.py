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
