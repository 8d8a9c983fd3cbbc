"""Distributed Gram matrix (integer-exact) + PCA projection."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _emb_ds(X):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(X)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in X],
                              pa.list_(pa.float32())),
    }))


class TestGramMatrix:
    def test_matches_numpy_exactly(self, ray_session):
        from graph_rag_agent_ray.ops.linalg import gram_matrix, _quantize
        rng = np.random.default_rng(2)
        X32 = rng.normal(size=(150, 12)).astype(np.float32)
        out = gram_matrix(_emb_ds(X32), q_bits=20).to_pandas()
        Xq = _quantize(X32.astype(np.float64), 1 << 20)
        G = Xq.T @ Xq
        got = {(r.i, r.j): r.s for r in out.itertuples()}
        iu = np.triu_indices(12)
        want = {(int(i), int(j)): int(G[i, j]) for i, j in zip(*iu)}
        assert got == want

    def test_batching_invariance(self, ray_session):
        """The integer sums cannot depend on how rows split into batches."""
        from graph_rag_agent_ray.ops.linalg import gram_matrix
        rng = np.random.default_rng(9)
        X32 = rng.normal(size=(200, 8)).astype(np.float32)
        a = (gram_matrix(_emb_ds(X32), batch_size=16).to_pandas()
             .sort_values(["i", "j"]).reset_index(drop=True))
        b = (gram_matrix(_emb_ds(X32), batch_size=4096).to_pandas()
             .sort_values(["i", "j"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_vs_duckdb_oracle(self, ray_session):
        import duckdb
        from graph_rag_agent_ray.ops.linalg import gram_matrix, gram_matrix_sql
        rng = np.random.default_rng(4)
        X32 = rng.normal(size=(120, 10)).astype(np.float32)
        ds = _emb_ds(X32)
        got = (gram_matrix(ds).to_pandas()
               .sort_values(["i", "j"]).reset_index(drop=True))
        con = duckdb.connect()
        con.register("emb_arrow", pa.table({
            "vec_id": pa.array(range(len(X32)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in X32],
                                  pa.list_(pa.float32()))}))
        want = (con.execute(gram_matrix_sql(table="emb_arrow")).df()
                .sort_values(["i", "j"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestPCA:
    def test_recovers_planted_subspace(self, ray_session):
        """Rows drawn from a rank-3 subspace: the top-3 components must
        span it (projection captures ~all the energy) and the projection
        op reproduces the driver-side matmul."""
        from graph_rag_agent_ray.ops.linalg import pca_components, pca_project
        rng = np.random.default_rng(11)
        basis = np.linalg.qr(rng.normal(size=(16, 3)))[0]  # 16-dim, rank 3
        Z = rng.normal(size=(300, 3))
        X = (Z @ basis.T).astype(np.float32)
        ds = _emb_ds(X)
        comps, vals, n = pca_components(ds, n_components=3)
        assert n == 300 and comps.shape == (3, 16)
        # energy captured by the recovered components ~ 100%
        Xd = X.astype(np.float64)
        total = np.sum(Xd * Xd)
        proj = Xd @ comps.T
        assert np.sum(proj * proj) / total > 0.999

        out = pca_project(ds, comps).to_pandas()
        P = np.array(out.sort_values("vec_id")["pca"].tolist())
        np.testing.assert_allclose(P, Xd @ comps.T, rtol=0, atol=1e-6)

    def test_empty_input(self, ray_session):
        from graph_rag_agent_ray.ops.linalg import pca_components
        comps, vals, n = pca_components(_emb_ds(np.zeros((0, 4))))
        assert n == 0 and comps.size == 0
