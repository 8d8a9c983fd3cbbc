"""Pre-alias edge aggregation ≡ classic canonical-remap-then-dedupe.

The build overlaps the heavy (s,p,o) edge shuffle with the entity
embedding/blocking phase by running it on NORMALIZED keys before the alias
map exists (canonicalize.preaggregate_edges), then finishing with an
edge-scale remap + re-reduce (dedupe_edges_from_partials). These tests pin
value-identity against the classic path dedupe_edges(canonical_triples(...))
— including max-weight merging across surface variants, lexicographic-min
(chunk_id, description) selection, and the MAX_EDGE_CHUNK_IDS provenance cap
under >64 distinct chunks per canonical key.
"""

import numpy as np
import pandas as pd
import pytest
import ray

import ray.data as rd

from graph_rag_agent_ray.config import KGConfig
from graph_rag_agent_ray.stages import canonicalize as C


def _triples_ds(seed: int, n: int, surfaces, n_chunks: int, preds=("OWNS", "SELLS")):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "subj": rng.choice(surfaces, n),
        "pred": rng.choice(list(preds), n),
        "obj": rng.choice(surfaces, n),
        "description": rng.choice(["likes it", "d2", "", "zz last"], n),
        "weight": rng.choice([1.0, 2.0, 5.0, 9.0], n).astype(np.float32),
        "chunk_id": [f"c{int(x):05d}" for x in rng.integers(0, n_chunks, n)],
        "doc_id": [f"doc{int(x)}" for x in rng.integers(0, 37, n)],
    })
    return rd.from_pandas(df).repartition(6)


def _edges_pdf(ds) -> pd.DataFrame:
    pdf = ds.to_pandas()
    pdf["chunk_ids"] = pdf["chunk_ids"].map(
        lambda v: list(v) if not isinstance(v, list) else v)
    return (pdf.sort_values(["src", "dst", "pred"])
            .reset_index(drop=True)
            [["src", "dst", "pred", "description", "weight",
              "n_sources", "chunk_ids"]])


# surface variants that normalize to DIFFERENT keys, some of which the alias
# map then merges into one canonical entity — the case where pre-alias
# aggregation groups finer than the final key
SURFACES = ["Apple Inc", "apple  inc.", "APPLE INC", "Orange LLC",
            "orange llc", "Pear AG", "pear ag", "Kiwi&Sons"]
# keys are normalized forms (build_alias_map's contract)
ALIAS = {"APPLE INC.": "APPLE INC", "ORANGE LLC": "KIWI&SONS"}


class TestEdgePreaggEquivalence:
    @pytest.mark.parametrize("seed", [7, 21])
    def test_matches_classic_path(self, ray_session, seed):
        cfg = KGConfig()
        ds = _triples_ds(seed, 4000, SURFACES, n_chunks=300)
        alias_ref = ray.put(dict(ALIAS))

        classic = _edges_pdf(C.dedupe_edges(
            C.canonical_triples(ds, alias_ref, cfg), cfg))
        partials = C.preaggregate_edges(ds, cfg).materialize()
        fused = _edges_pdf(C.dedupe_edges_from_partials(partials, alias_ref, cfg))

        pd.testing.assert_frame_equal(classic, fused)
        assert len(classic) > 0

    def test_provenance_cap_exceeded(self, ray_session):
        # 2 surfaces x 1 pred over 300 chunks → every canonical key sees far
        # more than MAX_EDGE_CHUNK_IDS distinct chunk ids; both paths must
        # keep the identical 64 smallest
        cfg = KGConfig()
        ds = _triples_ds(3, 6000, ["Apple Inc", "APPLE INC", "apple  inc."],
                         n_chunks=300, preds=("OWNS",))
        alias_ref = ray.put({"APPLE INC.": "APPLE INC"})

        classic = _edges_pdf(C.dedupe_edges(
            C.canonical_triples(ds, alias_ref, cfg), cfg))
        partials = C.preaggregate_edges(ds, cfg).materialize()
        fused = _edges_pdf(C.dedupe_edges_from_partials(partials, alias_ref, cfg))

        assert (classic["n_sources"] == C.MAX_EDGE_CHUNK_IDS).any()
        pd.testing.assert_frame_equal(classic, fused)

    @pytest.mark.parametrize("seed", [7, 21])
    def test_driver_local_finish_matches(self, ray_session, seed):
        # the under-guard driver-local finish (one pandas pass) must equal
        # both the shuffle finish and the classic path
        cfg = KGConfig()
        ds = _triples_ds(seed, 4000, SURFACES, n_chunks=300)
        alias_ref = ray.put(dict(ALIAS))
        partials = C.preaggregate_edges(ds, cfg).materialize()

        shuffled = _edges_pdf(C.dedupe_edges_from_partials(partials, alias_ref, cfg))
        local = _edges_pdf(C.dedupe_edges_from_partials_local(partials, alias_ref, cfg))
        pd.testing.assert_frame_equal(shuffled, local)

    def test_empty_alias(self, ray_session):
        cfg = KGConfig()
        ds = _triples_ds(11, 500, SURFACES, n_chunks=40)
        alias_ref = ray.put({})
        classic = _edges_pdf(C.dedupe_edges(
            C.canonical_triples(ds, alias_ref, cfg), cfg))
        fused = _edges_pdf(C.dedupe_edges_from_partials(
            C.preaggregate_edges(ds, cfg).materialize(), alias_ref, cfg))
        pd.testing.assert_frame_equal(classic, fused)


class TestPolarsKernelEquality:
    """The polars (Rust) edge kernels are value-identical to the pandas
    reducers on adversarial inputs: (chunk_id, description) ties, >cap
    provenance lists, unicode surfaces, float32 weights."""

    def _tricky_batch(self):
        import pyarrow as pa
        rows = []
        surfaces = ["苹果公司", "Apple Inc", "apple  inc.", "Ωmega", "zz"]
        for i in range(3000):
            rows.append({
                "subj": surfaces[i % 5],
                "pred": ["OWNS", "SELLS"][i % 2],
                "obj": surfaces[(i * 3 + 1) % 5],
                "description": ["likes it", "", "d2", "likes it"][i % 4],
                "weight": float([1.0, 9.0, 5.0][i % 3]),
                "chunk_id": f"c{i % 200:05d}",
                "doc_id": f"doc{i % 7}",
            })
        import pandas as pd_
        df = pd_.DataFrame(rows)
        df["weight"] = df["weight"].astype("float32")
        return pa.Table.from_pandas(df, preserve_index=False)

    @pytest.mark.skipif(not C._HAVE_POLARS, reason="polars absent")
    def test_partial_map_kernels_agree(self):
        batch = self._tricky_batch()
        a = C._partial_edges_arrow(batch).to_pandas()
        b = C._partial_edges(batch).to_pandas()
        keys = ["subj", "pred", "obj"]
        a = a.sort_values(keys).reset_index(drop=True)
        b = b.sort_values(keys)[a.columns.tolist()].reset_index(drop=True)
        assert len(a) == len(b)
        for col in ("min_chunk", "description"):
            assert (a[col].values == b[col].values).all(), col
        assert np.allclose(a["weight"].values, b["weight"].values)
        assert all(list(x) == list(y)
                   for x, y in zip(a["chunk_ids"], b["chunk_ids"]))

    @pytest.mark.skipif(not C._HAVE_POLARS, reason="polars absent")
    def test_bucket_kernels_agree(self):
        import pyarrow as pa
        batch = self._tricky_batch()
        partial = C._partial_edges_arrow(batch)
        # duplicate the partials so the bucket merge has real work
        doubled = pa.concat_tables([partial, partial])
        a = C._edges_partial_bucket_arrow(doubled).to_pandas()
        from graph_rag_agent_ray.functions.shuffle import _arrow_group_to_pandas
        b = C._edges_partial_bucket(_arrow_group_to_pandas(doubled))
        keys = ["subj", "pred", "obj"]
        a = a.sort_values(keys).reset_index(drop=True)
        b = b.sort_values(keys)[a.columns.tolist()].reset_index(drop=True)
        assert len(a) == len(b)
        for col in ("min_chunk", "description"):
            assert (a[col].values == b[col].values).all(), col
        assert all(list(x) == list(y)
                   for x, y in zip(a["chunk_ids"], b["chunk_ids"]))
        # final reduce too (src/dst schema)
        fa = C._edges_bucket_arrow(doubled).to_pandas()
        fb = C._edges_bucket(_arrow_group_to_pandas(doubled))
        fa = fa.sort_values(["src", "dst", "pred"]).reset_index(drop=True)
        fb = fb.sort_values(["src", "dst", "pred"])[fa.columns.tolist()] \
            .reset_index(drop=True)
        assert len(fa) == len(fb)
        assert (fa["description"].values == fb["description"].values).all()
        assert (fa["n_sources"].values == fb["n_sources"].values).all()
        assert all(list(x) == list(y)
                   for x, y in zip(fa["chunk_ids"], fb["chunk_ids"]))

    @pytest.mark.skipif(not C._HAVE_POLARS, reason="polars absent")
    def test_exact_partial_kernels_agree(self):
        import pyarrow as pa
        import pandas as pd_
        rows = []
        surfaces = ["苹果公司", "Apple Inc", "apple  inc.", "Ωmega", "zz",
                    "Apple  Inc", "APPLE INC"]
        for i in range(4000):
            rows.append({
                "entity_surface": surfaces[i % 7],
                "entity_type": ["company", "person"][i % 2],
                "chunk_id": f"c{i % 150:05d}",
                "description": ["a desc", "", "z"][i % 3],
                "doc_id": f"doc{i % 5}",
            })
        batch = pa.Table.from_pandas(pd_.DataFrame(rows), preserve_index=False)
        a = C._partial_exact_arrow(batch).to_pandas()
        b_tbl = C._partial_exact(batch)
        b = b_tbl.to_pandas() if hasattr(b_tbl, "to_pandas") else b_tbl
        keys = ["norm_surface", "entity_type"]
        a = a.sort_values(keys).reset_index(drop=True)
        b = b.sort_values(keys)[a.columns.tolist()].reset_index(drop=True)
        assert len(a) == len(b)
        for col in ("n_mentions", "min_chunk", "description"):
            assert (a[col].values == b[col].values).all(), col
        assert all(list(x) == list(y)
                   for x, y in zip(a["surfaces"], b["surfaces"]))

    @pytest.mark.skipif(not C._HAVE_POLARS, reason="polars absent")
    def test_exact_finish_kernels_agree(self):
        import pyarrow as pa
        import pandas as pd_
        rows = []
        surfaces = ["苹果公司", "Apple Inc", "apple  inc.", "Ωmega", "zz",
                    "Apple  Inc", "APPLE INC"]
        for i in range(4000):
            rows.append({
                "entity_surface": surfaces[i % 7],
                "entity_type": ["company", "person", "company"][i % 3],
                "chunk_id": f"c{i % 150:05d}",
                "description": ["a desc", "", "z"][i % 3],
                "doc_id": f"doc{i % 5}",
            })
        batch = pa.Table.from_pandas(pd_.DataFrame(rows), preserve_index=False)
        partial = C._partial_exact_arrow(batch)
        doubled = pa.concat_tables([partial, partial])
        from graph_rag_agent_ray.functions.shuffle import _arrow_group_to_pandas
        # tree-combine level
        ma = C._merge_exact_partials_arrow(doubled).to_pandas()
        mb = C._merge_exact_partials(_arrow_group_to_pandas(doubled))
        keys = ["norm_surface", "entity_type"]
        ma = ma.sort_values(keys).reset_index(drop=True)
        mb = mb.sort_values(keys)[ma.columns.tolist()].reset_index(drop=True)
        assert len(ma) == len(mb)
        for col in ("min_chunk", "description", "n_mentions"):
            assert (ma[col].values == mb[col].values).all(), col
        assert all(list(x) == list(y)
                   for x, y in zip(ma["surfaces"], mb["surfaces"]))
        # final reduce (majority type + tie-breaks)
        fa = C._final_exact_bucket_arrow(doubled).to_pandas()
        fb = C._final_exact_bucket(_arrow_group_to_pandas(doubled))
        fa = fa.sort_values("norm_surface").reset_index(drop=True)
        fb = fb.sort_values("norm_surface")[fa.columns.tolist()] \
            .reset_index(drop=True)
        assert len(fa) == len(fb)
        for col in ("entity_type", "description", "n_mentions"):
            assert (fa[col].values == fb[col].values).all(), col
        assert all(list(x) == list(y)
                   for x, y in zip(fa["surface_forms"], fb["surface_forms"]))
