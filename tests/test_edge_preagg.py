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
