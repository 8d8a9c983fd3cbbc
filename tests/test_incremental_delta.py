"""Delta-scoped incremental graph side: value-exact equivalence vs a fresh
build under mixed deltas (add + modify + delete), and evidence the delta
path actually ran (lineage ``delta_scoped`` rows).

The driver's kg_incremental gate checks canonical triples only; these tests
pin EVERY output table — entities, edges, communities, mentions_canon —
because the delta path carries rows over from previous snapshots and any
divergence (aggregation order, alias churn handling, dropped groups) shows
up in the merged values."""

import json

import pandas as pd
import pyarrow as pa
import ray.data as rd

from graph_rag_agent_ray import build_kg
from graph_rag_agent_ray import schema as S
from graph_rag_agent_ray.pipelines.incremental import (
    incremental_build_kg,
    write_registry,
)
from graph_rag_agent_ray.synth import generate


def _canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Sortable, comparison-stable view: lists → tuples, floats rounded."""
    out = {}
    for col in sorted(df.columns):
        s = df[col]
        if s.map(lambda v: isinstance(v, (list, tuple)) or hasattr(v, "tolist")).any():
            s = s.map(lambda v: tuple(
                round(float(x), 4) if isinstance(x, float) else x
                for x in (v.tolist() if hasattr(v, "tolist") else v)))
        elif s.dtype.kind == "f":
            s = s.round(4)
        out[col] = s
    res = pd.DataFrame(out)
    return res.sort_values(sorted(res.columns), kind="stable").reset_index(drop=True)


def _assert_tables_equal(t_inc, t_full, names):
    for name in names:
        a = _canon_frame(t_inc[name].to_pandas())
        b = _canon_frame(t_full[name].to_pandas())
        pd.testing.assert_frame_equal(a, b, check_dtype=False, obj=name)


def _mutated_corpus(documents: pa.Table) -> pa.Table:
    """Mixed delta: drop one doc, modify two (one gains a brand-new aliased
    entity pair to churn the alias map), add one."""
    rows = documents.to_pylist()
    rows = rows[1:]  # delete doc 0
    rows[0]["spans"][0]["text"] += " Extra appended sentence。"
    # alias churn: introduce surface variants of a fresh entity so the merge
    # judge produces NEW alias pairs this tick
    rows[1]["spans"][0]["text"] += (
        " Zephyrix Corp acquired Quantaflux。 Zephyrix Corporation 收购 Quantaflux。"
    )
    rows.append({"doc_id": "doc-added-1", "spans": [
        {"kind": "text", "text": "Novel Firm 与 Novel Firm Inc 合作。", "media_ref": "",
         "offset": 0}]})
    return pa.Table.from_pylist(rows, schema=S.DOCUMENTS)


ALL_TABLES = ("triples", "triples_canon", "edges", "entities",
              "communities", "mentions_canon", "mentions")


class TestDeltaScopedEquivalence:
    def test_mixed_delta_all_tables_exact(self, ray_session, tmp_path):
        corpus = generate(n_docs=25, seed=7)
        docs_v1 = rd.from_arrow(corpus.documents)
        prev_dir = str(tmp_path / "v1")
        build_kg(docs_v1, prev_dir, input_token="v1")
        write_registry(docs_v1, prev_dir, input_token="v1")

        v2_tbl = _mutated_corpus(corpus.documents)
        inc_dir = str(tmp_path / "inc")
        t_inc, counts = incremental_build_kg(
            rd.from_arrow(v2_tbl), inc_dir, prev_dir, input_token="v2")
        assert counts["deleted"] == 1 and counts["added"] == 1
        assert counts["modified"] == 2

        # evidence the delta-scoped path ran (not the legacy full rebuild)
        with open(f"{inc_dir}/_lineage.jsonl") as f:
            stages = [json.loads(l) for l in f if l.strip()]
        delta_stages = {r["stage"] for r in stages if r.get("delta_scoped")}
        assert {"chunks", "extractions", "mentions", "entities_embedded",
                "triples_canon", "edges", "mentions_canon"} <= delta_stages

        t_full = build_kg(rd.from_arrow(v2_tbl), str(tmp_path / "full"),
                          input_token="v2full")
        _assert_tables_equal(t_inc, t_full, ALL_TABLES)

    def test_second_tick_uses_prev_incremental(self, ray_session, tmp_path):
        """An incremental build's own snapshots must serve as prev for the
        NEXT tick (snapshot layout round-trips through the delta path)."""
        corpus = generate(n_docs=15, seed=11)
        docs_v1 = rd.from_arrow(corpus.documents)
        d1 = str(tmp_path / "t0")
        build_kg(docs_v1, d1, input_token="t0")
        write_registry(docs_v1, d1, input_token="t0")

        v2_tbl = _mutated_corpus(corpus.documents)
        d2 = str(tmp_path / "t1")
        incremental_build_kg(rd.from_arrow(v2_tbl), d2, d1, input_token="t1")

        # tick 2: modify another doc on top of v2
        rows = v2_tbl.to_pylist()
        rows[3]["spans"][0]["text"] += " 再一句。"
        v3_tbl = pa.Table.from_pylist(rows, schema=S.DOCUMENTS)
        d3 = str(tmp_path / "t2")
        t_inc2, counts2 = incremental_build_kg(
            rd.from_arrow(v3_tbl), d3, d2, input_token="t2")
        assert counts2["modified"] == 1

        with open(f"{d3}/_lineage.jsonl") as f:
            stages = [json.loads(l) for l in f if l.strip()]
        assert any(r.get("delta_scoped") for r in stages)

        t_full = build_kg(rd.from_arrow(v3_tbl), str(tmp_path / "f2"),
                          input_token="t2f")
        _assert_tables_equal(t_inc2, t_full, ALL_TABLES)

    def test_pure_addition_delta(self, ray_session, tmp_path):
        """Duplicate-doc addition (the driver's kg_incremental shape)."""
        gen2 = generate(n_docs=20, seed=42, dup_rate=0.2)
        v2 = rd.from_arrow(gen2.documents)
        v1 = v2.filter(lambda row: not str(row["doc_id"]).startswith("dup-"))
        d1 = str(tmp_path / "b0")
        build_kg(v1, d1, input_token="b0")
        write_registry(v1, d1, input_token="b0")
        t_inc, counts = incremental_build_kg(
            v2, str(tmp_path / "b1"), d1, input_token="b1")
        assert counts["added"] > 0 and counts["deleted"] == 0
        t_full = build_kg(v2, str(tmp_path / "bf"), input_token="b1f")
        _assert_tables_equal(t_inc, t_full, ALL_TABLES)

    def test_single_doc_tick_count_only_zero_dirty(self, ray_session, tmp_path):
        """A single-doc modification that leaves the entity VOCABULARY
        unchanged (appended free text the extractor grammar ignores — only
        mention counts/chunk ids of the doc's existing surfaces churn) must
        re-derive ZERO blocks: count-touched surfaces change no block member
        set and no judge decision, so every pair carries over with patched
        n_a/n_b — and the result still matches a fresh build value-exactly."""
        corpus = generate(n_docs=30, seed=13)
        docs_v1 = rd.from_arrow(corpus.documents)
        d1 = str(tmp_path / "s0")
        build_kg(docs_v1, d1, input_token="s0")
        write_registry(docs_v1, d1, input_token="s0")

        rows = corpus.documents.to_pylist()
        rows[5]["spans"][0]["text"] += (
            " Glimmerline Labs 与 Glimmerline Labs Inc 合作。"
        )
        v2_tbl = pa.Table.from_pylist(rows, schema=S.DOCUMENTS)
        d2 = str(tmp_path / "s1")
        t_inc, counts = incremental_build_kg(
            rd.from_arrow(v2_tbl), d2, d1, input_token="s1")
        assert counts["modified"] == 1 and counts["added"] == 0

        with open(f"{d2}/_lineage.jsonl") as f:
            stages = [json.loads(l) for l in f if l.strip()]
        alias_rows = [r for r in stages if r["stage"] == "alias_map"]
        assert alias_rows and alias_rows[-1]["scoped"] is True
        assert alias_rows[-1]["n_existence_touched"] == 0
        assert alias_rows[-1]["n_dirty_blocks"] == 0
        assert alias_rows[-1]["n_fresh_pairs"] == 0
        assert alias_rows[-1]["n_pairs"] > 0  # all carried

        t_full = build_kg(rd.from_arrow(v2_tbl), str(tmp_path / "sf"),
                          input_token="s1f")
        _assert_tables_equal(t_inc, t_full, ALL_TABLES)

    def test_dense_vocab_bypass_exact(self, ray_session, tmp_path):
        """When the touched-surface set covers most of the vocabulary (forced
        here with dense_fraction=0), the entity/edge aggregates bypass the
        carry-over machinery and re-aggregate in full — every output table
        must still match a fresh build value-exactly, and the lineage must
        show the bypass actually fired."""
        from graph_rag_agent_ray.config import KGConfig
        cfg = KGConfig(incremental_dense_fraction=0.0,
                       incremental_dense_min=0)
        corpus = generate(n_docs=25, seed=7)
        docs_v1 = rd.from_arrow(corpus.documents)
        d1 = str(tmp_path / "dv1")
        build_kg(docs_v1, d1, cfg=cfg, input_token="dv1")
        write_registry(docs_v1, d1, cfg=cfg, input_token="dv1")

        v2_tbl = _mutated_corpus(corpus.documents)
        d2 = str(tmp_path / "dv2")
        t_inc, counts = incremental_build_kg(
            rd.from_arrow(v2_tbl), d2, d1, cfg=cfg, input_token="dv2")
        assert counts["modified"] == 2

        with open(f"{d2}/_lineage.jsonl") as f:
            stages = [json.loads(l) for l in f if l.strip()]
        by_stage = {r["stage"]: r for r in stages}
        assert by_stage["touched_surfaces"]["dense_bypass"] is True
        assert by_stage["entities_embedded"]["dense_bypass"] is True
        assert by_stage["edges"]["dense_bypass"] is True

        t_full = build_kg(rd.from_arrow(v2_tbl), str(tmp_path / "dvf"),
                          cfg=cfg, input_token="dv2f")
        _assert_tables_equal(t_inc, t_full, ALL_TABLES)

    def test_single_doc_tick_scoped_blocking(self, ray_session, tmp_path):
        """A single-doc modification that ADDS vocabulary (two new aliased
        surfaces the grammar extracts) must take the DIRTY-BLOCK scoped pair
        derivation (scoped=True, fresh pairs > 0 but ≪ total, most pairs
        carried) and still match a fresh build value-exactly."""
        corpus = generate(n_docs=30, seed=13)
        docs_v1 = rd.from_arrow(corpus.documents)
        d1 = str(tmp_path / "s0")
        build_kg(docs_v1, d1, input_token="s0")
        write_registry(docs_v1, d1, input_token="s0")

        rows = corpus.documents.to_pylist()
        rows[5]["spans"][0]["text"] += (
            " The organization Glimmerline Labs collaborates with "
            "the organization Glimmerline Labs Inc."
        )
        v2_tbl = pa.Table.from_pylist(rows, schema=S.DOCUMENTS)
        d2 = str(tmp_path / "s1")
        t_inc, counts = incremental_build_kg(
            rd.from_arrow(v2_tbl), d2, d1, input_token="s1")
        assert counts["modified"] == 1 and counts["added"] == 0

        with open(f"{d2}/_lineage.jsonl") as f:
            stages = [json.loads(l) for l in f if l.strip()]
        alias_rows = [r for r in stages if r["stage"] == "alias_map"]
        assert alias_rows and alias_rows[-1]["scoped"] is True
        assert alias_rows[-1]["n_existence_touched"] > 0
        assert alias_rows[-1]["n_dirty_blocks"] > 0
        assert alias_rows[-1]["n_fresh_pairs"] > 0
        # the carried fraction is the point: most pairs must NOT re-derive
        assert (alias_rows[-1]["n_fresh_pairs"]
                < alias_rows[-1]["n_pairs"])

        t_full = build_kg(rd.from_arrow(v2_tbl), str(tmp_path / "sf"),
                          input_token="s1f")
        _assert_tables_equal(t_inc, t_full, ALL_TABLES)
