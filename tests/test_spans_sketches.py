"""Exact duplicated-substring spans (ops/spans.py) and sketch operators
(ops/sketches.py) — unit semantics on hand-crafted corpora plus DuckDB
oracle equivalence (the same comparison the driver gate runs)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from graph_rag_agent_ray.ops import search as SE
from graph_rag_agent_ray.ops import sketches as SK
from graph_rag_agent_ray.ops import spans as SP
from graph_rag_agent_ray.ops import textstats as TS

L = 10  # span length for the hand-crafted cases


def _docs(*texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(list(texts), pa.string()),
    }))


def _spans(ds, **kw):
    pdf = SP.duplicate_spans(ds, length=L, **kw).to_pandas()
    if pdf.empty:  # map_groups on zero rows yields a column-less frame
        return []
    return sorted(map(tuple, pdf[["doc_id", "span_start", "span_end"]]
                      .to_numpy()))


class TestDuplicateSpans:
    def test_cross_doc_duplicate(self, ray_session):
        shared = "ABCDEFGHIJ"  # exactly L chars
        ds = _docs("xx" + shared + "yy", "qq" + shared + "zz")
        assert _spans(ds) == [(0, 2, 12), (1, 2, 12)]

    def test_within_doc_duplicate(self, ray_session):
        shared = "ABCDEFGHIJ"
        ds = _docs(shared + "----" + shared, "unrelated text here pad")
        assert _spans(ds) == [(0, 0, 10), (0, 14, 24)]

    def test_overlapping_positions_merge(self, ray_session):
        # an L+1-char shared region duplicates at two consecutive offsets ->
        # ONE maximal span of L+1 chars in each doc
        shared = "ABCDEFGHIJK"
        ds = _docs(shared + "xx", "yy" + shared)
        assert _spans(ds) == [(0, 0, 11), (1, 2, 13)]

    def test_short_docs_and_no_dups(self, ray_session):
        ds = _docs("short", "completely different content", "x" * 9)
        assert _spans(ds) == []

    def test_min_count_three(self, ray_session):
        shared = "ABCDEFGHIJ"
        ds = _docs(shared + "1", shared + "2", shared + "3")
        assert _spans(ds, min_count=3) == [(0, 0, 10), (1, 0, 10), (2, 0, 10)]
        ds2 = _docs(shared + "1", shared + "2", "other data here!")
        assert _spans(ds2, min_count=3) == []

    def test_strip_removes_spans(self, ray_session):
        shared = "ABCDEFGHIJ"
        ds = _docs("xx" + shared + "yy", "qq" + shared + "zz")
        pdf = (SP.strip_duplicate_spans(ds, length=L).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert list(pdf["text"]) == ["xxyy", "qqzz"]

    def test_strip_fully_duplicated_doc_empties(self, ray_session):
        shared = "ABCDEFGHIJ"
        ds = _docs(shared, shared, "untouched other document")
        pdf = (SP.strip_duplicate_spans(ds, length=L).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert list(pdf["text"]) == ["", "", "untouched other document"]

    def test_oracle_equivalence_corpus(self, ray_session, sf_dir):
        path = f"{sf_dir}/documents.parquet"
        docs = rd.read_parquet(path, columns=["doc_id", "text"])
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{path}')")
        mine = (SP.duplicate_spans(docs, length=20)
                .to_pandas().sort_values(["doc_id", "span_start"])
                .reset_index(drop=True))
        oracle = (con.execute(SP.duplicate_spans_sql(length=20)).df()
                  .sort_values(["doc_id", "span_start"])
                  .reset_index(drop=True))
        assert len(mine) > 0  # the corpus generator repeats phrases
        pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)
        ms = (SP.strip_duplicate_spans(docs, length=20)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
        os_ = (con.execute(SP.strip_duplicate_spans_sql(length=20)).df()
               .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(ms, os_, check_dtype=False)


class TestFrequentNgrams:
    def test_counts_and_threshold(self, ray_session):
        ds = _docs("a b a b a b", "a b c", "c d")
        pdf = (TS.frequent_ngrams(ds, n=2, min_count=3).to_pandas()
               .sort_values("gram").reset_index(drop=True))
        # "a b" occurs 3+1=4 times across 2 docs; "b a" occurs 2 (below);
        # "b c"/"c d" once each
        assert list(map(tuple, pdf.to_numpy())) == [("a b", 2, 4)]

    def test_oracle_equivalence(self, ray_session, sf_dir):
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/documents.parquet')")
        mine = (TS.frequent_ngrams(docs, n=3, min_count=4).to_pandas()
                .sort_values("gram").reset_index(drop=True))
        oracle = (con.execute(TS.frequent_ngrams_sql(n=3, min_count=4)).df()
                  .sort_values("gram").reset_index(drop=True))
        assert len(mine) > 0
        pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


class TestHLL:
    def test_register_semantics(self, ray_session):
        import hashlib

        ds = rd.from_arrow(pa.table({
            "event_type": pa.array(["x"], pa.string()),
            "user_id": pa.array([7], pa.int64()),
        }))
        pdf = SK.hll_registers(ds).to_pandas()
        hx = hashlib.md5(b"7").hexdigest()
        suffix = int(hx[2:16], 16)
        expected_rank = 57 if suffix == 0 else 56 - suffix.bit_length() + 1
        assert list(pdf["register"]) == [hx[:2]]
        assert list(pdf["max_rank"]) == [expected_rank]

    def test_max_combine_order_independent(self, ray_session):
        rows = [("a", i) for i in range(200)] + [("b", i) for i in range(50)]
        t = pa.table({"event_type": pa.array([r[0] for r in rows]),
                      "user_id": pa.array([r[1] for r in rows], pa.int64())})
        one = SK.hll_registers(rd.from_arrow(t)).to_pandas()
        rev = SK.hll_registers(
            rd.from_arrow(t.take(list(reversed(range(len(t)))))),
        ).to_pandas()
        key = ["event_type", "register"]
        pd.testing.assert_frame_equal(
            one.sort_values(key).reset_index(drop=True),
            rev.sort_values(key).reset_index(drop=True))

    def test_estimate_accuracy(self, ray_session):
        # m=256 registers -> theoretical rel. error ~1.04/sqrt(256) = 6.5%
        n = 5000
        t = pa.table({"event_type": pa.array(["g"] * n),
                      "user_id": pa.array(range(n), pa.int64())})
        regs = SK.hll_registers(rd.from_arrow(t)).to_pandas()
        est = SK.hll_estimate(regs)["estimate"].iloc[0]
        assert abs(est - n) / n < 0.2

    def test_oracle_equivalence(self, ray_session, sf_dir):
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type", "user_id"])
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/events.parquet')")
        key = ["event_type", "register"]
        mine = (SK.hll_registers(ev).to_pandas()
                .sort_values(key).reset_index(drop=True))
        oracle = (con.execute(SK.hll_registers_sql()).df()
                  .sort_values(key).reset_index(drop=True))
        pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


class TestBM25:
    def test_hand_scored(self, ray_session):
        # 3 docs; term "cat": df=2, N=3 -> idf = ln(1 + 1.5/2.5)
        import math
        ds = _docs("cat sat mat", "cat cat dog", "dog runs far away now")
        pdf = (SE.bm25_topk(ds, ["cat"], k=10, k1=1.2, b=0.75)
               .to_pandas().reset_index(drop=True))
        assert list(pdf["doc_id"]) == [1, 0]  # doc 1 has tf=2
        idf = math.log(1 + 1.5 / 2.5)
        avgdl = (3 + 3 + 5) / 3
        def s(tf, dl):
            return round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6)
        assert list(pdf["score"]) == [s(2, 3), s(1, 3)]
        assert list(pdf["rank"]) == [1, 2]

    def test_no_match_empty(self, ray_session):
        ds = _docs("alpha beta", "gamma delta")
        pdf = SE.bm25_topk(ds, ["zeta"], k=5).to_pandas()
        assert len(pdf) == 0

    def test_oracle_equivalence(self, ray_session, sf_dir):
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/documents.parquet')")
        terms = ["spark", "vector", "customer"]
        mine = (SE.bm25_topk(docs, terms, k=15).to_pandas()
                .sort_values("rank").reset_index(drop=True))
        oracle = (con.execute(SE.bm25_topk_sql(terms, k=15)).df()
                  .sort_values("rank").reset_index(drop=True))
        assert len(mine) > 0
        pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


def _ref_spans(texts, length, min_count=2):
    """Brute-force reference: count every L-substring, mark positions whose
    substring repeats, merge per doc."""
    from collections import Counter
    grams = Counter()
    for t in texts:
        for i in range(len(t) - length + 1):
            grams[t[i:i + length]] += 1
    out = []
    for d, t in enumerate(texts):
        pos = [i for i in range(len(t) - length + 1)
               if grams[t[i:i + length]] >= min_count]
        start = prev = None
        for p in pos:
            if start is None:
                start = prev = p
            elif p - prev <= length:
                prev = p
            else:
                out.append((d, start, prev + length))
                start = prev = p
        if start is not None:
            out.append((d, start, prev + length))
    return sorted(out)


class TestSpanProperties:
    @pytest.mark.parametrize("seed", range(8))
    def test_matches_bruteforce_reference(self, ray_session, seed):
        # tiny alphabet forces heavy substring repetition (incl. within-doc
        # overlaps and cross-doc chains) — the regime where the merge and
        # verification logic can silently diverge
        import random
        rng = random.Random(seed)
        texts = ["".join(rng.choice("ab") for _ in range(rng.randint(0, 14)))
                 for _ in range(rng.randint(1, 5))]
        ds = _docs(*texts)
        pdf = SP.duplicate_spans(ds, length=3).to_pandas()
        got = ([] if pdf.empty else
               sorted(map(tuple, pdf[["doc_id", "span_start", "span_end"]]
                          .to_numpy())))
        assert got == _ref_spans(texts, 3)


class TestCountMin:
    def test_registers_sum_to_total(self, ray_session):
        # every row of the sketch partitions the full count mass
        rows = ["a"] * 30 + ["b"] * 12 + ["c"] * 5
        t = pa.table({"event_type": pa.array(rows)})
        pdf = SK.cms_registers(rd.from_arrow(t), depth=3).to_pandas()
        assert set(pdf["row"]) == {0, 1, 2}
        for _, sub in pdf.groupby("row"):
            assert sub["count"].sum() == len(rows)

    def test_estimate_one_sided_and_exact_without_collisions(self, ray_session):
        rows = ["a"] * 30 + ["b"] * 12 + ["c"] * 5
        t = pa.table({"event_type": pa.array(rows)})
        regs = SK.cms_registers(rd.from_arrow(t), depth=4).to_pandas()
        est = SK.cms_estimate(regs, ["a", "b", "c", "zz"], depth=4)
        truth = {"a": 30, "b": 12, "c": 5, "zz": 0}
        for v, e in zip(est["value"], est["estimate"]):
            assert e >= truth[v]          # one-sided always
        # 3 values in 256 cells x 4 rows: some row has no collision
        assert dict(zip(est["value"], est["estimate"])) == truth

    def test_sum_combine_order_independent(self, ray_session):
        rows = [f"v{i % 17}" for i in range(400)]
        t = pa.table({"event_type": pa.array(rows)})
        key = ["row", "register"]
        one = (SK.cms_registers(rd.from_arrow(t)).to_pandas()
               .sort_values(key).reset_index(drop=True))
        rev = (SK.cms_registers(
            rd.from_arrow(t.take(list(reversed(range(len(t)))))))
            .to_pandas().sort_values(key).reset_index(drop=True))
        pd.testing.assert_frame_equal(one, rev)

    def test_oracle_equivalence(self, ray_session, sf_dir):
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type"])
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/events.parquet')")
        key = ["row", "register"]
        mine = (SK.cms_registers(ev).to_pandas()
                .sort_values(key).reset_index(drop=True))
        oracle = (con.execute(SK.cms_registers_sql()).df()
                  .sort_values(key).reset_index(drop=True))
        pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


class TestHistogram:
    def test_counts_partition_mass(self, ray_session):
        import numpy as np
        rng = np.random.default_rng(3)
        t = pa.table({"event_type": pa.array(rng.choice(["x", "y"], 500)),
                      "value": pa.array(np.round(rng.uniform(0, 50, 500), 2))})
        pdf = SK.hist_registers(rd.from_arrow(t), n_bins=16).to_pandas()
        assert pdf["count"].sum() == 500
        assert pdf["bin"].between(0, 15).all()

    def test_quantile_within_one_bin(self, ray_session):
        import numpy as np
        rng = np.random.default_rng(9)
        vals = np.round(rng.uniform(0, 100, 4000), 2)
        t = pa.table({"event_type": pa.array(["g"] * 4000),
                      "value": pa.array(vals)})
        regs = SK.hist_registers(rd.from_arrow(t), n_bins=64).to_pandas()
        cents = np.rint(vals * 100).astype("int64")
        est = SK.hist_quantile(regs, 0.5, int(cents.min()),
                               int(cents.max()), n_bins=64)
        true_med = np.quantile(vals, 0.5)
        bin_width = (cents.max() - cents.min() + 1) / 64 / 100.0
        assert abs(est["estimate"].iloc[0] - true_med) <= bin_width

    def test_oracle_equivalence(self, ray_session, sf_dir):
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type", "value"])
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/events.parquet')")
        key = ["event_type", "bin"]
        mine = (SK.hist_registers(ev).to_pandas()
                .sort_values(key).reset_index(drop=True))
        oracle = (con.execute(SK.hist_registers_sql()).df()
                  .sort_values(key).reset_index(drop=True))
        pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)
