"""ops/analytics: rollups, joins, quantiles, samplers vs in-process pandas
references (the DuckDB oracles run in the driver gate; here we verify the
distributed implementations against straight pandas on small inputs, plus
the determinism/partitioning properties the module documents)."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graph_rag_agent_ray.ops import analytics as AN


def _lineitem(n=400, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "l_orderkey": rng.integers(0, 80, n),
        "l_returnflag": rng.choice(["A", "N", "R"], n),
        "l_linestatus": rng.choice(["O", "F"], n),
        "l_quantity": rng.integers(1, 50, n).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(100, 9000, n), 2),
        "l_discount": np.round(rng.integers(0, 11, n) / 100, 2),
        "l_tax": np.round(rng.integers(0, 9, n) / 100, 2),
    })


def _orders(n=80, seed=8):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "o_orderkey": np.arange(n),
        "o_custkey": rng.integers(0, 25, n),
        "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH", "3-LOW"], n),
        "o_totalprice": np.round(rng.uniform(1000, 90000, n), 2),
    })


class TestPricingSummary:
    def test_matches_pandas(self):
        li = _lineitem()
        out = AN.pricing_summary(rd.from_pandas(li).repartition(5)).to_pandas()
        base = np.rint(li.l_extendedprice * 100).astype("int64")
        disc = np.rint(li.l_discount * 100).astype("int64")
        tax = np.rint(li.l_tax * 100).astype("int64")
        ref = pd.DataFrame({
            "l_returnflag": li.l_returnflag, "l_linestatus": li.l_linestatus,
            "sum_qty": li.l_quantity.astype("int64"),
            "sum_base_cents": base,
            "sum_disc_price": base * (100 - disc),
            "sum_charge": base * (100 - disc) * (100 + tax),
            "n_rows": 1,
        }).groupby(["l_returnflag", "l_linestatus"]).sum().reset_index()
        key = ["l_returnflag", "l_linestatus"]
        got = out.sort_values(key).reset_index(drop=True)[ref.columns]
        pd.testing.assert_frame_equal(
            got, ref.sort_values(key).reset_index(drop=True),
            check_dtype=False)

    def test_partitioning_invariant(self):
        li = _lineitem()
        a = AN.pricing_summary(rd.from_pandas(li)).to_pandas()
        b = AN.pricing_summary(rd.from_pandas(li).repartition(11)).to_pandas()
        key = ["l_returnflag", "l_linestatus"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True)[a.columns])


class TestJoins:
    def test_order_revenue_matches_pandas(self):
        li, od = _lineitem(), _orders()
        out = AN.order_revenue_rollup(
            rd.from_pandas(li).repartition(4),
            rd.from_pandas(od).repartition(3)).to_pandas()
        j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
        rev = (np.rint(j.l_extendedprice * 100).astype("int64")
               * (100 - np.rint(j.l_discount * 100).astype("int64")))
        ref = (pd.DataFrame({"o_orderpriority": j.o_orderpriority,
                             "l_returnflag": j.l_returnflag,
                             "sum_revenue_cents": rev, "n_items": 1})
               .groupby(["o_orderpriority", "l_returnflag"]).sum().reset_index())
        key = ["o_orderpriority", "l_returnflag"]
        pd.testing.assert_frame_equal(
            out.sort_values(key).reset_index(drop=True)[ref.columns],
            ref.sort_values(key).reset_index(drop=True), check_dtype=False)

    def test_segment_sales_drops_unknown_custkeys(self):
        od = _orders()
        cust = pd.DataFrame({
            "c_custkey": np.arange(20),  # custkeys 20-24 missing
            "c_mktsegment": ["S" + str(i % 3) for i in range(20)],
        })
        out = AN.segment_sales(rd.from_pandas(od),
                               rd.from_pandas(cust)).to_pandas()
        j = od.merge(cust, left_on="o_custkey", right_on="c_custkey")
        ref = (pd.DataFrame({
            "c_mktsegment": j.c_mktsegment,
            "o_orderpriority": j.o_orderpriority,
            "sum_total_cents": np.rint(j.o_totalprice * 100).astype("int64"),
            "n_orders": 1,
        }).groupby(["c_mktsegment", "o_orderpriority"]).sum().reset_index())
        key = ["c_mktsegment", "o_orderpriority"]
        pd.testing.assert_frame_equal(
            out.sort_values(key).reset_index(drop=True)[ref.columns],
            ref.sort_values(key).reset_index(drop=True), check_dtype=False)
        assert out.n_orders.sum() == len(j) < len(od)


class TestGroupQuantiles:
    def test_quantile_disc_rule(self):
        df = pd.DataFrame({"event_type": ["a"] * 4 + ["b"] * 7,
                           "value": [1.0, 2.0, 3.0, 4.0] + list(range(7))})
        out = AN.group_quantiles(rd.from_pandas(df), qs=(0.25, 0.5, 0.9)) \
            .to_pandas().set_index("event_type")
        # rank = ceil(q*n), 1-indexed (DuckDB quantile_disc)
        assert out.loc["a", "q25"] == 1.0
        assert out.loc["a", "q50"] == 2.0
        assert out.loc["a", "q90"] == 4.0
        b = sorted(range(7))
        assert out.loc["b", "q50"] == b[math.ceil(0.5 * 7) - 1]
        assert list(out["n"]) and out.loc["b", "n"] == 7

    def test_every_quantile_is_a_group_element(self):
        rng = np.random.default_rng(3)
        df = pd.DataFrame({"event_type": rng.choice(list("xyz"), 500),
                           "value": rng.normal(size=500)})
        out = AN.group_quantiles(rd.from_pandas(df).repartition(7)).to_pandas()
        for _, row in out.iterrows():
            vals = set(df[df.event_type == row.event_type].value)
            for c in ("q25", "q50", "q75"):
                assert row[c] in vals


class TestSamplers:
    def test_stratified_rates_and_determinism(self):
        rng = np.random.default_rng(5)
        df = pd.DataFrame({"k": np.arange(4000),
                           "s": rng.choice(["hi", "lo", "zero"], 4000)})
        rates = {"hi": 0.8, "lo": 0.2}
        out = AN.stratified_sample(rd.from_pandas(df), rates,
                                   strata_col="s", key="k").to_pandas()
        assert set(out.s) <= {"hi", "lo"}  # default_rate=0 drops 'zero'
        frac = out.groupby("s").size() / df.groupby("s").size()
        assert abs(frac["hi"] - 0.8) < 0.05
        assert abs(frac["lo"] - 0.2) < 0.05
        again = AN.stratified_sample(rd.from_pandas(df).repartition(9), rates,
                                     strata_col="s", key="k").to_pandas()
        assert sorted(out.k) == sorted(again.k)

    def test_exact_k_partitioning_invariant(self):
        df = pd.DataFrame({"doc_id": np.arange(1000), "x": np.arange(1000.0)})
        a = AN.sample_exact_k(rd.from_pandas(df), k=37).to_pandas()
        b = AN.sample_exact_k(rd.from_pandas(df).repartition(13), k=37).to_pandas()
        assert len(a) == len(b) == 37
        assert sorted(a.doc_id) == sorted(b.doc_id)

    def test_exact_k_larger_than_input(self):
        df = pd.DataFrame({"doc_id": np.arange(5), "x": np.arange(5.0)})
        out = AN.sample_exact_k(rd.from_pandas(df), k=50).to_pandas()
        assert sorted(out.doc_id) == list(range(5))


class TestDistinct:
    def test_matches_pandas(self):
        rng = np.random.default_rng(11)
        df = pd.DataFrame({"event_type": rng.choice(list("pqr"), 3000),
                           "user_id": rng.integers(0, 120, 3000)})
        out = AN.distinct_per_group(rd.from_pandas(df).repartition(6)) \
            .to_pandas().set_index("event_type")["n_distinct"]
        ref = df.groupby("event_type").user_id.nunique()
        assert out.sort_index().to_dict() == ref.sort_index().to_dict()


def _events(n=600, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(np.sort(rng.integers(0, 3_600_000, n)), unit="ms"),
        "user_id": rng.integers(0, 12, n),
        "event_type": rng.choice(["view", "click", "error"], n,
                                 p=[0.6, 0.3, 0.1]),
        "value": np.round(rng.uniform(0, 20, n), 2),
    })


class TestIntervalJoin:
    def _ref(self, ev, window_s):
        w = pd.Timedelta(seconds=window_s)
        inc = ev[ev.event_type == "error"]
        m = ev.merge(inc[["user_id", "event_id", "ts"]]
                     .rename(columns={"event_id": "incident_id",
                                      "ts": "start"}), on="user_id")
        m = m[(m.ts >= m.start) & (m.ts < m.start + w)]
        return (m[["incident_id", "event_id"]].astype("int64")
                .sort_values(["incident_id", "event_id"])
                .reset_index(drop=True))

    def test_matches_pandas(self):
        from graph_rag_agent_ray.ops import relational as R
        ev = _events()
        out = R.interval_join(rd.from_pandas(ev).repartition(7),
                              anchor_type="error", window_s=120).to_pandas()
        got = (out.sort_values(["incident_id", "event_id"])
               .reset_index(drop=True).astype("int64"))
        pd.testing.assert_frame_equal(got, self._ref(ev, 120),
                                      check_dtype=False)
        # the anchor matches its own window
        assert ((got.incident_id == got.event_id).sum()
                == (ev.event_type == "error").sum())

    def test_boundary_exclusive_and_cross_bucket(self):
        """End-exclusive semantics and windows crossing the time-bucket
        boundary (replica in the second bucket) both behave."""
        from graph_rag_agent_ray.ops import relational as R
        t0 = pd.Timestamp("2024-01-01")
        ev = pd.DataFrame({
            "event_id": [0, 1, 2, 3],
            # anchor at 90s: bucket 0 of width 120s, window [90, 210)
            # crosses into bucket 1; event at 209.999999s matches, 210s not
            "ts": [t0 + pd.Timedelta(seconds=90),
                   t0 + pd.Timedelta(seconds=209, microseconds=999_999),
                   t0 + pd.Timedelta(seconds=210),
                   t0 + pd.Timedelta(seconds=89)],
            "user_id": [1, 1, 1, 1],
            "event_type": ["error", "view", "view", "view"],
            "value": [0.0, 1.0, 2.0, 3.0],
        })
        out = R.interval_join(rd.from_pandas(ev), anchor_type="error",
                              window_s=120).to_pandas()
        got = set(zip(out.incident_id, out.event_id))
        assert got == {(0, 0), (0, 1)}


class TestQuotaSample:
    def test_exact_quotas_and_determinism(self, ray_session, sf_dir):
        import duckdb

        import ray.data as rd
        from graph_rag_agent_ray.ops.analytics import (
            quota_sample,
            quota_sample_sql,
        )

        path = f"{sf_dir}/documents.parquet"
        docs = rd.read_parquet(path, columns=["doc_id", "lang", "n_chars"])
        q = {"en": 7, "zh": 3}
        a = (quota_sample(docs, q, group_col="lang", default_quota=1)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # quotas hit exactly (each lang has more rows than its quota here)
        counts = a["lang"].value_counts()
        assert counts["en"] == 7 and counts["zh"] == 3
        assert (counts.drop(["en", "zh"]) == 1).all()
        # repartitioned input draws the SAME sample (layout independence)
        b = (quota_sample(docs.repartition(7), q, group_col="lang",
                          default_quota=1)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{path}')")
        oracle = (con.execute(quota_sample_sql(
            q, group_col="lang", columns="doc_id, lang, n_chars",
            default_quota=1)).df().sort_values("doc_id")
            .reset_index(drop=True))
        pd.testing.assert_frame_equal(a, oracle, check_dtype=False)

    def test_quota_larger_than_group_takes_all(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from graph_rag_agent_ray.ops.analytics import quota_sample

        t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                      "lang": pa.array(["a"] * 2 + ["b"] * 4)})
        out = quota_sample(rd.from_arrow(t), {"a": 10, "b": 2},
                           group_col="lang").to_pandas()
        c = out["lang"].value_counts()
        assert c["a"] == 2 and c["b"] == 2


class TestTokenBudgetSample:
    def test_budget_cut_and_oracle(self, ray_session, sf_dir):
        import duckdb

        import ray.data as rd
        from graph_rag_agent_ray.ops.analytics import (
            token_budget_sample,
            token_budget_sample_sql,
        )

        path = f"{sf_dir}/documents.parquet"
        docs = rd.read_parquet(path, columns=["doc_id", "lang", "text"])
        budgets = {"en": 3000, "zh": 1200}
        a = (token_budget_sample(docs, budgets, default_budget=500)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # every group's total stays within its budget and is maximal
        # (adding the next doc in hash order would overshoot -> cum is
        # within [budget - max_doc_tokens, budget]; just check the cap here)
        totals = a.groupby("lang")["n_tokens"].sum()
        assert totals["en"] <= 3000 and totals["zh"] <= 1200
        assert (a.groupby("lang")["cum_tokens"].max() == totals).all()
        # layout independence
        b = (token_budget_sample(docs.repartition(9), budgets,
                                 default_budget=500)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{path}')")
        oracle = (con.execute(token_budget_sample_sql(
            budgets, default_budget=500)).df()
            .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, oracle, check_dtype=False)

    def test_zero_budget_group_excluded(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from graph_rag_agent_ray.ops.analytics import token_budget_sample

        t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                      "lang": pa.array(["a", "a", "b", "b"]),
                      "text": pa.array(["one two", "three", "x y z", "w"])})
        out = token_budget_sample(rd.from_arrow(t), {"a": 100},
                                  default_budget=0).to_pandas()
        assert set(out["lang"]) == {"a"}
        assert out["n_tokens"].sum() == 3


class TestTokenBudgetSentinel:
    def test_overflow_sentinel_regression(self, ray_session, sf_dir):
        """Regression for the unsound local-prefix prune: with the driver's
        budgets at sf0.001, a batch's first overflowing doc was dropped
        map-side, its tokens vanished from the reducer's prefix sums, and a
        later doc falsely survived (caught by the oracle gate). Many small
        partitions maximize cross-batch interleaving."""
        import duckdb
        import ray.data as rd
        from graph_rag_agent_ray.ops.analytics import (
            token_budget_sample,
            token_budget_sample_sql,
        )

        path = f"{sf_dir}/documents.parquet"
        budgets = {"en": 20000, "zh": 8000}
        docs = rd.read_parquet(path, columns=["doc_id", "lang", "text"])
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{path}')")
        oracle = (con.execute(token_budget_sample_sql(
            budgets, default_budget=2000)).df()
            .sort_values("doc_id").reset_index(drop=True))
        for parts in (1, 13):
            got = (token_budget_sample(docs.repartition(parts), budgets,
                                       default_budget=2000)
                   .to_pandas().sort_values("doc_id").reset_index(drop=True))
            pd.testing.assert_frame_equal(got, oracle, check_dtype=False)


class TestTokenBudgetSentinelUnit:
    def test_dropped_overflow_row_weight_preserved(self, ray_session):
        """Deterministic counterexample for a sentinel-less local prune:
        hash order A(6), B(6), C(3) with budget 10 — B is the global cut row.
        If B's batch drops it without a sentinel, a reducer seeing only
        {A, C} computes cum(C)=9 <= 10 and falsely keeps C. Correct output
        keeps A only. batch_size=2 forces [A, B] and [C] into separate map
        batches (Ray coalesces small blocks, so block layout alone is not
        enough)."""
        import pyarrow as pa
        import ray.data as rd
        from graph_rag_agent_ray.ops.analytics import (
            _md5_prefix_key,
            token_budget_sample,
        )

        ids = sorted(range(40), key=lambda i: (_md5_prefix_key([i])[0], i))
        a, b, c = ids[0], ids[1], ids[2]

        def doc(i, n):
            return {"doc_id": i, "lang": "g", "text": " ".join(["w"] * n)}

        ds = rd.from_arrow(pa.Table.from_pylist(
            [doc(a, 6), doc(b, 6), doc(c, 3)]))
        out = token_budget_sample(ds, {"g": 10}, batch_size=2).to_pandas()
        assert out["doc_id"].tolist() == [a]
        assert out["cum_tokens"].tolist() == [6]


class TestWindows:
    def _pandas_user_windows(self, ev):
        df = ev.copy()
        df["cents"] = np.rint(df["value"].to_numpy() * 100).astype("int64")
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        g = df.groupby("user_id", sort=False)
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "row_num": (g.cumcount() + 1).astype("int64"),
            "running_cents": g["cents"].cumsum().astype("int64"),
            "prev_cents": g["cents"].shift(fill_value=0).astype("int64"),
        }).sort_values("event_id").reset_index(drop=True)

    def test_user_windows_matches_pandas(self):
        ev = _events()
        got = (AN.user_windows(rd.from_pandas(ev), n_buckets=8).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
        want = self._pandas_user_windows(ev)
        pd.testing.assert_frame_equal(
            got[want.columns].astype("int64"), want.astype("int64"))

    def test_user_windows_partitioning_invariant(self):
        ev = _events(400, seed=11)
        a = (AN.user_windows(rd.from_pandas(ev).repartition(1), n_buckets=4)
             .to_pandas().sort_values("event_id").reset_index(drop=True))
        b = (AN.user_windows(rd.from_pandas(ev).repartition(13), n_buckets=32)
             .to_pandas().sort_values("event_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a[b.columns], b)

    def test_running_total_matches_sequential(self):
        ev = _events(500, seed=3)
        got = (AN.running_total(rd.from_pandas(ev).repartition(7), n_ranges=9)
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        df = ev.copy()
        df["cents"] = np.rint(df["value"].to_numpy() * 100).astype("int64")
        df = df.sort_values(["ts", "event_id"], kind="stable")
        want = pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "running_cents": df["cents"].cumsum().astype("int64"),
        }).sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns].astype("int64"), want)
        # the final prefix equals the global total regardless of ranges
        assert got["running_cents"].max() == df["cents"].sum()

    def test_running_total_duplicate_timestamps(self):
        # equal ts values share a range; event_id breaks the tie locally
        ev = _events(200, seed=9)
        ev["ts"] = pd.Timestamp("2024-01-01")  # all identical
        got = (AN.running_total(rd.from_pandas(ev).repartition(5), n_ranges=8)
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        cents = np.rint(ev.sort_values("event_id")["value"].to_numpy() * 100
                        ).astype("int64")
        assert (got["running_cents"].to_numpy() == np.cumsum(cents)).all()

    def test_running_total_empty(self):
        ev = _events(3).iloc[0:0]
        got = AN.running_total(rd.from_pandas(ev))
        # Ray drops columns in to_pandas() of an empty dataset; the schema
        # promise is checked on the dataset itself
        assert got.count() == 0
        assert set(f.name for f in got.schema().base_schema) == {
            "event_id", "running_cents"}
