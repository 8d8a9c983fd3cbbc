"""hash_join_arrow — the Arrow-native distributed join for payloads that
must not round-trip through pandas (corpus text, list columns)."""

import pyarrow as pa
import pytest
import ray.data as rd

from graph_rag_agent_ray.functions.shuffle import hash_join, hash_join_arrow


def _l():
    return rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3, 5], pa.int64()),
        "payload": pa.array([[1, 2], [3], [], [4, 5, 6], [7]],
                            pa.list_(pa.int64())),
        "txt": pa.array(["a", "b", "c", "d", "e"]),
    }))


def _r():
    return rd.from_arrow(pa.table({
        "k": pa.array([2, 2, 3, 4], pa.int64()),
        "w": pa.array([10.5, 20.5, 30.5, 40.5], pa.float64()),
    }))


LS = {"k": pa.int64(), "payload": pa.list_(pa.int64()), "txt": pa.string()}
RS = {"k": pa.int64(), "w": pa.float64()}


class TestArrowJoin:
    def test_inner_matches_pandas_join(self):
        got = hash_join_arrow(_l(), _r(), on=["k"], lschema=LS, rschema=RS
                              ).to_pandas()
        ref = hash_join(_l(), _r(), on=["k"],
                        lcols=["k", "txt"], rcols=["k", "w"]).to_pandas()
        # m:n fanout: key 2 has 2 left x 2 right = 4 rows
        assert len(got) == len(ref) == 5
        a = got[["k", "txt", "w"]].sort_values(["k", "txt", "w"]).reset_index(drop=True)
        b = ref[["k", "txt", "w"]].sort_values(["k", "txt", "w"]).reset_index(drop=True)
        assert a.equals(b.astype(a.dtypes.to_dict()))
        # list payload survived intact
        by_txt = {r.txt: list(r.payload) for r in got.itertuples()}
        assert by_txt["b"] == [3] and by_txt["d"] == [4, 5, 6]

    def test_left_join_null_fills_right(self):
        got = hash_join_arrow(_l(), _r(), on=["k"], how="left",
                              lschema=LS, rschema=RS).to_pandas()
        assert len(got) == 7  # 5 left rows, key 2 fans out x2
        unmatched = got[got["k"].isin([1, 5])]
        assert unmatched["w"].isna().all()

    def test_empty_right_side(self):
        empty_r = rd.from_arrow(pa.table({
            "k": pa.array([], pa.int64()), "w": pa.array([], pa.float64())}))
        inner = hash_join_arrow(_l(), empty_r, on=["k"],
                                lschema=LS, rschema=RS)
        assert inner.count() == 0
        left = hash_join_arrow(_l(), empty_r, on=["k"], how="left",
                               lschema=LS, rschema=RS).to_pandas()
        assert len(left) == 5 and left["w"].isna().all()

    def test_overlapping_non_key_columns_rejected(self):
        with pytest.raises(ValueError):
            hash_join_arrow(_l(), _l(), on=["k"], lschema=LS, rschema=LS)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestGramTokenAlignment:
    """All three ngram tokenizers (polars kernel, python fallback, DuckDB
    oracle) use the RE2 \\S+ class [^\\t\\n\\f\\r ]+ — pinned on text
    containing the characters where str.split() and Unicode \\s diverge
    (\\x1c-\\x1f, \\x0b, \\x85, \\xa0, U+2003)."""

    TEXT = "one\x1ctwo three\x0bfour\xa0five six\x85seven eight"

    def test_python_and_polars_kernels_agree(self):
        import duckdb
        from graph_rag_agent_ray.ops import dedup as D

        batch = pa.table({"doc_id": pa.array([7], pa.int64()),
                          "text": pa.array([self.TEXT])})
        py = D._gram_rows(batch, 2).to_pandas()
        sql = duckdb.sql(
            "SELECT t[i] || ' ' || t[i+1] AS gram FROM "
            "(SELECT regexp_extract_all(?, '\\S+') AS t), "
            "unnest(range(1, len(t))) AS u(i)",
            params=[self.TEXT]).df()
        assert sorted(py["gram"]) == sorted(sql["gram"])
        if D._HAVE_POLARS:
            plg = D._gram_rows_pl(batch, 2).to_pandas()
            assert sorted(plg["gram"]) == sorted(py["gram"])
            assert list(plg["sz"].unique()) == list(py["sz"].unique())


class TestTeeEmptySchema:
    def test_empty_stage_uses_schema_hint_without_recompute(self, tmp_path):
        from graph_rag_agent_ray.state.snapshots import SnapshotStore, fingerprint

        calls = {"n": 0}

        def compute():
            calls["n"] += 1
            return rd.from_arrow(pa.table(
                {"k": pa.array([], pa.int64()),
                 "v": pa.array([], pa.string())}))

        store = SnapshotStore(str(tmp_path))
        hint = pa.schema([("k", pa.int64()), ("v", pa.string())])
        lazy, commit = store.tee_stage("st", fingerprint("x"), compute,
                                       schema=hint)
        lazy.materialize()
        out = commit()
        assert calls["n"] == 1  # the schema hint avoided the re-execution
        assert out.count() == 0
        assert set(out.schema().names) == {"k", "v"}
