"""SnapshotStore.tee_stage — the write-through checkpoint used by the fresh
build path (pipelines/build.py): the parquet snapshot lands per-batch INSIDE
the consuming pipeline, the manifest commits after the consumer executes,
and a resume reads the committed snapshot like any classic stage."""

import json
import os

import pyarrow as pa
import pytest
import ray.data

from graph_rag_agent_ray.state.snapshots import SnapshotStore, fingerprint


def _src_tbl(n=100):
    return pa.table({"k": list(range(n)), "v": [f"v{i}" for i in range(n)]})


class TestTeeStage:
    def test_commit_after_consume_roundtrips(self, tmp_path):
        store = SnapshotStore(str(tmp_path))
        fp = fingerprint("t1")
        lazy, commit = store.tee_stage(
            "stage_a", fp, lambda: ray.data.from_arrow(_src_tbl()))
        # consume: a downstream aggregate executes the teed pipeline once
        total = lazy.map_batches(
            lambda b: pa.table({"s": [pa.compute.sum(b.column("k")).as_py()]}),
            batch_format="pyarrow").materialize()
        assert sum(r["s"] for r in total.take_all()) == sum(range(100))
        out = commit()
        assert store.is_complete("stage_a", fp)
        pdf = out.to_pandas().sort_values("k").reset_index(drop=True)
        assert list(pdf["k"]) == list(range(100))
        # manifest records the tee and the true row count
        m = store.manifest("stage_a")
        assert m["teed"] is True and m["n_rows"] == 100

    def test_resume_hit_returns_snapshot_with_noop_commit(self, tmp_path):
        store = SnapshotStore(str(tmp_path))
        fp = fingerprint("t2")
        lazy, commit = store.tee_stage(
            "stage_b", fp, lambda: ray.data.from_arrow(_src_tbl(10)))
        lazy.materialize()
        commit()
        # second call with the same fingerprint: no tmp dir, data served
        # from the snapshot, commit is a no-op returning the same handle
        lazy2, commit2 = store.tee_stage(
            "stage_b", fp, lambda: (_ for _ in ()).throw(AssertionError(
                "compute must not run on a fingerprint hit")))
        assert lazy2.count() == 10
        assert commit2().count() == 10
        assert not os.path.exists(str(tmp_path / "stage_b.tmp"))

    def test_retry_overwrites_not_duplicates(self, tmp_path):
        """Content-addressed tee filenames: re-running the same pipeline
        (Ray's task-retry shape) rewrites the same files instead of
        duplicating rows."""
        store = SnapshotStore(str(tmp_path))
        fp = fingerprint("t3")
        lazy, commit = store.tee_stage(
            "stage_c", fp, lambda: ray.data.from_arrow(_src_tbl(50)))
        lazy.materialize()
        lazy.materialize()  # a second execution = every task retried once
        out = commit()
        assert out.count() == 50

    def test_empty_stage_commits_schema(self, tmp_path):
        store = SnapshotStore(str(tmp_path))
        fp = fingerprint("t4")
        empty = pa.table({"k": pa.array([], pa.int64()),
                          "v": pa.array([], pa.string())})
        lazy, commit = store.tee_stage(
            "stage_d", fp, lambda: ray.data.from_arrow(empty))
        lazy.materialize()
        out = commit()
        assert out.count() == 0
        assert set(out.schema().names) == {"k", "v"}
        assert store.is_complete("stage_d", fp)

    def test_build_kg_tee_snapshots_match_classic(self, tmp_path):
        """A fresh build's teed chunks/mentions/triples snapshots are
        value-identical to a classic (resume-path) recompute of the same
        stages from the extraction snapshot."""
        import pandas as pd

        from graph_rag_agent_ray import build_kg
        from graph_rag_agent_ray.stages.parse import parse_mentions, parse_triples
        from graph_rag_agent_ray.synth import generate

        c = generate(n_docs=30, seed=7)
        out_dir = str(tmp_path / "kg")
        build_kg(ray.data.from_arrow(c.documents), out_dir, input_token="tee30")
        store = SnapshotStore(out_dir)
        for stage in ("chunks", "mentions", "triples"):
            assert store.manifest(stage).get("teed") is True, stage
        extractions = store.read("extractions")
        for stage, fn in (("mentions", parse_mentions),
                          ("triples", parse_triples)):
            teed = store.read(stage).to_pandas()
            fresh = fn(extractions).to_pandas()
            cols = sorted(teed.columns)
            a = teed[cols].sort_values(cols).reset_index(drop=True)
            b = fresh[cols].sort_values(cols).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
        # lineage carries the tee records
        rows = [json.loads(line)
                for line in open(os.path.join(out_dir, "_lineage.jsonl"))]
        assert any(r.get("stage") == "mentions" and r.get("teed")
                   for r in rows)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
