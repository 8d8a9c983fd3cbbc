"""Snapshot format contract (state/snapshots.py): parquet roundtrip always;
Lance write/read branch when the package exists (skipped in sandboxes — the
test keeps the production branch from rotting into a dead path)."""

import pandas as pd
import pytest
import ray.data as rd

from graph_rag_agent_ray.state.snapshots import HAVE_LANCE, SnapshotStore


def _sample_ds():
    return rd.from_pandas(pd.DataFrame({
        "k": ["a", "b", "c"], "v": [1, 2, 3],
        "emb": [[0.1, 0.2], [0.3, 0.4], [0.5, 0.6]],
    }))


class TestSnapshotFormats:
    def test_parquet_roundtrip_and_manifest(self, ray_session, tmp_path):
        store = SnapshotStore(str(tmp_path))
        store.write("s1", _sample_ds(), fp="f1")
        m = store.manifest("s1")
        assert m["fingerprint"] == "f1" and m["n_rows"] == 3
        if not HAVE_LANCE:
            assert m["format"] == "parquet"
        back = store.read("s1").to_pandas().sort_values("k").reset_index(drop=True)
        assert list(back["v"]) == [1, 2, 3]

    def test_manifest_format_matches_files(self, ray_session, tmp_path):
        """The manifest must describe what was actually written (a 'lance'
        claim over parquet files would poison read-backs)."""
        import os
        store = SnapshotStore(str(tmp_path))
        store.write("s2", _sample_ds(), fp="f2")
        files = os.listdir(str(tmp_path / "s2"))
        fmt = store.manifest("s2")["format"]
        if fmt == "parquet":
            assert any(f.endswith(".parquet") for f in files)
        else:
            assert any(f.endswith(".lance") or f == "data" for f in files)

    @pytest.mark.skipif(not HAVE_LANCE, reason="lance package not installed")
    def test_lance_roundtrip(self, ray_session, tmp_path):
        store = SnapshotStore(str(tmp_path))
        store.write("s3", _sample_ds(), fp="f3")
        assert store.manifest("s3")["format"] == "lance"
        back = store.read("s3").to_pandas().sort_values("k").reset_index(drop=True)
        assert list(back["v"]) == [1, 2, 3]

    def test_empty_dataset_roundtrip(self, ray_session, tmp_path):
        import pyarrow as pa
        store = SnapshotStore(str(tmp_path))
        empty = rd.from_arrow(pa.table({"k": pa.array([], pa.string())}))
        store.write("s4", empty, fp="f4")
        assert store.read("s4").count() == 0
