"""CLI (`python -m graph_rag_agent_ray`) end-to-end in subprocesses."""

import json
import os
import subprocess
import sys

import pytest


def _run(args, timeout=240):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    out = subprocess.run(
        [sys.executable, "-m", "graph_rag_agent_ray", *args],
        env=env, cwd="/root/repo", capture_output=True, text=True,
        timeout=timeout,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


class TestCLI:
    def test_synth_build_validate_update(self, tmp_path):
        corpus = str(tmp_path / "corpus")
        kg = str(tmp_path / "kg")
        kg2 = str(tmp_path / "kg2")

        r = _run(["synth", "--out", corpus, "--docs", "40"])
        assert r["docs"] == 40

        r = _run(["build", "--input", f"{corpus}/documents.parquet", "--out", kg])
        assert r["chunks"] == 40 and r["edges"] > 0

        r = _run(["validate", "--out", kg])
        assert r["empty_chunks"] == 0 and r["dangling_edges"] == 0

        # mutate one document, then incremental update
        import pyarrow as pa
        import pyarrow.parquet as pq

        from graph_rag_agent_ray import schema as S
        t = pq.read_table(f"{corpus}/documents.parquet")
        rows = t.to_pylist()
        rows[0]["spans"][0]["text"] += " The person Qq Ww uses the technology Ee Rr。"
        pq.write_table(pa.Table.from_pylist(rows, schema=S.DOCUMENTS),
                       f"{corpus}/documents.parquet")

        r = _run(["update", "--input", f"{corpus}/documents.parquet",
                  "--out", kg2, "--prev", kg])
        assert r["delta"]["modified"] == 1
        assert r["delta"]["unchanged"] == 39
