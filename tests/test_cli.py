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


def test_build_from_raw_file_directory(tmp_path):
    """CLI --input pointed at a raw-file directory routes through the
    read_directory dispatcher and builds end-to-end."""
    import subprocess, sys, os
    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.txt").write_text(
        "The person Alfa Beta leads the organization Gamma Delta。",
        encoding="utf-8")
    (d / "b.md").write_text(
        "The person Alfa Beta uses the technology Epsilon Zeta。",
        encoding="utf-8")
    out = tmp_path / "kg"
    r = subprocess.run(
        [sys.executable, "-m", "graph_rag_agent_ray", "build",
         "--input", str(d), "--out", str(out)],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    import pyarrow.parquet as pq
    chunks = pq.read_table(str(out / "chunks"))
    assert chunks.num_rows == 2
    assert set(chunks.column("doc_id").to_pylist()) == {"a.txt", "b.md"}


def test_query_modes(tmp_path):
    """query subcommand over a freshly built KG: every mode returns
    non-empty JSON with the expected shape."""
    corpus = str(tmp_path / "c")
    kg = str(tmp_path / "k")
    _run(["synth", "--out", corpus, "--docs", "40"])
    _run(["build", "--input", f"{corpus}/documents.parquet", "--out", kg])

    local = _run(["query", "--out", kg, "--q", "test query", "--mode",
                  "local", "--k", "3", "--ppr"])
    assert set(local) == {"entities", "edges", "chunks", "communities"}
    assert len(local["entities"]) > 0

    glob = _run(["query", "--out", kg, "--q", "x", "--mode", "global"])
    assert glob and "summary" in glob[0]

    naive = _run(["query", "--out", kg, "--q", "test", "--mode", "naive"])
    assert naive and "chunk_id" in naive[0]

    hyb = _run(["query", "--out", kg, "--q", "test", "--mode", "hybrid"])
    assert set(hyb) == {"low_entities", "low_edges", "low_chunks",
                        "high_communities"}

    chain = _run(["query", "--out", kg, "--q", "test", "--mode", "chain"])
    assert "visited" in chain and len(chain["visited"]) > 0
