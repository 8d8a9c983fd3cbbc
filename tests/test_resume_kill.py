"""Resume-after-kill: a build killed mid-run must resume from its snapshots
and produce results identical to an uninterrupted build (FIXTURES.md t2)."""

import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pytest
import ray.data as rd

from graph_rag_agent_ray import build_kg
from graph_rag_agent_ray.synth import generate

BUILD_SCRIPT = r"""
import sys
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
from graph_rag_agent_ray import build_kg
from graph_rag_agent_ray.synth import generate

out_dir = sys.argv[1]
corpus = generate(n_docs=120, seed=42)
build_kg(rd.from_arrow(corpus.documents), out_dir, input_token="kill-test")
print("BUILD_COMPLETE")
ray.shutdown()
"""


class TestResumeAfterKill:
    @pytest.mark.parametrize("kill_after_s", [6.0])
    def test_killed_build_resumes_to_identical_graph(
        self, ray_session, tmp_path, kill_after_s
    ):
        out_dir = str(tmp_path / "killed")
        env = dict(os.environ)
        env["PYTHONPATH"] = "/root/repo"
        proc = subprocess.Popen(
            [sys.executable, "-c", BUILD_SCRIPT, out_dir],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            start_new_session=True,
        )
        time.sleep(kill_after_s)
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)  # hard kill mid-pipeline
            killed = True
        else:
            killed = False  # machine was fast — build finished; still a valid resume test
        proc.wait()

        # no half-written snapshot is visible as complete: every committed
        # stage dir has a manifest (atomic rename), tmp dirs are leftovers
        if os.path.isdir(out_dir):
            for d in os.listdir(out_dir):
                p = os.path.join(out_dir, d)
                if os.path.isdir(p) and not d.endswith(".tmp") and not d.startswith("_"):
                    assert os.path.exists(os.path.join(p, "_MANIFEST.json")), d

        # resume in-process (session ray), then compare to a clean build
        corpus = generate(n_docs=120, seed=42)
        resumed = build_kg(rd.from_arrow(corpus.documents), out_dir,
                           input_token="kill-test")
        clean = build_kg(rd.from_arrow(corpus.documents),
                         str(tmp_path / "clean"), input_token="kill-test")

        for name, key in (("edges", ["src", "pred", "dst"]),
                          ("triples", ["subj", "pred", "obj", "chunk_id"]),
                          ("entities", ["entity_id"])):
            a = resumed[name].to_pandas()
            b = clean[name].to_pandas()
            sa = sorted(map(tuple, a[key].to_numpy().tolist()))
            sb = sorted(map(tuple, b[key].to_numpy().tolist()))
            assert sa == sb, (name, killed)


PARALLEL_SCRIPT = r"""
import sys
import ray
ray.init(address="local", num_cpus=int(sys.argv[2]), include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
from graph_rag_agent_ray import build_kg
from graph_rag_agent_ray.synth import generate

out_dir = sys.argv[1]
corpus = generate(n_docs=80, seed=42)
tables = build_kg(rd.from_arrow(corpus.documents), out_dir, input_token="par-test")
# consume so snapshots exist before exit
for t in ("edges", "entities", "communities"):
    tables[t].count()
ray.shutdown()
"""


class TestParallelismInvariance:
    def test_results_identical_across_num_cpus(self, tmp_path):
        """Same input, different parallelism levels (fresh Ray sessions) →
        bit-identical canonical graph (FIXTURES.md F6)."""
        import pyarrow.parquet as pq

        outs = {}
        for ncpu in (2, 4):
            out_dir = str(tmp_path / f"p{ncpu}")
            env = dict(os.environ)
            env["PYTHONPATH"] = "/root/repo"
            subprocess.run(
                [sys.executable, "-c", PARALLEL_SCRIPT, out_dir, str(ncpu)],
                env=env, cwd="/root/repo", check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            outs[ncpu] = out_dir

        def load(out_dir, stage):
            import pyarrow.dataset as pads
            return pads.dataset(f"{out_dir}/{stage}", format="parquet").to_table().to_pandas()

        for stage, key in (("edges", ["src", "pred", "dst", "n_sources"]),
                           ("entities", ["entity_id", "entity_type", "n_mentions"]),
                           ("communities", ["community_id", "rank"])):
            a = load(outs[2], stage)
            b = load(outs[4], stage)
            sa = sorted(map(tuple, a[key].to_numpy().tolist()))
            sb = sorted(map(tuple, b[key].to_numpy().tolist()))
            assert sa == sb, stage
