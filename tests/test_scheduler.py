"""Incremental scheduler + manual-edit conflict strategies
(pipelines/scheduler.py): ticks over a mutating corpus, protected entities
surviving rebuilds, and the three conflict strategies."""

import pyarrow as pa
import pytest
import ray.data as rd

from graph_rag_agent_ray.pipelines.scheduler import (
    IncrementalScheduler,
    ManualEditManager,
)
from graph_rag_agent_ray.synth import generate


def _mutable_docs():
    """v1 = 30 docs; v2 drops two docs and appends three new ones."""
    base = generate(n_docs=30, seed=42).documents
    extra = generate(n_docs=3, seed=99).documents
    extra = extra.set_column(0, "doc_id", pa.array(
        [f"new-{i}" for i in range(len(extra))], pa.string()))
    versions = [base, pa.concat_tables([base.slice(2), extra])]
    state = {"v": 0}

    def docs_fn():
        return rd.from_arrow(versions[min(state["v"], 1)])

    return docs_fn, state, base


class TestSchedulerTicks:
    @pytest.fixture(scope="class")
    def run_two_ticks(self, ray_session, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("sched"))
        docs_fn, state, base = _mutable_docs()
        sched = IncrementalScheduler(docs_fn, root, strategy="manual_first")
        r0 = sched.tick()
        # manual edit on a real canonical entity + a ghost entity
        ents0 = r0.tables["entities"].to_pandas()
        target = sorted(ents0["entity_id"])[0]
        sched.edits.record(target, description="MANUAL DESC", protected=True)
        sched.edits.record("GHOST PROTECTED ENTITY",
                           description="added by hand", protected=True)
        state["v"] = 1  # mutate the corpus
        r1 = sched.tick()
        return sched, r0, r1, target

    def test_delta_reflects_mutation(self, run_two_ticks):
        _, r0, r1, _ = run_two_ticks
        assert r0.delta["added"] == 30
        assert r1.delta["added"] == 3
        assert r1.delta["deleted"] == 2
        assert r1.delta["unchanged"] == 28

    def test_protected_manual_edit_survives_rebuild(self, run_two_ticks):
        _, _, r1, target = run_two_ticks
        ents = r1.tables["entities"].to_pandas().set_index("entity_id")
        assert ents.loc[target, "description"] == "MANUAL DESC"

    def test_protected_ghost_entity_appended(self, run_two_ticks):
        _, _, r1, _ = run_two_ticks
        ents = r1.tables["entities"].to_pandas()
        assert "GHOST PROTECTED ENTITY" in set(ents["entity_id"])

    def test_tick_dirs_are_separate(self, run_two_ticks):
        sched, r0, r1, _ = run_two_ticks
        assert r0.out_dir != r1.out_dir
        assert sched.n_ticks == 2


class TestConflictStrategies:
    @pytest.fixture(scope="class")
    def built(self, ray_session, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("strat"))
        docs_fn, _, _ = _mutable_docs()
        sched = IncrementalScheduler(docs_fn, root)
        r0 = sched.tick()
        ents = r0.tables["entities"].to_pandas()
        target = sorted(ents["entity_id"])[0]
        auto_desc = ents.set_index("entity_id").loc[target, "description"]
        mgr = ManualEditManager(root)
        mgr.record(target, description="MANUAL", protected=False)
        return r0.tables["entities"], mgr, target, auto_desc

    def test_manual_first(self, built):
        ents, mgr, target, _ = built
        out = mgr.apply(ents, "manual_first").to_pandas().set_index("entity_id")
        assert out.loc[target, "description"] == "MANUAL"

    def test_auto_first(self, built):
        ents, mgr, target, auto_desc = built
        out = mgr.apply(ents, "auto_first").to_pandas().set_index("entity_id")
        assert out.loc[target, "description"] == auto_desc

    def test_merge(self, built):
        ents, mgr, target, auto_desc = built
        out = mgr.apply(ents, "merge").to_pandas().set_index("entity_id")
        assert out.loc[target, "description"] == f"{auto_desc} | MANUAL"

    def test_unknown_strategy_raises(self, built):
        ents, mgr, _, _ = built
        with pytest.raises(ValueError):
            mgr.apply(ents, "nope")

    def test_last_write_wins(self, built, tmp_path):
        mgr = ManualEditManager(str(tmp_path))
        mgr.record("E", description="first")
        mgr.record("E", description="second")
        df = mgr.load()
        assert len(df) == 1 and df.iloc[0]["description"] == "second"


class TestSchedulerLoop:
    def test_run_with_max_ticks_and_stop(self, ray_session, tmp_path):
        docs_fn, _, _ = _mutable_docs()
        sched = IncrementalScheduler(docs_fn, str(tmp_path), interval_s=0.0)
        hist = sched.run(max_ticks=2, sleep=lambda _s: None)
        assert len(hist) == 2
        sched.stop()
        assert sched._stop.is_set()
