"""Incremental-update scheduler + manual-edit conflict resolution.

Reference semantics:
- ``IncrementalUpdateScheduler`` (/root/reference/build/incremental/
  incremental_update_scheduler.py:22-118): a background loop with
  per-component intervals that repeatedly applies the incremental update.
- ``ManualEditManager`` (/root/reference/build/incremental/
  manual_edit_manager.py:363-477): user edits to entities carry a
  ``protected`` flag and a conflict strategy — ``manual_first`` (the manual
  value survives rebuilds), ``auto_first`` (the pipeline value wins, manual
  fills gaps), ``merge`` (field-level union/concat).

Ray-Data re-expression: the scheduler is a thin driver loop over
``incremental_build_kg`` ticks (each tick is the registry-diff + carry-over
build in pipelines/incremental.py); manual edits are a small parquet table
applied to the ``entities`` Dataset as a broadcast map_batches overlay after
every build — edits are data, not mutations, so replays are idempotent and
survive any number of rebuilds.
"""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..config import KGConfig

MANUAL_EDITS_FILE = "manual_edits.parquet"
STRATEGIES = ("manual_first", "auto_first", "merge")

_EDITS_SCHEMA = pa.schema([
    ("entity_id", pa.string()),
    ("description", pa.string()),      # empty string = no manual value
    ("entity_type", pa.string()),      # empty string = no manual value
    ("protected", pa.bool_()),
    ("edited_at", pa.float64()),
])


class ManualEditManager:
    """Records manual entity edits and overlays them onto a built entities
    table under a conflict strategy. Edits persist as parquet next to the
    build snapshots, so every scheduler tick re-applies them."""

    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, MANUAL_EDITS_FILE)

    def load(self) -> pd.DataFrame:
        if os.path.exists(self.path):
            return pq.read_table(self.path).to_pandas()
        return _EDITS_SCHEMA.empty_table().to_pandas()

    def record(self, entity_id: str, description: str = "",
               entity_type: str = "", protected: bool = True,
               now: Optional[float] = None) -> None:
        """Add/replace the manual edit for one entity (last write wins)."""
        df = self.load()
        df = df[df["entity_id"] != entity_id]
        row = pd.DataFrame([{
            "entity_id": entity_id, "description": description,
            "entity_type": entity_type, "protected": bool(protected),
            "edited_at": time.time() if now is None else now,
        }])
        df = pd.concat([df, row], ignore_index=True)
        tmp = self.path + ".tmp"
        pq.write_table(pa.Table.from_pandas(df, schema=_EDITS_SCHEMA,
                                            preserve_index=False), tmp)
        os.replace(tmp, self.path)

    def apply(self, entities: "ray.data.Dataset",
              strategy: str = "manual_first") -> "ray.data.Dataset":
        """Overlay the recorded edits (broadcast once) onto the entities
        Dataset. ``manual_first``: manual values replace pipeline values.
        ``auto_first``: pipeline values win; manual only fills empties.
        ``merge``: descriptions concatenate (pipeline + manual), type manual
        wins. Protected entities missing from the build are APPENDED —
        a rebuild can never silently drop a protected entity."""
        if strategy not in STRATEGIES:
            raise ValueError(f"unknown strategy {strategy!r}; one of {STRATEGIES}")
        edits = self.load()
        if edits.empty:
            return entities
        edits_ref = ray.put(edits.set_index("entity_id"))

        def overlay(batch: pa.Table) -> pa.Table:
            import numpy as np
            e = ray.get(edits_ref)
            df = pa.Table.to_pandas(batch)
            # vectorized overlay: one left merge against the broadcast edits,
            # then np.where per strategy (no per-row .at loop)
            m = df[["entity_id"]].merge(
                e[["description", "entity_type"]], how="left",
                left_on="entity_id", right_index=True)
            md = m["description"].fillna("").to_numpy()
            mt = m["entity_type"].fillna("").to_numpy()
            d = df["description"].fillna("").to_numpy()
            t = df["entity_type"].fillna("").to_numpy()
            if strategy == "manual_first":
                df["description"] = np.where(md != "", md, d)
                df["entity_type"] = np.where(mt != "", mt, t)
            elif strategy == "merge":
                df["description"] = np.where(
                    md != "", np.char.add(np.char.add(d.astype(str), " | "), md.astype(str)), d)
                df["entity_type"] = np.where(mt != "", mt, t)
            else:  # auto_first: pipeline wins; manual fills blanks (both fields)
                df["description"] = np.where((d == "") & (md != ""), md, d)
                df["entity_type"] = np.where((t == "") & (mt != ""), mt, t)
            return pa.Table.from_pandas(df, preserve_index=False)

        overlaid = entities.map_batches(overlay, batch_format="pyarrow",
                                        batch_size=8192)

        # protected entities absent from this build get re-appended
        protected = edits[edits["protected"]]
        if protected.empty:
            return overlaid
        present = set(
            entities.select_columns(["entity_id"]).to_pandas()["entity_id"])
        missing = protected[~protected["entity_id"].isin(present)]
        if missing.empty:
            return overlaid
        # ghost rows carry TYPED defaults matching the entities schema (not
        # None) so Dataset.union schema unification and downstream numeric
        # consumers never see nulls: zero embedding (matching the tensor
        # shape), empty community list, zero degree/mentions, surface_forms
        # = [entity_id]
        import numpy as np
        schema = overlaid.schema()
        n = len(missing)
        cols = {}
        for name, typ in zip(schema.names, schema.types):
            shape = getattr(typ, "shape", None)  # Ray tensor extension type
            if name == "entity_id":
                vals = missing["entity_id"].tolist()
            elif name == "description":
                vals = [d or "" for d in missing["description"]]
            elif name == "entity_type":
                vals = [t or "" for t in missing["entity_type"]]
            elif name == "surface_forms":
                vals = [[eid] for eid in missing["entity_id"]]
            elif shape is not None:
                dt = getattr(getattr(typ, "scalar_type", None), "to_pandas_dtype",
                             lambda: np.float32)()
                vals = [np.zeros(shape, dtype=dt) for _ in range(n)]
            elif isinstance(typ, pa.DataType) and pa.types.is_list(typ):
                vals = [[] for _ in range(n)]
            elif isinstance(typ, pa.DataType) and pa.types.is_integer(typ):
                vals = [0] * n
            elif isinstance(typ, pa.DataType) and pa.types.is_floating(typ):
                vals = [0.0] * n
            else:
                vals = [""] * n
            cols[name] = pd.Series(vals, dtype=object) \
                if (shape is not None or isinstance(vals[0], list)) else vals
        # from_pandas so ndarray-object columns re-enter the tensor extension
        return overlaid.union(ray.data.from_pandas(pd.DataFrame(cols)))


@dataclass
class TickResult:
    tick: int
    out_dir: str
    delta: Dict[str, int]
    tables: Dict[str, "ray.data.Dataset"] = field(repr=False, default=None)


class IncrementalScheduler:
    """Driver loop over incremental ticks (reference scheduler thread,
    incremental_update_scheduler.py:89-201, minus wall-clock coupling: the
    interval is injectable and ``tick()`` is callable directly, so tests and
    cron-style external schedulers both work).

    ``docs_fn()`` returns the CURRENT documents Dataset each tick (the
    changing input); each tick builds into ``<root>/tick-N`` against the
    previous tick's snapshots and re-applies manual edits with the
    configured conflict strategy."""

    def __init__(self, docs_fn: Callable[[], "ray.data.Dataset"],
                 root_dir: str, cfg: Optional[KGConfig] = None,
                 strategy: str = "manual_first",
                 interval_s: float = 60.0,
                 extractor_cls=None) -> None:
        from ..stages.extract import MockLLMExtractor

        self.docs_fn = docs_fn
        self.root = root_dir
        self.cfg = cfg or KGConfig()
        self.strategy = strategy
        self.interval_s = interval_s
        self.extractor_cls = extractor_cls or MockLLMExtractor
        self.n_ticks = 0
        self.history: List[TickResult] = []
        self._stop = threading.Event()
        self.edits = ManualEditManager(root_dir)

    def _tick_dir(self, n: int) -> str:
        return os.path.join(self.root, f"tick-{n:04d}")

    def tick(self) -> TickResult:
        """Run ONE incremental update against the previous tick's build."""
        from .build import build_kg
        from .incremental import incremental_build_kg, write_registry

        docs = self.docs_fn()
        n = self.n_ticks
        out_dir = self._tick_dir(n)
        token = f"tick{n}"
        if n == 0:
            tables = build_kg(docs, out_dir, cfg=self.cfg, input_token=token,
                              extractor_cls=self.extractor_cls)
            write_registry(docs, out_dir, cfg=self.cfg, input_token=token)
            delta = {"added": int(docs.count()), "modified": 0,
                     "deleted": 0, "unchanged": 0}
        else:
            tables, delta = incremental_build_kg(
                docs, out_dir, self._tick_dir(n - 1), cfg=self.cfg,
                input_token=token, extractor_cls=self.extractor_cls)
        tables["entities"] = self.edits.apply(tables["entities"], self.strategy)
        self.n_ticks += 1
        res = TickResult(tick=n, out_dir=out_dir, delta=delta, tables=tables)
        self.history.append(res)
        return res

    def run(self, max_ticks: Optional[int] = None,
            sleep=time.sleep) -> List[TickResult]:
        """Loop tick() every ``interval_s`` until stop() or max_ticks."""
        while not self._stop.is_set():
            self.tick()
            if max_ticks is not None and self.n_ticks >= max_ticks:
                break
            if self._stop.wait(0) is False:
                sleep(self.interval_s)
        return self.history

    def start(self) -> threading.Thread:
        """Background-thread mode (the reference's scheduler shape)."""
        t = threading.Thread(target=self.run, daemon=True)
        t.start()
        return t

    def stop(self) -> None:
        self._stop.set()
