"""Stage snapshots + lineage: the checkpoint/resume layer.

The reference's work-skipping is an sha1-keyed pickle cache per chunk plus a
file-hash registry (/root/reference/graph/extraction/entity_extractor.py:89-143,
build/incremental/file_change_manager.py:31-130). Here every stage writes a
partitioned Parquet snapshot (Lance when the ``lance`` package is available —
same layout, this sandbox ships only Parquet) under
``<out_dir>/<stage>/`` with a ``_MANIFEST.json`` recording the stage's input
fingerprint, row count, wall time and config hash. A re-run with the same
fingerprint reads the snapshot instead of recomputing — partition-granular
resume, the scaled-up equivalent of the reference's per-chunk cache hits.

Writes are atomic: data lands in ``<stage>.tmp/`` and is renamed into place
after the manifest is written, so a killed run never leaves a half-snapshot
that a resume would trust.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Any, Callable, Dict, Optional

import ray.data

try:
    # ray.data's path resolution imports this on every read; without aiohttp
    # the import fails every time, and two snapshot jobs on different threads
    # can race the failing import and see a half-initialized module
    # (ImportError: HTTPFileSystem). Install a stub once so the import is
    # deterministic; ray only uses it for an isinstance check.
    import fsspec.implementations.http  # noqa: F401
except ImportError:
    import sys as _sys
    import types as _types

    import fsspec.implementations as _fsimpl

    _stub = _types.ModuleType("fsspec.implementations.http")

    class _StubHTTPFileSystem:  # aiohttp absent in this sandbox
        pass

    _stub.HTTPFileSystem = _StubHTTPFileSystem
    _sys.modules["fsspec.implementations.http"] = _stub
    _fsimpl.http = _stub

try:  # Lance is the intended production format; gate on availability
    import lance  # type: ignore  # noqa: F401
    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False

MANIFEST = "_MANIFEST.json"


def fingerprint(*parts: Any) -> str:
    h = hashlib.sha1()
    for p in parts:
        h.update(repr(p).encode("utf-8"))
    return h.hexdigest()


class SnapshotStore:
    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.out_dir, stage)

    def manifest(self, stage: str) -> Optional[Dict]:
        path = os.path.join(self._stage_dir(stage), MANIFEST)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def is_complete(self, stage: str, fp: str) -> bool:
        m = self.manifest(stage)
        return bool(m) and m.get("fingerprint") == fp

    def read(self, stage: str, columns=None) -> "ray.data.Dataset":
        # small snapshots coalesce into one or two blocks by default, which
        # caps downstream actor-pool parallelism — spread them over the
        # cluster's CPUs (read tasks cap at the file/row-group count anyway).
        # ``columns`` pushes a projection into the read (only the named
        # columns leave storage — prune-at-the-read for delta scans).
        import ray as _ray
        n_blocks = max(8, int(_ray.cluster_resources().get("CPU", 8)) * 2)
        m = self.manifest(stage)
        if m and m.get("format") == "lance" and HAVE_LANCE:
            return ray.data.read_lance(self._stage_dir(stage), columns=columns)
        if m and m.get("delta"):
            return self._read_delta(stage, m, columns, n_blocks)
        return ray.data.read_parquet(
            self._stage_dir(stage), override_num_blocks=n_blocks, columns=columns
        )

    def read_local(self, stage: str, columns=None):
        """Driver-side Arrow read of a PLAIN-parquet snapshot, or None when
        the snapshot needs distributed machinery (delta layout / lance) or
        doesn't exist. Exists because a Dataset execution has ~0.5 s fixed
        scheduling cost — for the small control-plane reads on the
        incremental critical path (a vocabulary column, a membership table)
        a direct ``pyarrow.parquet`` read is ~ms. Data-plane reads must
        stay on :meth:`read` (they need the cluster)."""
        m = self.manifest(stage)
        if not m or m.get("format") == "lance" or m.get("delta"):
            return None
        import pyarrow.parquet as pq

        try:
            return pq.read_table(self._stage_dir(stage), columns=columns)
        except Exception:
            return None

    def _read_delta(self, stage: str, m: Dict, columns, n_blocks: int):
        """Read a delta-layout snapshot: files grouped by generation, each
        group filtered by the union of all LATER generations' tombstoned
        keys (a row written at gen g is dead iff a later tick superseded or
        deleted its document)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        d = m["delta"]
        key_col = d["key_col"]
        gens: Dict[int, list] = {}
        for fname, g in d["files"].items():
            gens.setdefault(int(g), []).append(
                os.path.join(self._stage_dir(stage), fname))
        tombs = {int(g): set(ids) for g, ids in d["tombstones"].items()}
        read_cols = columns
        drop_key = False
        if columns is not None and key_col not in columns:
            read_cols = list(columns) + [key_col]
            drop_key = True
        parts = []
        per_group_blocks = max(4, n_blocks // max(1, len(gens)))
        for g in sorted(gens):
            later = set()
            for g2, ids in tombs.items():
                if g2 > g:
                    later |= ids
            ds_g = ray.data.read_parquet(
                sorted(gens[g]), override_num_blocks=per_group_blocks,
                columns=read_cols)
            if later:
                dead_ref = ray.put(pa.array(sorted(later), pa.string()))

                def _alive(batch: pa.Table, _ref=dead_ref, _col=key_col) -> pa.Table:
                    return batch.filter(pc.invert(pc.is_in(
                        batch.column(_col), value_set=ray.get(_ref))))

                ds_g = ds_g.map_batches(_alive, batch_format="pyarrow",
                                        batch_size=None)
            if drop_key:
                ds_g = ds_g.select_columns(list(columns))
            parts.append(ds_g)
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    def write_local(self, stage: str, table, fp: str,
                    extra: Optional[Dict] = None) -> None:
        """Atomically persist a DRIVER-SIDE Arrow table as a plain-parquet
        snapshot (same tmp+rename protocol as :meth:`write`, one file, no
        Dataset execution). For control-plane-sized tables only — community
        membership, carried parts — where a distributed write's ~0.5 s
        fixed cost dwarfs the bytes moved."""
        import pyarrow.parquet as pq

        final = self._stage_dir(stage)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        t0 = time.monotonic()
        pq.write_table(table, os.path.join(tmp, "local-0.parquet"))
        manifest = {
            "stage": stage, "fingerprint": fp,
            "wall_s": round(time.monotonic() - t0, 3),
            "n_files": 1, "n_rows": table.num_rows, "format": "parquet",
            "written_at": time.time(),
        }
        manifest.update(extra or {})
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

    def write(self, stage: str, ds: "ray.data.Dataset", fp: str,
              extra: Optional[Dict] = None) -> "ray.data.Dataset":
        """Materialize ``ds`` into the snapshot atomically; returns a Dataset
        reading back from the snapshot (downstream stages stream from disk,
        decoupling their lineage from upstream recompute)."""
        final = self._stage_dir(stage)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        t0 = time.monotonic()
        fmt = "parquet"
        if HAVE_LANCE and hasattr(ds, "write_lance"):
            try:  # production format; fall back to parquet on any failure
                ds.write_lance(tmp)
                fmt = "lance"
            except Exception:  # noqa: BLE001 - e.g. empty dataset edge cases
                shutil.rmtree(tmp, ignore_errors=True)
                os.makedirs(tmp, exist_ok=True)
                ds.write_parquet(tmp)
        else:
            ds.write_parquet(tmp)
        wall = time.monotonic() - t0
        if fmt == "lance":
            import lance as _lance
            n_rows = _lance.dataset(tmp).count_rows()
            manifest = {
                "stage": stage, "fingerprint": fp, "wall_s": round(wall, 3),
                "n_files": 1, "n_rows": n_rows, "format": "lance",
                "written_at": time.time(),
            }
            if extra:
                manifest.update(extra)
            with open(os.path.join(tmp, MANIFEST), "w") as f:
                json.dump(manifest, f)
            if os.path.exists(final):
                shutil.rmtree(final)
            os.replace(tmp, final)
            return self.read(stage)
        n_files = len([f for f in os.listdir(tmp) if f.endswith(".parquet")])
        if n_files == 0:
            # empty dataset: write_parquet emits nothing — persist an explicit
            # empty file so the snapshot read-back has a schema
            import pyarrow as pa
            import pyarrow.parquet as pq
            schema = ds.schema(fetch_if_missing=True)
            arrow_schema = getattr(schema, "base_schema", None) if schema else None
            if not isinstance(arrow_schema, pa.Schema):
                # pandas-block schemas have no Arrow base — rebuild from names
                names = list(getattr(schema, "names", []) or [])
                arrow_schema = pa.schema([(n, pa.string()) for n in names])
            pq.write_table(arrow_schema.empty_table(), os.path.join(tmp, "empty.parquet"))
            n_files = 1
        try:
            # row count from parquet footers only — no data read
            import pyarrow.dataset as pads
            n_rows = pads.dataset(tmp, format="parquet").count_rows()
        except Exception:  # noqa: BLE001
            n_rows = -1
        manifest = {
            "stage": stage,
            "fingerprint": fp,
            "wall_s": round(wall, 3),
            "n_files": n_files,
            "n_rows": n_rows,
            "format": "parquet",
            "written_at": time.time(),
        }
        manifest.update(extra or {})
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        return self.read(stage)

    # generations before a delta chain is compacted into a full rewrite
    MAX_DELTA_GENS = 8
    # tombstoned-row fraction of the base that triggers compaction
    MAX_TOMBSTONE_FRACTION = 0.25

    def write_delta(
        self,
        stage: str,
        prev_store: "SnapshotStore",
        delta_ds: "ray.data.Dataset",
        dead_keys,
        fp: str,
        key_col: str = "doc_id",
    ) -> "ray.data.Dataset":
        """O(delta) snapshot update: the new snapshot REUSES the previous
        snapshot's immutable parquet files (hardlinked — no data copied),
        records ``dead_keys`` as a new-generation tombstone set, and writes
        only ``delta_ds``'s rows. ``read`` reconstructs
        ``prev − dead + delta`` exactly. This is the Ray-side analog of a
        deletion-vector table format (the reference's dirty-flag store,
        build/incremental_graph_builder.py:520-560, bounds update I/O the
        same way); at 100 TB a 1% tick must not rewrite 99% of its bytes.

        Falls back to a full rewrite (compaction) when the chain is
        ``MAX_DELTA_GENS`` deep or the accumulated tombstones exceed
        ``MAX_TOMBSTONE_FRACTION`` of the base rows — reads stay O(files)
        and dead bytes are reclaimed on a bounded schedule.
        """
        prev_dir = prev_store._stage_dir(stage)
        prev_m = prev_store.manifest(stage)
        dead = sorted(set(map(str, dead_keys)))

        def _compacted() -> "ray.data.Dataset":
            import pyarrow as pa
            import pyarrow.compute as pc
            alive = prev_store.read(stage)
            if dead:
                dead_ref = ray.put(pa.array(dead, pa.string()))

                def _drop(batch: pa.Table) -> pa.Table:
                    return batch.filter(pc.invert(pc.is_in(
                        batch.column(key_col), value_set=ray.get(dead_ref))))

                alive = alive.map_batches(_drop, batch_format="pyarrow",
                                          batch_size=None)
            return delta_ds.union(alive)

        if not prev_m or prev_m.get("format") != "parquet":
            return self.write(stage, _compacted(), fp)

        prev_delta = prev_m.get("delta") or {}
        prev_files = prev_delta.get("files")
        if prev_files is None:
            prev_files = {f: 0 for f in os.listdir(prev_dir)
                          if f.endswith(".parquet")}
        prev_tombs = {int(g): list(ids) for g, ids in
                      prev_delta.get("tombstones", {}).items()}
        new_gen = (max((int(g) for g in prev_files.values()), default=0)) + 1
        all_tomb_ids = set(dead)
        for ids in prev_tombs.values():
            all_tomb_ids.update(ids)

        import pyarrow.dataset as pads
        try:
            base_rows = pads.dataset(
                [os.path.join(prev_dir, f) for f in prev_files],
                format="parquet").count_rows()
        except Exception:  # noqa: BLE001
            base_rows = 0
        if (new_gen > self.MAX_DELTA_GENS
                or (base_rows and len(all_tomb_ids) >
                    self.MAX_TOMBSTONE_FRACTION * base_rows)):
            return self.write(stage, _compacted(), fp)

        final = self._stage_dir(stage)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        t0 = time.monotonic()
        for fname in prev_files:
            src = os.path.join(prev_dir, fname)
            dst = os.path.join(tmp, fname)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(src, dst)
            except OSError:  # cross-device: fall back to a copy
                shutil.copy2(src, dst)
        delta_dir = os.path.join(tmp, f"gen{new_gen}")
        os.makedirs(delta_dir, exist_ok=True)
        delta_ds.write_parquet(delta_dir)
        files = {fname: int(g) for fname, g in prev_files.items()}
        for f in os.listdir(delta_dir):
            if f.endswith(".parquet"):
                files[os.path.join(f"gen{new_gen}", f)] = new_gen
        tombs = {str(g): ids for g, ids in prev_tombs.items()}
        if dead:
            tombs[str(new_gen)] = dead
        manifest = {
            "stage": stage, "fingerprint": fp,
            "wall_s": round(time.monotonic() - t0, 3),
            "n_files": len(files), "n_rows": -1, "format": "parquet",
            "delta": {"key_col": key_col, "files": files,
                      "tombstones": tombs, "max_gen": new_gen},
            "written_at": time.time(),
        }
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(manifest, f)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        return self.read(stage)

    def run_stage(
        self,
        stage: str,
        fp: str,
        compute: Callable[[], "ray.data.Dataset"],
        lineage: Optional["LineageLog"] = None,
    ) -> "ray.data.Dataset":
        """Resume-or-compute: if a snapshot with this fingerprint exists, read
        it (a cache hit in reference terms); otherwise compute + checkpoint."""
        if self.is_complete(stage, fp):
            if lineage is not None:
                lineage.record(stage, cached=True, wall_s=0.0)
            return self.read(stage)
        t0 = time.monotonic()
        out = self.write(stage, compute(), fp)
        if lineage is not None:
            lineage.record(stage, cached=False, wall_s=time.monotonic() - t0)
        return out

    def tee_stage(
        self,
        stage: str,
        fp: str,
        compute: Callable[[], "ray.data.Dataset"],
        lineage: Optional["LineageLog"] = None,
        schema=None,
    ):
        """Write-THROUGH checkpoint: returns ``(lazy_ds, commit)`` where
        ``lazy_ds`` is ``compute()`` with a per-batch Parquet tee appended —
        each Arrow block is written straight into the snapshot tmp dir and
        passed through unchanged, so ONE streaming pass both feeds the
        consuming pipeline and persists the stage. Compared to
        :meth:`run_stage_async_write` this removes (a) the materialization
        barrier between the stage and its consumer (the consumer streams
        block-by-block instead of waiting for the full corpus-sized table to
        land in the object store) and (b) the second pass over the data that
        the background ``write_parquet`` costs — at 10^12-doc scale the
        corpus-sized intermediates never need to sit in plasma at all.

        Contract: the caller must route ``lazy_ds`` into EXACTLY ONE
        consuming pipeline execution, then call ``commit()``, which writes
        the manifest, atomically renames tmp→final and returns the
        read-back Dataset. Tee filenames are content-addressed (sha1 of the
        block's IPC bytes), so a retried task overwrites its own partial
        file instead of duplicating rows — the write stays exactly-once
        under Ray's task retry semantics. On a fingerprint hit returns the
        snapshot read with a no-op commit."""
        if self.is_complete(stage, fp):
            if lineage is not None:
                lineage.record(stage, cached=True, wall_s=0.0)
            ds = self.read(stage)
            return ds, (lambda: ds)
        final = self._stage_dir(stage)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        t0 = time.monotonic()

        def tee(batch):
            import pyarrow as pa
            import pyarrow.parquet as pq
            if batch.num_rows == 0:
                return batch
            # content-addressed filename from the PARQUET bytes (which are
            # being produced anyway — no second serialization of the block):
            # a retried task rewrites the same file instead of duplicating
            # rows, so persistence stays exactly-once under Ray's retry
            # semantics. Requires block contents to be globally distinct —
            # true for every teed stage here (all carry doc_id/chunk_id
            # columns); two byte-identical blocks would coalesce to one.
            sink = pa.BufferOutputStream()
            pq.write_table(batch, sink)
            buf = sink.getvalue()
            name = f"tee-{hashlib.sha1(memoryview(buf)).hexdigest()}.parquet"
            path = os.path.join(tmp, name)
            with open(path + ".part", "wb") as f:
                f.write(buf)
            os.replace(path + ".part", path)  # readers never see a torn file
            return batch

        lazy = compute().map_batches(tee, batch_format="pyarrow",
                                     batch_size=None)

        def commit() -> "ray.data.Dataset":
            n_files = len([f for f in os.listdir(tmp)
                           if f.endswith(".parquet")])
            if n_files == 0:
                # empty stage: no block ever reached the tee. With a schema
                # hint, persist the empty table directly; otherwise fall
                # back to the classic write (re-executes compute() once)
                if schema is not None:
                    import pyarrow.parquet as pq
                    pq.write_table(schema.empty_table(),
                                   os.path.join(tmp, "empty.parquet"))
                else:
                    shutil.rmtree(tmp, ignore_errors=True)
                    out = self.write(stage, compute(), fp)
                    if lineage is not None:
                        lineage.record(stage, cached=False,
                                       wall_s=time.monotonic() - t0,
                                       teed=True)
                    return out
            try:
                import pyarrow.dataset as pads
                n_rows = pads.dataset(tmp, format="parquet").count_rows()
            except Exception:  # noqa: BLE001
                n_rows = -1
            manifest = {
                "stage": stage, "fingerprint": fp,
                "wall_s": round(time.monotonic() - t0, 3),
                "n_files": n_files, "n_rows": n_rows, "format": "parquet",
                "teed": True, "written_at": time.time(),
            }
            with open(os.path.join(tmp, MANIFEST), "w") as f:
                json.dump(manifest, f, indent=2)
            if os.path.exists(final):
                shutil.rmtree(final)
            os.rename(tmp, final)
            if lineage is not None:
                lineage.record(stage, cached=False,
                               wall_s=time.monotonic() - t0, teed=True)
            return self.read(stage)

        return lazy, commit

    def run_stage_async_write(
        self,
        stage: str,
        fp: str,
        compute: Callable[[], "ray.data.Dataset"],
        executor,
        lineage: Optional["LineageLog"] = None,
    ):
        """Like run_stage, but the downstream consumer streams from the
        MATERIALIZED (object-store) dataset while the Parquet checkpoint is
        written on ``executor`` in the background — the disk round-trip leaves
        the critical path. Returns (dataset, write_future)."""
        if self.is_complete(stage, fp):
            if lineage is not None:
                lineage.record(stage, cached=True, wall_s=0.0)
            ds = self.read(stage)
            fut = executor.submit(lambda: None)
            return ds, fut
        t0 = time.monotonic()
        ds = compute().materialize()
        if lineage is not None:
            lineage.record(stage, cached=False, wall_s=time.monotonic() - t0)
            lineage.record_stats(stage, ds)

        def _write():
            self.write(stage, ds, fp)

        return ds, executor.submit(_write)


class LineageLog:
    """Per-stage lineage + metrics sidecar (the reference's perf-stat dicts,
    build/build_graph.py:59-65, made durable). One JSONL row per stage run."""

    def __init__(self, out_dir: str) -> None:
        self.path = os.path.join(out_dir, "_lineage.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def record(self, stage: str, cached: bool, wall_s: float, **extra: Any) -> None:
        row = {"stage": stage, "cached": cached, "wall_s": round(wall_s, 3),
               "ts": time.time()}
        row.update(extra)
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def rows(self) -> list:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def record_stats(self, stage: str, ds) -> None:
        """Dump ray's per-operator stats for an executed dataset (the
        `ds.stats()` wall/cpu/udf breakdown) next to the lineage log — the
        per-stage tuning evidence the reference prints as wall-clock tables
        (build_graph.py:332-345)."""
        try:
            text = ds.stats()
        except Exception:  # noqa: BLE001 — observability must never fail a build
            return
        stats_dir = os.path.join(os.path.dirname(self.path), "_stats")
        os.makedirs(stats_dir, exist_ok=True)
        with open(os.path.join(stats_dir, f"{stage}.txt"), "w") as f:
            f.write(text)
