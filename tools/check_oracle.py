"""Local stand-in for the driver's correctness gate: run every queries()
entry and compare with its oracle_sql() via DuckDB (row count, sorted-column
schema, order-insensitive value hash). Usage:

    python tools/check_oracle.py [sf_dir]
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        hashlib.sha1(repr(tuple(r)).encode()).hexdigest()
        for r in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha1()
    for r in rows:
        h.update(r.encode())
    return h.hexdigest()


def main(sf_dir: str) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    import time as _time
    for name, fn in qs.items():
        _t0 = _time.monotonic()
        try:
            ours = _to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        _q_sec = _time.monotonic() - _t0
        if name not in oracles:
            print(f"rows  {name}: {len(ours)} rows (no oracle)")
            continue
        try:
            theirs = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {e}")
            failures += 1
            continue
        ok_rows = len(ours) == len(theirs)
        ok_schema = sorted(map(str.lower, ours.columns)) == sorted(map(str.lower, theirs.columns))
        ours.columns = [c.lower() for c in ours.columns]
        theirs.columns = [c.lower() for c in theirs.columns]
        # normalize dtypes for hashing: ints to int64, floats rounded
        for df in (ours, theirs):
            for c in df.columns:
                if pd.api.types.is_integer_dtype(df[c]):
                    df[c] = df[c].astype("int64")
                elif pd.api.types.is_bool_dtype(df[c]):
                    df[c] = df[c].astype(bool)
        ok_hash = ok_schema and value_hash(ours) == value_hash(theirs)
        status = "OK  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status}  {name}: rows {len(ours)}/{len(theirs)} "
              f"schema={ok_schema} hash={ok_hash} q_sec={_q_sec:.2f}")
        if not ok_hash and ok_rows and ok_schema and len(ours) < 50:
            print("  ours:", ours.sort_values(list(ours.columns)).head(10).to_dict("records")[:3])
            print("  theirs:", theirs.sort_values(list(theirs.columns)).head(10).to_dict("records")[:3])
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    rc = main(sf)
    import ray
    ray.shutdown()
    sys.exit(1 if rc else 0)
