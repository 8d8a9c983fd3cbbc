"""CLI entry point — the ``ray job submit`` surface.

    python -m graph_rag_agent_ray build --input <documents dir/parquet> \
        --out /path/to/kg [--resume]
    python -m graph_rag_agent_ray update --input <docs> --out <new> --prev <old>
    python -m graph_rag_agent_ray validate --out <kg dir>
    python -m graph_rag_agent_ray synth --out <dir> --docs 1000
    python -m graph_rag_agent_ray query --out <kg dir> --q "<question>" \
        [--mode local|global|naive|hybrid|chain] [--k 5] [--ppr]

Replaces the reference's ``python build/main.py`` / ``build/incremental_update.py``
drivers (/root/reference/build/main.py:19-45). On a cluster:
``ray job submit --working-dir . -- python -m graph_rag_agent_ray build ...``
(Ray auto-initialises and attaches to the cluster).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="graph_rag_agent_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--token", default="")

    u = sub.add_parser("update")
    u.add_argument("--input", required=True)
    u.add_argument("--out", required=True)
    u.add_argument("--prev", required=True)
    u.add_argument("--token", default="")

    v = sub.add_parser("validate")
    v.add_argument("--out", required=True)

    s = sub.add_parser("synth")
    s.add_argument("--out", required=True)
    s.add_argument("--docs", type=int, default=1000)
    s.add_argument("--seed", type=int, default=42)

    q = sub.add_parser("query")
    q.add_argument("--out", required=True, help="built KG snapshot dir")
    q.add_argument("--q", required=True, help="the question / query text")
    q.add_argument("--mode", default="local",
                   choices=("local", "global", "naive", "hybrid", "chain"))
    q.add_argument("--k", type=int, default=5)
    q.add_argument("--ppr", action="store_true",
                   help="local mode: widen the entity context by "
                        "personalized PageRank from the vector seeds")

    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    if args.cmd == "synth":
        from .synth import generate, write_corpus
        write_corpus(generate(n_docs=args.docs, seed=args.seed), args.out)
        print(json.dumps({"written": args.out, "docs": args.docs}))
        ray.shutdown()
        return 0

    import ray.data as rd
    from .sources.documents import read_documents

    def default_token(path: str) -> str:
        """Identify the input VERSION, not just its path: fold file
        mtime+size into the token so editing a file in place invalidates
        snapshots (build_kg requires 'path+mtime or content hash')."""
        import hashlib
        import os as _os
        h = hashlib.sha1(path.encode())
        try:
            for p in sorted(
                    _os.path.join(r, f)
                    for r, _, fs in _os.walk(path) for f in fs
            ) if _os.path.isdir(path) else [path]:
                st = _os.stat(p)
                h.update(f"|{p}|{st.st_mtime_ns}|{st.st_size}".encode())
        except OSError:
            pass
        return h.hexdigest()[:16]

    if args.cmd == "build":
        from .pipelines.build import build_kg
        from .pipelines.incremental import write_registry
        docs = read_documents(args.input)
        tables = build_kg(docs, args.out, input_token=args.token or default_token(args.input))
        write_registry(read_documents(args.input), args.out,
                       input_token=args.token or default_token(args.input))
        print(json.dumps({t: tables[t].count() for t in
                          ("chunks", "triples", "entities", "edges", "communities")}))
    elif args.cmd == "update":
        from .pipelines.incremental import incremental_build_kg
        docs = read_documents(args.input)
        tables, counts = incremental_build_kg(
            docs, args.out, args.prev, input_token=args.token or default_token(args.input))
        print(json.dumps({"delta": counts,
                          "edges": tables["edges"].count()}))
    elif args.cmd == "query":
        from .pipelines import query as Q
        from .state.snapshots import SnapshotStore
        store = SnapshotStore(args.out)
        names = ("entities", "edges", "chunks", "mentions_canon",
                 "communities", "chunk_embeddings")
        tables = {n: store.read(n) for n in names}
        if args.mode == "local":
            res = Q.local_search(tables, args.q, k_entities=args.k,
                                 ppr_expand=args.ppr)
            print(json.dumps({k: v.drop(
                columns=[c for c in ("embedding",) if c in v.columns])
                .to_dict("records") for k, v in res.items()},
                ensure_ascii=False, default=str))
        elif args.mode == "global":
            res = Q.global_search(tables, limit=args.k)
            print(json.dumps(res.to_dict("records"), ensure_ascii=False,
                             default=str))
        elif args.mode == "naive":
            res = Q.naive_search(tables, args.q, k=args.k)
            print(json.dumps(res.to_dict("records"), ensure_ascii=False,
                             default=str))
        elif args.mode == "hybrid":
            res = Q.hybrid_search(tables, args.q, k_low=args.k)
            print(json.dumps({k: v.drop(
                columns=[c for c in ("embedding",) if c in v.columns])
                .to_dict("records") for k, v in res.items()},
                ensure_ascii=False, default=str))
        elif args.mode == "chain":
            res = Q.chain_of_exploration(tables, args.q,
                                         beam_width=args.k)
            print(json.dumps({
                "visited": res["visited"], "hops": res["hops"],
                "evidence": res["evidence"].to_dict("records")},
                ensure_ascii=False, default=str))
    elif args.cmd == "validate":
        from .pipelines.build import build_kg  # noqa: F401
        from .stages.validate import validate_graph
        from .state.snapshots import SnapshotStore
        store = SnapshotStore(args.out)
        tables = {name: store.read(name) for name in
                  ("entities", "chunks", "edges")}
        tables["mentions_canon"] = None
        issues = validate_graph(tables)
        print(json.dumps(issues))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
