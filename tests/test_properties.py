"""Property-based tests (hypothesis) for the chunker/tokenizer/record
invariants — arbitrary inputs, not just the synthetic grammar."""

import string

from hypothesis import given, settings, strategies as st

from graph_rag_agent_ray.config import KGConfig
from graph_rag_agent_ray.functions.records import (
    format_entity,
    format_relationship,
    parse_records,
)
from graph_rag_agent_ray.functions.text import tokenize, tokenize_with_offsets
from graph_rag_agent_ray.stages.chunker import assemble_document, chunk_one_document

# record fields must not contain the reference's delimiters — the wire format
# is not escapable (graph_writer.py:48-49 regexes are non-greedy up to '"'),
# so property inputs use a delimiter-free alphabet
SAFE_FIELD = st.text(
    alphabet=string.ascii_letters + string.digits + " _-",
    min_size=1, max_size=30,
).map(str.strip).filter(bool)

MIXED_TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " .,!?。！？\n中文字符测试数据",
    min_size=0, max_size=2000,
)


class TestTokenizerProperties:
    @given(MIXED_TEXT)
    @settings(max_examples=200, deadline=None)
    def test_offsets_always_recover_substrings(self, text):
        for tok, lo, hi in tokenize_with_offsets(text):
            assert text[lo:hi] == tok

    @given(MIXED_TEXT)
    @settings(max_examples=100, deadline=None)
    def test_tokens_never_contain_whitespace(self, text):
        assert all(not any(c.isspace() for c in t) for t in tokenize(text))

    @given(MIXED_TEXT)
    @settings(max_examples=200, deadline=None)
    def test_spans_and_enders_fast_path_equivalence(self, text):
        """token_spans_and_enders (the chunker fast path, no token strings)
        must agree with the reference-semantics string tokenizer on both
        the char spans and the per-token sentence-ender flags — in
        particular no multi-char token may ever register as an ender."""
        from graph_rag_agent_ray.functions.text import (
            is_sentence_end, token_spans_and_enders)

        triples = tokenize_with_offsets(text)
        spans, enders = token_spans_and_enders(text)
        assert spans == [(lo, hi) for _, lo, hi in triples]
        assert enders == [is_sentence_end(t) for t, _, _ in triples]


class TestChunkerProperties:
    CFG = KGConfig(chunk_size=40, chunk_overlap=8)

    @given(MIXED_TEXT)
    @settings(max_examples=100, deadline=None)
    def test_every_token_covered_and_ids_consistent(self, text):
        spans = [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]
        rows = chunk_one_document("d", spans, self.CFG)
        assembled = assemble_document(spans)["text"]
        toks = tokenize(assembled)
        if not toks:
            assert rows == []
            return
        # stitch and compare token streams — no token lost or duplicated at a
        # given position
        buf = [None] * len(assembled)
        for r in rows:
            assert r["text"] == assembled[r["content_offset"]:r["content_offset"] + r["length"]]
            for i, ch in enumerate(r["text"]):
                prev = buf[r["content_offset"] + i]
                assert prev is None or prev == ch  # overlaps must agree
                buf[r["content_offset"] + i] = ch
        recovered = "".join(ch if ch is not None else " " for ch in buf)
        assert tokenize(recovered) == toks
        # positions sequential, offsets strictly increasing
        assert [r["position"] for r in rows] == list(range(len(rows)))
        offs = [r["content_offset"] for r in rows]
        assert offs == sorted(offs)

    @given(st.lists(MIXED_TEXT, min_size=1, max_size=5), st.data())
    @settings(max_examples=50, deadline=None)
    def test_assembly_range_exactness(self, texts, data):
        spans, off = [], 0
        for i, t in enumerate(texts):
            spans.append({"kind": "text", "text": t, "media_ref": "", "offset": off})
            off += len(t) + 1
            if data.draw(st.booleans()):
                spans.append({"kind": "image", "text": "", "media_ref": f"m{i}", "offset": off})
                off += 1
        out = assemble_document(spans)
        for s in out["spans"]:
            if s["kind"] == "text":
                orig = next(x for x in spans if x["offset"] == s["offset"])
                assert out["text"][s["char_start"]:s["char_end"]] == orig["text"]


class TestRecordProperties:
    @given(SAFE_FIELD, SAFE_FIELD, SAFE_FIELD)
    @settings(max_examples=200, deadline=None)
    def test_entity_roundtrip(self, name, etype, desc):
        parsed = parse_records(format_entity(name, etype, desc))
        assert parsed.entities == [(name, etype, desc)]

    @given(SAFE_FIELD, SAFE_FIELD, SAFE_FIELD, SAFE_FIELD,
           st.integers(min_value=1, max_value=10))
    @settings(max_examples=200, deadline=None)
    def test_relationship_roundtrip(self, s, t, r, d, w):
        parsed = parse_records(format_relationship(s, t, r, d, float(w)))
        assert len(parsed.relationships) == 1
        got = parsed.relationships[0]
        assert got == (s, t, r, d, float(w))


class TestSqlHashEquivalence:
    """The SQL-reproducible hash spec (functions/sqlhash.py) must compute
    identical values in numpy and DuckDB for arbitrary unicode input — the
    foundation every SQL-exact dedup oracle stands on."""

    @given(st.text(max_size=60), st.sampled_from([2, 5, 8]))
    @settings(max_examples=40, deadline=None)
    def test_gram_hashes_match_duckdb(self, text, k):
        import duckdb
        import pandas as pd
        from graph_rag_agent_ray.functions.sqlhash import gram_hashes, sql_gram_hash

        py = [int(x) for x in gram_hashes(text, k)]
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"text": [text]}))
        sql = (f"SELECT {sql_gram_hash('text', 'i', k)} AS h FROM t, "
               f"unnest(range(1, length(text) - {k} + 2)) AS u(i) ORDER BY i")
        theirs = [int(r[0]) for r in con.execute(sql).fetchall()]
        assert py == theirs

    @given(st.text(min_size=1, max_size=30).filter(lambda s: not any(
        ch.isspace() for ch in s)))
    @settings(max_examples=40, deadline=None)
    def test_md5_u64_matches_duckdb(self, token):
        import duckdb
        import pandas as pd
        from graph_rag_agent_ray.functions.sqlhash import md5_u64, sql_md5_u64

        con = duckdb.connect()
        con.register("t", pd.DataFrame({"tok": [token]}))
        theirs = con.execute(
            f"SELECT {sql_md5_u64('tok')}::HUGEINT FROM t").fetchone()[0]
        assert md5_u64(token) == int(theirs)

    @given(st.integers(min_value=0, max_value=(1 << 64) - 1))
    @settings(max_examples=30, deadline=None)
    def test_minhash_perm_matches_duckdb(self, h):
        import duckdb
        from graph_rag_agent_ray.functions.sqlhash import minhash_perm_params

        a, b = minhash_perm_params(4, seed=42)
        con = duckdb.connect()
        for i in range(4):
            with __import__("numpy").errstate(over="ignore"):
                import numpy as np
                py = int((np.uint64(a[i]) * np.uint64(h) + np.uint64(b[i])))
            theirs = con.execute(
                f"SELECT ({int(a[i])}::HUGEINT * {h}::HUGEINT + {int(b[i])}) "
                f"% 18446744073709551616").fetchone()[0]
            assert py == int(theirs)


class TestSpanIndexVectorizedProperties:
    """The vectorized SpanIndexBatch must equal assemble_document's
    bookkeeping on ARBITRARY span lists (kinds, offsets incl. duplicates,
    empty/None texts, unicode lengths)."""

    SPAN = st.fixed_dictionaries({
        "kind": st.sampled_from(["text", "image", "audio", "video"]),
        "text": st.text(alphabet="ab 中。\n", max_size=12),
        "media_ref": st.text(alphabet="mxyz:/", max_size=6),
        "offset": st.integers(min_value=0, max_value=5),
    })

    @given(st.lists(st.lists(SPAN, max_size=6), min_size=1, max_size=4))
    @settings(max_examples=60, deadline=None)
    def test_matches_assemble_document(self, docs):
        import pyarrow as pa
        import graph_rag_agent_ray.schema as S
        from graph_rag_agent_ray.stages.chunker import SpanIndexBatch

        # media spans carry no text in the real schema; normalize like the
        # generator does (text only meaningful for kind == "text")
        for spans in docs:
            for s in spans:
                if s["kind"] != "text":
                    s["text"] = ""
        batch = pa.table({
            "doc_id": pa.array([f"d{i}" for i in range(len(docs))], pa.string()),
            "spans": pa.array(docs, pa.list_(S.SPAN_STRUCT)),
        })
        got = sorted(map(tuple, SpanIndexBatch()(batch).to_pandas().to_numpy()))
        want = []
        for i, spans in enumerate(docs):
            for s in assemble_document(spans)["spans"]:
                want.append((f"d{i}", s["span_idx"], s["kind"], s["media_ref"],
                             s["offset"], s["char_start"], s["char_end"]))
        assert got == sorted(want)


class TestLocalGraphKernelProperties:
    """Pure-python properties of the driver-local graph kernels (the
    guarded fast paths of pagerank / personalized_pagerank /
    landmark_harmonic) against independent dense references."""

    EDGES = st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=1, max_size=60,
    ).map(lambda es: [(f"n{a:02d}", f"n{b:02d}") for a, b in es if a != b]
          ).filter(bool)

    @given(EDGES)
    @settings(max_examples=60, deadline=None)
    def test_power_iteration_matches_dense(self, rows):
        import numpy as np
        import pandas as pd
        from graph_rag_agent_ray.ops.graphstats import _power_iteration_local

        und = sorted({(min(a, b), max(a, b)) for a, b in rows})
        pairs = pd.DataFrame({"a": [r[0] for r in und],
                              "b": [r[1] for r in und]})
        out = _power_iteration_local(pairs, 0.85, 12, 10**9, "pr_ppb")

        nodes = sorted({x for r in und for x in r})
        idx = {v: i for i, v in enumerate(nodes)}
        A = np.zeros((len(nodes), len(nodes)))
        for a, b in und:
            A[idx[a], idx[b]] = 1.0
            A[idx[b], idx[a]] = 1.0
        deg = A.sum(axis=1)
        r = np.full(len(nodes), 1.0 / len(nodes))
        for _ in range(12):
            r = (1 - 0.85) / len(nodes) + 0.85 * (A.T @ (r / deg))
        want = {v: int(np.rint(r[i] * 1e9)) for v, i in idx.items()}
        assert dict(zip(out["node"], out["pr_ppb"])) == want
        # total mass conservation at the grid: sums to ~1e9
        assert abs(out["pr_ppb"].sum() - 10**9) <= len(nodes)

    @given(EDGES, st.integers(1, 4), st.integers(1, 6))
    @settings(max_examples=60, deadline=None)
    def test_bfs_harmonic_matches_dict_bfs(self, rows, n_landmarks, iters):
        import pandas as pd
        from collections import deque
        from graph_rag_agent_ray.ops.graphstats import (
            _bfs_harmonic_local, _lcm_upto)

        und = sorted({(min(a, b), max(a, b)) for a, b in rows})
        pairs = pd.DataFrame({"a": [r[0] for r in und],
                              "b": [r[1] for r in und]})
        out = _bfs_harmonic_local(pairs, n_landmarks, iters)

        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        landmarks = sorted(adj)[:n_landmarks]
        unit = _lcm_upto(iters)
        harm = {lm: 0 for lm in landmarks}
        for lm in landmarks:
            dist = {lm: 0}
            q = deque([lm])
            while q:
                u = q.popleft()
                if dist[u] >= iters:
                    continue
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        q.append(v)
            for v, d in dist.items():
                if d > 0:
                    harm[v] = harm.get(v, 0) + unit // d
        assert dict(zip(out["node"], out["harm_units"])) == harm


class TestCappedLists:
    """_capped_lists (vectorized sort + boundary split) ≡ the per-group
    sorted(set(...))[:cap] lambda it replaced in every hot aggregate."""

    @given(
        st.lists(
            st.tuples(st.sampled_from(["k1", "k2", "k3", ""]),
                      st.sampled_from(["A", "B"]),
                      st.text(alphabet="abcdef", min_size=0, max_size=4)),
            min_size=1, max_size=300),
        st.integers(min_value=1, max_value=5),
    )
    @settings(max_examples=60, deadline=None)
    def test_matches_lambda_formulation(self, rows, cap):
        import pandas as pd

        from graph_rag_agent_ray.stages.canonicalize import _capped_lists

        df = pd.DataFrame(rows, columns=["ka", "kb", "val"])
        keys = ["ka", "kb"]
        ref = (df.groupby(keys, sort=False)["val"]
               .agg(lambda s: sorted(set(s))[:cap])
               .reset_index(name="out"))
        got = _capped_lists(df, keys, "val", cap, "out")
        ref_d = {(r.ka, r.kb): list(r.out) for r in ref.itertuples()}
        got_d = {(r.ka, r.kb): list(r.out) for r in got.itertuples()}
        assert ref_d == got_d
