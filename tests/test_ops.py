"""Unit tests for the training-data ops: dedup family, similarity search,
text stats, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from graph_rag_agent_ray.ops import dedup as D
from graph_rag_agent_ray.ops import similarity as SIM
from graph_rag_agent_ray.ops import textstats as TS


@pytest.fixture(scope="module")
def docs_with_dups(ray_session):
    base = [
        "the quick brown fox jumps over the lazy dog again and again in the yard "
        "while the sun sets slowly behind the distant hills and the evening air "
        "grows cool and quiet as birds return to their nests for the night",
        "completely different content about ray data pipelines and arrow batches "
        "with streaming executors scheduling blocks across the object store and "
        "backpressure keeping memory bounded during wide shuffles of big tables",
        "a third document mentioning neither foxes nor pipelines at all today "
        "but instead describing gardens with tomatoes peppers and herbs growing "
        "in raised beds beside a stone path that winds toward an old wooden gate",
    ]
    rows = []
    # 0,1,2 originals; 3 exact dup of 0; 4 near dup of 0 (one word changed);
    # 5 near dup of 1 (word appended)
    texts = base + [base[0], base[0].replace("lazy", "sleepy"), base[1] + " extra"]
    for i, t in enumerate(texts):
        rows.append({"doc_id": i, "text": t})
    return rd.from_pandas(pd.DataFrame(rows))


class TestExactDedup:
    def test_groups_and_keeper(self, docs_with_dups):
        out = D.exact_dedup(docs_with_dups).to_pandas()
        assert len(out) == 5  # 6 docs, one exact dup pair
        dup_row = out[out["n_dups"] == 2]
        assert len(dup_row) == 1 and dup_row["keep_doc_id"].iloc[0] == 0


class TestMinHash:
    def test_finds_near_dups(self, docs_with_dups):
        pairs = D.minhash_duplicate_pairs(docs_with_dups, threshold=0.6).to_pandas()
        got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
        assert (0, 3) in got        # exact dup
        assert (0, 4) in got or (3, 4) in got  # near dup
        assert not any({a, b} == {1, 2} for a, b in got)  # unrelated docs

    def test_signature_deterministic(self):
        a, b = D._perm_params(64, 42)
        s1 = D.minhash_signature("hello world text", 64, 5, a, b)
        s2 = D.minhash_signature("hello world text", 64, 5, a, b)
        assert (s1 == s2).all()


class TestSimHash:
    def test_near_dup_small_hamming(self, docs_with_dups):
        pairs = D.simhash_duplicate_pairs(docs_with_dups, max_hamming=6).to_pandas()
        got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
        assert (0, 3) in got
        h0 = D.simhash64("identical words here")
        h1 = D.simhash64("identical words here")
        assert h0 == h1

    def test_exact_dup_zero_hamming(self):
        assert D.simhash64("abc def") == D.simhash64("abc def")


class TestNgramJaccard:
    def test_exact_dup_j1(self, docs_with_dups):
        pairs = D.ngram_jaccard_pairs(docs_with_dups, n=3, threshold=0.5).to_pandas()
        row = pairs[(pairs["a"] == 0) & (pairs["b"] == 3)]
        assert len(row) == 1 and row["jaccard"].iloc[0] == 1.0


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    vecs[10] = vecs[0] * 2.0          # same direction → cosine 1
    vecs[11] = vecs[0] + 0.01 * rng.standard_normal(16).astype(np.float32)
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
    }))


class TestKnn:
    def test_bruteforce_exact(self, emb_ds):
        out = SIM.knn_bruteforce(emb_ds, query_ids=[0], k=3).to_pandas()
        assert list(out.sort_values("rank")["neighbor_id"].head(2)) == [10, 11]
        assert list(out["rank"]) == [1, 2, 3]

    def test_ivf_finds_obvious_neighbour(self, emb_ds):
        out = SIM.knn_ivf(emb_ds, query_ids=[0], k=5, n_bits=2).to_pandas()
        # identical-direction vector must share every LSH bucket with query
        assert 10 in set(out["neighbor_id"])

    def test_ivf_recall_gates(self, emb_ds):
        # default config: useful recall on random-ish vectors (the hard case
        # for LSH — no cluster structure at top-10 granularity)
        assert SIM.knn_recall(emb_ds, range(8), k=10) >= 0.8
        # tuned config (documented): full Hamming coverage at n_bits=2 is
        # exact — recall 1.0 (bench reports the probe/recall curve)
        assert SIM.knn_recall(emb_ds, range(8), k=10, n_bits=2, n_probes=4) == 1.0

    def test_ivf_full_probe_equals_bruteforce(self, emb_ds):
        """Probing every cell makes multi-probe IVF exact."""
        ex = SIM.knn_bruteforce(emb_ds, query_ids=[0, 1], k=5).to_pandas()
        ap = SIM.knn_ivf(emb_ds, query_ids=[0, 1], k=5,
                         n_bits=2, n_probes=4).to_pandas()
        cols = ["query_id", "neighbor_id", "rank"]
        assert ex[cols].sort_values(cols).values.tolist() == \
            ap[cols].sort_values(cols).values.tolist()

    def test_neardup_pairs(self, emb_ds):
        pairs = D.embedding_neardup_pairs(emb_ds, threshold=0.95).to_pandas()
        got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
        assert (0, 10) in got


class TestKnnTrained:
    def test_centroids_deterministic_and_unit(self, emb_ds):
        c1 = SIM.train_centroids(emb_ds, n_centroids=4, seed=42)
        c2 = SIM.train_centroids(emb_ds, n_centroids=4, seed=42)
        assert np.array_equal(c1, c2)
        assert c1.shape == (4, 16)
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-9)

    def test_centroids_layout_independent(self, emb_ds):
        """Hash-sampled training set ⇒ identical centroids across block
        layouts (the parallelism-invariance requirement)."""
        c1 = SIM.train_centroids(emb_ds, n_centroids=4, seed=42)
        c2 = SIM.train_centroids(emb_ds.repartition(7), n_centroids=4, seed=42)
        assert np.array_equal(c1, c2)

    def test_full_probe_equals_bruteforce(self, emb_ds):
        """Probing every trained cell is exact (the driver-oracle config)."""
        ex = SIM.knn_bruteforce(emb_ds, query_ids=[0, 1, 2], k=5).to_pandas()
        ap = SIM.knn_ivf_trained(emb_ds, query_ids=[0, 1, 2], k=5,
                                 n_centroids=4, n_probes=4).to_pandas()
        cols = ["query_id", "neighbor_id", "rank"]
        assert ex[cols].sort_values(cols).values.tolist() == \
            ap[cols].sort_values(cols).values.tolist()

    def test_trained_beats_or_matches_lsh_on_clustered(self, ray_session):
        """On clustered embeddings (the realistic corpus shape) trained
        cells recover neighbours a single-probe LSH cut can split."""
        rng = np.random.default_rng(11)
        centers = rng.standard_normal((4, 16)).astype(np.float32) * 4
        vecs = np.concatenate([
            c + 0.3 * rng.standard_normal((25, 16)).astype(np.float32)
            for c in centers])
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
        }))
        r = SIM.knn_recall(ds, range(8), k=10, method=SIM.knn_ivf_trained,
                           n_centroids=4, n_probes=1)
        assert r >= 0.9  # one probe suffices when cells match the clusters

    def test_small_corpus_fallback(self, ray_session):
        """Fewer points than requested centroids must not crash."""
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                                  pa.list_(pa.float32())),
        }))
        out = SIM.knn_ivf_trained(ds, query_ids=[0], k=1,
                                  n_centroids=16, n_probes=16).to_pandas()
        assert list(out["neighbor_id"]) == [1]

    def test_auto_cell_rules(self):
        """Corpus-size rules: cells grow as 4·sqrt(n) within clamps."""
        assert SIM.auto_n_centroids(0) == 8
        assert SIM.auto_n_centroids(500) == 88          # 4·isqrt(500)
        assert SIM.auto_n_centroids(10**9) == 65536     # upper clamp
        ns = [SIM.auto_n_centroids(n) for n in (10**3, 10**5, 10**7)]
        assert ns == sorted(ns)                         # monotone
        assert SIM.auto_n_bits(50) == 5                 # 2^5 ≈ 4·sqrt(50)
        assert SIM.auto_n_bits(10**12) == 16            # upper clamp

    def test_auto_config_runs_and_recalls(self, emb_ds):
        """n_centroids=None / n_bits=None pick the corpus-size rule and the
        pipeline stays green with sane recall on the tiny fixture."""
        out = SIM.knn_ivf_trained(emb_ds, query_ids=[0], k=5,
                                  n_centroids=None, n_probes=8).to_pandas()
        assert len(out) == 5
        out2 = SIM.knn_ivf(emb_ds, query_ids=[0], k=5, n_bits=None).to_pandas()
        assert len(out2) <= 5 and len(out2) > 0

    def test_probe_layout_invariant(self, emb_ds):
        """The shuffle-free per-batch probe must give identical results
        across block layouts (partial-top-k union ⊇ per-cell top-k)."""
        a = SIM.knn_ivf_trained(emb_ds, query_ids=[0, 1, 2], k=5,
                                n_centroids=4, n_probes=2).to_pandas()
        b = SIM.knn_ivf_trained(emb_ds.repartition(7), query_ids=[0, 1, 2],
                                k=5, n_centroids=4, n_probes=2).to_pandas()
        cols = ["query_id", "neighbor_id", "rank", "sim"]
        assert a[cols].sort_values(cols).values.tolist() == \
            b[cols].sort_values(cols).values.tolist()


class TestKnnIvfPq:
    def test_codebooks_deterministic_and_shaped(self, emb_ds):
        cents = SIM.train_centroids(emb_ds, n_centroids=4, seed=42)
        b1 = SIM.train_pq(emb_ds, cents, m=4, n_codes=8, seed=42)
        b2 = SIM.train_pq(emb_ds.repartition(5), cents, m=4, n_codes=8, seed=42)
        assert np.array_equal(b1, b2)          # layout-independent training
        assert b1.shape == (4, 8, 4)           # (m, n_codes, dim/m)

    def test_indivisible_dim_raises(self, emb_ds):
        cents = SIM.train_centroids(emb_ds, n_centroids=4, seed=42)
        with pytest.raises(ValueError):
            SIM.train_pq(emb_ds, cents, m=3)   # 16 % 3 != 0

    def test_noop_prune_full_probe_is_exact(self, emb_ds):
        """Probing all cells with rerank >= batch size prunes nothing, so
        the exact-cosine rerank reproduces brute force (the oracle config)."""
        ex = SIM.knn_bruteforce(emb_ds, query_ids=[0, 1, 2], k=5).to_pandas()
        ap = SIM.knn_ivf_pq(emb_ds, query_ids=[0, 1, 2], k=5, n_centroids=4,
                            m=4, n_codes=16, n_probes=4,
                            rerank=4096).to_pandas()
        cols = ["query_id", "neighbor_id", "rank", "sim"]
        assert ex[cols].sort_values(cols).values.tolist() == \
            ap[cols].sort_values(cols).values.tolist()

    def test_sims_are_true_cosines(self, emb_ds):
        """Even at a pruning config, emitted sims must be exact cosine values
        (errors are recall-only, never wrong scores)."""
        ap = SIM.knn_ivf_pq(emb_ds, query_ids=[0], k=3, n_centroids=4,
                            m=4, n_codes=8, n_probes=2, rerank=5).to_pandas()
        ex = SIM.knn_bruteforce(emb_ds, query_ids=[0], k=50).to_pandas()
        truth = dict(zip(ex["neighbor_id"], ex["sim"]))
        for nid, sim in zip(ap["neighbor_id"], ap["sim"]):
            assert truth[nid] == sim

    def test_recall_on_clustered(self, ray_session):
        """Compressed codes + ADC prune + exact rerank on clustered
        embeddings keep recall at a single probe."""
        rng = np.random.default_rng(11)
        centers = rng.standard_normal((4, 16)).astype(np.float32) * 4
        vecs = np.concatenate([
            c + 0.3 * rng.standard_normal((25, 16)).astype(np.float32)
            for c in centers])
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
        }))
        r = SIM.knn_recall(ds, range(8), k=10, method=SIM.knn_ivf_pq,
                           n_centroids=4, m=4, n_codes=16, n_probes=1)
        assert r >= 0.9

    def test_layout_invariant(self, emb_ds):
        a = SIM.knn_ivf_pq(emb_ds, query_ids=[0, 1], k=5, n_centroids=4,
                           m=4, n_codes=8, n_probes=2).to_pandas()
        b = SIM.knn_ivf_pq(emb_ds.repartition(7), query_ids=[0, 1], k=5,
                           n_centroids=4, m=4, n_codes=8,
                           n_probes=2).to_pandas()
        cols = ["query_id", "neighbor_id", "rank", "sim"]
        assert a[cols].sort_values(cols).values.tolist() == \
            b[cols].sort_values(cols).values.tolist()


class TestContamination:
    def test_flags_ngram_overlap(self, ray_session):
        docs = rd.from_pandas(pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": [
                "the quick brown fox jumps over the lazy dog",   # benchmark
                "a quick brown fox appears",                     # shares 3-gram
                "completely different words entirely here",      # clean
                "",                                              # empty
            ],
        }))
        out = (TS.contamination_stats(docs, benchmark_ids=[0], n=3)
               .to_pandas().set_index("doc_id"))
        assert bool(out.loc[0, "contaminated"])          # benchmark self-hit
        assert bool(out.loc[1, "contaminated"])          # 'quick brown fox'
        assert not bool(out.loc[2, "contaminated"])
        assert out.loc[3, "n_grams"] == 0 and not bool(out.loc[3, "contaminated"])
        assert out.loc[1, "n_contaminated"] == 1
        # distinct-gram counting: doc 0 has 7 3-grams, all self-contaminated
        assert out.loc[0, "n_grams"] == 7 == out.loc[0, "n_contaminated"]

    def test_short_doc_and_empty_benchmark(self, ray_session):
        docs = rd.from_pandas(pd.DataFrame({
            "doc_id": [0, 1], "text": ["only two", "three tokens here"]}))
        out = (TS.contamination_stats(docs, benchmark_ids=[0], n=3)
               .to_pandas().set_index("doc_id"))
        # benchmark doc shorter than n → empty benchmark gram set
        assert not out["contaminated"].any()
        assert out.loc[0, "n_grams"] == 0 and out.loc[1, "n_grams"] == 1


class TestTextStats:
    def test_token_count_matches_python_split(self, docs_with_dups):
        out = TS.token_count(docs_with_dups).to_pandas().set_index("doc_id")
        texts = docs_with_dups.to_pandas().set_index("doc_id")["text"]
        for doc_id, text in texts.items():
            assert out.loc[doc_id, "n_tokens"] == len(text.split())

    def test_empty_text_zero_tokens(self, ray_session):
        ds = rd.from_pandas(pd.DataFrame({"doc_id": [0, 1], "text": ["", "  "]}))
        out = TS.token_count(ds).to_pandas()
        assert (out["n_tokens"] == 0).all()

    def test_quality_counts(self, ray_session):
        ds = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["Ab1. cd!"]}))
        out = TS.text_quality(ds).to_pandas().iloc[0]
        assert out["n_chars"] == 8 and out["n_punct"] == 2
        assert out["n_alpha"] == 4 and out["n_digit"] == 1

    def test_winnow_overlap_for_neardups(self, docs_with_dups):
        out = TS.winnow_fingerprints(docs_with_dups).to_pandas()
        by_doc = out.groupby("doc_id")["fp"].agg(set)
        f0, f4, f2 = by_doc[0], by_doc[4], by_doc[2]
        sim_near = len(f0 & f4) / len(f0 | f4)
        sim_far = len(f0 & f2) / len(f0 | f2)
        assert sim_near > sim_far


class TestBlockedNeardup:
    def test_subset_of_exact_and_recall(self, emb_ds):
        exact = D.embedding_neardup_pairs(emb_ds, threshold=0.95).to_pandas()
        blocked = D.embedding_neardup_blocked(
            emb_ds, threshold=0.95, n_bits=4, n_tables=12).to_pandas()
        ex = set(map(tuple, exact[["a", "b"]].to_numpy()))
        bl = set(map(tuple, blocked[["a", "b"]].to_numpy()))
        assert bl <= ex                      # blocked never invents pairs
        assert (0, 10) in bl                 # identical-direction pair found
        if ex:
            assert len(bl & ex) / len(ex) >= 0.5  # recall on this fixture

    def test_auto_table_rule(self):
        """OR-construction rule: L = ceil(ln(1-R)/ln(1-p)) with
        p = (1-acos(t)/pi)^bits; monotone in bits and target recall."""
        assert D.auto_lsh_tables(0.35, 2) == 30
        assert D.auto_lsh_tables(0.95, 2) < D.auto_lsh_tables(0.35, 2)
        assert D.auto_lsh_tables(0.35, 4) > D.auto_lsh_tables(0.35, 2)
        assert D.auto_lsh_tables(0.35, 2, target_recall=0.9) < 30
        assert D.auto_lsh_tables(0.0, 20) == 64   # cap
        assert D.auto_neardup_bits(500) == 2
        assert D.auto_neardup_bits(10**9) == 19
        bs = [D.auto_neardup_bits(n) for n in (10**4, 10**6, 10**8)]
        assert bs == sorted(bs)

    def test_auto_config_exact_on_fixture(self, emb_ds):
        """Computed knobs (n_bits=None, n_tables=None) recover every exact
        pair on the fixture — the driver-gate configuration."""
        exact = D.embedding_neardup_pairs(emb_ds, threshold=0.95).to_pandas()
        blocked = D.embedding_neardup_blocked(
            emb_ds, threshold=0.95, n_bits=None, n_tables=None).to_pandas()
        ex = set(map(tuple, exact[["a", "b"]].to_numpy()))
        bl = set(map(tuple, blocked[["a", "b"]].to_numpy()))
        assert bl == ex


class TestSqlOracleEquivalence:
    """The SQL-exact ops recompute identically in DuckDB (the driver's hard
    correctness gate, exercised here on an in-memory corpus with unicode,
    empty, and sub-k-length edge cases)."""

    @pytest.fixture(scope="class")
    def corpus(self, docs_with_dups):
        import duckdb
        pdf = docs_with_dups.to_pandas()
        extra = pd.DataFrame({
            "doc_id": [100, 101, 102, 103],
            "text": ["", "  ", "tiny", "héllo wörld ünïcode répeated héllo wörld"],
        })
        pdf = pd.concat([pdf, extra], ignore_index=True)
        con = duckdb.connect()
        con.register("documents", pdf)
        return rd.from_pandas(pdf), con

    def _assert_equal(self, ours: pd.DataFrame, con, sql: str, sort_cols):
        theirs = con.execute(sql).df()
        a = ours.sort_values(sort_cols).reset_index(drop=True)[sorted(ours.columns)]
        b = theirs.sort_values(sort_cols).reset_index(drop=True)[sorted(theirs.columns)]
        for df in (a, b):
            for c in df.columns:
                if pd.api.types.is_integer_dtype(df[c]):
                    df[c] = df[c].astype("int64")
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_minhash(self, corpus):
        from graph_rag_agent_ray.ops import oracles as O
        ds, con = corpus
        self._assert_equal(D.minhash_duplicate_pairs(ds, threshold=0.7).to_pandas(),
                           con, O.minhash_sql(threshold=0.7), ["a", "b"])

    def test_simhash(self, corpus):
        from graph_rag_agent_ray.ops import oracles as O
        ds, con = corpus
        self._assert_equal(D.simhash_duplicate_pairs(ds, max_hamming=3).to_pandas(),
                           con, O.simhash_sql(3), ["a", "b"])

    def test_ngram_jaccard(self, corpus):
        from graph_rag_agent_ray.ops import oracles as O
        ds, con = corpus
        self._assert_equal(D.ngram_jaccard_pairs(ds, n=3, threshold=0.5).to_pandas(),
                           con, O.ngram_jaccard_sql(3, 0.5), ["a", "b"])

    def test_winnow(self, corpus):
        from graph_rag_agent_ray.ops import oracles as O
        ds, con = corpus
        self._assert_equal(TS.winnow_fingerprints(ds).to_pandas(),
                           con, O.winnow_sql(), ["doc_id", "fp"])


class TestTrainingExport:
    """Composed quality→decontaminate→dedup→shard pipeline vs its one-shot
    DuckDB oracle, on a corpus where every stage drops something."""

    @pytest.fixture(scope="class")
    def export_corpus(self, ray_session):
        import duckdb
        prose = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                 "closes with a sentence here.")
        bench = "secret benchmark answer tokens appear here in order today."
        rows = [
            {"doc_id": 0, "text": bench},                     # benchmark doc
            {"doc_id": 1, "text": prose},                     # clean keeper
            {"doc_id": 2, "text": prose},                     # exact dup of 1
            {"doc_id": 3, "text": "too short."},              # quality drop
            {"doc_id": 4, "text": prose.replace(".", " {x}.")},  # brace drop
            {"doc_id": 5, "text": "leaked secret benchmark answer tokens in "
                                  "a long training document that also ends "
                                  "with proper punctuation right here."},
            {"doc_id": 6, "text": "another independent document with plenty "
                                  "of words and a full stop at the end."},
            {"doc_id": 7, "text": ""},                        # empty
        ]
        pdf = pd.DataFrame(rows)
        con = duckdb.connect()
        con.register("documents", pdf)
        return rd.from_pandas(pdf), con

    def test_matches_oracle(self, export_corpus):
        from graph_rag_agent_ray.ops import export as EX
        ds, con = export_corpus
        ours = EX.training_export(
            ds, benchmark_ids=[0], budget=20, n=3, min_words=5).to_pandas()
        theirs = con.execute(EX.training_export_sql(
            benchmark_ids=[0], budget=20, n=3, min_words=5)).df()
        a = ours.sort_values("doc_id").reset_index(drop=True)[sorted(ours.columns)]
        b = theirs.sort_values("doc_id").reset_index(drop=True)[sorted(theirs.columns)]
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        # every stage dropped its target: 0 (benchmark self-hit), 2 (dup of
        # 1), 3 (short), 4 (brace), 5 (contaminated), 7 (empty)
        assert sorted(ours["doc_id"]) == [1, 6]
        # prefix sum is in doc_id order and shards split on the budget
        assert list(ours.sort_values("doc_id")["start_offset"])[0] == 0

    def test_empty_survivors(self, export_corpus):
        from graph_rag_agent_ray.ops import export as EX
        ds, _ = export_corpus
        out = EX.training_export(
            ds, benchmark_ids=[0], budget=20, n=3, min_words=10_000)
        # schema survives the empty branch (to_pandas on an empty Ray
        # dataset drops columns — a Ray quirk, so check the Dataset schema)
        assert sorted(out.schema().names) == ["doc_id", "n_tokens", "shard",
                                              "start_offset"]
        assert len(out.to_pandas()) == 0


class TestMultimodal:
    def test_media_plumbing(self, ray_session):
        from graph_rag_agent_ray.ops.multimodal import (
            DecodeMedia, decode_media, decode_real, media_from_documents)
        from graph_rag_agent_ray.synth import generate
        docs = rd.from_arrow(generate(n_docs=40, seed=42).documents)
        media = media_from_documents(docs)
        feats = decode_media(media).to_pandas()
        assert len(feats) > 0
        assert all(len(f) == 32 for f in feats["feature"])
        # deterministic features
        feats2 = decode_media(media_from_documents(docs)).to_pandas()
        m1 = feats.sort_values("media_ref").reset_index(drop=True)
        m2 = feats2.sort_values("media_ref").reset_index(drop=True)
        assert (m1["media_ref"] == m2["media_ref"]).all()
        assert np.allclose(np.stack(m1["feature"]), np.stack(m2["feature"]))

    def test_real_codec_is_gated(self):
        from graph_rag_agent_ray.ops.multimodal import (
            DecodeMedia, codec_available, decode_real)
        if codec_available("image"):
            pytest.skip("image codec importable here — gate does not apply")
        with pytest.raises(NotImplementedError):
            decode_real(b"payload", "image")
        with pytest.raises(NotImplementedError):
            DecodeMedia(use_real_codec=True)
        # availability-selected default: no codec -> fake path
        assert DecodeMedia().use_real_codec is False

    def test_real_codec_when_importable(self):
        """Un-skips when PIL/imageio appears (the lance-roundtrip pattern):
        decode_real must decode a real PNG and DecodeMedia's auto path must
        route decodable payloads through it, falling back to the fake for
        undecodable bytes so the driver oracle is unchanged."""
        from graph_rag_agent_ray.ops.multimodal import (
            DecodeMedia, codec_available, decode_real)
        if not codec_available("image"):
            pytest.skip("no image codec importable in this container")
        import io

        from PIL import Image
        img = Image.new("RGB", (4, 4), color=(10, 200, 30))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        png = buf.getvalue()
        pixels = decode_real(png, "image")
        assert pixels.shape == (4, 4, 3)
        stage = DecodeMedia()
        assert stage.use_real_codec is True
        real = stage._decode_one(png, "image")
        fake = stage._fake_decode(png)
        assert not np.allclose(real, fake)  # histogram path, not sha1 fake
        # undecodable bytes fall back deterministically
        assert np.allclose(stage._decode_one(b"not-a-png", "image"),
                           stage._fake_decode(b"not-a-png"))


class TestNgramSampledRanking:
    def test_sampled_freq_order_identical_output(self, ray_session):
        """freq_sample_rate changes only the candidate heuristic; the
        verified pair set must be byte-identical (prefix lemma holds under
        any consistent gram order)."""
        rng = np.random.default_rng(3)
        vocab = [f"w{i}" for i in range(40)]
        texts = [" ".join(rng.choice(vocab, 30)) for _ in range(60)]
        texts[50] = texts[0]                       # exact dup
        texts[51] = texts[1] + " extra tail words here"   # near dup
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(60), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))
        full = D.ngram_jaccard_pairs(ds, n=3, threshold=0.5).to_pandas()
        sampled = D.ngram_jaccard_pairs(ds, n=3, threshold=0.5,
                                        freq_sample_rate=0.3).to_pandas()
        cols = ["a", "b", "n_common", "n_union", "jaccard"]
        assert full[cols].sort_values(["a", "b"]).values.tolist() == \
            sampled[cols].sort_values(["a", "b"]).values.tolist()
        assert ((full["a"] == 0) & (full["b"] == 50)).any()


class TestMultimodalStages:
    @pytest.fixture(scope="class")
    def media_ds(self, ray_session):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(["d1", "d1", "d2"], pa.string()),
            "media_ref": pa.array(["m://a", "m://b", "m://c"], pa.string()),
            "kind": pa.array(["image", "audio", "video"], pa.string()),
            "payload": pa.array([b"x" * 40, b"y" * 40, b"z" * 40], pa.binary()),
        }))

    def test_resize_only_images_and_exact_sizing(self, media_ds):
        from graph_rag_agent_ray.ops.multimodal import resize_images
        out = resize_images(media_ds, width=8, height=8).to_pandas()
        by_kind = out.set_index("kind")
        assert by_kind.loc["image", "resized"]
        assert len(by_kind.loc["image", "payload"]) == 64  # 8x8 bytes exactly
        assert not by_kind.loc["audio", "resized"]
        assert by_kind.loc["audio", "payload"] == b"y" * 40  # passthrough

    def test_resize_deterministic(self, media_ds):
        from graph_rag_agent_ray.ops.multimodal import ResizeImages
        a = ResizeImages(width=8, height=8)._fake_resample(b"p")
        b = ResizeImages(width=8, height=8)._fake_resample(b"p")
        assert a == b
        assert a != ResizeImages(width=16, height=16)._fake_resample(b"p")[:64]

    def test_sample_frames_explode(self, media_ds):
        from graph_rag_agent_ray.ops.multimodal import sample_frames
        out = sample_frames(media_ds, n_frames=4, duration_ms=4000).to_pandas()
        # image -> 1 frame at ts 0; audio/video -> 4 uniform frames
        assert len(out[out["kind"] == "image"]) == 1
        assert out[out["kind"] == "image"]["ts_ms"].iloc[0] == 0
        vid = out[out["kind"] == "video"].sort_values("frame_idx")
        assert list(vid["ts_ms"]) == [0, 1000, 2000, 3000]
        assert len(out) == 9
        # deterministic fake frames keyed by (ref, idx)
        assert out["frame"].map(len).eq(20).all()

    def test_real_codec_gated(self):
        from graph_rag_agent_ray.ops.multimodal import (
            ResizeImages, SampleFrames, codec_available)
        if not codec_available("image"):
            with pytest.raises(NotImplementedError):
                ResizeImages(use_real_codec=True)
        else:
            import io

            from PIL import Image
            img = Image.new("RGB", (32, 16), color=(5, 5, 250))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            resized = ResizeImages(width=8, height=8,
                                   use_real_codec=True)._real_resample(buf.getvalue())
            assert Image.open(io.BytesIO(resized)).size == (8, 8)
        if not codec_available("video"):
            with pytest.raises(NotImplementedError):
                SampleFrames(use_real_codec=True)


class TestWinnowSharedPairs:
    def test_shared_passage_detected(self, ray_session):
        """Docs sharing a long passage pair up even when the rest differs
        and reordering defeats whole-doc comparison; unrelated docs don't."""
        passage = "the quick brown fox jumps over the lazy dog near the river bank"
        texts = [
            "intro one. " + passage + " outro alpha text here",
            "completely different opening. " + passage,
            "no shared passage at all in this document about gardens and stone paths",
        ]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))
        pairs = D.winnow_shared_pairs(ds, min_shared=2).to_pandas()
        got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
        assert (0, 1) in got
        assert not any(2 in p for p in got)

    def test_max_df_drops_boilerplate_fp(self, ray_session):
        """A fingerprint present in EVERY doc is dropped by max_df, so a
        corpus of docs sharing only boilerplate yields no pairs."""
        boiler = "standard legal disclaimer text appended to every document"
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array([f"unique body {i*i} content. {boiler}"
                              for i in range(6)], pa.string()),
        }))
        strict = D.winnow_shared_pairs(ds, min_shared=1, max_df=3).to_pandas()
        loose = D.winnow_shared_pairs(ds, min_shared=1, max_df=64).to_pandas()
        assert len(loose) > len(strict)


class TestCleaningOps:
    @pytest.fixture(scope="class")
    def dirty_docs(self, ray_session):
        boiler = "COPYRIGHT 2026 Example Corp. All rights reserved."
        texts = [
            f"first body line\ncontact me at alice@example.com\n{boiler}",
            f"second doc entirely\n{boiler}\ncall +1 (555) 123-4567 today",
            "third doc has no boilerplate and no pii at all",
            f"fourth doc\n{boiler}\nbob.smith+tag@mail.example.org wrote this",
        ]
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))

    def test_boilerplate_stats(self, dirty_docs):
        from graph_rag_agent_ray.ops.clean import boilerplate_stats
        out = boilerplate_stats(dirty_docs, min_df=2).to_pandas() \
            .set_index("doc_id").sort_index()
        assert list(out["n_boilerplate"]) == [1, 1, 0, 1]
        assert out.loc[0, "n_lines"] == 3

    def test_strip_boilerplate_preserves_order(self, dirty_docs):
        from graph_rag_agent_ray.ops.clean import strip_boilerplate
        out = strip_boilerplate(dirty_docs, min_df=2).to_pandas() \
            .set_index("doc_id")
        assert out.loc[0, "text"] == \
            "first body line\ncontact me at alice@example.com"
        assert out.loc[1, "text"] == \
            "second doc entirely\ncall +1 (555) 123-4567 today"

    def test_mask_pii_counts_and_text(self, dirty_docs):
        from graph_rag_agent_ray.ops.clean import mask_pii
        out = mask_pii(dirty_docs).to_pandas().set_index("doc_id").sort_index()
        assert list(out["n_emails"]) == [1, 0, 0, 1]
        assert list(out["n_phones"]) == [0, 1, 0, 0]
        assert "[EMAIL]" in out.loc[0, "text"]
        assert "alice@example.com" not in out.loc[0, "text"]
        assert "[PHONE]" in out.loc[1, "text"]

    def test_pii_matches_duckdb_on_planted_text(self, dirty_docs):
        """The RE2/Python-re equivalence claim, checked on text that
        actually CONTAINS matches (the driver corpus mostly doesn't)."""
        import duckdb
        from graph_rag_agent_ray.ops.clean import mask_pii
        from graph_rag_agent_ray.ops.oracles import pii_sql
        ours = mask_pii(dirty_docs).to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", dirty_docs.to_pandas())
        theirs = con.execute(pii_sql()).df().sort_values("doc_id") \
            .reset_index(drop=True)
        for c in ("text", "n_emails", "n_phones"):
            assert list(ours[c]) == list(theirs[c]), c


class TestGopherAndQualityFilter:
    def test_repetition_signals(self, ray_session):
        texts = [
            "alpha beta\nalpha beta\nalpha beta\ngamma",   # dup lines
            "word word word word tail",                     # dominant word
            "",                                             # empty
        ]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))
        out = TS.gopher_repetition(ds).to_pandas().set_index("doc_id").sort_index()
        assert out.loc[0, "n_lines"] == 4
        assert out.loc[0, "n_dup_lines"] == 2          # two repeats of "alpha beta"
        assert out.loc[0, "dup_line_chars"] == 2 * len("alpha beta")
        assert out.loc[1, "top_word_chars"] == 4 * 4    # "word" x4
        assert out.loc[1, "word_chars_total"] == 4 * 4 + 4
        assert out.loc[2, "n_lines"] == 1               # "" splits to one line
        assert out.loc[2, "word_chars_total"] == 0

    def test_quality_filter_rules(self, ray_session):
        texts = [
            "a good sentence with enough words in it.",   # keep
            "too short.",                                  # < min_words
            "plenty of words here but no terminal punctuation at all",
            "code like content { return x; } with braces.",
        ]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))
        out = TS.quality_filter(ds, min_words=5).to_pandas() \
            .set_index("doc_id").sort_index()
        assert list(out["keep"]) == [True, False, False, False]


class TestLangId:
    def test_classification(self, ray_session):
        texts = [
            "this is clearly the english language text with the words",
            "这是一段完全中文的文本内容没有英文词汇",
            "texto latino sin marcador ingles aqui",
            "12345 67890 !!!",
        ]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))
        out = TS.lang_id(ds).to_pandas().set_index("doc_id").sort_index()
        assert list(out["lang"]) == ["en", "zh", "latin", "unknown"]


class TestResolveDuplicates:
    def _pairs(self):
        import pyarrow as pa
        import ray.data as rd
        # components: {1,2,3} (chain), {10,11}; singletons 5, 7 untouched
        return rd.from_arrow(pa.table({
            "a": pa.array([1, 2, 10], pa.int64()),
            "b": pa.array([2, 3, 11], pa.int64()),
        }))

    def _docs(self):
        import pyarrow as pa
        import ray.data as rd
        ids = [1, 2, 3, 5, 7, 10, 11]
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars": pa.array([i * 10 for i in ids], pa.int64()),
        }))

    def test_components_min_label(self, ray_session):
        from graph_rag_agent_ray.ops.dedup import duplicate_components
        comp = duplicate_components(self._pairs()).to_pandas()
        got = dict(zip(comp["doc_id"], comp["component"]))
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_survivors_broadcast_and_distributed_agree(self, ray_session):
        from graph_rag_agent_ray.ops.dedup import resolve_duplicates
        kept_b = (resolve_duplicates(self._docs(), self._pairs())
                  .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert kept_b["doc_id"].tolist() == [1, 5, 7, 10]
        # force the hash-anti-join path (broadcast_limit=0) — same result
        kept_d = (resolve_duplicates(self._docs(), self._pairs(),
                                     broadcast_limit=0)
                  .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(kept_b, kept_d, check_dtype=False)

    def test_no_pairs_keeps_all(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from graph_rag_agent_ray.ops.dedup import resolve_duplicates
        empty = rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}))
        kept = resolve_duplicates(self._docs(), empty).to_pandas()
        assert len(kept) == 7


class TestHashAntiJoin:
    def test_matches_pandas(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from graph_rag_agent_ray.functions.shuffle import hash_anti_join
        left = rd.from_arrow(pa.table({
            "k": pa.array(list(range(100)), pa.int64()),
            "v": pa.array([i * 2 for i in range(100)], pa.int64())}))
        right = rd.from_arrow(pa.table({
            "k": pa.array([i for i in range(0, 100, 3)], pa.int64())}))
        out = (hash_anti_join(left, right, on=["k"])
               .to_pandas().sort_values("k").reset_index(drop=True))
        assert out["k"].tolist() == [i for i in range(100) if i % 3 != 0]
        assert (out["v"] == out["k"] * 2).all()


class TestUnigramRarity:
    def test_oracle_and_layout_independence(self, ray_session, sf_dir):
        import duckdb
        import ray.data as rd
        from graph_rag_agent_ray.ops.textstats import (
            unigram_rarity,
            unigram_rarity_sql,
        )

        path = f"{sf_dir}/documents.parquet"
        docs = rd.read_parquet(path, columns=["doc_id", "text"])
        a = (unigram_rarity(docs).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (unigram_rarity(docs.repartition(7)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            a.drop(columns=["mean_logp"]), b.drop(columns=["mean_logp"]))
        # float path: layout-independent after rounding
        assert np.allclose(a["mean_logp"], b["mean_logp"], atol=2e-6)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{path}')")
        oracle = (con.execute(unigram_rarity_sql()).df()
                  .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            a.drop(columns=["mean_logp"]), oracle, check_dtype=False)

    def test_rarity_semantics(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from graph_rag_agent_ray.ops.textstats import unigram_rarity

        # doc 0: common tokens; doc 1: unique tokens; doc 2: empty (excluded)
        t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                      "text": pa.array(["x x x y", "rare1 rare2", "   "])})
        out = (unigram_rarity(rd.from_arrow(t)).to_pandas()
               .set_index("doc_id"))
        assert 2 not in out.index
        # common doc has higher mean corpus-frequency and higher logp
        assert (out.loc[0, "sum_cnt"] / out.loc[0, "n_tokens"]
                > out.loc[1, "sum_cnt"] / out.loc[1, "n_tokens"])
        assert out.loc[0, "mean_logp"] > out.loc[1, "mean_logp"]


class TestTfidfKeywords:
    def test_oracle_and_layout_independence(self, ray_session, sf_dir):
        import duckdb
        import ray.data as rd
        from graph_rag_agent_ray.ops.search import (
            tfidf_keywords,
            tfidf_keywords_sql,
        )

        path = f"{sf_dir}/documents.parquet"
        docs = rd.read_parquet(path, columns=["doc_id", "text"])
        a = (tfidf_keywords(docs, k=3).to_pandas()
             .sort_values(["doc_id", "rank"]).reset_index(drop=True))
        b = (tfidf_keywords(docs.repartition(9), k=3).to_pandas()
             .sort_values(["doc_id", "rank"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{path}')")
        oracle = (con.execute(tfidf_keywords_sql(k=3)).df()
                  .sort_values(["doc_id", "rank"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            a.drop(columns=["score"]), oracle, check_dtype=False)

    def test_rare_term_ranks_first(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from graph_rag_agent_ray.ops.search import tfidf_keywords

        t = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["common words zebra", "common words",
                              "common words"]),
        })
        out = tfidf_keywords(rd.from_arrow(t), k=1).to_pandas()
        row0 = out[out["doc_id"] == 0].iloc[0]
        assert row0["token"] == "zebra" and row0["rank"] == 1
        # doc-frequency-N terms have idf 0: every doc still ranks k terms
        assert set(out["doc_id"]) == {0, 1, 2}


class TestInvertedPostings:
    def test_oracle_and_layout_independence(self, ray_session, sf_dir):
        import duckdb
        import ray.data as rd
        from graph_rag_agent_ray.ops.search import (
            inverted_postings,
            inverted_postings_sql,
        )

        path = f"{sf_dir}/documents.parquet"
        docs = rd.read_parquet(path, columns=["doc_id", "text"])
        key = ["token", "doc_id"]
        a = (inverted_postings(docs, min_df=2).to_pandas()
             .sort_values(key).reset_index(drop=True))
        b = (inverted_postings(docs.repartition(9), min_df=2).to_pandas()
             .sort_values(key).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{path}')")
        oracle = (con.execute(inverted_postings_sql(min_df=2)).df()
                  .sort_values(key).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, oracle, check_dtype=False)

    def test_semantics(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from graph_rag_agent_ray.ops.search import inverted_postings

        t = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a a b", "a c", "   "]),
        })
        out = inverted_postings(rd.from_arrow(t), min_df=1).to_pandas()
        rows = {(r.token, r.doc_id): (r.tf, r.df)
                for r in out.itertuples(index=False)}
        assert rows[("a", 0)] == (2, 2)   # tf 2 in doc 0, df 2 overall
        assert rows[("a", 1)] == (1, 2)
        assert rows[("b", 0)] == (1, 1)
        assert rows[("c", 1)] == (1, 1)
        assert len(rows) == 4             # empty doc contributes nothing
        # min_df=2 keeps only the shared token
        out2 = inverted_postings(rd.from_arrow(t), min_df=2).to_pandas()
        assert set(out2["token"]) == {"a"} and len(out2) == 2


class TestCorpusProfile:
    def test_oracle_and_layout_independence(self, ray_session, sf_dir):
        import duckdb
        import ray.data as rd
        from graph_rag_agent_ray.ops.textstats import (
            corpus_profile,
            corpus_profile_sql,
        )

        path = f"{sf_dir}/documents.parquet"
        docs = rd.read_parquet(path, columns=["doc_id", "text"])
        a = (corpus_profile(docs).to_pandas()
             .sort_values("stat").reset_index(drop=True))
        b = (corpus_profile(docs.repartition(9)).to_pandas()
             .sort_values("stat").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{path}')")
        oracle = (con.execute(corpus_profile_sql()).df()
                  .sort_values("stat").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, oracle, check_dtype=False)

    def test_known_values(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from graph_rag_agent_ray.ops.textstats import corpus_profile

        t = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["one two three", "one", "   ",
                              "a b c d e f g h i j"]),
        })
        out = corpus_profile(rd.from_arrow(t)).to_pandas()
        s = dict(zip(out["stat"], out["value"]))
        assert s["n_docs"] == 4 and s["n_empty_docs"] == 1
        assert s["sum_tokens"] == 3 + 1 + 0 + 10
        assert s["min_tokens"] == 0 and s["max_tokens"] == 10
        # sorted token counts: [0, 1, 3, 10]; p50 = ceil(0.5*4)=rank 2 -> 1
        assert s["p50_tokens"] == 1
        # p90: rank ceil(.9*4)=4 -> 10 ; p99 same
        assert s["p90_tokens"] == 10 and s["p99_tokens"] == 10


class TestSplitSentences:
    def test_semantics(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from graph_rag_agent_ray.ops.textstats import split_sentences

        t = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([
                "First one. Second two!  Third three?",
                "你好。再见！结束",
                "No terminal punctuation here",
                "...",
            ]),
        })
        out = split_sentences(rd.from_arrow(t)).to_pandas()
        got = {(r.doc_id, r.sent_idx): r.sentence
               for r in out.itertuples(index=False)}
        assert got[(0, 0)] == "First one"
        assert got[(0, 1)] == "Second two"
        assert got[(0, 2)] == "Third three"
        assert got[(1, 0)] == "你好" and got[(1, 1)] == "再见"
        assert got[(1, 2)] == "结束"
        assert got[(2, 0)] == "No terminal punctuation here"
        assert 3 not in {k[0] for k in got}  # punctuation-only doc drops
        assert len(got) == 7

    def test_vs_duckdb_on_punctuated_text(self, ray_session, tmp_path):
        """The driver corpus has no punctuation (degenerate 1-sentence
        docs), so pin the non-degenerate path against DuckDB here."""
        import duckdb
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd
        from graph_rag_agent_ray.ops.textstats import (
            split_sentences, split_sentences_sql)

        rng = np.random.default_rng(41)
        words = ["alpha", "beta", "gamma", "delta", "eps"]
        texts = []
        for _ in range(200):
            sents = [" ".join(rng.choice(words, size=rng.integers(1, 6)))
                     for _ in range(rng.integers(0, 5))]
            texts.append(". ".join(sents)
                         + str(rng.choice([".", "!", "?", "", "。 "])))
        tbl = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                        "text": pa.array(texts)})
        path = str(tmp_path / "docs.parquet")
        pq.write_table(tbl, path)
        got = (split_sentences(rd.from_arrow(tbl)).to_pandas()
               .sort_values(["doc_id", "sent_idx"]).reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{path}')")
        want = (con.execute(split_sentences_sql()).df()
                .sort_values(["doc_id", "sent_idx"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestBpeTokenCount:
    def test_oracle_and_semantics(self, ray_session, sf_dir):
        import duckdb
        import pyarrow as pa
        import ray.data as rd
        from graph_rag_agent_ray.ops.textstats import (
            bpe_token_count, bpe_token_count_sql)

        path = f"{sf_dir}/documents.parquet"
        docs = rd.read_parquet(path, columns=["doc_id", "text"])
        a = (bpe_token_count(docs).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{path}')")
        oracle = (con.execute(bpe_token_count_sql()).df()
                  .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, oracle, check_dtype=False)

        # piece semantics: contractions split, digit/punct runs count once
        t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                      "text": pa.array(["I'll go", "3.14!", "   "])})
        out = bpe_token_count(rd.from_arrow(t)).to_pandas()
        got = dict(zip(out["doc_id"], out["n_bpe_tokens"]))
        # "I" + "'ll" + " go" = 3 ; "3" + "." + "14" + "!" = 4 ; ws-only = 0
        assert got == {0: 3, 1: 4, 2: 0}
