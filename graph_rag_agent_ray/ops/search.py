"""Keyword (lexical) retrieval — BM25 top-k over the documents table.

The reference's search tools seed retrieval with keyword matching next to
vector similarity (search/tool/*_search_tool.py keyword paths); this is the
corpus-scale form: score every document against a query term set and return
the global top-k without ever collecting corpus-sized state.

Shape (the knn_bruteforce pattern applied to lexical scoring):
1. STATS — one pass folds per-batch partials (per-term document frequency,
   doc count, token-length sum) to the driver; the collect is
   O(terms x blocks), never corpus-sized. IDF and avgdl derive from it and
   broadcast via ray.put.
2. SCORE — one stateless pass computes per-doc BM25 (Robertson/Sparck Jones;
   the Lucene ln(1 + (N-df+.5)/(df+.5)) idf form, so scores stay positive)
   and keeps a per-batch partial top-k; only (blocks x k) rows shuffle to
   the final merge.

Scores are rounded to ``round_digits`` BEFORE ranking and tie-broken by
doc_id, so the ordering is total and the DuckDB oracle (same formula,
df/avgdl computed independently in SQL) hash-matches. Tokenization is the
token_count whitespace spec.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _token_lists(batch: pa.Table) -> list:
    trimmed = pc.utf8_trim_whitespace(batch.column("text"))
    lists = pc.split_pattern_regex(trimmed, pattern=r"\s+").to_pylist()
    return [[] if t == [""] else t for t in lists]


def bm25_topk(
    ds: "ray.data.Dataset", terms: list[str], k: int = 20,
    k1: float = 1.2, b: float = 0.75, round_digits: int = 6,
) -> "ray.data.Dataset":
    """(doc_id, rank, score) — global BM25 top-k for one query term set;
    only docs containing at least one term (score > 0) rank."""
    terms = sorted(set(terms))

    def stats_partial(batch: pa.Table) -> pa.Table:
        toks = _token_lists(batch)
        df = Counter()
        for t in toks:
            s = set(t)
            for term in terms:
                if term in s:
                    df[term] += 1
        return pa.table({
            "term": pa.array(terms + [None], pa.string()),
            "df": pa.array([df[t] for t in terms] + [0], pa.int64()),
            "n_docs": pa.array([0] * len(terms) + [len(toks)], pa.int64()),
            "sum_dl": pa.array([0] * len(terms)
                               + [sum(len(t) for t in toks)], pa.int64()),
        })

    stats = (ds.map_batches(stats_partial, batch_format="pyarrow",
                            batch_size=8192).to_pandas())
    n = int(stats["n_docs"].sum())
    avgdl = (stats["sum_dl"].sum() / n) if n else 1.0
    df_by_term = stats.groupby("term")["df"].sum()
    idf = {t: float(np.log(1.0 + (n - df_by_term.get(t, 0) + 0.5)
                           / (df_by_term.get(t, 0) + 0.5)))
           for t in terms}
    params_ref = ray.put((idf, float(avgdl)))

    def score_partial(batch: pa.Table) -> pd.DataFrame:
        idf_, avgdl_ = ray.get(params_ref)
        toks = _token_lists(batch)
        ids = batch.column("doc_id").to_pylist()
        out_ids, out_scores = [], []
        for doc_id, t in zip(ids, toks):
            tf = Counter(t)
            dl = len(t)
            score = 0.0
            for term in terms:  # fixed order — same fold as the oracle sum
                f = tf.get(term, 0)
                if f:
                    score += idf_[term] * (f * (k1 + 1.0)) / (
                        f + k1 * (1.0 - b + b * dl / avgdl_))
            if score > 0.0:
                out_ids.append(doc_id)
                out_scores.append(score)
        part = pd.DataFrame({
            "doc_id": pd.array(out_ids, dtype="int64"),
            "score": np.round(np.asarray(out_scores, dtype=np.float64),
                              round_digits),
        })
        return (part.sort_values(["score", "doc_id"],
                                 ascending=[False, True], kind="stable")
                .head(k))

    partials = ds.map_batches(score_partial, batch_format="pyarrow",
                              batch_size=4096)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "doc_id" not in df.columns:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "rank": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        g = (df.sort_values(["score", "doc_id"], ascending=[False, True],
                            kind="stable").head(k).reset_index(drop=True))
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["doc_id", "rank", "score"]]

    # the merge input is (blocks x k) rows — repartition(1) + one reducer
    return partials.repartition(1).map_batches(merge, batch_format="pandas",
                                               batch_size=None)


def bm25_topk_sql(terms: list[str], k: int = 20, k1: float = 1.2,
                  b: float = 0.75) -> str:
    """DuckDB oracle for :func:`bm25_topk` — df/avgdl/idf computed
    INDEPENDENTLY in SQL (not inlined from the Ray side)."""
    terms = sorted(set(terms))
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    ws = r"'\s+'"
    return f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text, ' \t\n\r') = '' THEN []
              ELSE regexp_split_to_array(trim(text, ' \t\n\r'), {ws}) END AS t
  FROM documents
), dl AS (
  SELECT doc_id, len(t) AS dl, t FROM toks
), stats AS (
  SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, tok, count(*) AS f
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  WHERE tok IN ({tlist})
  GROUP BY doc_id, tok
), idf AS (
  SELECT tok, ln(1.0 + (stats.n - count(DISTINCT doc_id) + 0.5)
                       / (count(DISTINCT doc_id) + 0.5)) AS idf
  FROM tf, stats GROUP BY tok, stats.n
), scored AS (
  SELECT tf.doc_id,
         round(sum(idf.idf * (tf.f * ({k1} + 1.0))
                   / (tf.f + {k1} * (1.0 - {b} + {b} * dl.dl / stats.avgdl))),
               6) AS score
  FROM tf JOIN idf USING (tok) JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY tf.doc_id
), ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored WHERE score > 0
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= {k}
"""


def tfidf_keywords(
    ds: "ray.data.Dataset", k: int = 5, n_buckets: int = 32,
    round_digits: int = 6,
) -> "ray.data.Dataset":
    """(doc_id, token, rank, score) — top-k tf·idf keywords per document,
    the corpus-statistics form of the reference's query-side keyword
    extraction (search/tool/*_search_tool.py keyword seeding, which asks the
    LLM; here the classic tf·idf ranking plays that role at corpus scale).

    idf = ln(N / df) with df = docs containing the token, N = docs with ≥ 1
    token. Scores round to ``round_digits`` before ranking and tie-break by
    token, so the order is total and SQL-reproducible (the bm25/knn
    pattern; the driver query drops the float column).

    Scale shape: documents are rows, so per-doc distinct tokens are exact
    within one batch — df needs only a (token, partial_df) scalar shuffle
    and N one aggregate. Scoring co-partitions per-doc tf rows with the df
    table by token (hash_join — the vocabulary never sits on the driver),
    then one (doc_id,)-keyed scalar shuffle ranks per doc. Text shuffles
    nowhere."""
    from ..functions.shuffle import hash_join_arrow, hash_partitioned_groupby

    def tf_rows(batch: pa.Table) -> pd.DataFrame:
        toks = _token_lists(batch)
        ids = batch.column("doc_id").to_pylist()
        doc_rep, flat = [], []
        for d, t in zip(ids, toks):
            doc_rep.extend([d] * len(t))
            flat.extend(t)
        if not flat:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "token": pd.Series(dtype="object"),
                                 "tf": pd.Series(dtype="int64")})
        df = pd.DataFrame({"doc_id": doc_rep, "token": flat})
        return (df.groupby(["doc_id", "token"], sort=False)
                .size().rename("tf").reset_index())

    tf = ds.map_batches(tf_rows, batch_format="pyarrow",
                        batch_size=4096).materialize()

    def df_partials(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "token" not in df.columns:
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "df": pd.Series(dtype="int64")})
        # rows are already distinct (doc, token) pairs — count per token
        return (df.groupby("token", sort=False).size()
                .rename("df").reset_index())

    dfreq = hash_partitioned_groupby(
        tf.map_batches(df_partials, batch_format="pandas",
                       batch_size=16384),
        ["token"],
        lambda d: d.groupby("token", sort=False)["df"].sum().reset_index(),
        n_buckets=n_buckets,
    ).materialize()

    # N = count of docs with >= 1 token, aggregated straight off ``ds``
    # (docs are rows there; tf's blocks may be re-sliced mid-doc by the
    # block-size target, which would double-count a per-block nunique)
    def n_partials(batch: pa.Table) -> pd.DataFrame:
        trimmed = pc.utf8_trim_whitespace(batch.column("text"))
        nonempty = pc.sum(pc.cast(
            pc.not_equal(pc.utf8_length(trimmed), 0), pa.int64())).as_py()
        return pd.DataFrame({"n": [int(nonempty or 0)]})

    n_docs = int(ds.map_batches(n_partials, batch_format="pyarrow")
                 .to_pandas()["n"].sum())
    log_n = float(np.log(n_docs)) if n_docs else 0.0

    joined = hash_join_arrow(
        tf, dfreq, on=["token"], n_buckets=n_buckets,
        lschema={"doc_id": pa.int64(), "token": pa.string(),
                 "tf": pa.int64()},
        rschema={"token": pa.string(), "df": pa.int64()})

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "doc_id" not in df.columns:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "token": pd.Series(dtype="object"),
                                 "score": pd.Series(dtype="float64")})
        s = (df["tf"].to_numpy(dtype=np.float64)
             * (log_n - np.log(df["df"].to_numpy(dtype=np.float64))))
        out = df[["doc_id", "token"]].copy()
        out["score"] = np.round(s, round_digits)
        # per-batch partial top-k bounds the doc-keyed shuffle volume
        return (out.sort_values(["doc_id", "score", "token"],
                                ascending=[True, False, True], kind="stable")
                .groupby("doc_id", sort=False).head(k))

    partials = joined.map_batches(score, batch_format="pandas",
                                  batch_size=16384)

    def final_rank(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "doc_id" not in df.columns:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "token": pd.Series(dtype="object"),
                                 "rank": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        g = (df.sort_values(["doc_id", "score", "token"],
                            ascending=[True, False, True], kind="stable")
             .groupby("doc_id", sort=False).head(k).reset_index(drop=True))
        g["rank"] = g.groupby("doc_id", sort=False).cumcount() + 1
        g["rank"] = g["rank"].astype("int64")
        return g[["doc_id", "token", "rank", "score"]]

    return hash_partitioned_groupby(partials, ["doc_id"], final_rank,
                                    n_buckets=n_buckets)


def tfidf_keywords_sql(k: int = 5, table: str = "documents") -> str:
    """DuckDB oracle for the integer/string columns of
    :func:`tfidf_keywords` (float ``score`` dropped; df/N/idf recomputed
    independently in SQL)."""
    ws = r"'\s+'"
    return f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text, ' \t\n\r') = '' THEN []
              ELSE regexp_split_to_array(trim(text, ' \t\n\r'), {ws}) END AS t
  FROM {table}
), tf AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  GROUP BY doc_id, tok
), dfreq AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok
), n AS (
  SELECT count(DISTINCT doc_id) AS n FROM tf
), scored AS (
  SELECT tf.doc_id, tf.tok,
         round(tf.tf * ln(n.n * 1.0 / dfreq.df), 6) AS score
  FROM tf JOIN dfreq USING (tok), n
), ranked AS (
  SELECT doc_id, tok, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, tok) AS rank
  FROM scored
)
SELECT doc_id, tok AS token, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def inverted_postings(
    ds: "ray.data.Dataset", min_df: int = 1, n_buckets: int = 32,
) -> "ray.data.Dataset":
    """(token, doc_id, tf, df) — the MATERIALIZED inverted index the lexical
    retrievers consult transiently (:func:`bm25_topk` recomputes these stats
    per query; the reference's keyword search paths,
    search/tool/*_search_tool.py, hit Neo4j's fulltext index — this is that
    index as a first-class Arrow table a 100 TB corpus builds once and
    serves many queries from).

    Each posting row carries the collection-level document frequency so a
    reader can compute idf without a second pass; ``min_df`` drops hapax
    noise (df < min_df) at the source.

    Scale shape: per-doc tf rows are exact within one batch (documents are
    rows), so the only corpus-wide exchange is the vocabulary-keyed df
    shuffle + the token-keyed hash_join that attaches df back onto the
    postings — both scalar-column only; text never shuffles. Postings stay
    distributed end-to-end (no driver collect)."""
    from ..functions.shuffle import hash_join_arrow, hash_partitioned_groupby

    def tf_rows(batch: pa.Table) -> pd.DataFrame:
        toks = _token_lists(batch)
        ids = batch.column("doc_id").to_pylist()
        doc_rep, flat = [], []
        for d, t in zip(ids, toks):
            doc_rep.extend([d] * len(t))
            flat.extend(t)
        if not flat:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "token": pd.Series(dtype="object"),
                                 "tf": pd.Series(dtype="int64")})
        df = pd.DataFrame({"doc_id": doc_rep, "token": flat})
        return (df.groupby(["doc_id", "token"], sort=False)
                .size().rename("tf").reset_index())

    tf = ds.map_batches(tf_rows, batch_format="pyarrow",
                        batch_size=4096).materialize()

    def df_partials(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "token" not in df.columns:
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "df": pd.Series(dtype="int64")})
        return (df.groupby("token", sort=False).size()
                .rename("df").reset_index())

    dfreq = hash_partitioned_groupby(
        tf.map_batches(df_partials, batch_format="pandas",
                       batch_size=16384),
        ["token"],
        lambda d: d.groupby("token", sort=False)["df"].sum().reset_index(),
        n_buckets=n_buckets,
    )
    if min_df > 1:
        def keep(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.greater_equal(batch.column("df"), pa.scalar(min_df)))
        dfreq = dfreq.map_batches(keep, batch_format="pyarrow")

    joined = hash_join_arrow(
        tf, dfreq.materialize(), on=["token"], n_buckets=n_buckets,
        lschema={"doc_id": pa.int64(), "token": pa.string(),
                 "tf": pa.int64()},
        rschema={"token": pa.string(), "df": pa.int64()})

    def project(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "token" not in df.columns:
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "tf": pd.Series(dtype="int64"),
                                 "df": pd.Series(dtype="int64")})
        out = df[["token", "doc_id", "tf", "df"]].copy()
        out["tf"] = out["tf"].astype("int64")
        out["df"] = out["df"].astype("int64")
        return out

    return joined.map_batches(project, batch_format="pandas",
                              batch_size=65536)


def inverted_postings_sql(min_df: int = 1, table: str = "documents") -> str:
    """DuckDB oracle for :func:`inverted_postings` — unnest + two GROUP BYs,
    df recomputed independently."""
    ws = r"'\s+'"
    return f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text, ' \t\n\r') = '' THEN []
              ELSE regexp_split_to_array(trim(text, ' \t\n\r'), {ws}) END AS t
  FROM {table}
), tf AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  GROUP BY doc_id, tok
), dfreq AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok
)
SELECT tf.tok AS token, tf.doc_id, CAST(tf.tf AS BIGINT) AS tf,
       CAST(dfreq.df AS BIGINT) AS df
FROM tf JOIN dfreq USING (tok)
WHERE dfreq.df >= {min_df}
"""
