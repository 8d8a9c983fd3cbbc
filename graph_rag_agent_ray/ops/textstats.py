"""Text-analysis operators for large-scale training-data pipelines.

All are stateless, vectorized ``map_batches`` transforms over a flat
``(doc_id, text)`` table using pyarrow.compute kernels — no Python loop over
rows in the hot path (md5 is the one per-row call; hashlib dominates there).
Each has an exact DuckDB-SQL oracle (see __ray_entry__.oracle_sql), so the
semantics are pinned: token counting is whitespace splitting, quality signals
are character-class counts, the language feature is a stopword occurrence
count, the fingerprint is md5.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _token_count_arr(texts: pa.ChunkedArray) -> pa.Array:
    trimmed = pc.utf8_trim_whitespace(texts)
    counts = pc.list_value_length(pc.split_pattern_regex(trimmed, pattern=r"\s+"))
    # empty string splits to [''] (length 1) — force 0 like str.split()
    return pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int32()), counts)


def token_count(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_tokens) — whitespace tokenization."""
    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": _token_count_arr(batch.column("text")).cast(pa.int64()),
        })
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def text_quality(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_chars, n_punct, n_alpha, n_digit, n_tokens) — character-class
    quality signals (the shape of a C4/Gopher-style quality filter front end)."""
    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.utf8_length(text).cast(pa.int64()),
            "n_punct": pc.count_substring_regex(text, r"[.,;:!?]").cast(pa.int64()),
            "n_alpha": pc.count_substring_regex(text, r"[A-Za-z]").cast(pa.int64()),
            "n_digit": pc.count_substring_regex(text, r"[0-9]").cast(pa.int64()),
            "n_tokens": _token_count_arr(text).cast(pa.int64()),
        })
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def lang_feature(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_the, en_like) — n-gram-heuristic language ID feature: count
    of the ' the ' stopword bigram boundary; en_like when the document has at
    least one occurrence per 200 characters."""
    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_the = pc.count_substring(text, " the ").cast(pa.int64())
        n_chars = pc.utf8_length(text).cast(pa.int64())
        en_like = pc.greater(pc.multiply(n_the, pa.scalar(200, pa.int64())), n_chars)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_the": n_the,
            "en_like": en_like,
        })
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def fingerprint(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, fp) — md5 content fingerprint (SQL-checkable); the rolling
    winnowing variant lives in dedup.py."""
    def fn(batch: pa.Table) -> pa.Table:
        md5 = hashlib.md5
        fps = [md5(t.encode("utf-8")).hexdigest() for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "fp": pa.array(fps, pa.string()),
        })
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def winnow_fingerprints(ds: "ray.data.Dataset", k: int = 8, window: int = 16) -> "ray.data.Dataset":
    """(doc_id, fp) exploded winnowing fingerprints — distinct per-window
    minima of rolling character-k-gram hashes (Schleimer et al. 2003,
    "Winnowing: Local Algorithms for Document Fingerprinting"). The k-gram
    hash is the SQL-reproducible code-point polynomial (functions/sqlhash.py),
    so the whole operator has an exact DuckDB oracle (window-frame MIN).
    Texts with fewer than ``window`` grams contribute their single global
    minimum; texts shorter than k characters contribute nothing."""
    import numpy as np

    from ..functions.sqlhash import gram_hashes

    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, fps = [], []
        for doc_id, t in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            h = gram_hashes(t or "", k)
            if len(h) == 0:
                continue
            if len(h) <= window:
                mins = {int(h.min())}
            else:
                view = np.lib.stride_tricks.sliding_window_view(h, window)
                mins = set(int(m) for m in view.min(axis=1))
            for m in sorted(mins):
                doc_ids.append(doc_id)
                fps.append(m - (1 << 64) if m >= (1 << 63) else m)  # signed carrier
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "fp": pa.array(fps, pa.int64()),
        })
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=2048)


def gopher_repetition(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1: repetitious
    documents are low-quality): per doc —

    - ``n_lines`` / ``n_dup_lines`` (occurrences beyond the first of each
      distinct line) and ``dup_line_chars`` (characters in those repeats);
    - ``top_word_chars`` (characters covered by the single most frequent
      whitespace word, count × len) and ``word_chars_total``.

    All INTEGER so the DuckDB oracle hash-compares with zero float-rounding
    risk; callers derive the Gopher ratios (dup_line_frac etc.) and
    thresholds from these. Whitespace-word spec matches token_count."""
    from collections import Counter

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        # words via the SAME arrow kernel spec as token_count (its DuckDB
        # oracle is already proven equivalent on this split)
        trimmed = pc.utf8_trim_whitespace(text)
        word_lists = pc.split_pattern_regex(trimmed, pattern=r"\s+").to_pylist()
        out = {k: [] for k in ("n_lines", "n_dup_lines", "dup_line_chars",
                               "top_word_chars", "word_chars_total")}
        for t, words in zip(batch.column("text").to_pylist(), word_lists):
            lines = (t or "").split("\n")
            lc = Counter(lines)
            out["n_lines"].append(len(lines))
            out["n_dup_lines"].append(len(lines) - len(lc))
            out["dup_line_chars"].append(
                sum((c - 1) * len(l) for l, c in lc.items() if c > 1))
            if words == [""]:
                words = []
            wc = Counter(words)
            out["top_word_chars"].append(
                max((c * len(w) for w, c in wc.items()), default=0))
            out["word_chars_total"].append(sum(len(w) for w in words))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            **{k: pa.array(v, pa.int64()) for k, v in out.items()},
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def quality_filter(ds: "ray.data.Dataset", min_words: int = 5) -> "ray.data.Dataset":
    """C4-style keep/drop signals (Raffel et al. 2020 §2.2 subset that is
    exactly SQL-reproducible): ``keep`` = word count >= min_words AND the
    text contains a terminal punctuation mark AND no curly brace (code
    filter). Emitted with the contributing signals so downstream can audit
    or re-threshold."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_words = _token_count_arr(text).cast(pa.int64())
        has_term = pc.match_substring_regex(text, r"[.!?。！？]")
        has_brace = pc.match_substring_regex(text, r"[{}]")
        keep = pc.and_(
            pc.and_(pc.greater_equal(n_words, pa.scalar(min_words, pa.int64())),
                    has_term),
            pc.invert(has_brace))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_words": n_words,
            "has_terminal": has_term,
            "has_brace": has_brace,
            "keep": keep,
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def lang_id(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_cjk, n_latin, lang) — character-class language
    classification (the deterministic heuristic tier below a fastText model,
    which is unavailable offline): ``zh`` when CJK code points outnumber
    Latin letters, ``en`` when Latin letters dominate AND the ``' the '``
    stopword appears, ``latin`` for Latin-script text without the English
    marker, else ``unknown``. Pure pyarrow kernels, exact SQL oracle."""
    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_cjk = pc.count_substring_regex(text, r"[一-鿿]").cast(pa.int64())
        n_latin = pc.count_substring_regex(text, r"[A-Za-z]").cast(pa.int64())
        has_the = pc.greater(pc.count_substring(text, " the "),
                             pa.scalar(0, pa.int32()))
        lang = pc.if_else(
            pc.greater(n_cjk, n_latin),
            pa.scalar("zh"),
            pc.if_else(
                pc.greater(n_latin, pa.scalar(0, pa.int64())),
                pc.if_else(has_the, pa.scalar("en"), pa.scalar("latin")),
                pa.scalar("unknown")))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_cjk": n_cjk,
            "n_latin": n_latin,
            "lang": lang,
        })
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def _doc_ngrams(text: str, n: int) -> set:
    toks = text.split()
    if len(toks) < n:
        return set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def benchmark_gram_set(ds: "ray.data.Dataset", benchmark_ids, n: int) -> set:
    """Distinct token n-grams of the benchmark docs — one broadcast-filter
    scan; the collected set is benchmark-sized by definition."""
    import ray as _ray

    ids_ref = _ray.put(pa.array(sorted(int(b) for b in set(benchmark_ids)),
                                pa.int64()))

    def bench_grams(batch: pa.Table) -> pa.Table:
        sub = batch.filter(
            pc.is_in(batch.column("doc_id"), value_set=_ray.get(ids_ref)))
        grams: set = set()
        for t in pc.utf8_trim_whitespace(sub.column("text")).to_pylist():
            grams |= _doc_ngrams(t, n)
        return pa.table({"g": pa.array(sorted(grams), pa.string())})

    pdf = ds.map_batches(bench_grams, batch_format="pyarrow").to_pandas()
    return set(pdf["g"]) if len(pdf) else set()


def contamination_stats(
    ds: "ray.data.Dataset", benchmark_ids, n: int = 13,
) -> "ray.data.Dataset":
    """Benchmark decontamination (the GPT-3/Pile n-gram protocol): flag every
    document sharing a token ``n``-gram with any benchmark document.

    Two-phase broadcast join — the benchmark side is tiny by definition:
    1. collect the benchmark docs' distinct n-grams (one broadcast-filter
       scan; the collected set is benchmark-sized, ray.put once);
    2. one stateless pass over the corpus counts each doc's distinct grams
       and how many hit the benchmark set — no shuffle at all, so the op
       scales like any per-row transform.

    Output: (doc_id, n_grams, n_contaminated, contaminated). Tokenization is
    whitespace splitting on trimmed text (the same semantics as
    ``token_count`` and the DuckDB oracle).
    """
    import ray as _ray

    gram_ref = _ray.put(benchmark_gram_set(ds, benchmark_ids, n))

    def scan(batch: pa.Table) -> pa.Table:
        bset = _ray.get(gram_ref)
        n_grams, n_hit = [], []
        for t in pc.utf8_trim_whitespace(batch.column("text")).to_pylist():
            grams = _doc_ngrams(t, n)
            n_grams.append(len(grams))
            n_hit.append(len(grams & bset) if bset else 0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_contaminated": pa.array(n_hit, pa.int64()),
            "contaminated": pa.array([h > 0 for h in n_hit], pa.bool_()),
        })

    return ds.map_batches(scan, batch_format="pyarrow", batch_size=8192)


def frequent_ngrams(
    ds: "ray.data.Dataset", n: int = 2, min_count: int = 5,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Corpus-wide heavy-hitter token n-grams: (gram, n_docs, n_occ) for
    every n-gram with at least ``min_count`` total occurrences — the
    frequent-pattern mining step behind boilerplate discovery, tokenizer
    vocab candidates, and repetition audits.

    Scale shape: the n-gram key space is corpus-sized, so the op lives or
    dies on the map-side combine — each batch folds ALL its docs' grams into
    one partial frame (gram, occ partial, doc partial) before the single
    (gram)-keyed shuffle; integer sums are order-independent, so the result
    is hash-exact vs the DuckDB oracle. The HAVING filter runs inside the
    reduce bucket (complete key groups), so only surviving heavy hitters
    ever leave the reducers. Tokenization is the token_count whitespace
    spec."""
    from collections import Counter

    import pandas as pd

    from ..functions.shuffle import hash_partitioned_groupby

    def partials(batch: pa.Table) -> pa.Table:
        occ: Counter = Counter()
        docs: Counter = Counter()
        # the SAME split kernel as token_count / gopher_repetition — its
        # DuckDB-oracle equivalence on this whitespace spec is already proven
        trimmed = pc.utf8_trim_whitespace(batch.column("text"))
        word_lists = pc.split_pattern_regex(trimmed, pattern=r"\s+").to_pylist()
        for toks in word_lists:
            if toks == [""]:
                toks = []
            if len(toks) < n:
                continue
            grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
            occ.update(grams)
            docs.update(set(grams))
        keys = list(occ.keys())
        return pa.table({
            "gram": pa.array(keys, pa.string()),
            "occ": pa.array([occ[k] for k in keys], pa.int64()),
            "docs": pa.array([docs[k] for k in keys], pa.int64()),
        })

    parts = ds.map_batches(partials, batch_format="pyarrow", batch_size=4096)

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("gram", sort=False)[["occ", "docs"]].sum().reset_index()
        agg = agg[agg["occ"] >= min_count]
        return pd.DataFrame({"gram": agg["gram"],
                             "n_docs": agg["docs"].astype("int64"),
                             "n_occ": agg["occ"].astype("int64")})

    return hash_partitioned_groupby(
        parts, ["gram"], reduce_bucket, n_buckets=n_buckets,
        # count sums are associative — tree-combine the per-batch gram
        # partials before the sort (see shuffle.pre_combine)
        pre_combine=lambda df: (df.groupby("gram", sort=False)[["occ", "docs"]]
                                .sum().reset_index()),
    )


def frequent_ngrams_sql(n: int = 2, min_count: int = 5) -> str:
    """DuckDB oracle for :func:`frequent_ngrams` (token_count whitespace
    tokenization; doc frequency counts distinct docs)."""
    ws = r"'\s+'"
    return f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text, ' \t\n\r') = '' THEN []
              ELSE regexp_split_to_array(trim(text, ' \t\n\r'), {ws}) END AS t
  FROM documents
), grams AS (
  SELECT doc_id, array_to_string(t[i:i + {n - 1}], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - {n} + 2)) AS i) r
  WHERE len(t) >= {n}
)
SELECT gram,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occ
FROM grams GROUP BY gram HAVING count(*) >= {min_count}
"""


def contamination_sql(benchmark_ids, n: int = 13) -> str:
    """DuckDB oracle for :func:`contamination_stats`."""
    ids = ", ".join(str(int(b)) for b in sorted(set(benchmark_ids)))
    ws = r"'\s+'"
    return f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text, ' \t\n\r') = '' THEN []
              ELSE regexp_split_to_array(trim(text, ' \t\n\r'), {ws}) END AS t
  FROM documents
), grams AS (
  SELECT doc_id, array_to_string(t[i:i + {n - 1}], ' ') AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - {n} + 2)) AS i) r
), bg AS (
  SELECT DISTINCT g FROM grams WHERE doc_id IN ({ids})
), agg AS (
  SELECT grams.doc_id,
         count(DISTINCT grams.g) AS n_grams,
         count(DISTINCT grams.g) FILTER (WHERE bg.g IS NOT NULL) AS n_contaminated
  FROM grams LEFT JOIN bg ON grams.g = bg.g
  GROUP BY grams.doc_id
)
SELECT d.doc_id,
       coalesce(agg.n_grams, 0) AS n_grams,
       coalesce(agg.n_contaminated, 0) AS n_contaminated,
       coalesce(agg.n_contaminated, 0) > 0 AS contaminated
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""


# ------------------------------------------------- unigram LM rarity --------

def unigram_rarity(ds: "ray.data.Dataset", n_buckets: int = 32,
                   round_digits: int = 6) -> "ray.data.Dataset":
    """Corpus-unigram-LM document scoring — the perplexity-filter shape
    (CCNet/KenLM-style quality signal) without an external LM: train the
    unigram MLE on THIS corpus (global token counts), then score every doc.

    Output per doc (docs with >= 1 token):
    - ``n_tokens``, ``sum_cnt`` = Σ_tokens tf·count(token): exact int64
      surrogates (mean corpus-frequency ``sum_cnt/n_tokens`` ranks docs by
      rarity; hash-exact vs the SQL oracle).
    - ``mean_logp`` = (Σ tf·ln(cnt) − n·ln(N)) / n: the true unigram
      log-probability per token (float; dropped in the driver query like
      knn's ``sim``).

    Scale shape: pass 1 folds per-batch token counts map-side, then one
    (token, n) scalar shuffle builds the LM — the vocabulary never sits on
    the driver. Pass 2 re-derives per-doc (token, tf) rows and co-partitions
    them with the counts by token (hash_join), pre-aggregates per doc inside
    each batch, and one (doc_id, partials) scalar shuffle finishes. Token
    rows are corpus-token-sized but scalar-only (text never shuffles) —
    the same inherent-cost class as the n-gram join."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc_

    from ..functions.shuffle import hash_join, hash_partitioned_groupby

    def _tok_lists(batch: pa.Table) -> list:
        trimmed = pc_.utf8_trim_whitespace(batch.column("text"))
        lists = pc_.split_pattern_regex(trimmed, pattern=r"\s+").to_pylist()
        return [[] if t == [""] else t for t in lists]

    def tf_rows(batch: pa.Table) -> pd.DataFrame:
        toks = _tok_lists(batch)
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

    def count_partials(batch: pa.Table) -> pd.DataFrame:
        part = tf_rows(batch)
        if part.empty:
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "cnt": pd.Series(dtype="int64")})
        return (part.groupby("token", sort=False)["tf"].sum()
                .rename("cnt").reset_index())

    counts = hash_partitioned_groupby(
        ds.map_batches(count_partials, batch_format="pyarrow",
                       batch_size=4096),
        ["token"],
        lambda df: df.groupby("token", sort=False)["cnt"].sum().reset_index(),
        n_buckets=n_buckets,
    ).materialize()
    # N (total corpus tokens) is ONE scalar — an aggregate, not a collect
    total = counts.sum("cnt") or 0
    log_n = float(np.log(total)) if total else 0.0

    tf = ds.map_batches(tf_rows, batch_format="pyarrow", batch_size=4096)
    joined = hash_join(tf, counts, on=["token"], n_buckets=n_buckets,
                       lcols=["doc_id", "token", "tf"],
                       rcols=["token", "cnt"])

    def doc_partials(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "doc_id" not in df.columns:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_tokens": pd.Series(dtype="int64"),
                                 "sum_cnt": pd.Series(dtype="int64"),
                                 "sum_tflog": pd.Series(dtype="float64")})
        df = df.assign(
            sum_cnt=df["tf"].to_numpy() * df["cnt"].to_numpy(),
            sum_tflog=df["tf"].to_numpy()
            * np.log(df["cnt"].to_numpy(dtype=np.float64)),
        )
        return (df.groupby("doc_id", sort=False)
                .agg(n_tokens=("tf", "sum"), sum_cnt=("sum_cnt", "sum"),
                     sum_tflog=("sum_tflog", "sum")).reset_index())

    partials = joined.map_batches(doc_partials, batch_format="pandas",
                                  batch_size=16384)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("doc_id", sort=False)
             .agg(n_tokens=("n_tokens", "sum"), sum_cnt=("sum_cnt", "sum"),
                  sum_tflog=("sum_tflog", "sum")).reset_index())
        n = g["n_tokens"].to_numpy(dtype=np.float64)
        g["mean_logp"] = np.round(
            (g["sum_tflog"].to_numpy(dtype=np.float64) - n * log_n) / n,
            round_digits)
        g["n_tokens"] = g["n_tokens"].astype("int64")
        g["sum_cnt"] = g["sum_cnt"].astype("int64")
        return g[["doc_id", "n_tokens", "sum_cnt", "mean_logp"]]

    return hash_partitioned_groupby(partials, ["doc_id"], finish,
                                    n_buckets=n_buckets)


def unigram_rarity_sql(table: str = "documents") -> str:
    """DuckDB oracle for the integer-exact columns of
    :func:`unigram_rarity` (``mean_logp`` is float-derived and dropped)."""
    return f"""
WITH tf AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
        FROM {table})
  GROUP BY doc_id, tok
), cnt AS (
  SELECT tok, SUM(tf) AS cnt FROM tf GROUP BY tok
)
SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
       CAST(SUM(tf.tf * cnt.cnt) AS BIGINT) AS sum_cnt
FROM tf JOIN cnt USING (tok) GROUP BY tf.doc_id
"""


def corpus_profile(
    ds: "ray.data.Dataset",
    quantiles: tuple = (0.5, 0.9, 0.99),
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """(stat, value) — ONE-PASS corpus summary in long form: doc counts,
    token/char totals, language mix, and EXACT token-length quantiles.

    The profile every pipeline run wants before committing a 100 TB pass
    (the reference prints per-stage corpus stats during indexing,
    ``build/*`` progress reporting); long form keeps the schema stable as
    stats are added.

    Stats: n_docs, n_empty_docs, sum_tokens, sum_chars, n_en_like,
    min_tokens, max_tokens, p<q>_tokens for each requested quantile
    (discrete: sorted[ceil(q*n)-1], exact — not an approximation).

    Scale shape: one corpus pass emits per-batch partials as (stat, value)
    rows PLUS a token-length histogram ((tok=k, count) rows — bounded by
    the number of DISTINCT lengths, aggregate-scale); one scalar-keyed
    shuffle folds both; the driver folds only the tiny histogram into
    quantiles. Text shuffles nowhere; no sort."""
    import numpy as np
    import pandas as pd

    from ..functions.shuffle import hash_partitioned_groupby

    def partials(batch: pa.Table) -> pd.DataFrame:
        text = batch.column("text")
        toks = _token_count_arr(text).cast(pa.int64())
        chars = pc.utf8_length(text).cast(pa.int64())
        n_the = pc.count_substring(text, " the ").cast(pa.int64())
        en = pc.greater(pc.multiply(n_the, pa.scalar(200, pa.int64())), chars)
        t = toks.to_numpy(zero_copy_only=False)
        stats = {
            "n_docs": len(t),
            "n_empty_docs": int((t == 0).sum()),
            "sum_tokens": int(t.sum()),
            "sum_chars": int(pc.sum(chars).as_py() or 0),
            "n_en_like": int(pc.sum(pc.cast(en, pa.int64())).as_py() or 0),
        }
        vals, counts = np.unique(t, return_counts=True)
        return pd.DataFrame({
            "stat": (list(stats.keys())
                     + [f"__hist_{v}" for v in vals]),
            "value": (list(stats.values()) + counts.tolist()),
        })

    folded = hash_partitioned_groupby(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=8192),
        ["stat"],
        lambda df: df.groupby("stat", sort=False)["value"].sum().reset_index(),
        n_buckets=n_buckets,
    ).to_pandas()  # aggregate-scale: n_stats + distinct token lengths

    hist = folded[folded["stat"].str.startswith("__hist_")].copy()
    plain = folded[~folded["stat"].str.startswith("__hist_")]
    out_rows = dict(zip(plain["stat"], plain["value"].astype("int64")))
    if hist.empty:
        lengths = np.array([], dtype=np.int64)
        counts = np.array([], dtype=np.int64)
    else:
        hist["tok"] = hist["stat"].str.removeprefix("__hist_").astype("int64")
        hist = hist.sort_values("tok")
        lengths = hist["tok"].to_numpy()
        counts = hist["value"].to_numpy(dtype=np.int64)
    n = int(counts.sum())
    cum = np.cumsum(counts)
    out_rows["min_tokens"] = int(lengths[0]) if n else 0
    out_rows["max_tokens"] = int(lengths[-1]) if n else 0
    for q in quantiles:
        rank = max(1, int(np.ceil(q * n))) if n else 0
        idx = int(np.searchsorted(cum, rank)) if n else -1
        out_rows[f"p{int(q * 100)}_tokens"] = (
            int(lengths[idx]) if n else 0)

    res = pd.DataFrame({
        "stat": sorted(out_rows),
        "value": pd.array([out_rows[k] for k in sorted(out_rows)],
                          dtype="int64"),
    })
    return ray.data.from_pandas(res)


def corpus_profile_sql(quantiles: tuple = (0.5, 0.9, 0.99),
                       table: str = "documents") -> str:
    """DuckDB oracle for :func:`corpus_profile` — aggregates + explicit
    row_number discrete quantiles (no quantile_disc interpolation
    ambiguity), long form, same stat names."""
    ws = r"'\s+'"
    n_tokens = (
        "CASE WHEN trim(text, ' \t\n\r') = '' THEN 0 "
        f"ELSE array_length(regexp_split_to_array(trim(text, ' \t\n\r'), {ws})) END"
    )
    qsel = "\nUNION ALL\n".join(
        f"SELECT 'p{int(q * 100)}_tokens' AS stat, CAST(tok AS BIGINT) AS value "
        f"FROM ranked WHERE rn = GREATEST(1, CAST(CEIL({q} * n) AS BIGINT))"
        for q in quantiles)
    return f"""
WITH t AS (
  SELECT doc_id, {n_tokens} AS tok, length(text) AS chars,
         (length(text) - length(replace(text, ' the ', ''))) // 5 AS n_the
  FROM {table}
), ranked AS (
  SELECT tok, row_number() OVER (ORDER BY tok) AS rn,
         count(*) OVER () AS n
  FROM t
)
SELECT 'n_docs' AS stat, CAST(count(*) AS BIGINT) AS value FROM t
UNION ALL
SELECT 'n_empty_docs', CAST(sum(CASE WHEN tok = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM t
UNION ALL
SELECT 'sum_tokens', CAST(sum(tok) AS BIGINT) FROM t
UNION ALL
SELECT 'sum_chars', CAST(sum(chars) AS BIGINT) FROM t
UNION ALL
SELECT 'n_en_like', CAST(sum(CASE WHEN n_the * 200 > chars THEN 1 ELSE 0 END) AS BIGINT) FROM t
UNION ALL
SELECT 'min_tokens', CAST(COALESCE(min(tok), 0) AS BIGINT) FROM t
UNION ALL
SELECT 'max_tokens', CAST(COALESCE(max(tok), 0) AS BIGINT) FROM t
UNION ALL
{qsel}
"""


def split_sentences(
    ds: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """(doc_id, sent_idx, sentence) — row-EXPANDING sentence segmentation,
    the building block for sentence-level dedup / decontamination /
    sampling (and the flat table the reference's chunker consumes doc-wise,
    processor/text_chunker.py sentence snapping).

    Split spec (shared verbatim with the SQL oracle — RE2 on both sides, so
    no lookbehind): split on runs of terminal punctuation ``[.!?。！？]+``
    plus trailing whitespace; sentences are trimmed, empties dropped,
    ``sent_idx`` is the 0-based position among KEPT sentences.

    Scale shape: embarrassingly parallel — one vectorized map_batches
    (pyarrow regex split + pandas explode), no shuffle; output rows stay in
    their input block, so downstream per-sentence ops stream."""
    import pandas as pd

    pattern = r"[.!?。！？]+\s*"

    def fn(batch: pa.Table) -> pd.DataFrame:
        parts = pc.split_pattern_regex(batch.column("text"), pattern=pattern)
        df = pd.DataFrame({
            "doc_id": batch.column("doc_id").to_pandas(),
            "sentence": parts.to_pandas(),
        })
        df = df.explode("sentence", ignore_index=True)
        # explicit char set pins trim semantics to the SQL oracle's
        # trim(' \t\n\r') — pandas' default strip() eats ALL unicode ws
        df["sentence"] = df["sentence"].fillna("").str.strip(" \t\n\r")
        df = df[df["sentence"] != ""]
        df["sent_idx"] = df.groupby("doc_id", sort=False).cumcount()
        df["sent_idx"] = df["sent_idx"].astype("int64")
        return df[["doc_id", "sent_idx", "sentence"]]

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def split_sentences_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`split_sentences` — same RE2 split, index by
    original list position then renumbered over kept sentences."""
    pattern = r"[.!?。！？]+\s*"
    return f"""
WITH parts AS (
  SELECT doc_id,
         regexp_split_to_array(text, '{pattern}') AS sents
  FROM {table}
), pos AS (
  SELECT doc_id, i, trim(list_extract(sents, i), ' \t\n\r') AS sentence
  FROM parts, UNNEST(range(1, len(sents) + 1)) AS u(i)
), kept AS (
  SELECT doc_id, sentence,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS sent_idx
  FROM pos WHERE sentence <> ''
)
SELECT doc_id, CAST(sent_idx AS BIGINT) AS sent_idx, sentence FROM kept
"""


# BPE-ish pre-tokenizer spec (GPT-2 style, RE2-safe — no lookarounds, so
# pyarrow and DuckDB count the SAME matches): common English contractions,
# then space-prefixed letter runs, digit runs, and punctuation runs, then
# bare whitespace runs (which do NOT count as tokens).
_BPE_PIECE = (r"'(?:s|t|re|ve|m|ll|d)"
              r"| ?[A-Za-z\p{Han}]+"
              r"| ?[0-9]+"
              r"| ?[^\sA-Za-z0-9]+")


def bpe_token_count(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, n_bpe_tokens) — BPE-ish token counting: the number of
    GPT-2-style pre-tokenizer pieces (contractions / letter runs / digit
    runs / punctuation runs, each optionally space-prefixed). The piece
    count upper-bounds a real BPE vocab's token count much more tightly
    than whitespace words (a real tokenizer only ever SPLITS pieces), so
    it is the budget estimator a token-priced pipeline wants before the
    expensive real tokenizer runs.

    Vectorized ``pc.count_substring_regex`` — one RE2 scan per batch, no
    shuffle; the identical pattern runs in the DuckDB oracle."""
    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_bpe_tokens": pc.count_substring_regex(
                batch.column("text"), _BPE_PIECE).cast(pa.int64()),
        })
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def bpe_token_count_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`bpe_token_count` — same RE2 pattern via
    regexp_extract_all + len."""
    pat = _BPE_PIECE.replace("'", "''")
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)
       AS n_bpe_tokens
FROM {table}
"""
