"""DuckDB oracle SQL builders for the SQL-exact approximate-dedup operators.

Each builder returns ANSI-ish DuckDB SQL that recomputes the operator's full
semantics (shingling → hashing → banding → candidate join → verification)
relationally over the same ``documents(doc_id, text)`` view the Ray pipeline
reads — an independent execution path over the pinned hash spec in
functions/sqlhash.py. Column names match the Ray output exactly (the driver
hash-compares sorted columns).
"""

from __future__ import annotations

import math

from ..functions.sqlhash import (
    U64,
    I64_BIAS,
    sql_gram_hash,
    sql_minhash_params_values,
)

_TOKENS = r"regexp_extract_all(text, '\S+')"


def _signed(expr: str) -> str:
    return (f"CAST(CASE WHEN ({expr}) >= {I64_BIAS} THEN ({expr}) - {U64} "
            f"ELSE ({expr}) END AS BIGINT)")


def minhash_sql(threshold: float = 0.7, num_perm: int = 64, shingle_k: int = 5,
                n_bands: int = 8, seed: int = 42) -> str:
    rows_per_band = num_perm // n_bands
    min_agree = int(math.ceil(threshold * num_perm - 1e-9))
    return f"""
WITH params(perm_id, pa, pb) AS {sql_minhash_params_values(num_perm, seed)},
pos AS (
  SELECT doc_id, text, unnest(range(1, length(text) - {shingle_k} + 2)) AS i
  FROM documents WHERE length(text) >= {shingle_k}
),
g AS (
  SELECT DISTINCT doc_id, {sql_gram_hash('text', 'i', shingle_k)} AS h FROM pos
),
sig AS (
  SELECT doc_id, perm_id, MIN((pa * h + pb) % {U64}) AS v
  FROM g CROSS JOIN params GROUP BY doc_id, perm_id
),
band AS (
  SELECT doc_id, perm_id // {rows_per_band} AS band_id,
         string_agg(v::VARCHAR, '-' ORDER BY perm_id) AS bkey
  FROM sig GROUP BY doc_id, perm_id // {rows_per_band}
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM band x JOIN band y
    ON x.band_id = y.band_id AND x.bkey = y.bkey AND x.doc_id < y.doc_id
),
agree AS (
  SELECT c.a, c.b, SUM(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) AS n_agree
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.a
  JOIN sig sb ON sb.doc_id = c.b AND sb.perm_id = sa.perm_id
  GROUP BY c.a, c.b
)
SELECT a, b, CAST(n_agree AS BIGINT) AS n_agree
FROM agree WHERE n_agree >= {min_agree}
"""


def simhash_sql(max_hamming: int = 3) -> str:
    powers = ", ".join(f"({i}, {1 << i}::HUGEINT)" for i in range(64))
    band_powers = ", ".join(f"({b}, {1 << (16 * b)}::HUGEINT)" for b in range(4))
    return f"""
WITH powers(i, p) AS (VALUES {powers}),
bp(band_id, bpow) AS (VALUES {band_powers}),
tok AS (
  SELECT doc_id, unnest({_TOKENS}) AS t FROM documents
),
tc AS (
  SELECT doc_id, t, COUNT(*) AS cnt,
         ('0x' || substr(md5(t), 1, 16))::UBIGINT::HUGEINT AS h
  FROM tok GROUP BY doc_id, t
),
bits AS (
  SELECT doc_id, i, p,
         SUM(CASE WHEN (h // p) % 2 = 1 THEN cnt ELSE -cnt END) AS acc
  FROM tc CROSS JOIN powers GROUP BY doc_id, i, p
),
sh AS (
  SELECT doc_id, SUM(CASE WHEN acc > 0 THEN p ELSE 0::HUGEINT END) AS u
  FROM bits GROUP BY doc_id
),
bandx AS (
  SELECT doc_id, band_id, ((u // bpow) % 65536) AS key, u
  FROM sh CROSS JOIN bp
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.u AS ua, y.u AS ub
  FROM bandx x JOIN bandx y
    ON x.band_id = y.band_id AND x.key = y.key AND x.doc_id < y.doc_id
)
SELECT a, b,
       CAST(bit_count(xor({_signed('ua')}, {_signed('ub')})) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor({_signed('ua')}, {_signed('ub')})) <= {max_hamming}
"""


def ngram_jaccard_sql(n: int = 3, threshold: float = 0.5) -> str:
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
g AS (
  SELECT DISTINCT doc_id, {gram} AS gram
  FROM toks, unnest(range(1, len(t) - {n} + 2)) AS u(i)
  WHERE len(t) >= {n}
),
sz AS (SELECT doc_id, COUNT(*) AS s FROM g GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
  FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT i.a, i.b, CAST(c AS BIGINT) AS n_common,
       CAST(sa.s + sb.s - c AS BIGINT) AS n_union,
       c / (sa.s + sb.s - c) AS jaccard
FROM inter i
JOIN sz sa ON sa.doc_id = i.a
JOIN sz sb ON sb.doc_id = i.b
WHERE c / (sa.s + sb.s - c) >= {threshold}
"""


def winnow_sql(k: int = 8, window: int = 16) -> str:
    return f"""
WITH pos AS (
  SELECT doc_id, text, unnest(range(1, length(text) - {k} + 2)) AS i
  FROM documents WHERE length(text) >= {k}
),
h AS (SELECT doc_id, i, {sql_gram_hash('text', 'i', k)} AS hv FROM pos),
n AS (SELECT doc_id, COUNT(*) AS ng FROM h GROUP BY doc_id),
w AS (
  SELECT h.doc_id, h.i, ng,
         MIN(hv) OVER (PARTITION BY h.doc_id ORDER BY h.i
                       ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS wmin
  FROM h JOIN n USING (doc_id)
),
sel AS (
  SELECT doc_id, wmin AS m FROM w WHERE ng > {window} AND i <= ng - {window - 1}
  UNION ALL
  SELECT h.doc_id, MIN(hv) AS m FROM h JOIN n USING (doc_id)
  WHERE ng <= {window} GROUP BY h.doc_id
)
SELECT DISTINCT doc_id, {_signed('m')} AS fp FROM sel
"""


def winnow_shared_sql(k: int = 8, window: int = 16,
                      min_shared: int = 2, max_df: int = 64) -> str:
    """Exact DuckDB equivalent of ops.dedup.winnow_shared_pairs: the
    winnowing-fingerprint CTE self-joined on fp (fingerprints with document
    frequency in [2, max_df] only), pair-counted, thresholded."""
    return f"""
WITH wfp AS ({winnow_sql(k, window)}),
ok AS (
  SELECT fp FROM wfp GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND {max_df}
),
p AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM wfp x JOIN wfp y USING (fp) JOIN ok USING (fp)
  WHERE x.doc_id < y.doc_id
)
SELECT a, b, COUNT(*) AS n_shared FROM p GROUP BY a, b
HAVING COUNT(*) >= {min_shared}
"""


def boilerplate_sql(min_df: int = 2) -> str:
    """Exact DuckDB equivalent of ops.clean.boilerplate_stats."""
    return f"""
WITH lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents
),
dfreq AS (SELECT line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY line)
SELECT l.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN d.df >= {min_df} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boilerplate
FROM lines l JOIN dfreq d USING (line)
GROUP BY l.doc_id
"""


def pii_sql() -> str:
    """Exact DuckDB equivalent of ops.clean.mask_pii (RE2 = Python re on
    these lookaround-free patterns; emails masked before phones on both
    sides)."""
    from .clean import EMAIL_RE, PHONE_RE

    emasked = f"regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g')"
    return f"""
SELECT doc_id,
       regexp_replace({emasked}, '{PHONE_RE}', '[PHONE]', 'g') AS text,
       CAST(length(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(length(regexp_extract_all({emasked}, '{PHONE_RE}')) AS BIGINT) AS n_phones
FROM documents
"""


def gopher_sql() -> str:
    """Exact DuckDB equivalent of ops.textstats.gopher_repetition (same
    line/word split specs as boilerplate_sql / token_count)."""
    ws = r"'\s+'"
    return f"""
WITH lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents
),
lagg AS (
  SELECT doc_id, line, COUNT(*) AS c, length(line) AS len
  FROM lines GROUP BY doc_id, line
),
lstats AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_lines,
         CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dup_lines,
         CAST(SUM(CASE WHEN c > 1 THEN (c - 1) * len ELSE 0 END) AS BIGINT)
           AS dup_line_chars
  FROM lagg GROUP BY doc_id
),
words AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text, ' \t\n\r'), {ws})) AS w
  FROM documents WHERE trim(text, ' \t\n\r') <> ''
),
wagg AS (
  SELECT doc_id, w, COUNT(*) AS c, length(w) AS len FROM words GROUP BY doc_id, w
),
wstats AS (
  SELECT doc_id, CAST(MAX(c * len) AS BIGINT) AS top_word_chars,
         CAST(SUM(c * len) AS BIGINT) AS word_chars_total
  FROM wagg GROUP BY doc_id
)
SELECT l.doc_id, n_lines, n_dup_lines, dup_line_chars,
       COALESCE(top_word_chars, 0) AS top_word_chars,
       COALESCE(word_chars_total, 0) AS word_chars_total
FROM lstats l LEFT JOIN wstats w USING (doc_id)
"""


def quality_filter_sql(min_words: int = 5) -> str:
    """Exact DuckDB equivalent of ops.textstats.quality_filter."""
    ws = r"'\s+'"
    n_words = (
        "CASE WHEN trim(text, ' \t\n\r') = '' THEN 0 "
        f"ELSE array_length(regexp_split_to_array(trim(text, ' \t\n\r'), {ws})) END"
    )
    term = "regexp_matches(text, '[.!?。！？]')"
    brace = "regexp_matches(text, '[{}]')"
    return f"""
SELECT doc_id,
       CAST({n_words} AS BIGINT) AS n_words,
       {term} AS has_terminal,
       {brace} AS has_brace,
       ({n_words} >= {min_words} AND {term} AND NOT {brace}) AS keep
FROM documents
"""


def lang_id_sql() -> str:
    """Exact DuckDB equivalent of ops.textstats.lang_id."""
    n_cjk = "length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g'))"
    n_latin = "length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))"
    has_the = "position(' the ' IN text) > 0"
    return f"""
SELECT doc_id,
       CAST({n_cjk} AS BIGINT) AS n_cjk,
       CAST({n_latin} AS BIGINT) AS n_latin,
       CASE WHEN {n_cjk} > {n_latin} THEN 'zh'
            WHEN {n_latin} > 0 AND {has_the} THEN 'en'
            WHEN {n_latin} > 0 THEN 'latin'
            ELSE 'unknown' END AS lang
FROM documents
"""
