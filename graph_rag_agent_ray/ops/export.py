"""Composed training-data export pipeline.

``training_export`` chains the cleaning operators the way a pre-training data
engineer actually runs them — quality filter → benchmark decontamination →
exact dedup → global token-shard assignment — as ONE streaming Ray Data
pipeline with exactly one corpus pass, one small-key shuffle, and the
prefix-sum scan:

1. **signals pass** (``map_batches``, fused): per-doc C4-style ``keep``
   (ops.textstats.quality_filter spec), contamination flag against a
   broadcast benchmark n-gram set (ops.textstats.contamination_stats spec),
   md5 text hash, and whitespace token count — survivors leave the pass as
   ``(doc_id, text_hash, n_tokens)``; dropped docs never move again. The
   benchmark gram set is ``ray.put`` once (benchmark-sized by definition).
2. **dedup winners**: hash-partitioned groupby on ``text_hash`` keeping the
   minimum surviving ``doc_id`` (exact_dedup semantics applied AFTER the
   filters, so the winner is the smallest id among *kept* copies). Only
   ``(text_hash, doc_id, n_tokens)`` partials shuffle — per-batch combine
   first, never full text.
3. **token shards**: ops.relational.prefix_shards assigns each survivor its
   exclusive-prefix-sum ``start_offset`` in ``doc_id`` order and the
   fixed-budget training ``shard`` it starts in.

Output: ``(doc_id, n_tokens, start_offset, shard)`` — the manifest a
fixed-token-budget training run reads to locate every surviving document.
Benchmark docs drop themselves (they share all their own n-grams), so the
export is benchmark-free by construction.

Scale shape: the signals pass is embarrassingly parallel (the only broadcast
is the benchmark gram set), the dedup shuffle carries three scalar columns,
and the prefix sum moves one partial total per doc_id range to the driver —
the same 100 TB story as each constituent operator, with no extra corpus
joins from composing them (a naive compose of the public operators would
re-scan text three times and semi-join ids twice).

Reference analog: the reference's cleaning is interleaved with extraction in
``processor/file_reader.py`` / incremental work-dedup; this op family is the
standalone training-data surface SURVEY §2.8/§2.7 groups it with.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.shuffle import hash_partitioned_groupby
from .relational import prefix_shards
from .textstats import _doc_ngrams, _token_count_arr, benchmark_gram_set


def training_export(
    ds: "ray.data.Dataset",
    benchmark_ids,
    budget: int = 5000,
    n: int = 3,
    min_words: int = 5,
    require_terminal: bool = True,
    n_ranges: int = 64,
) -> "ray.data.Dataset":
    """See module docstring. ``n`` is the decontamination n-gram order
    (13 in the GPT-3 protocol; small here so tiny corpora exercise hits),
    ``budget`` the tokens-per-shard, ``min_words`` the C4 floor.
    ``require_terminal`` toggles the C4 terminal-punctuation clause (off for
    corpora that are token streams rather than prose)."""
    gram_ref = ray.put(benchmark_gram_set(ds, benchmark_ids, n))

    def signals(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_tok = _token_count_arr(text).cast(pa.int64())
        keep_q = pc.and_(
            pc.greater_equal(n_tok, pa.scalar(min_words, pa.int64())),
            pc.invert(pc.match_substring_regex(text, r"[{}]")))
        if require_terminal:
            keep_q = pc.and_(
                keep_q, pc.match_substring_regex(text, r"[.!?。！？]"))
        bset = ray.get(gram_ref)
        trimmed = pc.utf8_trim_whitespace(text).to_pylist()
        clean = pa.array(
            [not (bset and (_doc_ngrams(t, n) & bset)) for t in trimmed],
            pa.bool_())
        kept = batch.append_column("n_tokens", n_tok).filter(
            pc.and_(keep_q, clean))
        md5 = hashlib.md5
        hashes = [md5(t.encode("utf-8")).hexdigest()
                  for t in kept.column("text").to_pylist()]
        return pa.table({
            "doc_id": kept.column("doc_id"),
            "text_hash": pa.array(hashes, pa.string()),
            "n_tokens": kept.column("n_tokens"),
        })

    survivors = ds.map_batches(signals, batch_format="pyarrow",
                               batch_size=4096)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.groupby("text_hash", sort=False)
            .agg(doc_id=("doc_id", "min"), n_tokens=("n_tokens", "min"))
            .reset_index(), preserve_index=False)

    partials = survivors.map_batches(partial, batch_format="pyarrow",
                                     batch_size=16384)
    winners = hash_partitioned_groupby(
        partials, ["text_hash"],
        lambda df: df.groupby("text_hash", sort=False)
        .agg(doc_id=("doc_id", "min"), n_tokens=("n_tokens", "min"))
        .reset_index()[["doc_id", "n_tokens"]],
        n_buckets=32,
    )
    return prefix_shards(winners, budget, n_ranges)


def training_export_sql(
    benchmark_ids, budget: int = 5000, n: int = 3, min_words: int = 5,
    require_terminal: bool = True,
) -> str:
    """DuckDB oracle: the identical filter → decontaminate → dedup →
    window-prefix-sum chain, built from the SAME expression specs as the
    constituent operators' oracles (quality_filter_sql, contamination_sql,
    exact_dedup, token_shards_sql)."""
    ids = ", ".join(str(int(b)) for b in sorted(set(int(x) for x in benchmark_ids)))
    ws = r"'\s+'"
    n_tokens = (
        "CASE WHEN trim(text, ' \t\n\r') = '' THEN 0 "
        f"ELSE array_length(regexp_split_to_array(trim(text, ' \t\n\r'), {ws})) END"
    )
    term = ("regexp_matches(text, '[.!?。！？]')" if require_terminal
            else "TRUE")
    brace = "regexp_matches(text, '[{}]')"
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
), contam AS (
  SELECT DISTINCT grams.doc_id FROM grams JOIN bg USING (g)
), kept AS (
  SELECT doc_id, md5(text) AS h, CAST({n_tokens} AS BIGINT) AS n_tokens
  FROM documents
  WHERE {n_tokens} >= {min_words} AND {term} AND NOT {brace}
    AND doc_id NOT IN (SELECT doc_id FROM contam)
), winners AS (
  SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens
  FROM kept GROUP BY h
)
SELECT doc_id, n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_offset,
       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // {budget}
            AS BIGINT) AS shard
FROM winners
"""


def export_neo4j_csv(tables, out_dir: str) -> dict:
    """Write the canonical graph as Neo4j BULK-IMPORT CSVs — the migration
    sink for a reference user whose serving graph lives in Neo4j
    (the reference materializes exactly these node/relationship shapes via
    Cypher MERGE, ``processor/graph_writer.py`` /
    ``graph/structure_builder.py``; ``neo4j-admin database import`` is the
    documented bulk path for graphs this size).

    Layout (the split-header convention, so data files stay SHARDED and a
    failed export resumes per shard):

    - ``entities-header.csv`` + ``entities/part-*.csv`` — columns
      ``entity_id:ID,entity_type,description,n_mentions:long``
    - ``relationships-header.csv`` + ``relationships/part-*.csv`` —
      ``src:START_ID,dst:END_ID,pred:TYPE,weight:double,n_sources:long``

    Import with::

        neo4j-admin database import full \
          --nodes=entities-header.csv,entities/.* \
          --relationships=relationships-header.csv,relationships/.*

    Scale shape: two streaming ``write_csv`` sinks (headerless data files,
    one tiny header file each) — no shuffle, no driver collect; CSV
    escaping is Arrow's writer."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def headerless():
        # constructed inside the fn: pyarrow WriteOptions doesn't pickle
        from pyarrow import csv as _csv
        return {"write_options": _csv.WriteOptions(include_header=False)}

    ent_cols = [("entity_id", "entity_id:ID"),
                ("entity_type", "entity_type"),
                ("description", "description"),
                ("n_mentions", "n_mentions:long")]
    rel_cols = [("src", "src:START_ID"), ("dst", "dst:END_ID"),
                ("pred", "pred:TYPE"), ("weight", "weight:double"),
                ("n_sources", "n_sources:long")]

    def project(cols):
        names = [c for c, _ in cols]

        def fn(batch: pa.Table) -> pa.Table:
            return batch.select([n for n in names if n in batch.column_names])
        return fn

    with open(os.path.join(out_dir, "entities-header.csv"), "w") as f:
        f.write(",".join(h for _, h in ent_cols) + "\n")
    tables["entities"].map_batches(
        project(ent_cols), batch_format="pyarrow").write_csv(
        os.path.join(out_dir, "entities"), arrow_csv_args_fn=headerless)

    with open(os.path.join(out_dir, "relationships-header.csv"), "w") as f:
        f.write(",".join(h for _, h in rel_cols) + "\n")
    tables["edges"].map_batches(
        project(rel_cols), batch_format="pyarrow").write_csv(
        os.path.join(out_dir, "relationships"), arrow_csv_args_fn=headerless)

    return {"out_dir": out_dir,
            "entities": tables["entities"].count(),
            "relationships": tables["edges"].count()}
