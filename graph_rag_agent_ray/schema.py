"""pyarrow schemas for every logical table (SURVEY.md §1.2).

The reference keeps its schema implicit in Cypher strings
(/root/reference/graph/structure/struct_builder.py:175-211,
graph/extraction/graph_writer.py:226-230); here every table is a declared
Arrow schema so blocks stay columnar and zero-copy end to end.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

# input table — shape fixed by BASELINE.json input_hint
DOCUMENTS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# replaces __Chunk__ nodes + PART_OF/FIRST_CHUNK/NEXT_CHUNK chain
# (struct_builder.py:102-127); the chain is implicit in (doc_id, position)
CHUNKS = pa.schema(
    [
        pa.field("chunk_id", pa.string()),       # sha1(text) — graph/core/utils.py:24-34
        pa.field("doc_id", pa.string()),
        pa.field("position", pa.int32()),
        pa.field("text", pa.string()),
        pa.field("content_offset", pa.int32()),  # char offset in the doc's assembled text
        pa.field("n_tokens", pa.int32()),
        pa.field("length", pa.int32()),
        pa.field("span_lo", pa.int32()),         # first/last span index covered (invariant)
        pa.field("span_hi", pa.int32()),
    ]
)

# media spans carried alongside chunks so span-sequence equality is reconstructable
MEDIA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

# raw LLM output per chunk — replaces the sha1-keyed pickle cache
# (entity_extractor.py:101-143); doubles as the resume checkpoint
EXTRACTIONS = pa.schema(
    [
        pa.field("chunk_id", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("raw", pa.string()),
        pa.field("model_tag", pa.string()),
        pa.field("glean_rounds", pa.int8()),
    ]
)

MENTIONS = pa.schema(
    [
        pa.field("chunk_id", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("entity_surface", pa.string()),
        pa.field("entity_type", pa.string()),
        pa.field("description", pa.string()),
    ]
)

# the P/R comparison unit (BASELINE.json)
TRIPLES = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("description", pa.string()),
        pa.field("weight", pa.float32()),
        pa.field("chunk_id", pa.string()),
        pa.field("doc_id", pa.string()),
    ]
)

ENTITIES = pa.schema(
    [
        pa.field("entity_id", pa.string()),
        pa.field("surface_forms", pa.list_(pa.string())),
        pa.field("entity_type", pa.string()),
        pa.field("description", pa.string()),
        pa.field("embedding", pa.list_(pa.float32())),
        pa.field("degree", pa.int64()),
        pa.field("n_mentions", pa.int64()),
        pa.field("community", pa.list_(pa.int32())),
    ]
)

EDGES = pa.schema(
    [
        pa.field("src", pa.string()),
        pa.field("dst", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("description", pa.string()),
        pa.field("weight", pa.float32()),
        pa.field("n_sources", pa.int32()),
        pa.field("chunk_ids", pa.list_(pa.string())),
    ]
)

COMMUNITIES = pa.schema(
    [
        pa.field("community_id", pa.string()),   # "L-N" — leiden.py:102-140
        pa.field("level", pa.int32()),
        pa.field("members", pa.list_(pa.string())),
        pa.field("rank", pa.int64()),            # distinct mentioning chunks — summary/base.py:53-68
        pa.field("summary", pa.string()),
        pa.field("full_content", pa.string()),
    ]
)

LINEAGE = pa.schema(
    [
        pa.field("stage", pa.string()),
        pa.field("partition_id", pa.int32()),
        pa.field("input_rows", pa.int64()),
        pa.field("output_rows", pa.int64()),
        pa.field("wall_s", pa.float64()),
        pa.field("content_hash", pa.string()),
    ]
)
