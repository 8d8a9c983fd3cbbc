"""Document assembly + token-window chunking as stateless Arrow map_batches.

Reproduces the reference chunker's semantics (/root/reference/processor/
text_chunker.py:185-266): sliding window of ``chunk_size`` tokens with
``overlap``-token overlap, window end snapped forward to the next sentence end
when within ``chunk_size + 100`` tokens, next window start snapped to the
previous sentence end inside the overlap region, short texts emitted as a
single chunk, huge texts pre-split. chunk_id = sha1(chunk text)
(graph/core/utils.py:24-34); chunk ordering is the explicit (doc_id, position)
column pair instead of the reference's NEXT_CHUNK edge chain
(graph/structure/struct_builder.py:175-211).

Differences by design (documented, not accidental):
- deterministic regex tokenizer instead of HanLP weights (same algorithm; the
  tokenizer is a swappable pure function — functions/text.py);
- chunk text is recovered as an exact substring of the assembled document via
  token character offsets (the reference joins token lists), which is what
  makes the per-row span-sequence invariant reconstructible byte-exactly.

Span assembly: text spans are concatenated in offset order joined by "\n";
each span's character range in the assembled text is recorded in the
``span_index`` table, media spans as zero-width entries at their insertion
point. ``documents → (chunks, span_index)`` loses no information.
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right
from typing import Dict, List

import pyarrow as pa

import ray.data

from ..config import KGConfig
from ..functions.hashing import sha1_hex
from ..functions.text import is_sentence_end, token_spans_and_enders
from .. import schema as S


def assemble_document(spans: List[dict]) -> Dict:
    """Sort spans by offset; concat text spans with '\\n'; record char ranges.

    Returns {"text": str, "spans": [{span_idx, kind, media_ref, offset,
    char_start, char_end}]} where char ranges index into the assembled text
    (media spans are zero-width).
    """
    ordered = sorted(enumerate(spans), key=lambda t: (t[1]["offset"], t[0]))
    parts: List[str] = []
    index: List[dict] = []
    pos = 0
    for span_idx, sp in ordered:
        if sp["kind"] == "text":
            if parts:
                pos += 1  # the "\n" joiner
            start = pos
            parts.append(sp["text"])
            pos += len(sp["text"])
            index.append({
                "span_idx": span_idx, "kind": "text", "media_ref": sp["media_ref"],
                "offset": sp["offset"], "char_start": start, "char_end": pos,
            })
        else:
            index.append({
                "span_idx": span_idx, "kind": sp["kind"], "media_ref": sp["media_ref"],
                "offset": sp["offset"], "char_start": pos, "char_end": pos,
            })
    return {"text": "\n".join(parts), "spans": index}


def _window_token_spans(enders: List[bool], cfg: KGConfig) -> List[tuple]:
    """The reference's window algorithm (text_chunker.py:211-266) over
    per-token sentence-ender FLAGS; returns (tok_lo, tok_hi) index pairs.
    Boundary-identical to running find_next/previous_sentence_end over the
    token strings (functions/text.py:52-63): the forward scan is bounded at
    the snap-slack limit because any later ender would be rejected anyway,
    and "no ender within the bound" accepts the document end iff it lies
    inside the bound — exactly find_next_sentence_end's len(tokens) return."""
    n = len(enders)
    out = []
    start = 0
    while start < n:
        end = min(start + cfg.chunk_size, n)
        if end < n:
            bound = start + cfg.chunk_size + cfg.sentence_snap_slack
            hi_scan = min(n, bound)
            snapped = None
            for i in range(end, hi_scan):
                if enders[i]:
                    snapped = i + 1
                    break
            if snapped is None and hi_scan == n:
                snapped = n  # scanned the whole tail: find_next returns n
            if snapped is not None and snapped <= bound:
                end = snapped
        if end > start:
            out.append((start, end))
        if end >= n:
            break
        overlap_start = max(start, end - cfg.chunk_overlap)
        prev_sent = 0  # find_previous_sentence_end over flags
        for i in range(overlap_start - 1, -1, -1):
            if enders[i]:
                prev_sent = i + 1
                break
        if prev_sent > start and prev_sent < end:
            start = prev_sent
        else:
            start = overlap_start
        if start >= end:
            start = end
    return out


def chunk_one_document(doc_id: str, spans: List[dict], cfg: KGConfig,
                       tokenizer=None) -> List[dict]:
    """``tokenizer`` (optional): any offset-preserving callable
    ``text -> [(token, char_start, char_end)]`` — the pluggable seam for a
    HanLP-parity tokenizer (tools/tokenizer_divergence.py measures the
    chunk-boundary impact of swapping it). Default: the regex tokenizer."""
    assembled = assemble_document(spans)
    text = assembled["text"]
    if not text:
        return []
    text_spans = [s for s in assembled["spans"] if s["kind"] == "text"]
    span_starts = [s["char_start"] for s in text_spans]
    span_ends = [s["char_end"] for s in text_spans]

    # pre-split huge texts by paragraph boundaries (text_chunker.py:43-163 is
    # a ¶/sentence/fixed ladder; our substring windows make a simple char cap
    # sufficient because tokenization is linear and windows are bounded)
    if tokenizer is None:
        tok_spans, enders = token_spans_and_enders(text)
    else:
        triples = tokenizer(text)
        tok_spans = [(t[1], t[2]) for t in triples]
        enders = [is_sentence_end(t[0]) for t in triples]
    rows: List[dict] = []
    for position, (lo, hi) in enumerate(_window_token_spans(enders, cfg)):
        char_lo = tok_spans[lo][0]
        char_hi = tok_spans[hi - 1][1]
        chunk_text = text[char_lo:char_hi]
        # covered original spans (for the span-sequence invariant)
        s_lo = bisect_right(span_ends, char_lo)
        s_hi = bisect_left(span_starts, char_hi) - 1
        rows.append({
            "chunk_id": sha1_hex(chunk_text),
            "doc_id": doc_id,
            "position": position,
            "text": chunk_text,
            "content_offset": char_lo,
            "n_tokens": hi - lo,
            "length": len(chunk_text),
            "span_lo": text_spans[s_lo]["span_idx"] if 0 <= s_lo < len(text_spans) else -1,
            "span_hi": text_spans[s_hi]["span_idx"] if 0 <= s_hi < len(text_spans) else -1,
        })
    return rows


class ChunkBatch:
    """map_batches callable: documents → chunks. Stateless in spirit but kept
    as a class so a model-backed tokenizer could load once per actor."""

    def __init__(self, cfg: KGConfig | None = None) -> None:
        self.cfg = cfg or KGConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: List[dict] = []
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        for doc_id, spans in zip(doc_ids, spans_col):
            rows.extend(chunk_one_document(doc_id, spans or [], self.cfg))
        if not rows:
            return S.CHUNKS.empty_table()
        return pa.Table.from_pylist(rows, schema=S.CHUNKS)


class SpanIndexBatch:
    """map_batches callable: documents → span_index rows (doc_id, span_idx,
    kind, media_ref, offset, char_start, char_end). Together with the chunks
    table this reconstructs every row's exact span sequence.

    Fully vectorized re-statement of :func:`assemble_document`'s index
    bookkeeping: flatten the list<struct> column once, lexsort all spans by
    (doc, offset, list position), then derive char ranges from segmented
    cumulative sums (text length + "\\n" joiner per non-first text span;
    media spans are zero-width). No per-span Python objects — the hot-loop
    version cost ~10s of a 100k-doc build."""

    _EMPTY = pa.table({
        "doc_id": pa.array([], pa.string()),
        "span_idx": pa.array([], pa.int32()),
        "kind": pa.array([], pa.string()),
        "media_ref": pa.array([], pa.string()),
        "offset": pa.array([], pa.int32()),
        "char_start": pa.array([], pa.int64()),
        "char_end": pa.array([], pa.int64()),
    })

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        if len(batch) == 0:
            return self._EMPTY
        ls = batch.column("spans")
        if isinstance(ls, pa.ChunkedArray):
            ls = ls.combine_chunks()
        counts = pc.fill_null(pc.list_value_length(ls), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(ls)  # null/empty docs contribute no rows
        n = len(flat)
        if n == 0:
            return self._EMPTY
        parent = np.repeat(np.arange(len(ls), dtype=np.int64), counts)
        # original list position — assemble_document's enumerate() index
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        span_idx = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)

        offs = pc.fill_null(flat.field("offset"), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        is_text = pc.fill_null(pc.equal(flat.field("kind"), "text"), False) \
            .to_numpy(zero_copy_only=False)
        tlen = pc.fill_null(pc.utf8_length(flat.field("text")), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)

        order = np.lexsort((span_idx, offs, parent))
        parent_s = parent[order]
        is_text_s = is_text[order]
        tlen_s = np.where(is_text_s, tlen[order], 0)

        first_mask = np.empty(n, dtype=bool)
        first_mask[0] = True
        np.not_equal(parent_s[1:], parent_s[:-1], out=first_mask[1:])
        first_idx = np.flatnonzero(first_mask)
        doc_sizes = np.diff(np.concatenate((first_idx, [n])))

        def seg_cumsum(vals):
            """Cumulative sum restarting at each doc boundary."""
            cum = np.cumsum(vals)
            base = np.concatenate(([0], cum[first_idx[1:] - 1]))
            return cum - np.repeat(base, doc_sizes)

        # "\n" joiner precedes every text span except the doc's first one
        joiner = is_text_s & (seg_cumsum(is_text_s.astype(np.int64)) >= 2)
        pos_after = seg_cumsum(tlen_s + joiner)
        char_end = pos_after
        char_start = pos_after - tlen_s

        take = pa.array(order)
        return pa.table({
            "doc_id": batch.column("doc_id").take(pa.array(parent_s)),
            "span_idx": pa.array(span_idx[order].astype(np.int32), pa.int32()),
            "kind": flat.field("kind").take(take),
            "media_ref": flat.field("media_ref").take(take),
            "offset": pc.cast(flat.field("offset").take(take), pa.int32()),
            "char_start": pa.array(char_start, pa.int64()),
            "char_end": pa.array(char_end, pa.int64()),
        })


def chunk_documents(docs: "ray.data.Dataset", cfg: KGConfig | None = None) -> "ray.data.Dataset":
    cfg = cfg or KGConfig()
    return docs.map_batches(
        ChunkBatch(cfg), batch_format="pyarrow", batch_size=cfg.chunk_batch_size
    )


def build_span_index(docs: "ray.data.Dataset", cfg: KGConfig | None = None) -> "ray.data.Dataset":
    cfg = cfg or KGConfig()
    # 4× the chunker batch: span indexing is a cheap per-doc loop, so fewer,
    # larger tasks beat scheduling overhead (it shares cores with the chunk/
    # extract chain and must not flood the scheduler with tiny tasks)
    return docs.map_batches(
        SpanIndexBatch(), batch_format="pyarrow",
        batch_size=cfg.chunk_batch_size * 4
    )
