"""Deterministic tokenizer + surface normalization.

The reference tokenizes with HanLP (COARSE_ELECTRA_SMALL_ZH, loaded once per
worker — /root/reference/processor/text_chunker.py:25) and falls back to
per-character splitting on error (text_chunker.py:165-183). Model weights are
unavailable and non-deterministic across versions, so we implement the same
*algorithm* over a deterministic regex tokenizer: words, numbers, CJK chars
(one token each, like a coarse CJK segmenter's worst case), and punctuation.
The tokenizer protocol is swappable — a HanLP-backed tokenizer would slot into
the same stage unchanged.

Tokens carry their source character offsets so chunk text is recovered as an
exact substring of the assembled document text (the reference instead joins
token lists — struct_builder.py:60-127; substring recovery preserves the
span-sequence invariant byte-exactly).
"""

from __future__ import annotations

import re
import unicodedata
from typing import List, Tuple

# one token = a word/number run, OR a single CJK char, OR any single non-space symbol
_TOKEN_RE = re.compile(
    r"[A-Za-z0-9_]+(?:[''][A-Za-z0-9_]+)*"   # latin word / number (incl. apostrophes)
    r"|[一-鿿㐀-䶿]"           # one CJK ideograph per token
    r"|[^\sA-Za-z0-9_一-鿿㐀-䶿]"  # single symbol/punct
)

# sentence terminators: reference uses 。！？ (text_chunker.py:268-270); we add
# ASCII .!? because our corpora are mixed-script.
SENTENCE_ENDERS = frozenset({"。", "！", "？", ".", "!", "?"})


def tokenize_with_offsets(text: str) -> List[Tuple[str, int, int]]:
    """Return [(token, char_start, char_end)] — deterministic, offset-preserving."""
    return [(m.group(0), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


def tokenize(text: str) -> List[str]:
    return _TOKEN_RE.findall(text)


def token_spans_and_enders(text: str) -> Tuple[List[Tuple[int, int]], List[bool]]:
    """Chunker fast path of :func:`tokenize_with_offsets`: per-token char
    spans plus a sentence-ender flag, WITHOUT materializing 1-2M token
    strings per document batch. Every SENTENCE_ENDERS member is a single
    char and the token regex emits punctuation as single-char tokens, so a
    token equals an ender iff its span is length 1 and that char is an
    ender — boundary-identical to the string version by construction
    (pinned by the chunk_roundtrip/span_echo oracles). ~2.3x faster per
    batch than building (token, start, end) triples."""
    spans = [m.span() for m in _TOKEN_RE.finditer(text)]
    enders = [e - s == 1 and text[s] in SENTENCE_ENDERS for s, e in spans]
    return spans, enders


def is_sentence_end(token: str) -> bool:
    """Reference: text_chunker.py:268-270 (extended with ASCII enders)."""
    return token in SENTENCE_ENDERS


def find_next_sentence_end(tokens: List[str], start_pos: int) -> int:
    """Reference semantics: text_chunker.py:272-277."""
    for i in range(start_pos, len(tokens)):
        if is_sentence_end(tokens[i]):
            return i + 1
    return len(tokens)


def find_previous_sentence_end(tokens: List[str], start_pos: int) -> int:
    """Reference semantics: text_chunker.py:279-284."""
    for i in range(start_pos - 1, -1, -1):
        if is_sentence_end(tokens[i]):
            return i + 1
    return 0


_WS_RE = re.compile(r"\s+")


def normalize_surface(surface: str) -> str:
    """Canonical key for the exact-dedup groupby.

    NFKC width-fold + trim + whitespace-collapse + uppercase. The reference
    relies on the prompt uppercasing entity names (config/prompt.py:6) and
    Cypher ``toLower`` for candidate grouping (similar_entity.py:324); we fold
    explicitly so the shuffle key is deterministic.
    """
    s = unicodedata.normalize("NFKC", surface).strip()
    s = _WS_RE.sub(" ", s)
    return s.upper()


def normalize_surface_series(s):
    """Vectorized pandas equivalent of :func:`normalize_surface` (same op
    order: NFKC → strip → whitespace-collapse → upper)."""
    return (
        s.astype(str).str.normalize("NFKC").str.strip()
        .str.replace(r"\s+", " ", regex=True).str.upper()
    )


def normalize_remap_array(arr, alias=None):
    """Normalize (+ optional alias-remap) an Arrow STRING column via
    dictionary encoding: the NFKC/regex/upper passes and the alias lookup
    run once per UNIQUE value instead of once per row. Entity surfaces
    repeat heavily (vocabulary ≪ corpus), so this turns the canonical-remap
    stages from the 500k-doc build's CPU hot spot (~32 µs/row measured in
    MapBatches(remap)) into a dictionary `take`. Byte-identical to
    ``normalize_surface_series`` + ``map(alias).fillna``: same op order over
    the uniques, order restored by the dictionary indices, and nulls are
    pre-filled with ``str(None)`` exactly as ``astype(str)`` did."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.fill_null("None")  # astype(str) rendered null as "None"
    d = arr.dictionary_encode()
    uniq = pd.Series(d.dictionary.to_pylist(), dtype=object)
    norm = normalize_surface_series(uniq) if len(uniq) else uniq
    if alias:
        norm = norm.map(alias).fillna(norm)
    new_dict = pa.array(norm.tolist(), pa.string())
    return pa.DictionaryArray.from_arrays(d.indices, new_dict).cast(pa.string())


def edit_distance(a: str, b: str, limit: int | None = None) -> int:
    """Levenshtein distance with optional early-exit band.

    Stands in for ``apoc.text.distance`` (similar_entity.py:324). Pure-python
    (rapidfuzz unavailable in this environment) but only ever run on small
    candidate groups inside map_groups, never on the full corpus.
    """
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if limit is not None and abs(la - lb) > limit:
        return limit + 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if limit is not None:
        # Ukkonen band: any alignment path through a cell with |i-j| > limit
        # costs > limit, so only the 2*limit+1 diagonal band is computed —
        # exact for distances <= limit, limit+1 otherwise (the only contract
        # callers use; the merge judge runs this on ~100k+ survivor pairs
        # per sparse-vocabulary build, where the full O(la*lb) DP dominated
        # the whole canonicalization stage). Property-pinned against the
        # full DP in tests.
        k = limit
        big = k + 1
        prev = [i if i <= k else big for i in range(la + 1)]
        for j in range(1, lb + 1):
            bj = b[j - 1]
            lo_i = max(1, j - k)
            hi_i = min(la, j + k)
            cur = [big] * (la + 1)
            if j <= k:
                cur[0] = j
            row_min = cur[lo_i - 1]
            for i in range(lo_i, hi_i + 1):
                c = prev[i - 1] + (a[i - 1] != bj)
                v = prev[i] + 1
                if v < c:
                    c = v
                v = cur[i - 1] + 1
                if v < c:
                    c = v
                cur[i] = c
                if c < row_min:
                    row_min = c
            if row_min > k:
                return big
            prev = cur
        return prev[la] if prev[la] <= k else big
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        bj = b[j - 1]
        for i in range(1, la + 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (a[i - 1] != bj))
        prev = cur
    return prev[la]
