"""Minimal PDF text extraction — vendored, stdlib-only (zlib + re).

The reference reads PDFs per page with PyPDF2 and emits a bracketed error
sentinel for unreadable pages (/root/reference/processor/file_reader.py:
190-207). That library is absent in this environment, so this module covers
the common machine-generated text-PDF shape without it:

* objects located by scanning ``N G obj … endobj`` (no xref parsing — also
  robust to mildly corrupt files);
* page objects = dicts with ``/Type /Page`` (not ``/Pages``), in file order;
* each page's ``/Contents`` streams (direct or array of refs), FlateDecode
  decompressed when flagged;
* text from ``BT … ET`` blocks: ``Tj`` / ``'`` / ``"`` literal-string shows,
  ``TJ`` arrays, hex strings, with the standard literal escapes; ``T*`` /
  ``Td`` / ``TD`` line moves become newlines.

Scanned/image-only PDFs yield empty pages — the same failure mode PyPDF2
has. When ``pypdf``/``PyPDF2`` IS importable, callers prefer it (see
``sources.ingest.read_pdf_documents``).
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Tuple

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_CONTENTS_REF_RE = re.compile(rb"/Contents\s+(\d+)\s+(\d+)\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[(.*?)\]", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R")
_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
# literal string (with escaped parens), hex string, or a line-move operator
_TEXT_TOKEN_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)|<(?P<hex>[0-9A-Fa-f\s]*)>"
    rb"|(?P<nl>T\*|-?\d+(?:\.\d+)?\s+-?\d+(?:\.\d+)?\s+T[dD])")

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
            b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape_literal(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt in b"01234567":  # octal escape, up to 3 OCTAL digits —
                # \8/\9 are not octal: the spec drops the backslash instead
                j = i + 1
                while j < min(i + 4, len(raw)) and raw[j:j + 1] in b"01234567":
                    j += 1
                out.append(int(raw[i + 1:j], 8) & 0xFF)
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop the backslash
            continue
        out += c
        i += 1
    return bytes(out)


def _objects(data: bytes) -> Tuple[Dict[Tuple[int, int], bytes], List[Tuple[int, int]]]:
    """(num, gen) → object body, plus keys in FILE order."""
    objs: Dict[Tuple[int, int], bytes] = {}
    order: List[Tuple[int, int]] = []
    for m in _OBJ_RE.finditer(data):
        key = (int(m.group(1)), int(m.group(2)))
        objs[key] = m.group(3)
        order.append(key)
    return objs, order


def _stream_bytes(body: bytes) -> bytes:
    m = _STREAM_RE.search(body)
    if not m:
        return b""
    raw = m.group(1)
    if b"/FlateDecode" in body.split(b"stream", 1)[0]:
        raw = zlib.decompress(raw)
    return raw


def _content_stream(body: bytes, objs: Dict[Tuple[int, int], bytes]) -> bytes:
    """Concatenate a page's content streams (direct ref or array of refs)."""
    dict_part = body.split(b"stream", 1)[0]
    parts: List[bytes] = []
    arr = _CONTENTS_ARR_RE.search(dict_part)
    if arr:
        for r in _REF_RE.finditer(arr.group(1)):
            ref = (int(r.group(1)), int(r.group(2)))
            if ref in objs:
                parts.append(_stream_bytes(objs[ref]))
    else:
        ref_m = _CONTENTS_REF_RE.search(dict_part)
        if ref_m:
            ref = (int(ref_m.group(1)), int(ref_m.group(2)))
            if ref in objs:
                parts.append(_stream_bytes(objs[ref]))
    return b"\n".join(parts)


def _text_of_content(content: bytes) -> str:
    """Show-text arguments inside BT…ET blocks, line moves as newlines."""
    pieces: List[str] = []
    for block in _BT_ET_RE.finditer(content):
        line: List[bytes] = []
        lines: List[bytes] = []
        for tok in _TEXT_TOKEN_RE.finditer(block.group(1)):
            if tok.group("nl") is not None:
                if line:
                    lines.append(b"".join(line))
                    line = []
                continue
            if tok.group("lit") is not None:
                line.append(_unescape_literal(tok.group("lit")))
            else:
                hx = re.sub(rb"\s", b"", tok.group("hex"))
                if len(hx) % 2:
                    hx += b"0"
                line.append(bytes.fromhex(hx.decode("ascii")))
        if line:
            lines.append(b"".join(line))
        if lines:
            pieces.append(b"\n".join(lines).decode("utf-8", "replace"))
    return "\n".join(pieces)


def _page_keys(data: bytes):
    if not data.lstrip()[:5].startswith(b"%PDF-"):
        raise ValueError("not a PDF: missing %PDF- header")
    objs, order = _objects(data)
    pages = []
    for key in order:
        dict_part = objs[key].split(b"stream", 1)[0]
        if re.search(rb"/Type\s*/Page\b", dict_part) and not re.search(
                rb"/Type\s*/Pages\b", dict_part):
            pages.append(key)
    return objs, pages


def extract_pdf_pages(data: bytes) -> List[str]:
    """Per-page text, pages in file order. Raises on a non-PDF payload or an
    undecodable page (use :func:`extract_pdf_text` for sentinel behaviour)."""
    objs, pages = _page_keys(data)
    return [_text_of_content(_content_stream(objs[key], objs))
            for key in pages]


def extract_pdf_text(data: bytes) -> str:
    """Whole-document text with the reference's per-page error sentinel
    (file_reader.py:198-203: page text + '\\n\\n', unreadable page →
    '[第 N 页无法读取]'). Raises only when the payload is not a PDF at all
    — callers wrap that in the whole-file sentinel (:204-207)."""
    objs, pages = _page_keys(data)
    out = []
    for i, key in enumerate(pages):
        try:
            out.append(_text_of_content(_content_stream(objs[key], objs))
                       + "\n\n")
        except Exception:  # noqa: BLE001 — per-page sentinel, keep reading
            out.append(f"[第 {i + 1} 页无法读取]\n\n")
    return "".join(out)
