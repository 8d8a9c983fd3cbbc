"""Minimal .docx text extraction — vendored, stdlib-only (zipfile + ElementTree).

The reference reads Word documents with python-docx and joins body-paragraph
texts with ``'\\n'`` (/root/reference/processor/file_reader.py:219-229);
legacy ``.doc`` goes through a win32com → textract → python-docx fallback
chain ending in a bracketed warning sentinel (:231-295). None of those
libraries exist in this environment, so this module implements the same
paragraph semantics directly over the OOXML package:

* ``word/document.xml`` from the zip container;
* paragraphs = the body's direct ``<w:p>`` children (python-docx's
  ``Document.paragraphs`` — table-cell paragraphs are NOT included);
* paragraph text = concatenated ``<w:t>`` runs, with ``<w:tab/>`` → ``'\\t'``
  and ``<w:br/>``/``<w:cr/>`` → ``'\\n'`` (python-docx ``Paragraph.text``).

Binary ``.doc`` (OLE2) is not a zip and raises here — callers map that to
the reference's warning sentinel.
"""

from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET

W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def _para_text(p) -> str:
    parts = []
    for node in p.iter():
        if node.tag == W_NS + "t":
            parts.append(node.text or "")
        elif node.tag == W_NS + "tab":
            parts.append("\t")
        elif node.tag in (W_NS + "br", W_NS + "cr"):
            parts.append("\n")
    return "".join(parts)


def extract_docx_text(data: bytes) -> str:
    """Body-paragraph texts joined with '\\n' (python-docx parity). Raises on
    non-OOXML payloads (callers wrap in the reference's error sentinel)."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        xml = z.read("word/document.xml")
    root = ET.fromstring(xml)
    body = root.find(W_NS + "body")
    if body is None:
        return ""
    return "\n".join(_para_text(p) for p in body.findall(W_NS + "p"))
