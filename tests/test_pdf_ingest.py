"""Vendored PDF text extraction + ingest wiring (reference
file_reader.py:190-207 parity: per-page text, per-page and whole-file error
sentinels). The fixture is a real minimal PDF built byte-by-byte — one
Flate-compressed page, one plain page — exercising Tj, TJ arrays, hex
strings, literal escapes and line moves."""

import zlib

import pytest

from graph_rag_agent_ray.sources.pdf import extract_pdf_pages, extract_pdf_text
from graph_rag_agent_ray.sources.ingest import _pdf_to_text


def _obj(num: int, body: bytes) -> bytes:
    return b"%d 0 obj\n" % num + body + b"\nendobj\n"


def _stream_obj(num: int, content: bytes, flate: bool) -> bytes:
    data = zlib.compress(content) if flate else content
    dic = b"<< /Length %d%s >>" % (
        len(data), b" /Filter /FlateDecode" if flate else b"")
    return _obj(num, dic + b"\nstream\n" + data + b"\nendstream")


def make_pdf() -> bytes:
    page1 = (b"BT /F1 12 Tf 72 720 Td (Acme Corp acquired) Tj "
             b"[( Widget)-250( Ltd.)] TJ T* (Second \\(line\\)) Tj ET")
    page2 = b"BT 72 720 Td <48656C6C6F> Tj ( hex page) Tj ET"
    parts = [b"%PDF-1.4\n"]
    parts.append(_obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    parts.append(_obj(2, b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"))
    parts.append(_obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"))
    parts.append(_stream_obj(4, page1, flate=True))
    parts.append(_obj(5, b"<< /Type /Page /Parent 2 0 R /Contents [6 0 R] >>"))
    parts.append(_stream_obj(6, page2, flate=False))
    parts.append(b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    return b"".join(parts)


class TestVendoredExtractor:
    def test_two_pages_text(self):
        pages = extract_pdf_pages(make_pdf())
        assert len(pages) == 2
        assert pages[0] == "Acme Corp acquired Widget Ltd.\nSecond (line)"
        assert pages[1] == "Hello hex page"

    def test_whole_doc_join(self):
        text = extract_pdf_text(make_pdf())
        assert "Acme Corp acquired" in text and "Hello hex page" in text
        assert text.endswith("\n\n")

    def test_not_a_pdf_raises(self):
        with pytest.raises(ValueError):
            extract_pdf_pages(b"plain text, no header")

    def test_file_sentinel(self):
        out = _pdf_to_text(b"not a pdf at all")
        assert out.startswith("[无法读取PDF文件内容:")


class TestPdfIngest:
    def test_read_pdf_documents(self, ray_session, tmp_path):
        from graph_rag_agent_ray.sources.ingest import read_pdf_documents
        (tmp_path / "a.pdf").write_bytes(make_pdf())
        rows = read_pdf_documents(str(tmp_path)).to_pandas()
        assert list(rows["doc_id"]) == ["a.pdf"]
        text = rows["spans"][0][0]["text"]
        assert "Acme Corp acquired Widget Ltd." in text
        assert "Hello hex page" in text

    def test_read_directory_dispatches_pdf(self, ray_session, tmp_path):
        from graph_rag_agent_ray.sources.ingest import read_directory
        (tmp_path / "a.pdf").write_bytes(make_pdf())
        (tmp_path / "b.txt").write_text("plain text doc")
        rows = read_directory(str(tmp_path)).take_all()
        by_id = {r["doc_id"]: r["spans"][0]["text"] for r in rows}
        assert "Acme Corp acquired" in by_id["a.pdf"]
        assert by_id["b.txt"] == "plain text doc"


def make_docx(paragraphs) -> bytes:
    """Real minimal OOXML .docx built byte-by-byte (zip container +
    word/document.xml) — exercises runs, tabs and breaks."""
    import io
    import zipfile
    W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = []
    for runs in paragraphs:
        xml_runs = []
        for r in runs:
            if r == "\t":
                xml_runs.append("<w:r><w:tab/></w:r>")
            elif r == "\n":
                xml_runs.append("<w:r><w:br/></w:r>")
            else:
                xml_runs.append(
                    f'<w:r><w:t xml:space="preserve">{r}</w:t></w:r>')
        body.append("<w:p>" + "".join(xml_runs) + "</w:p>")
    doc = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           f'<w:document xmlns:w="{W}"><w:body>{"".join(body)}</w:body>'
           f"</w:document>")
    types = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
             '<Default Extension="xml" ContentType="application/xml"/></Types>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", types)
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


class TestDocxIngest:
    def test_vendored_extractor(self):
        from graph_rag_agent_ray.sources.docx import extract_docx_text
        data = make_docx([["Hello ", "world。"], ["第二段", "\t", "tabbed"],
                          ["line", "\n", "break"]])
        assert extract_docx_text(data) == \
            "Hello world。\n第二段\ttabbed\nline\nbreak"

    def test_reader_and_sentinels(self, ray_session, tmp_path):
        from graph_rag_agent_ray.sources.ingest import read_docx_documents
        (tmp_path / "a.docx").write_bytes(make_docx([["doc body"]]))
        (tmp_path / "old.doc").write_bytes(b"\xd0\xcf\x11\xe0 ole2 junk")
        rows = {r["doc_id"]: r["spans"][0]["text"]
                for r in read_docx_documents(str(tmp_path)).take_all()}
        assert rows["a.docx"] == "doc body"
        assert rows["old.doc"].startswith("[警告: 无法读取.doc文件 old.doc")

    def test_read_directory_dispatches_docx(self, ray_session, tmp_path):
        from graph_rag_agent_ray.sources.ingest import read_directory
        (tmp_path / "a.docx").write_bytes(make_docx([["段落一"], ["para two"]]))
        (tmp_path / "broken.docx").write_bytes(b"not a zip")
        rows = {r["doc_id"]: r["spans"][0]["text"]
                for r in read_directory(str(tmp_path)).take_all()}
        assert rows["a.docx"] == "段落一\npara two"
        assert rows["broken.docx"].startswith("[无法读取Word文档内容:")


class TestPdfEdgeCases:
    def test_octal_escape_and_crlf_stream(self):
        """Octal escapes in literal strings, CRLF stream delimiters."""
        from graph_rag_agent_ray.sources.pdf import extract_pdf_pages
        content = b"BT (A\\101\\x) Tj ET"  # \101 = 'A'; stray \x drops backslash
        data = b"".join([
            b"%PDF-1.4\n",
            _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
            _obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
            _obj(4, b"<< /Length %d >>" % len(content)
                 + b"\nstream\r\n" + content + b"\r\nendstream"),
            b"%%EOF\n",
        ])
        pages = extract_pdf_pages(data)
        assert pages == ["AAx"]

    def test_page_without_contents(self):
        from graph_rag_agent_ray.sources.pdf import extract_pdf_pages
        data = b"".join([
            b"%PDF-1.4\n",
            _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
            _obj(3, b"<< /Type /Page /Parent 2 0 R >>"),
            b"%%EOF\n",
        ])
        assert extract_pdf_pages(data) == [""]

    def test_backslash_eight_is_not_octal(self):
        from graph_rag_agent_ray.sources.pdf import _unescape_literal
        assert _unescape_literal(rb"a\8b") == b"a8b"
        assert _unescape_literal(rb"a\101b") == b"aAb"
        assert _unescape_literal(rb"a\12") == b"a\nb"[:2] + b""  # \12 = LF
