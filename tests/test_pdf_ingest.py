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
