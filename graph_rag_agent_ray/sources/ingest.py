"""Ingestion: raw files → the interleaved-span documents table.

The reference's FileReader walks a directory and dispatches per extension
(/root/reference/processor/file_reader.py:36-79; txt with chardet fallback
:164-188, pdf :190-207, markdown :209-217, docx :219-295, csv :297-349,
json :351-374, yaml :376-399). Our engine's canonical input is the
``documents (doc_id, spans)`` table; these readers produce it from common
formats with Ray Data sources. PDFs decode via pypdf/PyPDF2 when importable
and otherwise via the vendored stdlib extractor (sources/pdf.py); .docx via
python-docx when importable and otherwise the vendored OOXML extractor
(sources/docx.py); legacy .doc ends in the reference's warning sentinel
(its win32com/textract rungs need Windows/network).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

import ray.data

from .documents import flat_text_to_spans


def _wrap(doc_ids, texts) -> pa.Table:
    spans = [[{"kind": "text", "text": t or "", "media_ref": "", "offset": 0}]
             for t in texts]
    return pa.table({
        "doc_id": pa.array([str(d) for d in doc_ids], pa.string()),
        "spans": pa.array(spans),
    })


def read_text_documents(paths) -> "ray.data.Dataset":
    """Directory/glob of .txt/.md files → documents (one doc per file).
    Encoding fallback mirrors file_reader.py:164-188 (utf-8 → gb18030 →
    latin-1) without the chardet dependency."""
    raw = ray.data.read_binary_files(paths, include_paths=True)

    def decode(batch: pa.Table) -> pa.Table:
        texts = []
        for b in batch.column("bytes").to_pylist():
            for enc in ("utf-8", "gb18030", "latin-1"):
                try:
                    texts.append(b.decode(enc))
                    break
                except UnicodeDecodeError:
                    continue
            else:
                texts.append(b.decode("utf-8", "replace"))
        ids = [os.path.basename(p) for p in batch.column("path").to_pylist()]
        return _wrap(ids, texts)

    return raw.map_batches(decode, batch_format="pyarrow", batch_size=64)


def read_csv_documents(path, id_column: str, text_column: str) -> "ray.data.Dataset":
    """CSV rows → one document per row (read_csv_as_dicts parity,
    file_reader.py:297-349)."""
    ds = ray.data.read_csv(path)

    def fn(batch: pa.Table) -> pa.Table:
        return _wrap(batch.column(id_column).to_pylist(),
                     [str(t) for t in batch.column(text_column).to_pylist()])

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=1024)


def read_json_documents(path, id_field: str = "doc_id",
                        text_field: str = "text") -> "ray.data.Dataset":
    """JSONL rows → documents (read_json_as_dict parity, file_reader.py:351-374)."""
    ds = ray.data.read_json(path)

    def fn(batch: pa.Table) -> pa.Table:
        return _wrap(batch.column(id_field).to_pylist(),
                     [str(t) for t in batch.column(text_field).to_pylist()])

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=1024)


def read_yaml_documents(paths, id_field: str = "doc_id",
                        text_field: str = "text") -> "ray.data.Dataset":
    """YAML files → documents (read_yaml_as_dict parity,
    file_reader.py:376-399). Each file holds either one mapping or a list of
    mappings; a mapping without ``text_field`` is serialized back to YAML
    text (the reference's 'yaml → dumped text' behaviour). Parsing happens
    inside map_batches — the safe_load per file runs on workers."""
    import yaml  # PyYAML; gate at call time like the other codec readers

    raw = ray.data.read_binary_files(paths, include_paths=True)

    def decode(batch: pa.Table) -> pa.Table:
        ids, texts = [], []
        for path, b in zip(batch.column("path").to_pylist(),
                           batch.column("bytes").to_pylist()):
            base = os.path.basename(str(path))
            try:
                obj = yaml.safe_load(b.decode("utf-8", "replace"))
            except yaml.YAMLError:
                obj = None
            rows = obj if isinstance(obj, list) else [obj]
            for i, row in enumerate(rows):
                if isinstance(row, dict) and text_field in row:
                    ids.append(str(row.get(id_field, f"{base}#{i}")))
                    texts.append(str(row[text_field]))
                elif row is not None:
                    ids.append(f"{base}#{i}")
                    texts.append(yaml.safe_dump(row, allow_unicode=True))
        return _wrap(ids, texts)

    return raw.map_batches(decode, batch_format="pyarrow", batch_size=64)


def read_parquet_documents(path, id_column: str = "doc_id",
                           text_column: str = "text") -> "ray.data.Dataset":
    ds = ray.data.read_parquet(path, columns=[id_column, text_column])
    if id_column != "doc_id" or text_column != "text":
        ds = ds.rename_columns({id_column: "doc_id", text_column: "text"})
    return flat_text_to_spans(ds)


def _pdf_to_text(data: bytes) -> str:
    """One PDF payload → text with the reference's sentinels
    (file_reader.py:190-207): per-page text joined with '\\n\\n', unreadable
    page → '[第 N 页无法读取]', unreadable file → '[无法读取PDF文件内容: …]'.
    Uses pypdf/PyPDF2 when importable; otherwise the vendored stdlib
    extractor (sources/pdf.py) — same shape for machine-generated text PDFs."""
    try:
        try:
            from pypdf import PdfReader  # type: ignore
        except ImportError:
            from PyPDF2 import PdfReader  # type: ignore
        import io
        reader = PdfReader(io.BytesIO(data))
        out = []
        for i, page in enumerate(reader.pages):
            try:
                out.append((page.extract_text() or "") + "\n\n")
            except Exception:  # noqa: BLE001 — per-page sentinel
                out.append(f"[第 {i + 1} 页无法读取]\n\n")
        return "".join(out)
    except ImportError:
        pass
    except Exception as e:  # noqa: BLE001 — whole-file sentinel
        return f"[无法读取PDF文件内容: {e}]"
    try:
        from .pdf import extract_pdf_text
        return extract_pdf_text(data)
    except Exception as e:  # noqa: BLE001 — whole-file sentinel
        return f"[无法读取PDF文件内容: {e}]"


def read_pdf_documents(paths) -> "ray.data.Dataset":
    """Directory/glob of .pdf files → documents (one doc per file), the
    binary read + decode map_batches pattern of read_text_documents with
    :func:`_pdf_to_text` as the decode (file_reader.py:190-207 parity,
    including both error sentinels)."""
    raw = ray.data.read_binary_files(paths, include_paths=True)

    def decode(batch: pa.Table) -> pa.Table:
        texts = [_pdf_to_text(b) for b in batch.column("bytes").to_pylist()]
        ids = [os.path.basename(p) for p in batch.column("path").to_pylist()]
        return _wrap(ids, texts)

    return raw.map_batches(decode, batch_format="pyarrow", batch_size=16)


def _docx_to_text(data: bytes, name: str = "", legacy_doc: bool = False) -> str:
    """One Word payload → text with the reference's sentinels
    (file_reader.py:219-295). python-docx when importable, else the vendored
    OOXML extractor (sources/docx.py). Legacy .doc (OLE2, not a zip) ends in
    the reference's warning sentinel — its win32com/textract rungs don't
    exist off-Windows/offline, which is exactly when the reference emits the
    same warning."""
    try:
        from docx import Document  # type: ignore
        import io
        doc = Document(io.BytesIO(data))
        return "\n".join(p.text for p in doc.paragraphs)
    except ImportError:
        pass
    except Exception as e:  # noqa: BLE001 — reference sentinel
        if legacy_doc:
            return (f"[警告: 无法读取.doc文件 {name}，"
                    "请安装相关依赖或转换为.docx格式]")
        return f"[无法读取Word文档内容: {e}]"
    try:
        from .docx import extract_docx_text
        return extract_docx_text(data)
    except Exception as e:  # noqa: BLE001 — reference sentinel
        if legacy_doc:
            return (f"[警告: 无法读取.doc文件 {name}，"
                    "请安装相关依赖或转换为.docx格式]")
        return f"[无法读取Word文档内容: {e}]"


def read_docx_documents(paths) -> "ray.data.Dataset":
    """Directory/glob of .docx files → documents (one doc per file) —
    file_reader.py:219-229 parity via :func:`_docx_to_text`."""
    raw = ray.data.read_binary_files(paths, include_paths=True)

    def decode(batch: pa.Table) -> pa.Table:
        names = [os.path.basename(p) for p in batch.column("path").to_pylist()]
        texts = [_docx_to_text(b, name=n,
                               legacy_doc=n.lower().endswith(".doc"))
                 for n, b in zip(names, batch.column("bytes").to_pylist())]
        return _wrap(names, texts)

    return raw.map_batches(decode, batch_format="pyarrow", batch_size=16)


SUPPORTED_DISPATCH_EXTS = (".txt", ".md", ".csv", ".json", ".jsonl",
                           ".yaml", ".yml", ".pdf", ".docx", ".doc")


def read_directory(directory, file_extensions=None,
                   recursive: bool = True,
                   strict: bool = False) -> "ray.data.Dataset":
    """FileReader.read_files parity (file_reader.py:36-143): walk a
    directory, dispatch per extension, ONE document per file with
    doc_id = path relative to ``directory`` (the reference stores relative
    paths so same-named files in different subdirs stay distinct).

    Only the LISTING happens on the driver (metadata-sized); file contents
    are read by ``ray.data.read_binary_files`` and decoded inside
    map_batches. Per-extension content semantics match the reference:
    txt/md raw text with the utf-8 → gb18030 → latin-1 encoding ladder
    (:164-188); csv rows re-joined ``','``/``'\\n'`` (:297-329); json
    pretty-printed ``json.dumps(ensure_ascii=False, indent=2)`` (:351-360);
    yaml re-dumped ``yaml.dump(allow_unicode=True)`` (:376-386). Decode
    failures yield the reference's bracketed error sentinel text rather
    than dropping the file. PDFs decode via pypdf when importable, else the
    vendored extractor (sources/pdf.py); .docx via python-docx or the
    vendored OOXML extractor (sources/docx.py); legacy .doc ends in the
    reference's warning sentinel — every reference format decodes or
    sentinels, none is silently skipped."""
    import logging

    log = logging.getLogger(__name__)
    wanted = tuple(e.lower() for e in (file_extensions or SUPPORTED_DISPATCH_EXTS))
    paths = []
    if recursive:
        walker = os.walk(directory)
    else:
        walker = [(directory, [],
                   [f for f in sorted(os.listdir(directory))
                    if os.path.isfile(os.path.join(directory, f))])]
    for root, _dirs, files in walker:
        for f in sorted(files):
            ext = os.path.splitext(f)[1].lower()
            if ext in wanted and ext in SUPPORTED_DISPATCH_EXTS:
                paths.append(os.path.join(root, f))
    if not paths:
        msg = (f"read_directory: no ingestible files under {directory!r} "
               f"(wanted extensions {wanted}) — a KG build over this "
               "input would be empty")
        if strict:
            raise ValueError(msg)
        log.warning(msg)
        import graph_rag_agent_ray.schema as S
        return ray.data.from_arrow(S.DOCUMENTS.empty_table())

    root_abs = os.path.abspath(directory)

    def decode(batch: pa.Table) -> pa.Table:
        import csv as _csv
        import io
        import json as _json

        ids, texts = [], []
        for path, b in zip(batch.column("path").to_pylist(),
                           batch.column("bytes").to_pylist()):
            # ray's paths may be absolute or relative to cwd; normalize
            ap = os.path.abspath(str(path))
            rel = os.path.relpath(ap, root_abs) if ap.startswith(root_abs) \
                else os.path.basename(ap)
            ext = os.path.splitext(rel)[1].lower()
            if ext in (".pdf", ".docx", ".doc"):
                # binary formats — never run the text-encoding ladder on them
                ids.append(rel)
                if ext == ".pdf":
                    texts.append(_pdf_to_text(b))
                else:
                    texts.append(_docx_to_text(
                        b, name=os.path.basename(rel),
                        legacy_doc=(ext == ".doc")))
                continue
            for enc in ("utf-8", "gb18030", "latin-1"):
                try:
                    text = b.decode(enc)
                    break
                except UnicodeDecodeError:
                    continue
            else:
                text = b.decode("utf-8", "replace")
            try:
                if ext == ".csv":
                    rows = _csv.reader(io.StringIO(text))
                    text = "\n".join(",".join(r) for r in rows)
                elif ext == ".json":
                    text = _json.dumps(_json.loads(text),
                                       ensure_ascii=False, indent=2)
                elif ext == ".jsonl":
                    # one object per line — pretty-print each, keep order
                    text = "\n".join(
                        _json.dumps(_json.loads(ln), ensure_ascii=False)
                        for ln in text.splitlines() if ln.strip())
                elif ext in (".yaml", ".yml"):
                    import yaml as _yaml
                    text = _yaml.dump(_yaml.safe_load(text),
                                      allow_unicode=True,
                                      default_flow_style=False)
            except Exception as e:  # noqa: BLE001 — reference sentinel text
                text = f"[无法读取{ext[1:].upper()}文件内容: {e}]"
            ids.append(rel)
            texts.append(text)
        return _wrap(ids, texts)

    raw = ray.data.read_binary_files(paths, include_paths=True)
    return raw.map_batches(decode, batch_format="pyarrow", batch_size=64)
