"""Chunker parity with the reference DocumentChunker (imported
read-only for behavioral comparison) + Spark surface."""

from __future__ import annotations

import sys

import pytest

from oboyu_spark.operators.chunker import chunk_documents, py_chunk_text

TEXTS = [
    "",
    "   ",
    "short text",
    "a" * 1024,
    "a" * 1025,
    ("word " * 300).strip(),               # breaks at ". "? no - spaces only
    ("sentence one. " * 120).strip(),      # sentence breaks
    ("パラグラフ。" * 300),                  # JP sentence breaks
    ("para\n\n" * 250).strip(),            # paragraph breaks
    "x" * 5000,                            # no break points at all
    ("line\n" * 400).strip(),              # newline breaks
    ("mixed text. 日本語の文。! " * 90).strip(),
]


def _reference_chunker(size=1024, overlap=256):
    # load the module file directly — the package __init__ chain pulls
    # optional deps (chardet) that aren't installed here
    import importlib.util

    path = "/root/reference/src/oboyu/indexer/core/document_chunker.py"
    try:
        spec = importlib.util.spec_from_file_location("ref_chunker", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.DocumentChunker(chunk_size=size, chunk_overlap=overlap)
    except Exception:
        return None


@pytest.mark.parametrize("size,overlap", [(1024, 256), (300, 75), (100, 20)])
def test_reference_parity(size, overlap):
    ref = _reference_chunker(size, overlap)
    if ref is None:
        pytest.skip("reference chunker not importable")
    for t in TEXTS:
        assert py_chunk_text(t, size, overlap) == ref.chunk_text(t), t[:50]


def test_basic_properties():
    assert py_chunk_text("") == [""]
    assert py_chunk_text("abc") == ["abc"]
    chunks = py_chunk_text("x" * 5000, 1024, 256)
    assert all(len(c) <= 1024 for c in chunks)
    # overlap reconstructs the full text's coverage
    assert sum(len(c) for c in chunks) >= 5000


def test_spark_chunk_documents(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    rows = chunk_documents(docs, chunk_size=300, chunk_overlap=75).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_index"], r["text"]))
    for i, t in enumerate(TEXTS):
        got = [txt for _, txt in sorted(by_doc.get(i, []))]
        assert got == py_chunk_text(t, 300, 75), t[:40]
    # deterministic chunk ids
    assert all(r["chunk_id"] == f"{r['doc_id']}#{r['chunk_index']}" for r in rows)


def test_spark_chunk_documents_fixed(spark):
    from oboyu_spark.operators.chunker import chunk_documents_fixed

    texts = TEXTS + ["", "   ", "x" * 301, "a" * 300]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_documents_fixed(docs, chunk_size=300,
                                 chunk_overlap=75).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_index"], r["text"]))
    for i, t in enumerate(texts):
        got = [txt for _, txt in sorted(by_doc.get(i, []))]
        if not t or t.strip() == "":
            assert got == [""], repr(t)
        elif len(t) <= 300:
            assert got == [t]
        else:
            step = 225
            exp = [t[j:j + 300].strip(" ") for j in range(0, len(t), step)]
            assert got == [c for c in exp if c != ""], t[:40]
    # overlap guard
    import pytest as _pt
    with _pt.raises(ValueError, match="chunk_overlap"):
        chunk_documents_fixed(docs, chunk_size=100, chunk_overlap=100)


def test_chunk_documents_fixed_plan_has_no_udf(spark):
    """The fixed chunker's selling point: zero Python in the plan."""
    import contextlib
    import io

    from oboyu_spark.operators.chunker import chunk_documents_fixed

    docs = spark.createDataFrame([(1, "abc " * 200)],
                                 "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        chunk_documents_fixed(docs, chunk_size=300,
                              chunk_overlap=75).explain("formatted")
    plan = buf.getvalue()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
