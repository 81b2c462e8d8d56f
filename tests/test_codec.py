"""Varbyte/delta-gap codec round-trip properties (hypothesis)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from oboyu_spark.operators.codec import (
    decode_doc_ids,
    decode_varbyte,
    encode_doc_ids,
    encode_varbyte,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert decode_varbyte(encode_varbyte(arr)).tolist() == vals


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=0, max_size=300, unique=True
    )
)
@settings(max_examples=200, deadline=None)
def test_docid_roundtrip(ids):
    ids = sorted(ids)
    arr = np.array(ids, dtype=np.uint64)
    assert decode_doc_ids(encode_doc_ids(arr)).tolist() == ids


def test_compression_ratio():
    # dense sorted ids compress to ~1 byte/posting
    ids = np.arange(0, 100_000, 3, dtype=np.uint64)
    enc = encode_doc_ids(ids)
    assert len(enc) < ids.size * 1.1


def test_empty():
    assert encode_varbyte(np.array([], dtype=np.uint64)) == b""
    assert decode_varbyte(b"").size == 0
    assert decode_doc_ids(b"").size == 0
