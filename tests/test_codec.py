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


@given(
    st.lists(st.integers(min_value=1, max_value=200), min_size=1,
             max_size=40),
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_encode_frame_vectorized_matches_loop(sizes, seed):
    """The r5 whole-frame vectorized encoder (three codec calls per
    frame, reduceat block metadata) must be BYTE-identical to the
    per-group loop on arbitrary group shapes, including multi-block
    groups (size > 128) and cross-group id wraparound."""
    import pandas as pd

    from oboyu_spark.operators.postings import (
        _encode_frame, _encode_frame_loop,
    )

    rng = np.random.default_rng(seed)
    sizes = np.asarray(sizes)
    n = int(sizes.sum())
    bounds = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
    gid = np.repeat(np.arange(len(sizes)), sizes)
    di = np.concatenate([
        np.sort(rng.choice(10**6, s, replace=False)) for s in sizes
    ]).astype(np.int64)
    pdf = pd.DataFrame({
        "shard": (gid % 5).astype(np.int64),
        "th1": gid.astype(np.int64),
        "th2": (gid * 31).astype(np.int64),
        "salt": (gid % 3).astype(np.int64),
        "doc_int": di,
        "tf": rng.integers(1, 300, n).astype(np.int64),
        "dl": rng.integers(1, 10**5, n).astype(np.int64),
    })
    a, b = _encode_frame(pdf, bounds), _encode_frame_loop(pdf, bounds)
    assert len(a) == len(b) == len(sizes)
    for c in ("shard", "th1", "th2", "salt", "n"):
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
    for c in ("gaps", "tfs", "dls"):
        assert all(bytes(x) == bytes(y) for x, y in zip(a[c], b[c])), c
    for c in ("block_last", "block_maxtf", "block_mindl"):
        assert all(list(x) == list(y) for x, y in zip(a[c], b[c])), c
