"""Delta-gap + varbyte posting-list codec — pure numpy, fully vectorized.

The reference stores raw (term, chunk_id, tf) rows (schema.py:113-127);
the north rule requires compressed posting lists, so this layer exceeds
the reference's storage format while preserving its scoring semantics.

Format: classic unsigned LEB128-style varbyte — little-endian 7-bit
groups, high bit set on continuation bytes, terminator byte < 0x80.
Doc ids are sorted and delta-gapped before encoding (first value is
stored absolute). All encode/decode paths are numpy array ops — no
per-element Python loops except over the ≤10 possible byte positions.
"""

from __future__ import annotations

import numpy as np

_MASK = np.uint64(0x7F)
_CONT = np.uint8(0x80)


def encode_varbyte_buf(values: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """Varbyte-encode a whole array in one pass; returns the raw uint8
    buffer plus the per-value byte count. Because varbyte is
    per-value independent, any CONTIGUOUS slice of values maps to the
    contiguous byte range given by the cumulative counts — which is
    what lets the partition encoder encode a million posting lists
    with three calls instead of three calls per list."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # number of 7-bit groups per value (>=1)
    nbytes = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)  # exclusive end offset per value
    starts = ends - nbytes
    # write each byte position k (k-th 7-bit group), vectorized over values
    max_b = int(nbytes.max())
    for k in range(max_b):
        sel = nbytes > k
        pos = starts[sel] + k
        chunk = ((v[sel] >> np.uint64(7 * k)) & _MASK).astype(np.uint8)
        is_last = (nbytes[sel] - 1) == k
        out[pos] = np.where(is_last, chunk, chunk | _CONT)
    return out, nbytes


def encode_varbyte(values: np.ndarray) -> bytes:
    """Encode a non-negative int array to varbyte bytes."""
    out, _ = encode_varbyte_buf(values)
    return out.tobytes()


def decode_varbyte(buf: bytes) -> np.ndarray:
    """Decode varbyte bytes back to a uint64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_term = raw < 0x80  # terminator byte of each value
    n_vals = int(is_term.sum())
    # group index for every byte: 0-based value id
    group = np.zeros(raw.shape, dtype=np.int64)
    group[1:] = np.cumsum(is_term)[:-1]
    # position of byte within its value
    starts = np.zeros(n_vals, dtype=np.int64)
    ends = np.flatnonzero(is_term)
    starts[1:] = ends[:-1] + 1
    pos_in_group = np.arange(raw.size, dtype=np.int64) - starts[group]
    vals = np.zeros(n_vals, dtype=np.uint64)
    contrib = (raw & 0x7F).astype(np.uint64) << (
        np.uint64(7) * pos_in_group.astype(np.uint64)
    )
    np.add.at(vals, group, contrib)
    return vals


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Sort-assumed doc ids -> delta gaps -> varbyte."""
    d = np.asarray(doc_ids, dtype=np.uint64)
    if d.size == 0:
        return b""
    gaps = np.empty_like(d)
    gaps[0] = d[0]
    gaps[1:] = d[1:] - d[:-1]
    return encode_varbyte(gaps)


def decode_doc_ids(buf: bytes) -> np.ndarray:
    gaps = decode_varbyte(buf)
    return np.cumsum(gaps, dtype=np.uint64)
