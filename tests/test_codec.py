"""Property tests: decode∘encode == id for the posting-block codec
(FIXTURES.md §4)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from shazam_an_industrial_strength_audio_search_algorithm__spark.functions.codec import (
    decode_block,
    encode_block,
    varint_decode,
    varint_encode,
    zigzag_decode,
    zigzag_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = varint_decode(varint_encode(arr))
    assert out.tolist() == vals


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_zigzag_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert zigzag_decode(zigzag_encode(arr)).tolist() == vals


@given(
    st.sets(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=300),
    st.data(),
)
@settings(max_examples=200, deadline=None)
def test_block_roundtrip(ids, data):
    doc_ids = np.array(sorted(ids), dtype=np.int64)
    ints = st.lists(
        st.integers(min_value=1, max_value=10**6),
        min_size=len(doc_ids),
        max_size=len(doc_ids),
    )
    tfs = np.array(data.draw(ints), dtype=np.int64)
    dls = np.array(data.draw(ints), dtype=np.int64)
    d, t, dl = decode_block(encode_block(doc_ids, tfs, dls))
    assert d.tolist() == doc_ids.tolist()
    assert t.tolist() == tfs.tolist()
    assert dl.tolist() == dls.tolist()


@given(
    st.sets(st.integers(min_value=-(2**63), max_value=2**63 - 1),
            min_size=1, max_size=60),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip_with_positions(ids, data):
    """Positions ride in a trailing delta section: tf[i] strictly
    ascending offsets per doc; full round-trip, and the SAME payload
    still decodes positions-free (readers that don't ask don't pay)."""
    doc_ids = np.array(sorted(ids), dtype=np.int64)
    n = len(doc_ids)
    tfs = np.array(
        data.draw(st.lists(st.integers(min_value=1, max_value=8),
                           min_size=n, max_size=n)),
        dtype=np.int64,
    )
    dls = np.array(
        data.draw(st.lists(st.integers(min_value=1, max_value=10**6),
                           min_size=n, max_size=n)),
        dtype=np.int64,
    )
    pos_parts = []
    for tf in tfs:
        offs = sorted(data.draw(st.sets(
            st.integers(min_value=0, max_value=10**6),
            min_size=int(tf), max_size=int(tf))))
        pos_parts.append(np.array(offs, dtype=np.int64))
    flat = np.concatenate(pos_parts)
    payload = encode_block(doc_ids, tfs, dls, flat)
    d, t, dl, p = decode_block(payload, with_positions=True)
    assert d.tolist() == doc_ids.tolist()
    assert t.tolist() == tfs.tolist()
    assert dl.tolist() == dls.tolist()
    assert p.tolist() == flat.tolist()
    d2, t2, dl2 = decode_block(payload)  # positions section ignored
    assert d2.tolist() == doc_ids.tolist()
    assert t2.tolist() == tfs.tolist()
    assert dl2.tolist() == dls.tolist()


def test_positions_size_mismatch_rejected():
    import pytest

    ids = np.array([1, 2], dtype=np.int64)
    tfs = np.array([2, 1], dtype=np.int64)
    dls = np.array([5, 5], dtype=np.int64)
    with pytest.raises(ValueError):
        encode_block(ids, tfs, dls, np.array([0, 1], dtype=np.int64))
    payload = encode_block(ids, tfs, dls)  # no positions stored
    with pytest.raises(ValueError):
        decode_block(payload, with_positions=True)


def test_block_rejects_unsorted():
    import pytest

    one = np.array([1, 1])
    with pytest.raises(ValueError):
        encode_block(np.array([3, 1], dtype=np.int64), one, one)
    with pytest.raises(ValueError):
        encode_block(np.array([1, 1], dtype=np.int64), one, one)


def test_compression_beats_raw():
    """Dense ascending ids (small gaps) must compress far below raw
    (8B id + 8B tf + 8B dl = 24B/posting)."""
    ids = np.arange(10_000, dtype=np.int64) * 7 + 123
    tfs = np.ones(10_000, dtype=np.int64)
    dls = np.full(10_000, 900, dtype=np.int64)
    payload = encode_block(ids, tfs, dls)
    assert len(payload) < 10_000 * 5  # ~4 bytes/posting vs 24 raw
