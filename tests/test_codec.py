"""Varbyte/delta/block-max codec properties (FIXTURES.md §5)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.index.codec import (
    PostingSegment,
    bm25_impact,
    decode_postings,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert (varbyte_decode(varbyte_encode(arr), len(vals)) == arr).all()


@given(
    st.sets(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=500),
    st.integers(min_value=1, max_value=1000),
)
@settings(max_examples=100, deadline=None)
def test_segment_roundtrip(idset, tfbase):
    ids = np.array(sorted(idset), dtype=np.int64)
    rng = np.random.default_rng(tfbase)
    tfs = rng.integers(1, 300, ids.size)
    dls = rng.integers(1, 3000, ids.size)
    buf = encode_postings(ids, tfs, dls, avgdl=25.0)
    d_ids, d_tfs, d_dls = decode_postings(buf)
    assert (d_ids == ids).all()
    assert (d_tfs == tfs).all()
    assert (d_dls == dls).all()


def test_docids_must_increase():
    with pytest.raises(ValueError):
        encode_postings(
            np.array([5, 5], dtype=np.int64),
            np.array([1, 1]),
            np.array([1, 1]),
            10.0,
        )


def test_block_directory_and_max_impact():
    n = 1000
    ids = np.arange(0, 2 * n, 2, dtype=np.int64)
    tfs = np.ones(n, dtype=np.int64)
    tfs[777] = 50  # impact spike in block 6
    dls = np.full(n, 20, dtype=np.int64)
    buf = encode_postings(ids, tfs, dls, avgdl=20.0, block_size=128)
    seg = PostingSegment(buf)
    assert seg.n_blocks == (n + 127) // 128
    spike_block = 777 // 128
    expected = bm25_impact(np.array([50]), np.array([20]), 20.0)[0]
    assert abs(seg.impacts[spike_block] - expected) < 1e-6
    # other blocks have the tf=1 impact
    base = bm25_impact(np.array([1]), np.array([20]), 20.0)[0]
    assert abs(seg.impacts[0] - base) < 1e-6
    # per-block decode matches slice
    d_ids, d_tfs, _ = seg.block(spike_block)
    assert (d_tfs == tfs[spike_block * 128:(spike_block + 1) * 128]).all()
    assert (d_ids == ids[spike_block * 128:(spike_block + 1) * 128]).all()


def test_weight_stream_roundtrip_and_gating():
    rng = np.random.default_rng(3)
    n = 300
    ids = np.sort(rng.choice(10**6, n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, n)
    dls = rng.integers(5, 50, n)
    ws = rng.choice([1.0, 2.0, 3.0], n)
    buf = encode_postings(ids, tfs, dls, 20.0, block_size=128, weights=ws)
    seg = PostingSegment(buf)
    assert seg.has_weights
    got = np.concatenate([seg.block_weights(b) for b in range(seg.n_blocks)])
    assert (got == ws).all()  # 1/16 quantization is exact for these
    # per-block boosted bound dominates every weighted impact in the block
    imps = bm25_impact(tfs, dls, 20.0) * ws
    for b in range(seg.n_blocks):
        lo, hi = b * 128, min((b + 1) * 128, n)
        assert seg.wimpacts[b] >= imps[lo:hi].max() - 1e-12
    # all-unit weights: stream omitted, zero size cost vs no weights at all
    buf1 = encode_postings(ids, tfs, dls, 20.0, weights=np.ones(n))
    buf2 = encode_postings(ids, tfs, dls, 20.0)
    assert buf1 == buf2
    assert not PostingSegment(buf1).has_weights
    assert (PostingSegment(buf1).block_weights(0) == 1.0).all()


def test_compression_beats_raw():
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(10**9, 50_000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 5, ids.size)
    dls = rng.integers(5, 60, ids.size)
    buf = encode_postings(ids, tfs, dls, 30.0)
    assert len(buf) < ids.size * 24 * 0.3  # >3x smaller than raw int64x3


def test_vectorized_segment_encode_byte_identical(spark):
    """encode_segments' batch kernel must produce byte-identical segments to
    per-group encode_postings (the concatenation property of varbyte)."""
    import numpy as np

    from search_engine_spark.index.build import encode_segments
    from search_engine_spark.index.codec import (
        encode_positions_segment,
        encode_postings,
        varbyte_encode,
    )

    rng = np.random.default_rng(7)
    rows = []
    # several groups incl. a multi-block one (300 postings > BLOCK_SIZE),
    # with and without non-unit role weights (weight stream present/absent)
    specs = [
        ("alpha", 0, 300, True), ("alpha", 1, 5, False),
        ("beta", 0, 1, True), ("gamma", 2, 130, False),
    ]
    expected = {}
    expected_pos = {}
    for term, dr, cnt, weighted in specs:
        base = dr * 1000
        ids = np.sort(rng.choice(np.arange(base, base + 999), cnt, replace=False))
        tfs = rng.integers(1, 9, cnt)
        dls = rng.integers(5, 50, cnt)
        ws = (
            rng.choice([1.0, 2.0, 3.0], cnt)
            if weighted
            else np.ones(cnt, dtype=np.float64)
        )
        pos_blobs = [
            varbyte_encode(
                np.sort(rng.choice(2000, size=int(t), replace=False))
            )
            for t in tfs
        ]
        expected[(term, dr)] = encode_postings(
            ids, tfs, dls, avgdl=20.0, weights=ws
        )
        expected_pos[(term, dr)] = encode_positions_segment(pos_blobs)
        rows += [
            (term, int(i), int(t), int(d), float(w * t), bytearray(p))
            for i, t, d, w, p in zip(
                ids.tolist(), tfs.tolist(), dls.tolist(), ws.tolist(),
                pos_blobs,
            )
        ]
    df = spark.createDataFrame(
        rows,
        "term string, doc_id long, tf int, doc_len int, importance double, "
        "positions binary",
    )
    segs = encode_segments(df, avgdl=20.0, drange_span=1000, num_partitions=2).collect()
    assert len(segs) == len(specs)
    for r in segs:
        assert bytes(r["postings"]) == expected[(r["term"], r["drange"])]
        assert bytes(r["positions"]) == expected_pos[(r["term"], r["drange"])]
