"""Posting-list segment codec: delta + varbyte with block-max metadata.

The reference stores raw BSON posting arrays (``Indexer/Indexer.java:337-351``)
— uncompressed, no skip data, capped by Mongo's 16 MB document limit. At
10^12-turn scale posting lists must be compressed and block-skippable, so
this codec implements the classic inverted-index layout:

* docIDs are strictly increasing per (term, doc-range) group; stored as
  deltas (first delta = first docID relative to the group's range base),
  varbyte-encoded (7 data bits/byte, MSB = continuation).
* term frequencies and doc lengths are varbyte-encoded alongside (the
  reference stores ``frequency`` and ``length`` on every posting,
  ``Indexer/Indexer.java:338-340``).
* postings are chunked into fixed-size blocks; per block we store the last
  docID (skip pointer) and the block-max BM25 *impact* (the score term
  without the idf factor), enabling Block-Max WAND traversal.

Everything is vectorized numpy — this code runs inside Arrow-batched pandas
UDFs, never per-row Python from Spark's perspective.
"""

from __future__ import annotations

import struct

import numpy as np

BLOCK_SIZE = 128
MAGIC = 0x5345_4722  # "SEG!" v2: adds optional per-posting weight stream

BM25_K1 = 1.2
BM25_B = 0.75

# per-posting role weights are quantized to 1/WEIGHT_SCALE when stored —
# exact for the integer ROLE_WEIGHTS (and any 1/16-multiple); the boosted
# WAND path must be bit-identical to the DataFrame path's importance/tf.
# Scale 16 keeps every weight < 8 in ONE varbyte byte per posting.
WEIGHT_SCALE = 16
FLAG_WEIGHTS = 1  # header flag bit: weight stream present


# ---------------------------------------------------------------------------
# varbyte
# ---------------------------------------------------------------------------

def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encode of a non-negative int64 array."""
    return varbyte_encode_with_sizes(values)[0]


def varbyte_encode_with_sizes(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Vectorized varbyte encode returning (buffer, bytes-per-value).
    Because the encoding is per-value independent, slicing the buffer at
    cumulative size boundaries yields exactly ``varbyte_encode(slice)`` —
    this is what lets build_postings encode a whole Arrow batch's positions
    in ONE call and hand each posting its byte span."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    # bytes needed per value: ceil(bitlen/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 7
        tmp >>= np.uint64(7)
    nbytes = np.maximum(nbits // 7, 1)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    # fill little-endian 7-bit groups; continuation bit on all but last byte
    maxb = int(nbytes.max())
    rem = v.copy()
    for b in range(maxb):
        mask = nbytes > b
        idx = offsets[:-1][mask] + b
        chunk = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        is_last = nbytes[mask] == (b + 1)
        out[idx] = chunk | np.where(is_last, 0, 0x80).astype(np.uint8)
        rem[mask] >>= np.uint64(7)
    return out.tobytes(), nbytes


def varbyte_decode(buf: bytes, n: int) -> np.ndarray:
    """Vectorized varbyte decode of ``n`` values."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    is_last = (raw & 0x80) == 0
    # value index for each byte = number of completed values before it
    value_idx = np.concatenate(([0], np.cumsum(is_last)[:-1]))
    # position of each byte within its value
    starts = np.concatenate(([0], np.nonzero(is_last)[0][:-1] + 1))
    byte_pos = np.arange(raw.size) - starts[value_idx]
    vals = np.zeros(int(is_last.sum()), dtype=np.uint64)
    np.add.at(
        vals,
        value_idx,
        (raw & np.uint64(0x7F)).astype(np.uint64) << (np.uint64(7) * byte_pos.astype(np.uint64)),
    )
    return vals[:n].astype(np.int64)


# ---------------------------------------------------------------------------
# BM25 impact
# ---------------------------------------------------------------------------

def bm25_impact(tf: np.ndarray, dl: np.ndarray, avgdl: float,
                k1: float = BM25_K1, b: float = BM25_B) -> np.ndarray:
    """Per-posting BM25 score sans idf: tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))."""
    tf = tf.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))


def f32_upper(x) -> np.ndarray:
    """Round float64 values UP to float32: block-max impacts are stored as
    f32 and must remain valid UPPER bounds — round-to-nearest could round
    the true max down and let WAND prune a qualifying doc."""
    y = np.asarray(x, dtype=np.float64)
    f = y.astype(np.float32)
    return np.where(
        f.astype(np.float64) < y,
        np.nextafter(f, np.float32(np.inf)),
        f,
    ).astype(np.float32)


def bm25_idf(n_docs: int, df: np.ndarray | int) -> np.ndarray | float:
    """BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)). (The reference's ranker
    uses ln(N/(1+df)), Indexer.java:384-388 — kept in stats for parity
    queries; BM25 is the north-rule upgrade.)"""
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


# ---------------------------------------------------------------------------
# segment encode / decode
# ---------------------------------------------------------------------------

# magic, n_postings, base_doc_id, n_blocks, flags
_HEADER = struct.Struct("<IIqii")


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                    avgdl: float, block_size: int = BLOCK_SIZE,
                    weights: np.ndarray | None = None) -> bytes:
    """Encode one (term, doc-range) posting group.

    ``doc_ids`` must be strictly increasing. Layout (v2):

        header | block directory | varbyte(gaps) | varbyte(tf) | varbyte(dl)
               [| varbyte(round(weight*WEIGHT_SCALE)) when any weight != 1]

    block directory per block: last_doc_id:int64, impact:float32 (block max),
    wimpact:float32 (block max of weight*impact — the boosted-query bound),
    end_offsets into each of the four streams:int32 x4, n:int32. The weight
    stream is omitted (header flag clear, zero offsets) when every posting's
    weight is 1 — the common case pays no size cost.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    if n == 0:
        return b""
    if n > 1 and not (np.diff(doc_ids) > 0).all():
        raise ValueError("doc_ids must be strictly increasing")
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    base = int(doc_ids[0])
    gaps = np.diff(doc_ids, prepend=base)  # first gap = 0

    impacts = bm25_impact(tfs, dls, avgdl)
    if weights is None:
        w_q = np.full(n, WEIGHT_SCALE, dtype=np.int64)
    else:
        w_q = np.rint(
            np.asarray(weights, dtype=np.float64) * WEIGHT_SCALE
        ).astype(np.int64)
    has_w = bool((w_q != WEIGHT_SCALE).any())
    w_impacts = impacts * (w_q.astype(np.float64) / WEIGHT_SCALE)
    n_blocks = (n + block_size - 1) // block_size

    dir_entries = []
    gap_parts, tf_parts, dl_parts, w_parts = [], [], [], []
    g_off = t_off = d_off = w_off = 0
    for bi in range(n_blocks):
        lo, hi = bi * block_size, min((bi + 1) * block_size, n)
        gb = varbyte_encode(gaps[lo:hi])
        tb = varbyte_encode(tfs[lo:hi])
        db = varbyte_encode(dls[lo:hi])
        g_off += len(gb)
        t_off += len(tb)
        d_off += len(db)
        gap_parts.append(gb)
        tf_parts.append(tb)
        dl_parts.append(db)
        if has_w:
            wb = varbyte_encode(w_q[lo:hi])
            w_off += len(wb)
            w_parts.append(wb)
        dir_entries.append(
            struct.pack(
                "<qffiiiii",
                int(doc_ids[hi - 1]),
                float(f32_upper(impacts[lo:hi].max())),
                float(f32_upper(w_impacts[lo:hi].max())),
                g_off,
                t_off,
                d_off,
                w_off,
                hi - lo,
            )
        )
    flags = FLAG_WEIGHTS if has_w else 0
    return b"".join(
        [_HEADER.pack(MAGIC, n, base, n_blocks, flags)]
        + dir_entries
        + gap_parts
        + tf_parts
        + dl_parts
        + w_parts
    )


_DIR = struct.Struct("<qffiiiii")


class PostingSegment:
    """Decoded view over an encoded segment with lazy per-block access."""

    __slots__ = ("n", "base", "n_blocks", "flags", "last_doc_ids", "impacts",
                 "wimpacts", "g_offs", "t_offs", "d_offs", "w_offs",
                 "block_ns", "_gaps", "_tfs", "_dls", "_ws")

    def __init__(self, buf: bytes):
        # magic sits at offset 0 in every codec version — check it before
        # unpacking the (version-specific) rest of the header so a v1
        # segment fails with an actionable message, not a struct error
        if len(buf) < 4 or struct.unpack_from("<I", buf, 0)[0] != MAGIC:
            old = struct.unpack_from("<I", buf, 0)[0] if len(buf) >= 4 else None
            if old == 0x5345_4721:  # codec v1 ("SEG!" v1)
                raise ValueError(
                    "segment encoded with codec v1 — rebuild or compact the "
                    "index with this version (codec v2 adds a widened "
                    "header/directory and an optional weight stream)"
                )
            raise ValueError("bad segment magic")
        magic, n, base, n_blocks, flags = _HEADER.unpack_from(buf, 0)
        self.n, self.base, self.n_blocks, self.flags = n, base, n_blocks, flags
        off = _HEADER.size
        self.last_doc_ids = np.empty(n_blocks, dtype=np.int64)
        self.impacts = np.empty(n_blocks, dtype=np.float64)
        self.wimpacts = np.empty(n_blocks, dtype=np.float64)
        self.g_offs = np.empty(n_blocks + 1, dtype=np.int64)
        self.t_offs = np.empty(n_blocks + 1, dtype=np.int64)
        self.d_offs = np.empty(n_blocks + 1, dtype=np.int64)
        self.w_offs = np.empty(n_blocks + 1, dtype=np.int64)
        self.block_ns = np.empty(n_blocks, dtype=np.int64)
        self.g_offs[0] = self.t_offs[0] = self.d_offs[0] = 0
        self.w_offs[0] = 0
        for bi in range(n_blocks):
            ld, imp, wimp, go, to, do, wo, bn = _DIR.unpack_from(buf, off)
            off += _DIR.size
            self.last_doc_ids[bi] = ld
            self.impacts[bi] = imp
            self.wimpacts[bi] = wimp
            self.g_offs[bi + 1] = go
            self.t_offs[bi + 1] = to
            self.d_offs[bi + 1] = do
            self.w_offs[bi + 1] = wo
            self.block_ns[bi] = bn
        g0 = off
        t0 = g0 + int(self.g_offs[-1])
        d0 = t0 + int(self.t_offs[-1])
        w0 = d0 + int(self.d_offs[-1])
        self._gaps = buf[g0:t0]
        self._tfs = buf[t0:d0]
        self._dls = buf[d0:w0]
        self._ws = (
            buf[w0:w0 + int(self.w_offs[-1])]
            if self.flags & FLAG_WEIGHTS
            else b""
        )

    @property
    def has_weights(self) -> bool:
        return bool(self.flags & FLAG_WEIGHTS)

    def block(self, bi: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode block ``bi`` -> (doc_ids, tfs, dls)."""
        bn = int(self.block_ns[bi])
        gaps = varbyte_decode(self._gaps[self.g_offs[bi]:self.g_offs[bi + 1]], bn)
        tfs = varbyte_decode(self._tfs[self.t_offs[bi]:self.t_offs[bi + 1]], bn)
        dls = varbyte_decode(self._dls[self.d_offs[bi]:self.d_offs[bi + 1]], bn)
        prev = self.base if bi == 0 else int(self.last_doc_ids[bi - 1])
        doc_ids = prev + np.cumsum(gaps)
        return doc_ids, tfs, dls

    def block_weights(self, bi: int) -> np.ndarray:
        """Per-posting role weights for block ``bi`` (all-ones when the
        segment carries no weight stream)."""
        bn = int(self.block_ns[bi])
        if not self.has_weights:
            return np.ones(bn, dtype=np.float64)
        wq = varbyte_decode(self._ws[self.w_offs[bi]:self.w_offs[bi + 1]], bn)
        return wq.astype(np.float64) / WEIGHT_SCALE

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        gaps = varbyte_decode(self._gaps, self.n)
        tfs = varbyte_decode(self._tfs, self.n)
        dls = varbyte_decode(self._dls, self.n)
        doc_ids = self.base + np.cumsum(gaps)
        return doc_ids, tfs, dls


def decode_postings(buf: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a whole segment -> (doc_ids, tfs, dls)."""
    if not buf:
        return (np.empty(0, np.int64),) * 3
    return PostingSegment(buf).decode_all()


# ---------------------------------------------------------------------------
# positional stream (segments table `positions` column)
# ---------------------------------------------------------------------------
# Block-structured positional skip data (VERDICT r3 next #1): the per-doc
# position lists of a (term, doc-range) group are concatenated in docID
# order into ONE stream, with a directory of per-block end offsets aligned
# to the SAME BLOCK_SIZE posting blocks as the scored segment. A phrase
# query intersects candidate docIDs on the compact streams first, then
# decodes ONLY the position blocks whose posting range contains a
# candidate — the rest of the stream is skipped at byte granularity.
#
# The column is self-describing and separate from the `postings` blob, so
# the scored-segment layout (and codec MAGIC) is unchanged: WAND readers
# never touch it (column pruning), and indexes built before this column
# simply lack it (serve falls back to the row-level positional path).
#
# Layout: n_blocks:int32 | end_offset:int32[n_blocks] (cumulative bytes
# into the stream) | varbyte stream of raw position ordinals (per-posting
# lists back to back; per-posting counts come from the scored segment's tf
# stream, so no per-posting size table is stored).

_POS_HEADER = struct.Struct("<i")


def encode_positions_segment(pos_blobs: list[bytes],
                             block_size: int = BLOCK_SIZE) -> bytes:
    """Reference encoder (tests / small paths): per-posting varbyte position
    blobs in docID order -> one block-skippable stream. The production
    encoder in ``build.encode_segments`` produces byte-identical output
    vectorized over whole Arrow batches."""
    n = len(pos_blobs)
    n_blocks = (n + block_size - 1) // block_size
    sizes = np.fromiter((len(b) for b in pos_blobs), np.int64, count=n)
    cum = np.concatenate(([0], np.cumsum(sizes)))
    ends = np.asarray(
        [cum[min((bi + 1) * block_size, n)] for bi in range(n_blocks)],
        dtype="<i4",
    )
    return _POS_HEADER.pack(n_blocks) + ends.tobytes() + b"".join(pos_blobs)


class PositionalSegment:
    """View over an encoded positional stream with per-block byte access.
    ``block_bytes(lo, hi)`` returns the raw varbyte bytes of blocks
    [lo, hi) — contiguous block runs decode in one ``varbyte_decode`` call
    (counts come from the scored segment's tf stream)."""

    __slots__ = ("n_blocks", "end_offs", "_base", "_buf")

    def __init__(self, buf: bytes):
        (self.n_blocks,) = _POS_HEADER.unpack_from(buf, 0)
        self.end_offs = np.frombuffer(
            buf, dtype="<i4", count=self.n_blocks, offset=_POS_HEADER.size
        )
        self._base = _POS_HEADER.size + 4 * self.n_blocks
        self._buf = buf

    def block_bytes(self, lo: int, hi: int) -> bytes:
        """Raw bytes of blocks [lo, hi)."""
        s = 0 if lo == 0 else int(self.end_offs[lo - 1])
        e = int(self.end_offs[hi - 1])
        return self._buf[self._base + s:self._base + e]
