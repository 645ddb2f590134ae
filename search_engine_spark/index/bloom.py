"""Vectorized bloom filter over int64 doc_ids.

Purpose: tombstone exclusion inside the WAND shard scorers without ever
materializing the tombstone id set on the driver (a dedup pass can delete
10^8 docs; collecting those ids per query does not scale — VERDICT r2 §wrong
1). The filter has no false negatives, so a bloom-NEGATIVE doc is certainly
live; bloom-POSITIVE docs ("suspects") are verified exactly against the
tombstone table afterwards, restricted to the few suspects that actually
beat the shard's top-k threshold.

Construction is distributed: each partition ORs its ids into a fixed-size
bitmap inside an Arrow-batched kernel; the driver ORs the per-partition
bitmaps (bitmap size is set by the tombstone COUNT, independent of which
docs are deleted — worst case a few MB crosses the wire per partition).

Hashing: splitmix64 double-hashing — bit_i(x) = h1(x) + i*h2(x) mod m
(Kirsch & Mitzenmacher 2006), all numpy uint64 arithmetic.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)

# bitmap sizing: ~20 bits/key targets <0.1% fp; clamped so the broadcast
# stays small even for enormous delete sets (fp rises, correctness holds —
# suspects are exactly verified downstream)
MIN_BITS = 1 << 14       # 2 KiB
MAX_BITS = 1 << 27       # 16 MiB
BITS_PER_KEY = 20


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain constants)."""
    z = x + _C1
    z = (z ^ (z >> np.uint64(30))) * _C2
    z = (z ^ (z >> np.uint64(27))) * _C3
    return z ^ (z >> np.uint64(31))


def _size_for(n_items: int) -> tuple[int, int]:
    """(m_bits, k) for an expected item count."""
    want = max(MIN_BITS, n_items * BITS_PER_KEY)
    m = MIN_BITS
    while m < want and m < MAX_BITS:
        m <<= 1
    k = max(1, min(8, int(round(m / max(1, n_items) * 0.693))))
    return m, k


class Bloom:
    """Fixed-size bloom filter; picklable (broadcast-friendly)."""

    __slots__ = ("m", "k", "words")

    def __init__(self, m_bits: int, k: int, words: np.ndarray | None = None):
        assert m_bits % 64 == 0 and (m_bits & (m_bits - 1)) == 0
        self.m = m_bits
        self.k = k
        self.words = (
            words
            if words is not None
            else np.zeros(m_bits // 64, dtype=np.uint64)
        )

    def _bit_positions(self, ids: np.ndarray) -> np.ndarray:
        """(k, n) bit indexes for an int64 id array."""
        x = ids.astype(np.uint64)
        with np.errstate(over="ignore"):
            h1 = _mix(x)
            h2 = _mix(x ^ _C2) | np.uint64(1)  # odd -> full-period stepping
            i = np.arange(self.k, dtype=np.uint64)[:, None]
            return (h1[None, :] + i * h2[None, :]) & np.uint64(self.m - 1)

    def add_many(self, ids: np.ndarray) -> None:
        if ids.size == 0:
            return
        with np.errstate(over="ignore"):
            pos = self._bit_positions(ids).ravel()
            np.bitwise_or.at(
                self.words,
                (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )

    def contains_many(self, ids: np.ndarray) -> np.ndarray:
        """Boolean mask: True = possibly present (no false negatives)."""
        if ids.size == 0:
            return np.zeros(0, dtype=bool)
        with np.errstate(over="ignore"):
            pos = self._bit_positions(ids)
            hit = (
                self.words[(pos >> np.uint64(6)).astype(np.int64)]
                >> (pos & np.uint64(63))
            ) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    def or_words(self, raw: bytes) -> None:
        self.words |= np.frombuffer(raw, dtype=np.uint64)


def bloom_from_df(df, col: str, n_items: int) -> Bloom:
    """Distributed bloom build over a single-id-column DataFrame: one
    fixed-size bitmap per partition (Arrow-batched), OR-merged on the
    driver. ``n_items`` sizes the filter (pass the table's count)."""
    import pandas as pd

    m, k = _size_for(n_items)

    def part(batches):
        b = Bloom(m, k)
        for pdf in batches:
            b.add_many(pdf[col].to_numpy(np.int64))
        yield pd.DataFrame({"w": [b.words.tobytes()]})

    out = Bloom(m, k)
    # cap the number of per-partition bitmaps crossing the wire; coalesce
    # (not repartition) -> no shuffle of the underlying rows
    parts = df.select(col).coalesce(32).mapInPandas(part, "w binary")
    for row in parts.collect():
        out.or_words(bytes(row["w"]))
    return out
