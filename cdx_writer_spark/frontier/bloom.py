"""Vectorized Bloom filter over pre-hashed 64-bit keys.

The URL-seen set at 10^10 keys cannot be an in-memory hash set per
executor; the classic crawler answer (Mercator, Heritrix) is a
partitioned Bloom/cuckoo filter.  Design choices here:

* **Keys arrive pre-hashed.**  The two 64-bit hashes are computed
  JVM-side as ``xxhash64(surt_key)`` / ``xxhash64('b', surt_key)``
  columns, so the Python side never touches strings — just numpy
  uint64 arithmetic (double hashing h1 + i*h2, Kirsch-Mitzenmacher).
* **One blob per host-hash partition** (seen.py), sized for the
  partition's expected cardinality at a target false-positive rate:
  ``m = -n ln(p) / (ln 2)^2``, ``k = (m/n) ln 2``.
* **False positives are NOT dropped** — a Bloom "maybe seen" is
  verified against the exact parquet seen-table (seen.py), so the
  crawl's URL-seen semantics stay exact; the filter only shrinks the
  anti-join's probe side (the "definitely new" majority skips the
  shuffle entirely).  FPR therefore only affects *cost*, not output.

Serialization is a stable little-endian layout: 16-byte header
(n_bits, k, n_items as u64/u32/u32) + bit array; blobs round-trip
through parquet BinaryType checkpoints.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_HEADER = struct.Struct("<QII")


class BloomFilter:
    """Fixed-size Bloom filter with vectorized add/contains."""

    def __init__(self, n_bits: int, k: int, bits: np.ndarray | None = None,
                 n_items: int = 0):
        if n_bits <= 0 or k <= 0:
            raise ValueError("n_bits and k must be positive")
        self.n_bits = int(n_bits)
        self.k = int(k)
        self.n_items = int(n_items)
        n_bytes = (self.n_bits + 7) // 8
        if bits is None:
            self.bits = np.zeros(n_bytes, dtype=np.uint8)
        else:
            if bits.dtype != np.uint8 or len(bits) != n_bytes:
                raise ValueError("bits array does not match n_bits")
            self.bits = bits

    @classmethod
    def sized_for(cls, n_items: int, fpr: float = 0.01) -> "BloomFilter":
        """Optimal (m, k) for `n_items` keys at false-positive rate
        `fpr` — m = -n ln p / (ln 2)^2, k = (m/n) ln 2."""
        n = max(1, n_items)
        m = max(64, int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2))))
        k = max(1, int(round((m / n) * math.log(2))))
        return cls(m, k)

    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """k probe positions per key via double hashing; (len, k) array."""
        h1u = h1.astype(np.uint64, copy=False)
        h2u = h2.astype(np.uint64, copy=False)
        # force odd step so h2 never degenerates to a zero stride
        h2u = h2u | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return ((h1u[:, None] + i * h2u[:, None])
                % np.uint64(self.n_bits)).astype(np.int64)

    def add_many(self, h1: np.ndarray, h2: np.ndarray) -> None:
        if len(h1) == 0:
            return
        pos = self._positions(h1, h2).ravel()
        np.bitwise_or.at(self.bits, pos >> 3,
                         (np.uint8(1) << (pos & 7).astype(np.uint8)))
        self.n_items += len(h1)

    def contains_many(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Boolean array: True = maybe seen, False = definitely new."""
        if len(h1) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h1, h2)
        probed = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return probed.all(axis=1)

    # --- serialization ---------------------------------------------------

    def to_bytes(self) -> bytes:
        return _HEADER.pack(self.n_bits, self.k, self.n_items) \
            + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        n_bits, k, n_items = _HEADER.unpack_from(blob, 0)
        bits = np.frombuffer(blob, dtype=np.uint8,
                             offset=_HEADER.size).copy()
        return cls(n_bits, k, bits=bits, n_items=n_items)
