"""Vectorized Bloom filter over pre-hashed 64-bit keys.

The URL-seen set at 10^10 keys cannot be an in-memory hash set per
executor; the classic crawler answer (Mercator, Heritrix) is a
partitioned Bloom/cuckoo filter.  Design choices here:

* **Keys arrive pre-hashed.**  The two 64-bit hashes are computed
  JVM-side as ``xxhash64(surt_key)`` / ``xxhash64('b', surt_key)``
  columns, so the Python side never touches strings — just numpy
  arithmetic (double hashing h1 + i*h2, Kirsch-Mitzenmacher).
* **Overflow-free position arithmetic** so probes can ALSO run as
  native Catalyst expressions (seen.py's default probe path): h1 is
  masked to 53 bits and h2 to 40 bits, so ``h1m + i*h2m`` stays below
  2^54 for any realistic k — no mod-2^64 wraparound anywhere, hence
  bit-identical between numpy and Spark's ANSI-checked long
  arithmetic.  Entropy is ample: the filter index space (n_bits) is
  orders of magnitude below 2^53.
* **One blob per host-hash partition** (seen.py), sized for the
  partition's expected cardinality at a target false-positive rate:
  ``m = -n ln(p) / (ln 2)^2``, ``k = (m/n) ln 2``.
* **False positives are NOT dropped** — a Bloom "maybe seen" is
  verified against the exact parquet seen-table (seen.py), so the
  crawl's URL-seen semantics stay exact; the filter only shrinks the
  anti-join's probe side (the "definitely new" majority skips the
  shuffle entirely).  FPR therefore only affects *cost*, not output.

Serialization is a stable little-endian layout: 4-byte format magic
(``BLF2`` — bumped whenever the blob layout OR the position arithmetic
changes, since a silently re-interpreted old blob would probe wrong
positions and return Bloom false NEGATIVES, re-enqueuing already-seen
URLs) + 16-byte header (n_bits, k, n_items as u64/u32/u32) + bit
array; blobs round-trip through parquet BinaryType checkpoints.
Deserializing a blob without the current magic raises a clear
"incompatible filter checkpoint" error instead of mis-probing —
rebuild filters from the exact seen table when resuming pre-v2 state.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# v2 = 53/40-bit masked double hashing + bits_longs native-probe layout
_MAGIC = b"BLF2"
_HEADER = struct.Struct("<QII")

# Masks keeping double-hash arithmetic overflow-free (see module doc):
# h1m < 2^53, h2m < 2^40, so h1m + i*h2m < 2^54 for k up to ~8000.
H1_MASK = (1 << 53) - 1
H2_MASK = (1 << 40) - 1


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
        """k probe positions per key via double hashing; (len, k) array.

        MUST stay expression-for-expression identical to the native
        probe in seen.py (`_native_probe_col`): masked inputs keep the
        whole computation < 2^54, so int64 arithmetic is exact on both
        sides and the Bloom no-false-negative guarantee survives the
        engine boundary."""
        h1m = (h1.astype(np.int64, copy=False)
               & np.int64(H1_MASK))
        # force odd step so h2 never degenerates to a zero stride
        h2m = ((h2.astype(np.int64, copy=False) & np.int64(H2_MASK))
               | np.int64(1))
        i = np.arange(self.k, dtype=np.int64)[None, :]
        return (h1m[:, None] + i * h2m[:, None]) % np.int64(self.n_bits)

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

    def to_longs(self) -> list[int]:
        """The bit array as little-endian int64 words (zero-padded to a
        multiple of 8 bytes) — the representation the native Catalyst
        probe indexes with ``element_at`` + ``shiftright``: for any pos,
        ``(words[pos >> 6] >> (pos & 63)) & 1`` equals the byte-level
        ``(bits[pos >> 3] >> (pos & 7)) & 1``."""
        pad = (-len(self.bits)) % 8
        b = self.bits if pad == 0 else np.concatenate(
            [self.bits, np.zeros(pad, dtype=np.uint8)])
        return [int(w) for w in b.view("<i8")]

    @classmethod
    def from_longs(cls, longs, n_bits: int, k: int,
                   n_items: int = 0) -> "BloomFilter":
        """Inverse of :meth:`to_longs`: rebuild the byte-level filter
        from the little-endian int64 word view (the native fold path
        assembles words JVM-side and only crosses into Python for this
        64-row blob serialization)."""
        b = np.asarray(longs, dtype="<i8").view(np.uint8)
        n_bytes = (int(n_bits) + 7) // 8
        return cls(n_bits, k, bits=b[:n_bytes].copy(), n_items=n_items)

    # --- serialization ---------------------------------------------------

    def to_bytes(self) -> bytes:
        return _MAGIC + _HEADER.pack(self.n_bits, self.k, self.n_items) \
            + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        if blob[:len(_MAGIC)] != _MAGIC:
            raise ValueError(
                "incompatible filter checkpoint: blob lacks the "
                f"{_MAGIC!r} format magic (written by an older "
                "incompatible build); rebuild the filters from the "
                "exact seen table instead of resuming them")
        n_bits, k, n_items = _HEADER.unpack_from(blob, len(_MAGIC))
        bits = np.frombuffer(blob, dtype=np.uint8,
                             offset=len(_MAGIC) + _HEADER.size).copy()
        return cls(n_bits, k, bits=bits, n_items=n_items)
