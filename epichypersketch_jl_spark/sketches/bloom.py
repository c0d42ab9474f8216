"""Bloom filter with double hashing; merge = bitwise OR (same params+seed).

Two hash families:
  * BloomFilter — splitmix64 double hashing (the fast general-purpose
    member; strings supported).
  * KmvBloom — bit positions from the package's SQL-portable
    quadratic-permutation hash (sketches/kmv.py) at salted rows, so a
    DuckDB oracle can recompute EVERY bit and every membership answer —
    including the false positives — with pure integer SQL (the same
    exactness trick as CountSketch).  Integer keys only.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..errors import MergeError
from ..functions.hashing import hash64, splitmix64
from .base import MergeableSketch

_U = np.uint64

#: Salt stride between KmvBloom hash rows (matches CountSketch's stride
#: discipline; any odd constant).
KMV_BLOOM_STRIDE = 1_000_003


class BloomFilter(MergeableSketch):
    TAG = b"BLM1"

    def __init__(
        self,
        *,
        n_expected: int = 1_000_000,
        fpp: float = 0.01,
        seed: int = 42,
        n_bits: int | None = None,
        n_hashes: int | None = None,
        _words: np.ndarray | None = None,
    ):
        if n_bits is None:
            n_bits = max(64, int(math.ceil(-n_expected * math.log(fpp) / (math.log(2) ** 2))))
        if n_hashes is None:
            n_hashes = max(1, round(n_bits / max(1, n_expected) * math.log(2)))
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        self.seed = int(seed)
        self.n_expected = int(n_expected)
        self.fpp = float(fpp)
        n_words = (self.n_bits + 63) // 64
        self.words = _words if _words is not None else np.zeros(n_words, dtype=np.uint64)

    def _bit_positions(self, values) -> np.ndarray:
        """(n_hashes, n) bit indices via double hashing h1 + i*h2 mod n_bits."""
        h1 = hash64(values, seed=self.seed)
        h2 = splitmix64(h1) | _U(1)  # odd => full-period stepping
        i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :]) % _U(self.n_bits)).astype(np.int64)

    def update_batch(self, values) -> None:
        pos = self._bit_positions(values).ravel()
        if pos.size == 0:
            return
        np.bitwise_or.at(self.words, pos >> 6, _U(1) << (pos & 63).astype(np.uint64))

    def contains(self, values) -> np.ndarray:
        pos = self._bit_positions(values)  # (k, n)
        bits = (self.words[pos >> 6] >> (pos & 63).astype(np.uint64)) & _U(1)
        return bits.all(axis=0)

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.words.view(np.uint8)).mean())

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (
            not isinstance(other, BloomFilter)
            or self.n_bits != other.n_bits
            or self.n_hashes != other.n_hashes
            or self.seed != other.seed
        ):
            raise MergeError("incompatible Bloom parameters")
        return BloomFilter(
            n_expected=self.n_expected,
            fpp=self.fpp,
            seed=self.seed,
            n_bits=self.n_bits,
            n_hashes=self.n_hashes,
            _words=self.words | other.words,
        )

    def _payload(self) -> bytes:
        return (
            struct.pack("<qiqqd", self.n_bits, self.n_hashes, self.seed, self.n_expected, self.fpp)
            + self.words.tobytes()
        )

    @classmethod
    def _from_payload(cls, payload: bytes) -> "BloomFilter":
        hsz = struct.calcsize("<qiqqd")
        n_bits, n_hashes, seed, n_exp, fpp = struct.unpack("<qiqqd", payload[:hsz])
        words = np.frombuffer(payload[hsz:], dtype=np.uint64).copy()
        return cls(
            n_expected=n_exp, fpp=fpp, seed=seed, n_bits=n_bits, n_hashes=n_hashes, _words=words
        )


def kmv_bloom_pos_sql(value_expr: str, row: int, n_bits: int) -> str:
    """SQL text for KmvBloom's r-th bit position of an integer expression —
    identical in Spark SQL and DuckDB (kmv.hash_sql is int64-safe)."""
    from .kmv import hash_sql

    h = hash_sql(f"(CAST({value_expr} AS BIGINT) + {row * KMV_BLOOM_STRIDE})")
    return f"(({h}) % {n_bits})"


class KmvBloom(MergeableSketch):
    """Bloom filter whose bit positions are SQL-recomputable (module doc)."""

    TAG = b"BLK1"

    def __init__(
        self,
        *,
        n_bits: int = 1 << 16,
        n_hashes: int = 3,
        _words: np.ndarray | None = None,
    ):
        if n_bits < 64:
            raise ValueError("n_bits must be >= 64")
        if n_hashes < 1:
            raise ValueError("n_hashes must be >= 1")
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        n_words = (self.n_bits + 63) // 64
        self.words = _words if _words is not None else np.zeros(n_words, dtype=np.uint64)

    def _bit_positions(self, values) -> np.ndarray:
        from .kmv import kmv_hash

        v = np.asarray(values, dtype=np.int64)
        return np.stack(
            [kmv_hash(v + r * KMV_BLOOM_STRIDE) % self.n_bits for r in range(self.n_hashes)]
        )

    def update_batch(self, values) -> None:
        pos = self._bit_positions(values).ravel()
        if pos.size == 0:
            return
        np.bitwise_or.at(self.words, pos >> 6, _U(1) << (pos & 63).astype(np.uint64))

    def contains(self, values) -> np.ndarray:
        pos = self._bit_positions(values)
        bits = (self.words[pos >> 6] >> (pos & 63).astype(np.uint64)) & _U(1)
        return bits.all(axis=0)

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.words.view(np.uint8)).mean())

    def merge(self, other: "KmvBloom") -> "KmvBloom":
        if (
            not isinstance(other, KmvBloom)
            or self.n_bits != other.n_bits
            or self.n_hashes != other.n_hashes
        ):
            raise MergeError("incompatible KmvBloom parameters")
        return KmvBloom(
            n_bits=self.n_bits, n_hashes=self.n_hashes, _words=self.words | other.words
        )

    def _payload(self) -> bytes:
        return struct.pack("<qi", self.n_bits, self.n_hashes) + self.words.tobytes()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "KmvBloom":
        hsz = struct.calcsize("<qi")
        n_bits, n_hashes = struct.unpack("<qi", payload[:hsz])
        words = np.frombuffer(payload[hsz:], dtype=np.uint64).copy()
        return cls(n_bits=n_bits, n_hashes=n_hashes, _words=words)
