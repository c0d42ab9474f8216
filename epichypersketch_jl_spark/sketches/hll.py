"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, 64-bit variant).

Part of the generalized sketch family mandated alongside the reference's CMS
(the reference itself has no cardinality sketch).  merge = elementwise max of
registers — associative, commutative, idempotent.
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import MergeError
from ..functions.hashing import bit_length_u64, hash64
from .base import MergeableSketch

_U = np.uint64


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HyperLogLog(MergeableSketch):
    TAG = b"HLL1"

    def __init__(self, *, p: int = 14, seed: int = 42, _regs: np.ndarray | None = None):
        if not (4 <= p <= 18):
            raise ValueError(f"p must be in [4,18], got {p}")
        self.p = int(p)
        self.m = 1 << self.p
        self.seed = int(seed)
        self.regs = _regs if _regs is not None else np.zeros(self.m, dtype=np.uint8)

    def update_batch(self, values) -> None:
        h = hash64(values, seed=self.seed)
        if h.size == 0:
            return
        idx = (h >> _U(64 - self.p)).astype(np.int64)
        rest = h & ((_U(1) << _U(64 - self.p)) - _U(1))
        # rank = leading zeros within the low 64-p bits, + 1
        rank = ((64 - self.p) - bit_length_u64(rest) + 1).astype(np.uint8)
        np.maximum.at(self.regs, idx, rank)

    def update_hashes(self, h: np.ndarray) -> None:
        """Ingest pre-computed uint64 hashes (for composite keys)."""
        if h.size == 0:
            return
        idx = (h >> _U(64 - self.p)).astype(np.int64)
        rest = h & ((_U(1) << _U(64 - self.p)) - _U(1))
        rank = ((64 - self.p) - bit_length_u64(rest) + 1).astype(np.uint8)
        np.maximum.at(self.regs, idx, rank)

    def estimate(self) -> float:
        m = self.m
        inv = np.ldexp(1.0, -self.regs.astype(np.int64))  # 2^-reg
        raw = _alpha(m) * m * m / inv.sum()
        zeros = int(np.count_nonzero(self.regs == 0))
        if raw <= 2.5 * m and zeros > 0:
            return m * np.log(m / zeros)  # linear counting, small range
        return float(raw)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if not isinstance(other, HyperLogLog) or self.p != other.p or self.seed != other.seed:
            raise MergeError("incompatible HLL parameters")
        return HyperLogLog(p=self.p, seed=self.seed, _regs=np.maximum(self.regs, other.regs))

    def _payload(self) -> bytes:
        return struct.pack("<iq", self.p, self.seed) + self.regs.tobytes()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "HyperLogLog":
        hsz = struct.calcsize("<iq")
        p, seed = struct.unpack("<iq", payload[:hsz])
        regs = np.frombuffer(payload[hsz:], dtype=np.uint8).copy()
        return cls(p=p, seed=seed, _regs=regs)
