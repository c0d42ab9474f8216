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


def hashes_to_sparse(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes -> (register index: int64, rank: uint8) pairs — the
    sparse form of an HLL update.  Shared by the dense in-place update and
    the vectorized grouped kernel (operators/cardinality.py), so both paths
    produce bit-identical registers."""
    idx = (h >> _U(64 - p)).astype(np.int64)
    rest = h & ((_U(1) << _U(64 - p)) - _U(1))
    rank = ((64 - p) - bit_length_u64(rest) + 1).astype(np.uint8)
    return idx, rank


def frame_sparse(p: int, seed: int, idx: np.ndarray, ranks: np.ndarray) -> bytes:
    """Build a framed HLL blob directly from sparse (idx, rank) pairs
    WITHOUT allocating the dense 2^p register array — the high-group-
    cardinality path emits one of these per (task, group), so blob size
    must track the number of distinct values seen, not the register
    width."""
    from .base import _MAGIC

    payload = (
        struct.pack("<iq", p, seed)
        + b"S"
        + struct.pack("<q", len(idx))
        + np.ascontiguousarray(idx, dtype="<i4").tobytes()
        + np.ascontiguousarray(ranks, dtype=np.uint8).tobytes()
    )
    return _MAGIC + HyperLogLog.TAG + struct.pack("<q", len(payload)) + payload


def parse_sparse_blob(blob: bytes) -> tuple[int, int, np.ndarray, np.ndarray]:
    """Zero-copy parse of a frame_sparse blob -> (p, seed, idx, ranks)
    without materializing dense registers — the merge side of the grouped
    build parses one blob per (task, group) and must not allocate 2^p
    bytes per parse."""
    from .base import _MAGIC

    if blob[:4] != _MAGIC or blob[4:8] != HyperLogLog.TAG:
        raise ValueError("not an HLL blob")
    hsz = struct.calcsize("<iq")
    off = 16  # magic + tag + payload length
    p, seed = struct.unpack_from("<iq", blob, off)
    if blob[off + hsz : off + hsz + 1] != b"S":
        raise ValueError("not a sparse HLL blob")
    (nnz,) = struct.unpack_from("<q", blob, off + hsz + 1)
    base = off + hsz + 9
    if nnz < 0 or len(blob) < base + 5 * nnz:
        raise ValueError("corrupt HLL payload")
    idx = np.frombuffer(blob, dtype="<i4", count=nnz, offset=base).astype(np.int64)
    ranks = np.frombuffer(blob, dtype=np.uint8, count=nnz, offset=base + 4 * nnz)
    return p, seed, idx, ranks


def estimate_from_sparse(
    p: int, nnz: np.ndarray, pow_sums: np.ndarray
) -> np.ndarray:
    """Vectorized HyperLogLog.estimate over MANY sketches given, per
    sketch, the number of set registers and sum(2^-rank) over them.
    Zero registers contribute 2^0 = 1 each, so the harmonic denominator is
    (m - nnz) + pow_sums.  Same estimator + linear-counting switch as the
    scalar estimate(); summation order differs only in float ulps, and is
    fixed by register order, so results are deterministic under any
    partitioning."""
    m = 1 << p
    inv_sum = (m - nnz).astype(np.float64) + pow_sums
    raw = _alpha(m) * m * m / inv_sum
    zeros = (m - nnz).astype(np.float64)
    with np.errstate(divide="ignore"):
        lin = m * np.log(np.where(zeros > 0, m / np.maximum(zeros, 1e-300), 1.0))
    return np.where((raw <= 2.5 * m) & (zeros > 0), lin, raw)


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
        # rank = leading zeros within the low 64-p bits, + 1
        idx, rank = hashes_to_sparse(h, self.p)
        np.maximum.at(self.regs, idx, rank)

    def update_hashes(self, h: np.ndarray) -> None:
        """Ingest pre-computed uint64 hashes (for composite keys)."""
        if h.size == 0:
            return
        idx, rank = hashes_to_sparse(h, self.p)
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
        head = struct.pack("<iq", self.p, self.seed)
        nz = np.flatnonzero(self.regs)
        if nz.size < self.m // 8:
            # sparse encoding: 5 bytes per set register vs m bytes dense —
            # dominant for small groups / early-stream sketches
            return (
                head
                + b"S"
                + struct.pack("<q", nz.size)
                + nz.astype("<i4").tobytes()
                + self.regs[nz].tobytes()
            )
        return head + b"D" + self.regs.tobytes()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "HyperLogLog":
        hsz = struct.calcsize("<iq")
        if len(payload) < hsz + 1:
            raise ValueError("corrupt HLL payload")
        p, seed = struct.unpack("<iq", payload[:hsz])
        if not 4 <= p <= 18:
            raise ValueError("corrupt HLL payload")
        m = 1 << p
        mode, rest = payload[hsz : hsz + 1], payload[hsz + 1 :]
        if mode == b"D":
            if len(rest) != m:
                raise ValueError("corrupt HLL payload")
            regs = np.frombuffer(rest, dtype=np.uint8).copy()
        elif mode == b"S":
            if len(rest) < 8:
                raise ValueError("corrupt HLL payload")
            (nnz,) = struct.unpack("<q", rest[:8])
            if nnz < 0 or len(rest) != 8 + 5 * nnz:
                raise ValueError("corrupt HLL payload")
            idx = np.frombuffer(rest[8 : 8 + 4 * nnz], dtype="<i4").astype(np.int64)
            ranks = np.frombuffer(rest[8 + 4 * nnz :], dtype=np.uint8)
            if nnz and (idx.min() < 0 or idx.max() >= m):
                raise ValueError("corrupt HLL payload")
            regs = np.zeros(m, dtype=np.uint8)
            # duplicate indices may arrive from concatenated sparse runs;
            # maximum.at keeps merge semantics
            np.maximum.at(regs, idx, ranks)
        else:
            # legacy framing (round <= 3 blobs): dense registers with no
            # mode byte
            regs_raw = payload[hsz:]
            if len(regs_raw) != m:
                raise ValueError("corrupt HLL payload")
            regs = np.frombuffer(regs_raw, dtype=np.uint8).copy()
        return cls(p=p, seed=seed, _regs=regs)
