"""KLL quantile sketch (Karnin, Lang, Liberty 2016) — numpy compactors.

merge = levelwise concatenation + recompression.  Byte-identity under
re-partitioning is NOT a property of KLL (compaction is randomized); the
guaranteed invariant is the rank-error bound, which is what we test.
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import MergeError
from .base import MergeableSketch

_C = 2.0 / 3.0


class KLL(MergeableSketch):
    TAG = b"KLL1"

    def __init__(self, *, k: int = 200, seed: int = 42, _compactors=None, _n: int = 0):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.seed = int(seed)
        self.compactors: list[np.ndarray] = (
            [np.asarray(c, dtype=np.float64) for c in _compactors]
            if _compactors is not None
            else [np.empty(0, dtype=np.float64)]
        )
        self.n = int(_n)
        self._rng = np.random.default_rng(seed)

    # ------------------------------------------------------------ internals
    def _capacity(self, h: int) -> int:
        depth = len(self.compactors) - h - 1
        return max(2, int(np.ceil(self.k * (_C**depth))))

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    def _max_size(self) -> int:
        return sum(self._capacity(h) for h in range(len(self.compactors)))

    def _compress(self) -> None:
        while self._size() >= self._max_size():
            for h in range(len(self.compactors)):
                if len(self.compactors[h]) >= self._capacity(h):
                    if h + 1 >= len(self.compactors):
                        self.compactors.append(np.empty(0, dtype=np.float64))
                    buf = np.sort(self.compactors[h])
                    start = int(self._rng.integers(0, 2))
                    promoted = buf[start::2]
                    self.compactors[h + 1] = np.concatenate([self.compactors[h + 1], promoted])
                    self.compactors[h] = np.empty(0, dtype=np.float64)
                    break

    # -------------------------------------------------------------- updates
    def update_batch(self, values) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        # ingest in capacity-sized chunks so level 0 never wildly overflows
        cap = max(self._capacity(0), 64)
        for i in range(0, v.size, cap):
            self.compactors[0] = np.concatenate([self.compactors[0], v[i : i + cap]])
            self.n += int(min(cap, v.size - i))
            self._compress()

    # -------------------------------------------------------------- queries
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, c in enumerate(self.compactors):
            if len(c):
                vals.append(c)
                wts.append(np.full(len(c), 2**h, dtype=np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def rank(self, x) -> np.ndarray:
        """Estimated number of items <= x (vectorized over x)."""
        v, w = self._weighted_items()
        cw = np.concatenate([[0.0], np.cumsum(w)])
        pos = np.searchsorted(v, np.atleast_1d(np.asarray(x, dtype=np.float64)), side="right")
        return cw[pos]

    def quantile(self, q) -> np.ndarray:
        """Value(s) at normalized rank(s) q in [0,1]."""
        v, w = self._weighted_items()
        if v.size == 0:
            return np.full(np.shape(q) or (1,), np.nan)
        cw = np.cumsum(w)
        targets = np.atleast_1d(np.asarray(q, dtype=np.float64)) * cw[-1]
        pos = np.clip(np.searchsorted(cw, targets, side="left"), 0, v.size - 1)
        return v[pos]

    # ---------------------------------------------------------------- merge
    def merge(self, other: "KLL") -> "KLL":
        if not isinstance(other, KLL) or self.k != other.k:
            raise MergeError("incompatible KLL parameters")
        H = max(len(self.compactors), len(other.compactors))
        comps = []
        for h in range(H):
            a = self.compactors[h] if h < len(self.compactors) else np.empty(0)
            b = other.compactors[h] if h < len(other.compactors) else np.empty(0)
            comps.append(np.concatenate([a, b]))
        out = KLL(k=self.k, seed=self.seed, _compactors=comps, _n=self.n + other.n)
        out._compress()
        return out

    # struct header + per-level (len, raw float64 buffer) — the same framing
    # discipline as CountMinSketch._payload; checkpoint/sink blobs must never
    # go through pickle (arbitrary code execution on tampered files).
    _HDR = "<qqqq"  # k, seed, n, n_levels

    def _payload(self) -> bytes:
        parts = [struct.pack(self._HDR, self.k, self.seed, self.n, len(self.compactors))]
        for c in self.compactors:
            parts.append(struct.pack("<q", len(c)))
            parts.append(np.ascontiguousarray(c, dtype=np.float64).tobytes())
        return b"".join(parts)

    @classmethod
    def _from_payload(cls, payload: bytes) -> "KLL":
        hsz = struct.calcsize(cls._HDR)
        if len(payload) < hsz:
            raise ValueError("corrupt KLL payload")
        k, seed, n, n_levels = struct.unpack(cls._HDR, payload[:hsz])
        if n_levels < 0 or n < 0 or k <= 0:
            raise ValueError("corrupt KLL payload")
        comps = []
        off = hsz
        for _ in range(n_levels):
            if off + 8 > len(payload):
                raise ValueError("corrupt KLL payload")
            (m,) = struct.unpack("<q", payload[off : off + 8])
            off += 8
            if m < 0 or off + 8 * m > len(payload):
                raise ValueError("corrupt KLL payload")
            comps.append(np.frombuffer(payload, dtype=np.float64, count=m, offset=off))
            off += 8 * m
        if off != len(payload):
            raise ValueError("corrupt KLL payload")
        return cls(k=k, seed=seed, _compactors=comps, _n=n)
