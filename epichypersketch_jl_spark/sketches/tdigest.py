"""t-digest quantile sketch (Dunning & Ertl) — merging variant, vectorized.

Clustering uses the k1 scale function k(q) = (delta / 2π) asin(2q−1); points
whose cumulative k-index falls in the same unit interval merge into one
centroid, which bounds every centroid's k-size by 1 and lets the compress
step be a pure numpy groupby (np.unique + np.add.reduceat) instead of the
usual sequential greedy loop.  merge = concatenate centroids + compress.
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import MergeError
from .base import MergeableSketch


class TDigest(MergeableSketch):
    TAG = b"TDG1"

    def __init__(
        self,
        *,
        compression: float = 100.0,
        _means: np.ndarray | None = None,
        _weights: np.ndarray | None = None,
        _min: float = np.inf,
        _max: float = -np.inf,
    ):
        self.compression = float(compression)
        self.means = np.asarray(_means, dtype=np.float64) if _means is not None else np.empty(0)
        self.weights = (
            np.asarray(_weights, dtype=np.float64) if _weights is not None else np.empty(0)
        )
        self.vmin = float(_min)
        self.vmax = float(_max)
        self._buf_v: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []
        self._buf_n = 0

    # ------------------------------------------------------------ internals
    def _k(self, q: np.ndarray) -> np.ndarray:
        q = np.clip(q, 1e-12, 1 - 1e-12)
        return self.compression / (2 * np.pi) * np.arcsin(2 * q - 1)

    def _compress(self, force: bool = False) -> None:
        if self._buf_n == 0 and not force:
            return
        vs = [self.means] + self._buf_v
        ws = [self.weights] + self._buf_w
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        self._buf_v, self._buf_w, self._buf_n = [], [], 0
        if v.size == 0:
            return
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        total = w.sum()
        # centroid midpoint quantiles -> k-index -> group by unit interval
        cum = np.cumsum(w)
        qmid = (cum - w / 2) / total
        ki = np.floor(self._k(qmid)).astype(np.int64)  # unit intervals of k
        # group boundaries where the integer k-index changes
        starts = np.flatnonzero(np.concatenate([[True], ki[1:] != ki[:-1]]))
        gw = np.add.reduceat(w, starts)
        gm = np.add.reduceat(v * w, starts) / gw
        self.means, self.weights = gm, gw
        self.vmin = min(self.vmin, float(v[0]))
        self.vmax = max(self.vmax, float(v[-1]))

    # -------------------------------------------------------------- updates
    def update_batch(self, values, weights=None) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        mask = ~np.isnan(v)
        v = v[mask]
        if v.size == 0:
            return
        w = (
            np.ones(v.size, dtype=np.float64)
            if weights is None
            else np.asarray(weights, dtype=np.float64).ravel()[mask]
        )
        self._buf_v.append(v)
        self._buf_w.append(w)
        self._buf_n += v.size
        if self._buf_n >= 10 * self.compression:
            self._compress()

    @property
    def n(self) -> float:
        return float(self.weights.sum()) + float(sum(w.sum() for w in self._buf_w))

    # -------------------------------------------------------------- queries
    def quantile(self, q) -> np.ndarray:
        self._compress()
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.means.size == 0:
            return np.full(qs.shape, np.nan)
        if self.means.size == 1:
            return np.full(qs.shape, self.means[0])
        w, m = self.weights, self.means
        total = w.sum()
        cum = np.cumsum(w) - w / 2  # centroid midpoints
        targets = qs * total
        out = np.interp(targets, cum, m)
        out = np.where(targets <= cum[0], np.interp(targets, [0, cum[0]], [self.vmin, m[0]]), out)
        out = np.where(
            targets >= cum[-1], np.interp(targets, [cum[-1], total], [m[-1], self.vmax]), out
        )
        return out

    def cdf(self, x) -> np.ndarray:
        self._compress()
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if self.means.size == 0:
            return np.full(xs.shape, np.nan)
        w, m = self.weights, self.means
        cum = np.cumsum(w) - w / 2
        return np.interp(xs, m, cum / w.sum(), left=0.0, right=1.0)

    # ---------------------------------------------------------------- merge
    def merge(self, other: "TDigest") -> "TDigest":
        if not isinstance(other, TDigest) or self.compression != other.compression:
            raise MergeError("incompatible TDigest parameters")
        self._compress()
        other._compress()
        out = TDigest(
            compression=self.compression,
            _means=np.concatenate([self.means, other.means]),
            _weights=np.concatenate([self.weights, other.weights]),
            _min=min(self.vmin, other.vmin),
            _max=max(self.vmax, other.vmax),
        )
        out._compress(force=True)
        return out

    # struct header + raw float64 buffers: same framing discipline as
    # CountMinSketch._payload — blobs read back from checkpoints/sinks must
    # never go through pickle (arbitrary code execution on tampered files).
    _HDR = "<dddq"

    def _payload(self) -> bytes:
        self._compress()
        hdr = struct.pack(
            self._HDR, self.compression, self.vmin, self.vmax, self.means.size
        )
        return (
            hdr
            + np.ascontiguousarray(self.means, dtype=np.float64).tobytes()
            + np.ascontiguousarray(self.weights, dtype=np.float64).tobytes()
        )

    @classmethod
    def _from_payload(cls, payload: bytes) -> "TDigest":
        hsz = struct.calcsize(cls._HDR)
        comp, lo, hi, n = struct.unpack(cls._HDR, payload[:hsz])
        if hsz + 16 * n != len(payload):
            raise ValueError("corrupt TDigest payload")
        means = np.frombuffer(payload, dtype=np.float64, count=n, offset=hsz)
        weights = np.frombuffer(payload, dtype=np.float64, count=n, offset=hsz + 8 * n)
        return cls(compression=comp, _means=means, _weights=weights, _min=lo, _max=hi)
