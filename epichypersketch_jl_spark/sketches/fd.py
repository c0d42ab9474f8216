"""Frequent Directions — the mergeable MATRIX sketch (Liberty 2013,
Ghashami et al. 2016): a deterministic l x d shadow B of a tall n x d
matrix A with the covariance guarantee

    0 <= ||A^T A - B^T B||_2 <= ||A||_F^2 / l

i.e. every direction's second moment is preserved to within a 1/l
fraction of the total mass — the matrix analog of Misra-Gries (which it
degenerates to for one-hot rows).  The primitive behind streaming PCA /
low-rank summaries of an embedding table at 100-TB scale: the sketch is
l*d floats regardless of row count.

Merge = stack the two B blocks and shrink back to l rows (Ghashami's
proof: the bound composes additively, so partition-local sketches
tree-merge like every other family member).  NOTE: unlike the hash-based
sketches, B itself is NOT partition-invariant (SVD sees rows in arrival
order); only the guarantee is.  Tests therefore pin the bound and the
exact Frobenius mass, not bytes.

Reference parity: EpicHyperSketch.jl has no matrix sketch; this extends
the mergeable family the north_star asks for.
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import MergeError
from .base import MergeableSketch


class FrequentDirections(MergeableSketch):
    TAG = b"FDS1"

    def __init__(
        self,
        *,
        l: int = 16,
        dim: int | None = None,
        _rows: np.ndarray | None = None,
        _fro2: float = 0.0,
        _n_rows: int = 0,
    ) -> None:
        if l < 2:
            raise ValueError("l must be >= 2")
        self.l = int(l)
        self.dim = dim if dim is None else int(dim)
        # buffer holds up to 2l rows; shrink compacts back to <= l
        self._buf = _rows  # (m, dim) float64 or None
        self.fro2 = float(_fro2)  # exact ||A||_F^2 accumulated
        self.n_rows = int(_n_rows)

    # ------------------------------------------------------------- internals
    def _shrink(self) -> None:
        """SVD shrink: keep l directions, subtract sigma_l^2 from every
        retained singular value (the FD soft-threshold)."""
        if self._buf is None or self._buf.shape[0] <= self.l:
            return
        _, s, vt = np.linalg.svd(self._buf, full_matrices=False)
        if len(s) > self.l:
            delta = s[self.l - 1] ** 2
        else:
            delta = 0.0
        keep = min(self.l, len(s))
        s2 = np.maximum(s[:keep] ** 2 - delta, 0.0)
        self._buf = np.sqrt(s2)[:, None] * vt[:keep]
        nz = np.flatnonzero(s2 > 0)
        self._buf = self._buf[: (nz[-1] + 1)] if nz.size else self._buf[:0]

    # --------------------------------------------------------------- updates
    def update_batch(self, rows: np.ndarray) -> None:
        rows = np.asarray(rows, dtype=np.float64)
        if rows.ndim != 2 or rows.shape[0] == 0:
            return
        if self.dim is None:
            self.dim = rows.shape[1]
        if rows.shape[1] != self.dim:
            raise ValueError(f"dim mismatch: {rows.shape[1]} vs {self.dim}")
        self.fro2 += float((rows * rows).sum())
        self.n_rows += rows.shape[0]
        start = 0
        while start < rows.shape[0]:
            room = 2 * self.l - (0 if self._buf is None else self._buf.shape[0])
            chunk = rows[start : start + max(room, self.l)]
            self._buf = chunk if self._buf is None else np.vstack([self._buf, chunk])
            start += chunk.shape[0]
            if self._buf.shape[0] > 2 * self.l:
                self._shrink()
        self._shrink()

    # ----------------------------------------------------------------- query
    @property
    def B(self) -> np.ndarray:
        """The (<= l, dim) sketch matrix."""
        d = self.dim or 0
        if self._buf is None:
            return np.zeros((0, d))
        self._shrink()
        return self._buf

    def cov_error_bound(self) -> float:
        """The guaranteed ceiling on ||A^T A - B^T B||_2."""
        return self.fro2 / self.l

    # ----------------------------------------------------------------- merge
    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if not isinstance(other, FrequentDirections) or self.l != other.l:
            raise MergeError("incompatible FrequentDirections parameters")
        if self.dim is not None and other.dim is not None and self.dim != other.dim:
            raise MergeError("incompatible FrequentDirections dims")
        a, b = self.B, other.B
        rows = np.vstack([a, b]) if a.size and b.size else (a if a.size else b)
        out = FrequentDirections(
            l=self.l,
            dim=self.dim if self.dim is not None else other.dim,
            _rows=rows.copy() if rows.size else None,
            _fro2=self.fro2 + other.fro2,
            _n_rows=self.n_rows + other.n_rows,
        )
        out._shrink()
        return out

    # ------------------------------------------------------------- serialize
    def _payload(self) -> bytes:
        b = self.B
        d = self.dim or 0
        return (
            struct.pack("<iiqdq", self.l, d, b.shape[0], self.fro2, self.n_rows)
            + np.ascontiguousarray(b, dtype=np.float64).tobytes()
        )

    @classmethod
    def _from_payload(cls, payload: bytes) -> "FrequentDirections":
        hsz = struct.calcsize("<iiqdq")
        l, d, m, fro2, n_rows = struct.unpack("<iiqdq", payload[:hsz])
        rows = np.frombuffer(payload[hsz:], dtype=np.float64).reshape(m, d).copy()
        return cls(
            l=l,
            dim=d if d else None,
            _rows=rows if m else None,
            _fro2=fro2,
            _n_rows=n_rows,
        )
