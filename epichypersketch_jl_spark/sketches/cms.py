"""Count-Min Sketch over integer k-tuple keys — vectorized numpy.

Semantics match the reference (SURVEY.md §2 #9-#13):

* table: (d x w) counters, d = ceil(ln(1/delta)), w = ceil(e/eps)
  (reference src/sketch.jl:39-78; defaults src/EpicHyperSketch.jl:14-16).
* per-row hash of a key (t_1..t_h): (sum_j t_j * coeff[r, j]) mod (d*w) mod w,
  coefficients uniform in [1, d*w-1], seeded (reference src/count_gpu.jl:21-30,
  133-136; coeffs src/sketch.jl:63-69).  We accumulate in int64 so the
  double-mod is exact (the reference relies on Int32 wraparound absorbed by
  the mods — src/EpicHyperSketch.jl:10, test/debug_negative_hash.jl).
* point query: min over ALL d rows (the GPU path, src/count_gpu.jl:139-155);
  we deliberately do NOT reproduce the CPU path's row-1-only read
  (src/count_cpu.jl:172,213) — see SURVEY.md §2 #13.
* merge: elementwise +, valid because coefficients are seed-derived and thus
  identical on every executor (reference shares one sketch object instead,
  src/partition.jl:148).
* conservative update (optional): never-undercount preserved, strictly
  tighter estimates; merge by + stays sound because each cell still upper-
  bounds every key counted into it within its partition.

Counters are int64: at the 10^12-sequence design scale a single heavy key
exceeds int32.
"""

from __future__ import annotations

import struct

import numpy as np

from ..config import cms_dims
from ..errors import MergeError
from .base import MergeableSketch


class CountMinSketch(MergeableSketch):
    TAG = b"CMS1"

    def __init__(
        self,
        *,
        delta: float = 1e-4,
        epsilon: float = 5e-5,
        key_width: int = 1,
        seed: int = 42,
        conservative: bool = False,
        depth: int | None = None,
        width: int | None = None,
        _table: np.ndarray | None = None,
        _n_updates: int = 0,
    ) -> None:
        d, w = cms_dims(delta, epsilon)
        self.depth = int(depth if depth is not None else d)
        self.width = int(width if width is not None else w)
        self.key_width = int(key_width)
        self.seed = int(seed)
        self.conservative = bool(conservative)
        self.delta = float(delta)
        self.epsilon = float(epsilon)
        # Seed-derived coefficients => identical across executors => mergeable.
        rng = np.random.default_rng(self.seed)
        self.coeffs = rng.integers(
            1, self.depth * self.width, size=(self.depth, self.key_width), dtype=np.int64
        )
        if _table is not None:
            self.table = _table
        else:
            self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.n_updates = int(_n_updates)  # total increments N, for the eps*N bound

    # ------------------------------------------------------------------ hash
    def bucket_indices(self, keys: np.ndarray) -> np.ndarray:
        """(n, key_width) int array -> (d, n) bucket indices."""
        keys = np.ascontiguousarray(keys, dtype=np.int64)
        if keys.ndim == 1:
            keys = keys[:, None]
        if keys.shape[1] != self.key_width:
            raise ValueError(f"key width {keys.shape[1]} != {self.key_width}")
        # (n, d): double mod exactly as the reference's final index calc.
        raw = keys @ self.coeffs.T
        return (raw % (self.depth * self.width) % self.width).T

    # ---------------------------------------------------------------- update
    def update_batch(self, keys: np.ndarray, counts: np.ndarray | None = None) -> None:
        """Add `counts[i]` (default 1) occurrences of each key row."""
        keys = np.ascontiguousarray(keys, dtype=np.int64)
        if keys.ndim == 1:
            keys = keys[:, None]
        n = keys.shape[0]
        if n == 0:
            return
        unit = counts is None
        if counts is None:
            counts = np.ones(n, dtype=np.int64)
        else:
            counts = np.ascontiguousarray(counts, dtype=np.int64)
        idx = self.bucket_indices(keys)  # (d, n)
        if not self.conservative:
            for r in range(self.depth):
                # bincount is the fast path for dense repeated increments;
                # the weightless variant stays on the integer code path
                if unit:
                    self.table[r] += np.bincount(idx[r], minlength=self.width)
                else:
                    self.table[r] += np.bincount(
                        idx[r], weights=counts, minlength=self.width
                    ).astype(np.int64)
        else:
            self._conservative_update(idx, counts)
        self.n_updates += n if unit else int(counts.sum())

    def _conservative_update(self, idx: np.ndarray, counts: np.ndarray) -> None:
        """Batched conservative update.

        Group duplicate keys (by their full d-tuple of buckets), then for each
        unique key set every row cell to max(cell, est_before + count).  This
        equals item-wise CU when keys don't share cells and remains a valid
        never-undercount overapproximation when they do (cells only grow, and
        each key's new min >= its pre-batch estimate + its batch count).
        """
        uniq, inv = np.unique(idx.T, axis=0, return_inverse=True)  # (u, d)
        ucnt = np.bincount(inv, weights=counts).astype(np.int64)  # (u,)
        uidx = uniq.T  # (d, u)
        est = self.table[np.arange(self.depth)[:, None], uidx].min(axis=0)  # (u,)
        target = est + ucnt
        for r in range(self.depth):
            np.maximum.at(self.table[r], uidx[r], target)

    # ----------------------------------------------------------------- query
    def estimate(self, keys: np.ndarray) -> np.ndarray:
        """Point query: min over all d rows (true CMS min, never undercounts)."""
        idx = self.bucket_indices(keys)  # (d, n)
        return self.table[np.arange(self.depth)[:, None], idx].min(axis=0)

    # ----------------------------------------------------------------- merge
    def _compat(self, other: "CountMinSketch") -> None:
        if not isinstance(other, CountMinSketch):
            raise MergeError(f"cannot merge CMS with {type(other).__name__}")
        if (
            self.depth != other.depth
            or self.width != other.width
            or self.key_width != other.key_width
            or self.seed != other.seed
            or self.conservative != other.conservative
        ):
            raise MergeError("incompatible CMS parameters")

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self._compat(other)
        return CountMinSketch(
            delta=self.delta,
            epsilon=self.epsilon,
            key_width=self.key_width,
            seed=self.seed,
            conservative=self.conservative,
            depth=self.depth,
            width=self.width,
            _table=self.table + other.table,
            _n_updates=self.n_updates + other.n_updates,
        )

    def merge_inplace(self, other: "CountMinSketch") -> "CountMinSketch":
        self._compat(other)
        self.table += other.table
        self.n_updates += other.n_updates
        return self

    # ------------------------------------------------------------- serialize
    def _payload(self) -> bytes:
        hdr = struct.pack(
            "<iiiqBddq",
            self.depth,
            self.width,
            self.key_width,
            self.seed,
            1 if self.conservative else 0,
            self.delta,
            self.epsilon,
            self.n_updates,
        )
        return hdr + self.table.tobytes()

    @classmethod
    def _from_payload(cls, payload: bytes) -> "CountMinSketch":
        hsz = struct.calcsize("<iiiqBddq")
        depth, width, key_width, seed, cons, delta, eps, n_up = struct.unpack(
            "<iiiqBddq", payload[:hsz]
        )
        table = np.frombuffer(payload[hsz:], dtype=np.int64).reshape(depth, width).copy()
        return cls(
            delta=delta,
            epsilon=eps,
            key_width=key_width,
            seed=seed,
            conservative=bool(cons),
            depth=depth,
            width=width,
            _table=table,
            _n_updates=n_up,
        )

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, CountMinSketch)
            and self.depth == other.depth
            and self.width == other.width
            and self.key_width == other.key_width
            and self.seed == other.seed
            and self.conservative == other.conservative
            and np.array_equal(self.table, other.table)
        )
