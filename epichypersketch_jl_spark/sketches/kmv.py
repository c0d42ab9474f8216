"""KMV (k-minimum-values / bottom-k) distinct-count sketch.

Bar-Yossef et al. 2002: keep the k smallest DISTINCT hash values of a
stream; merge = bottom-k of the union (associative, commutative,
idempotent); if the sketch is full, distinct ≈ (k-1) / r_k where r_k is
the k-th smallest hash normalized to (0,1), else the exact count of
distinct hashes seen.  Relative standard error ≈ 1/sqrt(k-1).

Complements the HLL in the sketch family (BASELINE.json north_star) with
two abilities HLL lacks:
  * the retained hashes double as a uniform DISTINCT-VALUE SAMPLE, and
  * two sketches support set-similarity estimation (Jaccard via
    |bottom_k(A∪B) ∩ A_k ∩ B_k| / k, Beyer et al. 2007).

The hash is deliberately NOT the package's splitmix64: it is two rounds
of a quadratic permutation-polynomial mod the Mersenne prime 2^31-1,
chosen because every intermediate fits int64, so the IDENTICAL integer
arithmetic runs as pure Catalyst column expressions (JVM-side, zero
Python in the build), in numpy, and in the DuckDB oracle SQL — making
even the *estimate* of this approximate sketch exactly recomputable by
the driver's oracle (integer-only: est = (k-1)*P div h_k, no float
division anywhere).
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import MergeError
from .base import MergeableSketch

#: Mersenne prime hash modulus; hash values are uniform over [0, P).
P = (1 << 31) - 1
_A1, _B1 = 1103515245, 12345
_A2, _B2 = 69069, 362437

#: The hash as a SQL expression template over an integer column {x} —
#: valid in both Spark SQL and DuckDB (all intermediates < 2^63).  The
#: input reduction is a POSITIVE mod ((x % p + p) % p): SQL's % is
#: truncated (sign-preserving), numpy's is floored (non-negative for a
#: positive modulus) — without the pmod, negative inputs produce negative
#: hashes in SQL/Catalyst and break both the [0, P) range invariant and
#: the numpy parity.  Later stages operate on non-negative values, where
#: the two conventions agree.
HASH_SQL = "((({xm}) * ({xm}) % {p} + {a1} * ({xm}) + {b1}) % {p})"
HASH_SQL_FULL = "(({y}) * ({y}) % {p} + {a2} * ({y}) + {b2}) % {p}"


def hash_sql(x: str) -> str:
    """SQL text computing kmv_hash({x}) — identical semantics in Spark SQL
    and DuckDB for ANY int64 input; every intermediate bounded by 2^62.
    The input is cast to BIGINT first so 32-bit columns don't overflow in
    the INT lattice."""
    xm = f"(CAST({x} AS BIGINT) % {P} + {P}) % {P}"
    y = HASH_SQL.format(xm=xm, p=P, a1=_A1, b1=_B1)
    return HASH_SQL_FULL.format(y=y, p=P, a2=_A2, b2=_B2)


def kmv_hash(x: np.ndarray) -> np.ndarray:
    """Vectorized numpy twin of hash_sql (int64 in/out, exact)."""
    x = np.asarray(x, dtype=np.int64) % P
    y = (x * x % P + _A1 * x + _B1) % P
    return (y * y % P + _A2 * y + _B2) % P


def bottom_k_distinct(hashes: np.ndarray, k: int) -> np.ndarray:
    """Sorted k smallest distinct values of an int64 array."""
    u = np.unique(np.asarray(hashes, dtype=np.int64))
    return u[:k]


def estimate_int(k: int, n_kept: int, kth: int) -> int:
    """Integer-exact KMV estimator: exact count while not full, else
    (k-1)*P div h_k — recomputable verbatim in SQL ((k-1)*P < 2^41)."""
    if n_kept < k:
        return n_kept
    return (k - 1) * P // int(kth)


class KMV(MergeableSketch):
    """Mergeable bottom-k sketch over int64 hash values in [0, P)."""

    TAG = b"KMV1"

    def __init__(self, k: int = 512):
        if k < 2:
            raise ValueError("KMV needs k >= 2")
        self.k = int(k)
        self.values = np.empty(0, dtype=np.int64)  # sorted distinct hashes

    # --- ingest ---------------------------------------------------------
    def update_raw(self, values: np.ndarray) -> None:
        """Hash raw integer values and fold them in."""
        self.update_hashes(kmv_hash(values))

    def update_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        self.values = bottom_k_distinct(
            np.concatenate([self.values, np.asarray(hashes, dtype=np.int64)]),
            self.k,
        )

    # --- algebra --------------------------------------------------------
    def merge(self, other: "KMV") -> "KMV":
        if not isinstance(other, KMV) or other.k != self.k:
            raise MergeError("KMV merge requires identical k")
        out = KMV(k=self.k)
        out.values = bottom_k_distinct(
            np.concatenate([self.values, other.values]), self.k
        )
        return out

    # --- queries --------------------------------------------------------
    @property
    def full(self) -> bool:
        return len(self.values) >= self.k

    def estimate(self) -> int:
        if len(self.values) == 0:
            return 0
        return estimate_int(self.k, len(self.values), self.values[-1])

    def jaccard(self, other: "KMV") -> tuple[int, int]:
        """(n_common, k_used): bottom-k of the union intersected with both
        sketches; estimate = n_common / k_used (Beyer et al. 2007).
        Integer outputs so callers can compare exactly."""
        if other.k != self.k:
            raise MergeError("KMV jaccard requires identical k")
        union_k = bottom_k_distinct(
            np.concatenate([self.values, other.values]), self.k
        )
        common = np.intersect1d(self.values, other.values, assume_unique=True)
        n_common = len(np.intersect1d(union_k, common, assume_unique=True))
        return n_common, len(union_k)

    # --- serialization --------------------------------------------------
    def _payload(self) -> bytes:
        return (
            struct.pack("<qq", self.k, len(self.values))
            + np.ascontiguousarray(self.values, dtype="<i8").tobytes()
        )

    @classmethod
    def _from_payload(cls, payload: bytes) -> "KMV":
        hsz = struct.calcsize("<qq")
        if len(payload) < hsz:
            raise ValueError("corrupt KMV payload")
        k, n = struct.unpack_from("<qq", payload, 0)
        if k < 2 or n < 0 or n > k or len(payload) < hsz + 8 * n:
            raise ValueError("corrupt KMV payload")
        out = cls(k=int(k))
        out.values = np.frombuffer(
            payload, dtype="<i8", count=n, offset=hsz
        ).astype(np.int64)
        return out

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, KMV)
            and other.k == self.k
            and np.array_equal(other.values, self.values)
        )
