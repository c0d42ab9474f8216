from .base import MergeableSketch, from_bytes
from .cms import CountMinSketch
from .fd import FrequentDirections
from .countsketch import CountSketch
from .hll import HyperLogLog
from .bloom import BloomFilter, KmvBloom
from .kll import KLL
from .kmv import KMV
from .tdigest import TDigest

__all__ = [
    "MergeableSketch",
    "from_bytes",
    "CountMinSketch",
    "FrequentDirections",
    "CountSketch",
    "HyperLogLog",
    "BloomFilter",
    "KmvBloom",
    "KLL",
    "KMV",
    "TDigest",
]
