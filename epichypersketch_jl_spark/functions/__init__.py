from .hashing import splitmix64, hash64, combine_hashes, bit_length_u64
from .combinations import comb_index_matrix, iter_length_groups

__all__ = [
    "splitmix64",
    "hash64",
    "combine_hashes",
    "bit_length_u64",
    "comb_index_matrix",
    "iter_length_groups",
]
