from .tables import read_table, documents_sequences, build_vocab
from .synth import planted_motif_corpus, planted_conv_corpus, corpus_to_df

__all__ = [
    "read_table",
    "documents_sequences",
    "build_vocab",
    "planted_motif_corpus",
    "planted_conv_corpus",
    "corpus_to_df",
]
