"""Training-data curation walkthrough: compose the pipeline operators on
the driver testdata — quality gating, near-dup cluster resolution, BM25
relevance, deterministic weighted sampling, context-window chunking, a
stable split, and per-source sketch telemetry.

Run:  PYTHONPATH=. python examples/training_data_example.py [sf_dir]
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from epichypersketch_jl_spark.operators.cardinality import hll_distinct
from epichypersketch_jl_spark.operators.corpus_prep import (
    chunk_documents,
    stable_split,
)
from epichypersketch_jl_spark.operators.dedup import (
    minhash_lsh_pairs,
    resolve_duplicate_clusters,
)
from epichypersketch_jl_spark.operators.quantiles import kll_quantiles_grouped
from epichypersketch_jl_spark.operators.sampling import weighted_sample
from epichypersketch_jl_spark.operators.text_analysis import (
    bm25_scores,
    quality_score,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
    F.col("text").isNotNull()
)
print(f"corpus: {docs.count()} docs")

# 1. quality gate: drop very short docs
q = quality_score(docs)
docs = docs.join(q.filter(F.col("length_bucket") != "short").select("doc_id"), "doc_id")
print(f"after quality gate: {docs.count()}")

# 2. near-duplicate removal: LSH pairs -> connected components -> keepers
pairs = minhash_lsh_pairs(docs, threshold=0.8)
resolved = resolve_duplicate_clusters(docs, pairs)
docs = docs.join(
    resolved.filter(F.col("is_keeper")).select("doc_id"), "doc_id"
)
print(f"after near-dup resolution: {docs.count()}")

# 3. relevance: BM25 against a topical query bag, keep matching docs
scored = bm25_scores(docs, ["hash", "join", "dup"])
docs = docs.join(scored.filter(F.col("score") > 0).select("doc_id"), "doc_id")
print(f"matching the query bag: {docs.count()}")

# 4. deterministic weighted sample: up to 10 docs per source by length
sample = weighted_sample(
    docs, id_col="doc_id", weight_col="n_chars", k=10, group_col="source"
)
print(f"weighted sample: {sample.count()} docs")

# 5. chunk to a context window, then stable train/valid/test split
chunks = chunk_documents(sample, max_words=64, overlap=8)
chunks = chunks.withColumn(
    "chunk_key", F.concat_ws("_", F.col("doc_id"), F.col("chunk_id"))
)
split = stable_split(chunks, id_col="chunk_key")
split.groupBy("split").count().orderBy("split").show()

# 6. telemetry sketches per source
hll_distinct(docs, "doc_id", group_col="source").show(5)
kll_quantiles_grouped(docs, "n_chars", "source", [0.5, 0.9]).orderBy(
    "source", "q"
).show(5)

# 7. round-4 diagnostics: length distribution, repeat rate, widest vocab
from epichypersketch_jl_spark.operators.cardinality import topk_distinct_groups
from epichypersketch_jl_spark.operators.histogram import value_histogram
from epichypersketch_jl_spark.operators.lm import trigram_logprob
from epichypersketch_jl_spark.operators.moments import ams_f2
from epichypersketch_jl_spark.sources.tables import documents_sequences

value_histogram(docs, "n_chars", mode="log2").show()
seq = documents_sequences(spark, sf_dir, with_positions=True)
ams_f2(seq, "tokens", group_col="source", d=4).select(
    "source", "n_values", "f2_est"
).show(5)
topk_distinct_groups(seq, "tokens", "source", k_sketch=64, n=3).show()
# fluency gate: lowest-scoring docs under the corpus's own trigram LM
trigram_logprob(seq).orderBy("avg_logprob").select(
    "doc_id", "n_triples", F.round("avg_logprob", 3).alias("avg_logprob")
).show(5)

spark.stop()
print("done")
