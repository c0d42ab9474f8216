"""Simple example: finding enriched motifs — the Spark-native port of the
reference's examples/simple_example.jl (same data shape: 100 sequences of
5-15 features drawn from 1-20, random float contributions, k=2,
min_count=5; then the README's post-aggregation workflow).

Run:  PYTHONPATH=. python examples/simple_example.py
"""

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from epichypersketch_jl_spark import HyperSketchConfig
from epichypersketch_jl_spark.operators import enriched_configurations, motif_summary

print("=" * 60)
print("epichypersketch_jl_spark: Simple Example")
print("=" * 60)

rng = np.random.default_rng(42)
rows = []
for i in range(100):
    n = int(rng.integers(5, 16))
    feats = rng.integers(1, 21, size=n)
    weights = rng.random(n).astype(np.float32)
    rows.append((f"seq_{i:03d}", feats.astype(np.int32).tolist(), weights.tolist(), n, "demo"))

schema = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("weights", ArrayType(FloatType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
    ]
)

spark = (
    SparkSession.builder.master("local[4]")
    .appName("ehs-simple-example")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
df = spark.createDataFrame(pd.DataFrame(rows, columns=[f.name for f in schema.fields]), schema)
print(f"\nCreated {df.count()} sequences")

print("\n" + "-" * 60)
print("Finding 2-feature motifs (min_count=5)...")
print("-" * 60)
cfg = HyperSketchConfig(motif_size=2, min_count=5, seed=42)
motifs = enriched_configurations(df, cfg)
print(f"Found {motifs.count()} motif occurrences")
motifs.show(5)

print("Top motifs by estimated count (the README workflow):")
motif_summary(motifs, k=2, top_n=10).show()
spark.stop()
