"""Full-pipeline smoke at the FIXTURES.md bench tier: build + aggregated
extract over the seeded large corpus (same parquet bench_scaling.py
generates).  Proves the two-pass design holds memory at the tier where the
enumeration count reaches billions.

Usage: PYTHONPATH=/root/repo python BENCH/scale_smoke.py
"""
import json, os, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DATA = os.path.join(REPO, ".cache", "scaling_corpus.parquet")

from pyspark.sql import SparkSession

from epichypersketch_jl_spark.session import apply_malloc_tuning
apply_malloc_tuning()  # numpy-temp mmap churn: session.MALLOC_TUNING
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "128")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "100g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from epichypersketch_jl_spark.config import HyperSketchConfig
from epichypersketch_jl_spark.operators.motif import build_motif_cms, motif_counts

df = spark.read.parquet(DATA)
# threshold must clear the sketch noise floor: with N ~ 1.8e9 updates into
# w = 54,366 cells the expected per-cell load is ~33k, and the eps*N bound
# is ~90k — a min_count below that selects essentially every key (the same
# property holds in the reference; SURVEY.md §6).  200k isolates genuinely
# heavy pairs.
cfg = HyperSketchConfig(motif_size=2, min_count=200_000, seed=42)
t0 = time.monotonic()
cms, metrics = build_motif_cms(df, cfg)
t1 = time.monotonic()
top = motif_counts(df, cfg, cms=cms)
n_heavy = top.count()
t2 = time.monotonic()
print(json.dumps({
    "docs": df.count(), "updates": cms.n_updates,
    "build_sec": round(t1 - t0, 1), "extract_agg_sec": round(t2 - t1, 1),
    "qualifying_keys": n_heavy,
    "build_updates_per_sec": round(cms.n_updates / (t1 - t0), 0),
}))
spark.stop()
