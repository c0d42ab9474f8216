"""SparkSession builder defaults for this engine.

Codifies the session configuration the operators are designed around, so a
user switching from the reference gets the intended plan shapes without
archaeology through jobs/ and bench.py:

  * AQE on — runtime coalescing + skew-join handling for the dedup /
    similarity self-joins;
  * Arrow batch size bounded — the motif kernels chunk internally via
    max_cells, but the Arrow transfer batch is what bounds transient
    JVM->Python buffers;
  * shuffle partitions sized to the cluster rather than the 200 default.

Everything here is a default — any user-provided conf wins.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

DEFAULT_ARROW_BATCH_ROWS = 4096


def session_builder(
    app_name: str = "epichypersketch",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = DEFAULT_ARROW_BATCH_ROWS,
) -> "SparkSession.Builder":
    """Builder pre-loaded with the engine's recommended configuration.

    shuffle_partitions: set explicitly for deterministic plans in tests;
    when None, `get_session` sizes it to 2x the cluster's default
    parallelism after the session starts (the builder itself cannot know
    the cluster size).
    """
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    b = (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return b


def get_session(app_name: str = "epichypersketch", **kw) -> SparkSession:
    """Create (or get) a session with the recommended configuration; when
    shuffle_partitions was not given AND the key was not explicitly set
    anywhere (spark-submit --conf, spark-defaults.conf, a pre-existing
    session's builder), size it to 2x the default parallelism — AQE only
    coalesces DOWN, so the 200 stock default silently caps wide-stage
    parallelism on big clusters.  Explicitness is checked via the
    SparkConf key itself (not by comparing against 200), so a deliberate
    `--conf spark.sql.shuffle.partitions=200` is honored."""
    explicit = kw.get("shuffle_partitions") is not None
    spark = session_builder(app_name, **kw).getOrCreate()
    if not explicit:
        explicit = spark.sparkContext.getConf().contains("spark.sql.shuffle.partitions")
    if not explicit and spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(2 * spark.sparkContext.defaultParallelism),
        )
    return spark
