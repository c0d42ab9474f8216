"""Source adapters.

The engine's native input is a pre-tokenized sequence table
(doc_id, tokens: array<int32>, n_tok, source) — BASELINE.json input_hint.
The reference takes an in-memory Dict and has no I/O layer at all
(src/errors.jl:37-47 is its entire ingest surface); our scan goes through
`spark.read` so Catalyst gets column pruning + predicate pushdown for free.

`documents_sequences` adapts the driver's documents.parquet (raw text) into
that shape with a deterministic tokenizer: token id = 1-based rank of the
word in the sorted global vocabulary.  Properties that matter:
  * identical ids are derivable in ANSI SQL (dense_rank over sorted distinct
    words) — used by the DuckDB oracles;
  * ids >= 1, matching the reference's "0 is reserved padding" convention
    (src/record.jl:159);
  * the per-token mapping runs vectorized in an Arrow kernel (searchsorted
    against the sorted codebook) — no explode, no join, no shuffle.

Scale design (the two levers a 100-TB corpus needs):
  * `tokenized_sequences` — a write-once parquet cache per sf_dir, so the
    tokenizer + vocabulary job run ONCE per dataset instead of once per
    query (tokenization is ingest, not query work);
  * `vocab_table` assigns ranks distributively (range-partitioned sort +
    per-partition offsets — only #partitions counts reach the driver), and
    `tokenize_with_vocab_join` maps words -> ids with a shuffle join instead
    of a driver-collected codebook, for vocabularies too large to broadcast
    (web text: URLs, typos, numbers).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..errors import InputError

ICEBERG_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)

# Above this many distinct words the codebook is no longer collected/broadcast;
# the shuffle-join tokenizer takes over (strategy="auto").
VOCAB_BROADCAST_MAX = 4_000_000
# Constant file count for the tokenized cache: independent of the writing
# session's parallelism, enough splits for any local[k] reader.
_CACHE_FILES = 32


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Table scan: Iceberg/catalog table when `sf_dir` is a catalog namespace
    (no path separator, e.g. "my_catalog.db" -> spark.read.table), parquet
    directory otherwise.  The sandbox has no Iceberg runtime jar, so the
    catalog branch is exercised by a dispatch unit test only; the adapter
    keeps the engine format-agnostic (SURVEY.md §2 #1)."""
    if _is_catalog_namespace(sf_dir):
        return spark.read.table(f"{sf_dir}.{name}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _is_catalog_namespace(sf_dir: str) -> bool:
    """Catalog namespaces look like `catalog.db` (dotted, no path separator,
    not an existing directory).  Requiring the dot keeps a mistyped relative
    parquet directory on the path branch, where the scan error is legible."""
    return (
        "." in sf_dir
        and "/" not in sf_dir
        and "\\" not in sf_dir
        and not os.path.exists(sf_dir)
    )


# --------------------------------------------------------------- vocabulary


def vocab_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed codebook: (w: string, tok: int) with tok = 1-based rank of
    w in the sorted distinct vocabulary.

    Plan: distinct words -> range-repartition by w -> sort within partitions
    -> per-partition offsets (one tiny count job: #partitions ints to the
    driver) -> rank = offset + local index.  Equivalent to a global
    dense_rank but without the single-partition window or a full driver
    collect, so it holds for unbounded web-scale vocabularies.

    The returned DataFrame pins a persisted intermediate; call
    `result.unpersist_source()` (attached attribute) or let it die with the
    session.  Callers that materialize (write/collect) should do so once.
    """
    import numpy as np
    import pyarrow as pa

    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    spark = docs.sparkSession
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    n_parts = max(spark.sparkContext.defaultParallelism, 2)
    swords = (
        words.repartitionByRange(n_parts, "w")
        .sortWithinPartitions("w")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # job 1: per-partition sizes (the only thing the driver ever sees)
    sizes = {
        r.pid: r.n
        for r in swords.groupBy(F.spark_partition_id().alias("pid")).agg(
            F.count("*").alias("n")
        ).collect()
    }
    offsets = [0] * (n_parts + 1)
    for i in range(n_parts):
        offsets[i + 1] = offsets[i] + sizes.get(i, 0)
    bc = spark.sparkContext.broadcast(offsets)
    schema = StructType(
        [StructField("w", StringType(), False), StructField("tok", IntegerType(), False)]
    )

    def fn(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        base = bc.value[ctx.partitionId()] + 1  # 1-based ids (0 = padding)
        for batch in batches:
            n = batch.num_rows
            yield pa.RecordBatch.from_pydict(
                {
                    "w": batch.column("w"),
                    "tok": pa.array(np.arange(base, base + n, dtype=np.int32)),
                }
            )
            base += n

    out = swords.mapInArrow(fn, schema)
    out.unpersist_source = swords.unpersist  # type: ignore[attr-defined]
    return out


def build_vocab(docs: DataFrame, text_col: str = "text") -> list[str]:
    """Sorted distinct whitespace words — the driver-side codebook.

    Only valid for bounded vocabularies (<= VOCAB_BROADCAST_MAX); the
    unbounded path is vocab_table + tokenize_with_vocab_join.
    """
    rows = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
        .orderBy("w")
        .collect()
    )
    return [r.w for r in rows]


# --------------------------------------------------------------- tokenizers


def documents_sequences(
    spark: SparkSession,
    sf_dir: str,
    *,
    with_positions: bool = False,
    vocab: list[str] | None = None,
    unknown: str = "error",
) -> DataFrame:
    """documents.parquet -> (doc_id, tokens, n_tok, source[, positions]).

    Token id = 1-based rank in the sorted vocab, computed vectorized in an
    Arrow kernel (np.searchsorted over the sorted codebook) — equivalent to
    dense_rank in SQL, identical ids, and independent of JVM codegen warm-up.

    With a caller-supplied `vocab`, words absent from it are handled per
    `unknown`: "error" raises InputError (default — silent id collisions
    were a correctness hazard), "zero" maps them to the reserved padding
    id 0 (reference convention, src/record.jl:159).
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    if vocab is None:
        vocab = build_vocab(docs)
    return tokenize_with_broadcast_vocab(
        docs, vocab, with_positions=with_positions, unknown=unknown
    )


def tokenize_with_broadcast_vocab(
    docs: DataFrame,
    vocab: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_positions: bool = False,
    unknown: str = "error",
) -> DataFrame:
    """Broadcast-codebook tokenizer over any (id, text, ...) DataFrame:
    one Arrow map pass, np.searchsorted against the sorted vocab; every
    non-text column is carried through unchanged.  Output column order:
    (id_col, tokens, n_tok[, positions], *carry)."""
    import numpy as np
    import pyarrow as pa

    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    if unknown not in ("error", "zero"):
        raise InputError(f"unknown= must be 'error' or 'zero', got {unknown!r}")
    vocab_arr = np.array(vocab)
    n_vocab = len(vocab_arr)
    carry = [c for c in docs.columns if c not in (id_col, text_col)]

    fields = [
        docs.schema[id_col],
        StructField("tokens", ArrayType(IntegerType(), False), False),
        StructField("n_tok", IntegerType(), False),
    ]
    if with_positions:
        fields.append(StructField("positions", ArrayType(IntegerType(), False), False))
    fields += [docs.schema[c] for c in carry]
    schema = StructType(fields)

    def fn(batches):
        import pyarrow.compute as pc

        for batch in batches:
            words = pc.split_pattern(batch.column(text_col), " ")
            offsets = words.offsets.to_numpy().astype(np.int64)
            flat = words.values.to_numpy(zero_copy_only=False).astype(str)
            flat = flat[offsets[0] : offsets[-1]]  # align with (possibly sliced) offsets
            offsets = offsets - offsets[0]
            # drop empty words (doubled/leading/trailing spaces): the vocab
            # excludes '' so they must not be tokenized; oracle SQL filters
            # them identically (w != '')
            keep = flat != ""
            if not keep.all():
                cs = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
                lens = cs[offsets[1:]] - cs[offsets[:-1]]
                flat = flat[keep]
                offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
            idx = np.searchsorted(vocab_arr, flat)
            # membership validation: searchsorted returns an insertion point,
            # which for an unknown word silently collides with a real id
            bad = idx >= n_vocab
            safe = np.minimum(idx, max(n_vocab - 1, 0))
            if n_vocab:
                bad |= vocab_arr[safe] != flat
            else:
                bad[:] = True
            ids = (idx + 1).astype(np.int32)
            if bad.any():
                if unknown == "error":
                    w = flat[np.flatnonzero(bad)[0]]
                    raise InputError(
                        f"word {w!r} not in the supplied vocabulary "
                        f"({int(bad.sum())} unknown occurrences); pass unknown='zero' "
                        "to map unknowns to the reserved padding id 0"
                    )
                ids[bad] = 0
            off32 = offsets.astype(np.int32)
            toks = pa.ListArray.from_arrays(pa.array(off32), pa.array(ids))
            lens = np.diff(offsets).astype(np.int32)
            cols = {
                id_col: batch.column(id_col),
                "tokens": toks,
                "n_tok": pa.array(lens),
            }
            if with_positions:
                pos_flat = (
                    np.arange(offsets[-1] - offsets[0], dtype=np.int32)
                    - np.repeat(off32[:-1], lens)
                    + 1
                )
                cols["positions"] = pa.ListArray.from_arrays(pa.array(off32), pa.array(pos_flat))
            for c in carry:
                cols[c] = batch.column(c)
            yield pa.RecordBatch.from_pydict(cols)

    return docs.mapInArrow(fn, schema)


def tokenize_with_vocab_join(
    docs: DataFrame,
    vocab_df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_positions: bool = False,
    unknown: str = "error",
) -> DataFrame:
    """Fully distributed tokenizer for unbounded vocabularies: posexplode the
    words, shuffle-join against the (w, tok) codebook, regroup per document
    preserving word order.  No codebook ever reaches the driver.  Costs two
    shuffles over the token stream — the price of an unbroadcastable vocab.

    Words absent from the codebook follow `unknown` (same contract as
    documents_sequences): "error" raises executor-side via raise_error — a
    silent inner-join drop would shorten tokens/n_tok and renumber positions
    with no signal; "zero" maps them to the reserved padding id 0.

    Output schema and values are identical to documents_sequences (verified
    by tests/test_tokenizer_cache.py).
    """
    if unknown not in ("error", "zero"):
        raise InputError(f"unknown= must be 'error' or 'zero', got {unknown!r}")
    carry = [c for c in docs.columns if c not in (id_col, text_col)]
    words = (
        docs.select(
            id_col,
            *carry,
            F.posexplode(F.split(F.col(text_col), " ")).alias("pos0", "w"),
        )
        .filter(F.col("w") != "")
    )
    joined = words.join(vocab_df, "w", "left")
    if unknown == "error":
        tok_expr = F.when(
            F.col("tok").isNull(),
            F.raise_error(
                F.concat(
                    F.lit("word '"), F.col("w"), F.lit("' not in the supplied vocabulary")
                )
            ).cast("int"),
        ).otherwise(F.col("tok"))
    else:
        tok_expr = F.coalesce(F.col("tok"), F.lit(0))
    joined = joined.withColumn("tok", tok_expr)
    grouped = (
        joined.groupBy(id_col)
        .agg(
            *[F.first(c).alias(c) for c in carry],
            F.array_sort(F.collect_list(F.struct("pos0", "tok"))).alias("ps"),
        )
        .withColumn("tokens", F.transform("ps", lambda s: s.tok))
        .withColumn("n_tok", F.size("tokens"))
    )
    if with_positions:
        grouped = grouped.withColumn(
            "positions", F.sequence(F.lit(1), F.col("n_tok")).cast("array<int>")
        )
    # docs with zero non-empty words vanish in the explode; reinstate them
    # with empty token arrays (the Arrow tokenizer keeps them)
    base = docs.select(id_col, *carry)
    out = base.join(grouped.drop(*carry, "ps"), id_col, "left")
    empty_i32 = F.array().cast("array<int>")
    out = out.withColumn("tokens", F.coalesce("tokens", empty_i32)).withColumn(
        "n_tok", F.coalesce("n_tok", F.lit(0))
    )
    cols = [id_col, "tokens", "n_tok"]
    if with_positions:
        out = out.withColumn("positions", F.coalesce("positions", empty_i32))
        cols.append("positions")
    return out.select(*cols, *carry)


# ------------------------------------------------------------ cached ingest


def _cache_root() -> str:
    return os.environ.get(
        "EHS_TOKEN_CACHE", os.path.join(tempfile.gettempdir(), "ehs_tokcache")
    )


def _dataset_fingerprint(sf_dir: str) -> str | None:
    """Slug that changes when the documents table changes (mtime + size),
    so a regenerated sf_dir never hits a stale cache.  None when the
    documents table is not locally stattable (remote URI such as s3a/hdfs):
    a constant fingerprint would serve stale tokens forever after a remote
    rewrite, so such inputs must bypass the cache instead."""
    path = os.path.join(sf_dir, "documents.parquet")
    total_size = 0
    latest = 0
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in files:
                st = os.stat(os.path.join(root, f))
                total_size += st.st_size
                latest = max(latest, st.st_mtime_ns)
    elif os.path.exists(path):
        st = os.stat(path)
        total_size, latest = st.st_size, st.st_mtime_ns
    else:
        return None
    slug = os.path.realpath(sf_dir).strip("/").replace("/", "_")
    return f"{slug}-{total_size}-{latest}"


def tokenized_cache_path(sf_dir: str) -> str | None:
    fp = _dataset_fingerprint(sf_dir)
    return os.path.join(_cache_root(), fp) if fp is not None else None


def _cache_complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, "sequences", "_SUCCESS")) and os.path.exists(
        os.path.join(path, "vocab", "_SUCCESS")
    )


def tokenized_sequences(
    spark: SparkSession,
    sf_dir: str,
    *,
    with_positions: bool = False,
    strategy: str = "auto",
) -> DataFrame:
    """Read-through tokenization cache: the vocabulary job + tokenizer pass
    run once per dataset and land in a write-once parquet; every subsequent
    query is a plain columnar scan.  This is the ingest/query split the
    input_hint describes (the real input IS a pre-tokenized table) — at
    100 TB the tokenizer is a one-time ETL, not a per-query tax.

    strategy: "broadcast" (driver codebook, bounded vocab), "join"
    (shuffle-join tokenizer, unbounded vocab), or "auto" (count the vocab,
    pick by VOCAB_BROADCAST_MAX).

    Inputs whose contents cannot be fingerprinted from the local filesystem
    — catalog namespaces AND remote URIs (s3a://, hdfs://) — bypass the
    cache entirely: serving a stale cache after the underlying table is
    rewritten would be silent corruption.
    """
    path = tokenized_cache_path(sf_dir) if not _is_catalog_namespace(sf_dir) else None
    if path is None:
        return documents_sequences(spark, sf_dir, with_positions=with_positions)
    if not _cache_complete(path):
        _build_token_cache(spark, sf_dir, path, strategy)
    # Memoize the LAZY scan DataFrame per session: constructing the reader
    # costs ~0.1 s of listing/schema py4j round trips per call, repeated by
    # every query.  Safe because `path` embeds the dataset fingerprint
    # (mtime+size) and the cache is write-once-then-rename: the same path
    # can never serve different bytes.  Nothing is computed or persisted —
    # every action on the returned frame still scans the parquet.
    memo = spark.__dict__.setdefault("_ehs_tok_df_memo", {})
    df = memo.get(path)
    if df is None:
        df = memo[path] = spark.read.parquet(os.path.join(path, "sequences"))
    cols = ["doc_id", "tokens", "n_tok", "source"]
    if with_positions:
        cols.insert(3, "positions")
    return df.select(*cols)


def read_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (w, tok) codebook backing tokenized_sequences(sf_dir)."""
    path = tokenized_cache_path(sf_dir) if not _is_catalog_namespace(sf_dir) else None
    if path is None:
        raise InputError(
            f"no cacheable codebook for {sf_dir!r} (catalog/remote input); "
            "build one with vocab_table(documents) directly"
        )
    if not _cache_complete(path):
        _build_token_cache(spark, sf_dir, path, "auto")
    return spark.read.parquet(os.path.join(path, "vocab"))


def _build_token_cache(spark: SparkSession, sf_dir: str, path: str, strategy: str) -> None:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(_cache_root(), exist_ok=True)
    vdf = vocab_table(docs)
    try:
        # write with vocab_table's native range-partitioning (one file per
        # range of w) — a repartition(1) funnel would make a single writer
        # task the straggler/OOM point for a web-scale (10^8+ row) vocab.
        # Readers don't need one file: the broadcast path orderBy("tok")s
        # on read and the join tokenizer is order-agnostic.
        vdf.write.mode("overwrite").parquet(os.path.join(tmp, "vocab"))
    finally:
        vdf.unpersist_source()
    vocab_pq = spark.read.parquet(os.path.join(tmp, "vocab"))
    if strategy == "auto":
        strategy = "broadcast" if vocab_pq.count() <= VOCAB_BROADCAST_MAX else "join"
    if strategy == "broadcast":
        vocab = [r.w for r in vocab_pq.orderBy("tok").collect()]
        seq = documents_sequences(spark, sf_dir, with_positions=True, vocab=vocab)
    elif strategy == "join":
        seq = tokenize_with_vocab_join(docs, vocab_pq, with_positions=True)
        seq = seq.select("doc_id", "tokens", "n_tok", "positions", "source")
    else:
        raise InputError(f"unknown tokenize strategy {strategy!r}")
    seq.repartition(_CACHE_FILES).write.mode("overwrite").parquet(
        os.path.join(tmp, "sequences")
    )
    try:
        os.rename(tmp, path)
    except OSError:
        # lost a concurrent-writer race; the winner's cache is equivalent
        shutil.rmtree(tmp, ignore_errors=True)
