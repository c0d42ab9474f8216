"""Physical-plan pins: the scale properties the engine is built on must be
visible in the executed plan, so a regression (an accidental shuffle of raw
rows, a lost filter pushdown, a join sneaking into the Bloom reducer) fails
a test rather than a 100-TB run.

SURVEY.md architecture contract:
  * sketch build is map-only — no Exchange between the scan and the kernel;
  * selection filters reach the parquet scan (PushedFilters);
  * column pruning reaches the scan (ReadSchema excludes unused columns);
  * the aggregated extraction shuffles only post-kernel (aggregated) rows;
  * bloom_semijoin is a scan-side reducer — no Join operator at all.
"""

import pytest

from epichypersketch_jl_spark.config import HyperSketchConfig
from epichypersketch_jl_spark.sources.tables import read_table, tokenized_sequences


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPlanShapes:
    def test_build_input_is_map_only(self, spark, sf_dir):
        """The prepared build input (pruned, filtered) must not shuffle."""
        from epichypersketch_jl_spark.operators.motif import _prepared

        cfg = HyperSketchConfig(motif_size=2, min_count=2)
        seq = tokenized_sequences(spark, sf_dir)
        plan = _plan(_prepared(seq, cfg, conv=False, with_weights=False))
        assert "Exchange" not in plan, plan

    def test_short_sequence_filter_pushed_to_scan(self, spark, sf_dir):
        from epichypersketch_jl_spark.operators.motif import _prepared

        cfg = HyperSketchConfig(motif_size=2, min_count=2)
        seq = tokenized_sequences(spark, sf_dir, with_positions=True).filter("n_tok <= 40")
        plan = _plan(_prepared(seq, cfg, conv=True, with_weights=False))
        assert "PushedFilters" in plan
        assert "LessThanOrEqual(n_tok,40)" in plan, plan

    def test_column_pruning_reaches_scan(self, spark, sf_dir):
        """A tokens-only projection must not read text-sized columns."""
        from epichypersketch_jl_spark.operators.motif import _prepared

        cfg = HyperSketchConfig(motif_size=2, min_count=2)
        seq = tokenized_sequences(spark, sf_dir)
        plan = _plan(_prepared(seq, cfg, conv=False, with_weights=False))
        # ReadSchema should carry doc_id + tokens (+ n_tok for the size
        # filter), but never source
        read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
        assert "tokens" in read_schema
        assert "source" not in read_schema, read_schema

    def test_aggregated_extraction_shuffles_only_after_kernel(self, spark, sf_dir):
        """motif_counts: the only wide operations are the final groupBy/sort
        over kernel-aggregated rows — 2 Exchanges max (hash + range), and
        the kernel (MapInArrow / ArrowEvalPython-free) sits below them."""
        from epichypersketch_jl_spark.operators.motif import motif_counts

        seq = tokenized_sequences(spark, sf_dir)
        cfg = HyperSketchConfig(motif_size=2, min_count=2, seed=1)
        out = motif_counts(seq, cfg)
        plan = _plan(out)
        assert plan.count("Exchange") <= 2, plan
        assert "MapInArrow" in plan or "PythonMapInArrow" in plan, plan
        # no shuffle below the kernel: the kernel's subtree is scan-only
        kernel_sub = plan[plan.find("MapInArrow"):]
        assert "Exchange" not in kernel_sub, kernel_sub

    def test_bloom_semijoin_has_no_join(self, spark, sf_dir):
        from epichypersketch_jl_spark.operators.cardinality import (
            bloom_semijoin,
            build_bloom,
        )

        cust = read_table(spark, sf_dir, "customer").filter("c_acctbal > 5000")
        bloom = build_bloom(cust, "c_custkey", n_expected=10_000, fpp=1e-6, seed=42)
        orders = read_table(spark, sf_dir, "orders")
        plan = _plan(bloom_semijoin(orders, "o_custkey", bloom))
        assert "Join" not in plan, plan
        assert "Exchange" not in plan, plan

    def test_exact_topk_broadcasts_queries(self, spark, sf_dir):
        """cosine_topk must broadcast the small query side, never
        shuffle-join the corpus against it."""
        from epichypersketch_jl_spark.operators.similarity import cosine_topk

        emb = read_table(spark, sf_dir, "embeddings")
        q = emb.filter("vec_id < 3")
        plan = _plan(cosine_topk(emb, q, k=5))
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
        assert "SortMergeJoin" not in plan, plan

    def test_ungrouped_weighted_sample_no_single_partition_exchange(
        self, spark, sf_dir
    ):
        """Ungrouped weighted_sample must never funnel the full input
        through one task: the plan is per-partition bottom-k (MapInArrow,
        no Exchange) + TakeOrderedAndProject over the tasks*k survivors —
        no SinglePartition exchange node at any point."""
        from epichypersketch_jl_spark.operators.sampling import weighted_sample

        docs = read_table(spark, sf_dir, "documents")
        out = weighted_sample(docs, id_col="doc_id", weight_col="n_chars", k=7)
        plan = _plan(out)
        assert "SinglePartition" not in plan, plan
        assert "TakeOrderedAndProject" in plan, plan
        # and the grouped path shuffles by group, not to one partition
        grouped = weighted_sample(
            docs, id_col="doc_id", weight_col="n_chars", k=7, group_col="source"
        )
        gplan = _plan(grouped)
        assert "SinglePartition" not in gplan, gplan
