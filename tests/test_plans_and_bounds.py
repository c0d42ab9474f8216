"""Plan-shape pins (explain-level), eps*N bound at the correctness tier,
and skew/salting behavior (SURVEY.md §5 items 4 and 6)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from epichypersketch_jl_spark.config import HyperSketchConfig
from epichypersketch_jl_spark.functions.motif_kernels import build_batch, make_cms
from epichypersketch_jl_spark.operators.motif import build_motif_cms, enriched_configurations
from epichypersketch_jl_spark.plans.partitioning import (
    plan_report,
    repartition_by_length,
    salt_hot_keys,
)
from epichypersketch_jl_spark.sources.synth import corpus_to_df, planted_motif_corpus
from epichypersketch_jl_spark.sources.tables import read_table


class TestPlanShape:
    def test_extract_plan_is_shuffle_free(self, spark, sf_dir):
        """The full pipeline's extract stage must be scan -> filter ->
        mapInArrow with NO exchange: no raw-data shuffle at any scale.
        (No explicit repartition on the input here — that would add its own
        exchange and is a caller-side layout choice, not pipeline cost.)"""
        pdf = planted_motif_corpus()
        df = corpus_to_df(spark, pdf)
        cfg = HyperSketchConfig(motif_size=2, min_count=8, seed=42)
        occ = enriched_configurations(df, cfg)
        rep = plan_report(occ)
        assert rep["n_exchanges"] == 0, rep["plan"]
        assert rep["n_python_evals"] >= 1

    def test_filter_pushdown_to_scan(self, spark, sf_dir):
        # use a table no other test caches: a cached InMemoryRelation would
        # (correctly) replace the parquet scan and hide PushedFilters
        df = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 1000).select(
            "o_orderkey", "o_custkey"
        )
        rep = plan_report(df)
        assert any("o_totalprice" in p for p in rep["pushed_filters"]), rep["pushed_filters"]

    def test_repartition_by_length_plan(self, spark):
        df = corpus_to_df(spark, planted_motif_corpus(), n_partitions=4)
        out = repartition_by_length(df, 8)
        assert "rangepartitioning" in out._jdf.queryExecution().executedPlan().toString().lower()


class TestEpsilonBound:
    def test_eps_n_bound_on_correctness_tier(self, spark):
        """FIXTURES.md correctness tier: larger corpus, narrow sketch so
        collisions actually occur; assert the eps*N bound pass rate and
        never-undercount on every distinct key."""
        rng = np.random.default_rng(7)
        n_docs = 20_000
        lengths = rng.integers(5, 25, n_docs)
        offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
        flat = (rng.zipf(1.3, size=int(offsets[-1])) % 5000 + 1).astype(np.int32)
        # narrow sketch: eps = 1e-3 -> w = 2719, forces real collisions
        cfg = HyperSketchConfig(motif_size=2, min_count=1, delta=1e-3, epsilon=1e-3, seed=11)
        cms = make_cms(cfg, conv=False)
        build_batch(cms, flat, offsets, cfg)

        # exact recount (brute force, numpy)
        from itertools import combinations

        exact: dict[tuple, int] = {}
        for i in range(n_docs):
            toks = sorted(flat[offsets[i] : offsets[i + 1]].tolist())
            for c in combinations(toks, 2):
                exact[c] = exact.get(c, 0) + 1
        keys = np.array(list(exact.keys()), dtype=np.int64)
        truth = np.array(list(exact.values()), dtype=np.int64)
        est = cms.estimate(keys)
        assert (est >= truth).all(), "never undercounts"
        n = cms.n_updates
        assert n == truth.sum()
        viol_rate = float((est - truth > cfg.epsilon * n).mean())
        assert viol_rate <= cfg.delta * 10, f"eps*N violation rate {viol_rate}"
        # and collisions genuinely happened (the bound was actually exercised)
        assert (est > truth).any()


class TestSkew:
    def test_salting_spreads_hot_source(self, spark):
        pdf = planted_motif_corpus()
        df = corpus_to_df(spark, pdf, n_partitions=4)
        hot_share = df.filter("source = 'src_hot'").count() / df.count()
        assert hot_share > 0.5, "fixture must be skewed"
        salted = salt_hot_keys(df, "source", n_salts=8, hot_threshold=0.3)
        grp = salted.groupBy("__salted_key").count().toPandas()
        hot_rows = grp[grp["__salted_key"].str.startswith("src_hot#")]
        assert len(hot_rows) == 8, "hot key must fan out over all salts"
        assert hot_rows["count"].max() < hot_share * df.count() * 0.5
        # non-hot keys untouched
        assert (~grp["__salted_key"].str.contains("#") | grp["__salted_key"].str.startswith("src_hot")).all()

    def test_salted_build_same_sketch(self, spark):
        """Salting (or any repartitioning) must not change the merged sketch."""
        pdf = planted_motif_corpus()
        df = corpus_to_df(spark, pdf, n_partitions=4)
        cfg = HyperSketchConfig(motif_size=3, min_count=8, seed=42)
        base, _ = build_motif_cms(df, cfg)
        salted = salt_hot_keys(df, "source", n_salts=4, hot_threshold=0.3)
        resharded = salted.repartition(16, "__salted_key").drop("__salted_key")
        again, _ = build_motif_cms(resharded, cfg)
        assert base == again


class TestBoundChecksPartitionInvariant:
    """The driver's CORRECTNESS gate runs in ITS session (unknown
    parallelism); the quantile bound-check queries must hold under any
    partitioning — KLL/t-digest VALUES legitimately vary with the merge
    tree, the rank-error invariant must not."""

    SF01 = "/root/testdata/sf0.01"

    @pytest.mark.skipif(not os.path.exists(SF01), reason="sf0.01 testdata absent")
    @pytest.mark.parametrize("parts", [2, 16])
    def test_kll_tdigest_bounds_hold(self, spark, parts):
        from epichypersketch_jl_spark.entrypoints import (
            KLL_EPS,
            TDIGEST_EPS,
            _rank_bound_check,
        )
        from epichypersketch_jl_spark.operators.quantiles import (
            kll_quantiles,
            tdigest_quantiles,
        )
        from epichypersketch_jl_spark.sources.tables import read_table, tokenized_sequences

        seq = tokenized_sequences(spark, self.SF01).repartition(parts)
        qs = kll_quantiles(seq, "n_tok", [0.1, 0.5, 0.9, 0.99], k=256, seed=42)
        got = _rank_bound_check(spark, seq, "n_tok", qs, KLL_EPS).collect()
        assert all(r.rank_error_ok for r in got)

        ev = read_table(spark, self.SF01, "events").repartition(parts)
        qt = tdigest_quantiles(ev, "value", [0.01, 0.5, 0.99], compression=200.0)
        got = _rank_bound_check(spark, ev, "value", qt, TDIGEST_EPS).collect()
        assert all(r.rank_error_ok for r in got)
