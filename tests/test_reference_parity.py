"""Ports of the remaining reference test scenarios (SURVEY.md §5):
higher-order motifs with scrambled positions (test_higher_order_motifs.jl),
the statistical corpus (test_cpu_implementation.jl:5-131, Fixture C),
weighted contributions, and the length-partitioning edge cases
(test_partitioning.jl:49-69)."""

import numpy as np
import pandas as pd
import pytest

from epichypersketch_jl_spark.config import HyperSketchConfig
from epichypersketch_jl_spark.operators.motif import enriched_configurations, motif_counts
from epichypersketch_jl_spark.sources.synth import SEQ_POS_SCHEMA, corpus_to_df


class TestHigherOrderMotifs:
    @pytest.mark.parametrize("k", [4, 5])
    def test_conv_k45_scrambled_storage_order(self, spark, k):
        """k=4/5 convolution motifs whose storage order is scrambled relative
        to position order — canonicalization must recover the planted gaps
        (test_higher_order_motifs.jl)."""
        rng = np.random.default_rng(99)
        motif = list(range(11, 11 + k))  # filters 11..11+k-1
        positions = [10 + 12 * i for i in range(k)]  # gaps = 12 - 8 = 4
        filter_len = 8
        rows = []
        for i in range(30):
            perm = rng.permutation(k)
            toks = np.array(motif, dtype=np.int32)[perm]
            poss = np.array(positions, dtype=np.int32)[perm]
            rows.append((f"doc_{i:03d}", toks.tolist(), poss.tolist(), k, "s"))
        for i in range(200):  # noise docs
            n = int(rng.integers(k, k + 3))
            toks = rng.choice(np.arange(500, 900), size=n, replace=False).astype(np.int32)
            poss = np.sort(rng.choice(np.arange(1, 400, 11), size=n, replace=False)).astype(
                np.int32
            )
            rows.append((f"noise_{i:03d}", toks.tolist(), poss.tolist(), n, "s"))
        pdf = pd.DataFrame(rows, columns=["doc_id", "tokens", "positions", "n_tok", "source"])
        df = spark.createDataFrame(pdf, schema=SEQ_POS_SCHEMA)
        cfg = HyperSketchConfig(motif_size=k, min_count=25, filter_len=filter_len, seed=7)
        out = enriched_configurations(df, cfg).toPandas()
        planted = out
        for j in range(k):
            planted = planted[planted[f"m{j+1}"] == motif[j]]
        assert len(planted) == 30, "every planted doc must emit the canonical motif"
        for j in range(k - 1):
            assert (planted[f"d{j+1}{j+2}"] == 4).all()
        assert (planted["start"] == positions[0]).all()
        assert (planted["end"] == positions[-1] + filter_len - 1).all()


class TestStatisticalCorpus:
    def test_fixture_c_pair_detection(self, spark):
        """2000 docs; every 8th carries pair {5,15}; threshold 80 must
        surface it and only it (test_cpu_implementation.jl)."""
        rng = np.random.default_rng(123)
        rows = []
        for i in range(2000):
            toks = rng.choice(np.arange(1000, 2000), size=int(rng.integers(1, 6)), replace=False)
            toks = toks.tolist()
            if i % 8 == 0:
                toks = [5, 15] + toks
            rows.append((f"doc_{i:05d}", [int(t) for t in toks], len(toks), "s"))
        pdf = pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source"])
        df = corpus_to_df(spark, pdf, n_partitions=8)
        cfg = HyperSketchConfig(motif_size=2, min_count=80, seed=3)
        top = motif_counts(df, cfg).toPandas()
        assert ((top.m1 == 5) & (top.m2 == 15)).any()
        hit = top[(top.m1 == 5) & (top.m2 == 15)].iloc[0]
        assert hit["n_occurrences"] == 250
        # nothing else reaches the threshold (noise pairs are ~uniform rare)
        assert len(top) == 1


class TestWeightedContributions:
    def test_contribution_sums_member_weights(self, spark):
        pdf = pd.DataFrame(
            {
                "doc_id": ["a", "b"],
                "tokens": [[1, 2, 3], [1, 2]],
                "positions": [[10, 20, 30], [5, 15]],
                "weights": [[0.5, 1.5, 2.0], [1.0, 3.0]],
                "n_tok": np.array([3, 2], dtype=np.int32),
                "source": ["s", "s"],
            }
        )
        from pyspark.sql.types import (
            ArrayType,
            FloatType,
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        schema = StructType(
            [
                StructField("doc_id", StringType()),
                StructField("tokens", ArrayType(IntegerType())),
                StructField("positions", ArrayType(IntegerType())),
                StructField("weights", ArrayType(FloatType())),
                StructField("n_tok", IntegerType()),
                StructField("source", StringType()),
            ]
        )
        df = spark.createDataFrame(pdf, schema=schema)
        cfg = HyperSketchConfig(motif_size=2, min_count=1, filter_len=0, seed=1)
        out = enriched_configurations(df, cfg).toPandas()
        got = {
            (r.m1, r.m2, r.doc_id): r.contribution for r in out.itertuples()
        }
        assert got[(1, 2, "a")] == pytest.approx(2.0)  # 0.5 + 1.5
        assert got[(1, 3, "a")] == pytest.approx(2.5)
        assert got[(2, 3, "a")] == pytest.approx(3.5)
        assert got[(1, 2, "b")] == pytest.approx(4.0)


class TestPartitioningEdgeCases:
    @pytest.mark.parametrize(
        "lengths",
        [[1], [3, 3, 3, 3], list(range(1, 61))],
        ids=["single", "uniform", "sweep-1-60"],
    )
    def test_degenerate_length_distributions(self, spark, lengths):
        rng = np.random.default_rng(5)
        rows = []
        for i, L in enumerate(lengths):
            toks = rng.choice(np.arange(1, 5000), size=L, replace=False).astype(np.int32)
            rows.append((f"d{i}", [int(t) for t in toks], L, "s"))
        pdf = pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source"])
        df = corpus_to_df(spark, pdf, n_partitions=4)
        cfg = HyperSketchConfig(motif_size=2, min_count=1, seed=2)
        out = enriched_configurations(df, cfg, validate=False).toPandas()
        from math import comb

        expected = sum(comb(L, 2) for L in lengths)
        assert len(out) == expected


class TestWeightedConvAggregate:
    def test_motif_counts_matches_occurrence_sum(self, spark):
        """Conv mode + weights through the AGGREGATED kernel must equal the
        occurrence-level extraction summed per key."""
        import numpy as np
        import pandas as pd
        rng = np.random.default_rng(11)
        rows = []
        for i in range(40):
            L = int(rng.integers(3, 9))
            toks = rng.integers(1, 6, size=L)
            rows.append(
                (
                    f"d{i}",
                    [int(t) for t in toks],
                    [int(p) for p in range(1, L + 1)],
                    [float(w) for w in rng.integers(1, 4, size=L)],
                    L,
                    "s",
                )
            )
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "tokens", "positions", "weights", "n_tok", "source"]
        )
        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        schema = StructType(
            [
                StructField("doc_id", StringType()),
                StructField("tokens", ArrayType(IntegerType())),
                StructField("positions", ArrayType(IntegerType())),
                StructField("weights", ArrayType(DoubleType())),
                StructField("n_tok", IntegerType()),
                StructField("source", StringType()),
            ]
        )
        df = spark.createDataFrame(pdf, schema=schema).repartition(4)
        cfg = HyperSketchConfig(motif_size=2, min_count=2, filter_len=1, seed=3)
        from epichypersketch_jl_spark.operators.motif import motif_counts

        agg = motif_counts(df, cfg).toPandas()
        occ = enriched_configurations(df, cfg, validate=False).toPandas()
        ref = (
            occ.groupby(["m1", "m2", "d12"])
            .agg(n=("contribution", "size"), tc=("contribution", "sum"))
            .reset_index()
        )
        m = agg.merge(ref, on=["m1", "m2", "d12"], how="outer", indicator=True)
        assert (m["_merge"] == "both").all()
        assert (m["n_occurrences"] == m["n"]).all()
        assert np.allclose(m["total_contribution"], m["tc"])


class TestGapModeParity:
    """gap_mode='gpu' emulates the GPU counting kernel (count_gpu.jl:51-53):
    gap = delta_pos, filter_len ignored, no overlap rejection — next to the
    default CPU semantics (count_cpu.jl:47-53).  Planted fixture where the
    two modes provably diverge: filter_len=2 with an adjacent (delta_pos=1)
    pair that CPU rejects and GPU keeps."""

    def _run(self, spark, gap_mode, filter_len):
        import pandas as pd

        from epichypersketch_jl_spark.config import HyperSketchConfig
        from epichypersketch_jl_spark.operators.motif import motif_counts

        pdf = pd.DataFrame(
            {
                "doc_id": [f"d{i}" for i in range(6)],
                "tokens": [[1, 2, 3]] * 6,
                "positions": [[1, 2, 6]] * 6,  # (1,2) adjacent: overlap at
                "n_tok": [3] * 6,              # filter_len=2
            }
        )
        df = spark.createDataFrame(pdf)
        cfg = HyperSketchConfig(
            motif_size=2, min_count=1, filter_len=filter_len,
            gap_mode=gap_mode, seed=11,
        )
        out = motif_counts(df, cfg).toPandas()
        return {(r.m1, r.m2, r.d12): r.n_occurrences for r in out.itertuples()}

    def test_gpu_keeps_overlaps_cpu_rejects(self, spark):
        cpu = self._run(spark, "cpu", 2)
        gpu = self._run(spark, "gpu", 2)
        # CPU: (1,2) delta 1 -> gap -1 rejected; (1,3) delta 5 -> gap 3;
        # (2,3) delta 4 -> gap 2
        assert cpu == {(1, 3, 3): 6, (2, 3, 2): 6}
        # GPU: raw deltas, nothing rejected
        assert gpu == {(1, 2, 1): 6, (1, 3, 5): 6, (2, 3, 4): 6}

    def test_modes_agree_when_filter_len_zero(self, spark):
        # with filter_len=0 the CPU gap equals the raw delta and nothing
        # overlaps: both modes must produce identical results
        assert self._run(spark, "cpu", 0) == self._run(spark, "gpu", 0)

    def test_bad_mode_rejected(self):
        import pytest as _pt

        from epichypersketch_jl_spark.config import HyperSketchConfig
        from epichypersketch_jl_spark.errors import ConfigError

        with _pt.raises(ConfigError):
            HyperSketchConfig(motif_size=2, gap_mode="tpu")
