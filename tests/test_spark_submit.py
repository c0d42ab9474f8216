"""End-to-end spark-submit --py-files run (north_rule execution mode)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def dist_zip():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "make_dist.py")],
        capture_output=True,
        text=True,
        check=True,
    )
    return out.stdout.strip()


def _spark_submit(dist_zip, script, *args):
    from pyspark import find_spark_home

    spark_home = find_spark_home._find_spark_home()
    cmd = [
        os.path.join(spark_home, "bin", "spark-submit"),
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", dist_zip,
        os.path.join(REPO, "jobs", script),
        *args,
    ]
    return subprocess.run(cmd, capture_output=True, text=True, timeout=420)


class TestSparkSubmit:
    def test_enriched_configs_job(self, spark, dist_zip, tmp_path):
        from epichypersketch_jl_spark.sources.synth import corpus_to_df, planted_motif_corpus

        inp = str(tmp_path / "seqs")
        outp = str(tmp_path / "occ")
        metrics = str(tmp_path / "logs")
        corpus_to_df(spark, planted_motif_corpus(), n_partitions=4).write.parquet(inp)

        r = _spark_submit(
            dist_zip,
            "enriched_configs.py",
            "--input", inp, "--output", outp,
            "--k", "3", "--min-count", "8", "--summary",
            "--metrics-dir", metrics,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        got = spark.read.parquet(outp).toPandas()
        motifs = set(map(tuple, got[["m1", "m2", "m3"]].values.tolist()))
        from epichypersketch_jl_spark.sources.synth import PLANTED_ORDINARY

        for motif, cnt in PLANTED_ORDINARY.items():
            if cnt >= 8:
                assert motif in motifs
        # lineage JSONL written
        with open(os.path.join(metrics, "runs.jsonl")) as f:
            rec = json.loads(f.readline())
        assert rec["job"] == "enriched_configs"
        assert rec["totals"]["n_updates"] > 0 and rec["n_tasks"] >= 1


    def test_enriched_configs_with_memory_budget(self, spark, dist_zip, tmp_path):
        """--memory-budget-mb routes through the planner (chunk cap + Arrow
        batch rows) and must not change results."""
        from epichypersketch_jl_spark.sources.synth import corpus_to_df, planted_motif_corpus

        inp = str(tmp_path / "seqs2")
        outp = str(tmp_path / "occ2")
        corpus_to_df(spark, planted_motif_corpus(), n_partitions=4).write.parquet(inp)
        r = _spark_submit(
            dist_zip,
            "enriched_configs.py",
            "--input", inp, "--output", outp,
            "--k", "3", "--min-count", "8", "--summary",
            "--memory-budget-mb", "64",
        )
        assert r.returncode == 0, r.stderr[-3000:]
        got = spark.read.parquet(outp).toPandas()
        motifs = set(map(tuple, got[["m1", "m2", "m3"]].values.tolist()))
        from epichypersketch_jl_spark.sources.synth import PLANTED_ORDINARY

        for motif, cnt in PLANTED_ORDINARY.items():
            if cnt >= 8:
                assert motif in motifs


class TestSessionHelper:
    def test_builder_sets_recommended_confs(self):
        from epichypersketch_jl_spark.session import session_builder

        b = session_builder("t", master="local[1]", shuffle_partitions=4)
        opts = b._options
        assert opts["spark.sql.adaptive.enabled"] == "true"
        assert opts["spark.sql.execution.arrow.maxRecordsPerBatch"] == "4096"
        assert opts["spark.sql.shuffle.partitions"] == "4"


class TestTokenizeJob:
    @pytest.mark.parametrize("strategy", ["broadcast", "join"])
    def test_tokenize_etl(self, spark, dist_zip, tmp_path, strategy):
        from epichypersketch_jl_spark.sources.tables import read_table

        inp = str(tmp_path / f"docs_{strategy}")
        outp = str(tmp_path / f"seq_{strategy}")
        vout = str(tmp_path / f"vocab_{strategy}")
        read_table(spark, "/root/testdata/sf0.001", "documents").write.parquet(inp)
        r = _spark_submit(
            dist_zip,
            "tokenize_corpus.py",
            "--input", inp, "--output", outp, "--vocab-output", vout,
            "--strategy", strategy, "--positions",
        )
        assert r.returncode == 0, r.stderr[-3000:]
        seq = spark.read.parquet(outp)
        # computed columns lead; every non-text input column is carried
        assert seq.columns[:4] == ["doc_id", "tokens", "n_tok", "positions"]
        assert "source" in seq.columns and "text" not in seq.columns
        from epichypersketch_jl_spark.sources.tables import documents_sequences

        direct = documents_sequences(spark, "/root/testdata/sf0.001", with_positions=True)
        a = {r.doc_id: (list(r.tokens), list(r.positions)) for r in seq.collect()}
        b = {r.doc_id: (list(r.tokens), list(r.positions)) for r in direct.collect()}
        assert a == b
        vocab = spark.read.parquet(vout)
        assert vocab.count() == vocab.select("tok").distinct().count()


class TestCorpusPipelineJob:
    def test_end_to_end(self, spark, dist_zip, tmp_path):
        """Composed pipeline: quality gate -> exact dedup -> near-dup
        resolve -> chunk -> split.  Planted: one exact duplicate and one
        near-duplicate (one word appended) of the same base doc — the
        exact pass must drop the copy, the near-dup pass must drop the
        appended variant, and all surviving chunks must stitch back to
        keeper documents only."""
        from pyspark.sql import functions as F

        base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        d0 = base.orderBy("doc_id").limit(1).collect()[0]
        extra = spark.createDataFrame(
            [
                (900001, d0.text),             # exact duplicate of doc 0
                (900002, d0.text + " zzz"),    # near-duplicate (jaccard ~1)
                (900003, "a b"),               # fails min-words gate
            ],
            "doc_id: long, text: string",
        )
        inp = str(tmp_path / "docs_pipe")
        outp = str(tmp_path / "chunks_pipe")
        report = str(tmp_path / "report.json")
        base.select("doc_id", "text").unionByName(extra).write.parquet(inp)

        r = _spark_submit(
            dist_zip,
            "corpus_pipeline.py",
            "--input", inp, "--output", outp, "--report", report,
            "--min-words", "5", "--threshold", "0.5",
            "--max-words", "32", "--overlap", "4",
            "--train-frac", "0.8", "--valid-frac", "0.1",
        )
        assert r.returncode == 0, r.stderr[-3000:]
        with open(report) as f:
            counts = json.load(f)
        n_base = base.count()
        assert counts["input"] == n_base + 3
        assert counts["after_quality_gate"] == n_base + 2   # 900003 gated
        assert counts["after_exact_dedup"] == n_base + 1    # 900001 dropped
        # 900002 is dropped here; the base corpus contains organic near-dup
        # clusters of its own, so the count only bounds from above
        assert counts["after_neardup_resolve"] < counts["after_exact_dedup"]

        chunks = spark.read.parquet(outp)
        assert set(chunks.select("split").distinct().toPandas()["split"]) <= {
            "train", "valid", "test"
        }
        assert chunks.filter(F.col("doc_id").isin([900001, 900002, 900003])).count() == 0
        # chunks stitch back: every surviving doc is fully covered
        surv = chunks.select("doc_id").distinct().count()
        assert surv == counts["after_neardup_resolve"]
        assert counts["chunks_written"] == chunks.count()
        # every chunk respects the window bound
        assert chunks.filter(F.col("n_words") > 32).count() == 0


class TestSketchStatsCLI:
    def test_new_sketch_branches(self, dist_zip):
        """kmv / topk / grouped-kll / grouped-tdigest / ams CLI branches
        produce JSON rows (plain python with PYTHONPATH — same code path
        spark-submit --py-files exercises)."""
        import json

        env = dict(os.environ, PYTHONPATH=REPO)
        base = [sys.executable, os.path.join(REPO, "jobs", "sketch_stats.py")]
        ev = "/root/testdata/sf0.001/events.parquet"

        r = subprocess.run(
            base + ["--input", ev, "--sketch", "kmv", "--column", "user_id",
                    "--kmv-k", "32"],
            capture_output=True, text=True, timeout=300, env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        rows = [json.loads(x) for x in r.stdout.splitlines() if x.startswith("{")]
        assert rows and "est_distinct" in rows[0]

        r = subprocess.run(
            base + ["--input", ev, "--sketch", "topk", "--column", "event_type",
                    "--topk", "2"],
            capture_output=True, text=True, timeout=300, env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        rows = [json.loads(x) for x in r.stdout.splitlines() if x.startswith("{")]
        assert len(rows) == 2 and {"item", "est_count"} <= set(rows[0])

        r = subprocess.run(
            base + ["--input", ev, "--sketch", "tdigest", "--column", "value",
                    "--group-col", "event_type", "--quantiles", "0.5,0.99"],
            capture_output=True, text=True, timeout=300, env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        rows = [json.loads(x) for x in r.stdout.splitlines() if x.startswith("{")]
        assert rows and {"q", "est"} <= set(rows[0])

        r = subprocess.run(
            base + ["--input", ev, "--sketch", "ams", "--column", "user_id",
                    "--group-col", "event_type", "--ams-d", "4"],
            capture_output=True, text=True, timeout=300, env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        rows = [json.loads(x) for x in r.stdout.splitlines() if x.startswith("{")]
        assert rows and {"f2_est", "n_values"} <= set(rows[0])
