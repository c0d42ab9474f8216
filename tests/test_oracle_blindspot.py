"""Always-run oracle gate for the driver's rotation blind spot (VERDICT r5
item 8): six queries have never been sampled by any driver round
(count_sketch_shift, doc_length_histogram, kn_bigram_logprob_docs,
percentile_rank_events, trigram_logprob_docs, weighted_sample_global), so a
regression there could land silently between rounds.  This module keeps them
under the full DuckDB value-hash compare at sf0.001 INSIDE the default
pytest budget (no `oracle` marker — `pytest tests/` runs it)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_check import TABLES, value_hash  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_BLINDSPOT_SF_DIR", "/root/testdata/sf0.001")

BLIND_SPOT = [
    "count_sketch_shift",
    "doc_length_histogram",
    "kn_bigram_logprob_docs",
    "percentile_rank_events",
    "trigram_logprob_docs",
    "weighted_sample_global",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


@pytest.mark.parametrize("name", BLIND_SPOT)
def test_blindspot_oracle_parity(name: str, spark, duck):
    import __spark_entry__ as e

    fn = e.queries()[name]
    sql = e.oracle_sql()[name]
    spark_pdf = fn(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(sql).fetchdf()
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: rows {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    spark_pdf.columns = [c.lower() for c in spark_pdf.columns]
    duck_pdf.columns = [c.lower() for c in duck_pdf.columns]
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), f"{name}: columns"
    assert value_hash(spark_pdf) == value_hash(duck_pdf), f"{name}: value-hash mismatch"


def test_coverage_doc_counts_match_registry():
    """COVERAGE.md's current-round headline count must equal the registry
    size, so the docs cannot drift again (VERDICT r5 item 7)."""
    import re

    import __spark_entry__ as e

    n = len(e.queries())
    text = open(os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")).read()
    # current-round claims: the first "All **N** `queries()`" block and the
    # "all N stay green" sentence must both say len(queries())
    first_all = re.search(r"All \*\*(\d+)\*\* `queries\(\)` entries", text)
    assert first_all and int(first_all.group(1)) == n, (
        f"COVERAGE.md headline count {first_all and first_all.group(1)} != {n}"
    )
    stay_green = re.search(r"all (\d+) stay green", text)
    assert stay_green and int(stay_green.group(1)) == n, (
        f"COVERAGE.md 'stay green' count {stay_green and stay_green.group(1)} != {n}"
    )
