"""The bulk (bench) rule set must be just as correct as the canonical one:
Spark ≡ oracle with 58 rules across all predicate families."""

from __future__ import annotations

from sagan_spark.engine import pipeline
from sagan_spark.oracle.pandas_engine import run_oracle
from sagan_spark.rules.bulk import bulk_ruleset


def test_bulk_ruleset_matches_oracle(spark, tiny_path, tiny_pdf):
    rs = bulk_ruleset()
    assert len(rs.rules) == 58
    want = run_oracle(tiny_pdf, rs)
    res = pipeline.run(spark, tiny_path, ruleset=rs)
    assert res.sink_counts == want.sink_counts
    assert res.sid_counts == want.sid_counts
    res.unpersist()