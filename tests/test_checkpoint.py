"""Resume semantics: interrupted run + resume ≡ single uninterrupted run."""

from __future__ import annotations

import json
import os

from sagan_spark.datagen.transcripts import write_transcripts
from sagan_spark.engine import checkpoint as cp
from sagan_spark.engine import pipeline


def _multi_file_input(tmp_path) -> str:
    p = str(tmp_path / "tx_multi")
    # 4 chunks → 4 parquet files, each holding whole conversations
    write_transcripts(p, n_convs=120, seed=11, chunk_convs=30)
    return p


def test_conv_locality_holds(spark, tmp_path):
    path = _multi_file_input(tmp_path)
    assert cp.check_conv_locality(spark, path)


def test_interrupt_and_resume_equals_single_run(spark, tmp_path):
    path = _multi_file_input(tmp_path)
    out = str(tmp_path / "out_resume")

    # simulate a crash after 2 of 4 units
    r1 = cp.run_resumable(spark, path, out, max_units=2)
    assert r1.processed_units == 2
    m = json.load(open(os.path.join(out, cp.MANIFEST)))
    assert sum(1 for u in m["units"].values() if u["status"] == "done") == 2

    # resume: must skip the 2 done units and process the remaining 2
    r2 = cp.run_resumable(spark, path, out)
    assert r2.skipped_units == 2
    assert r2.processed_units == 2

    # totals equal a single-shot pipeline run over the whole input
    ref = pipeline.run(spark, path)
    got = r2.totals
    assert got["per_sink"] == ref.sink_counts
    assert {int(k): v for k, v in got["per_sid"].items()} == ref.sid_counts
    ref.unpersist()

    # lineage recorded per unit
    for u in r2.manifest["units"].values():
        assert u["rows_in"] > 0 and "wall_s" in u and u["files"]


def test_rerun_is_noop(spark, tmp_path):
    path = _multi_file_input(tmp_path)
    out = str(tmp_path / "out_noop")
    cp.run_resumable(spark, path, out)
    r = cp.run_resumable(spark, path, out)
    assert r.processed_units == 0
    assert r.skipped_units == 4


def test_resume_rejects_different_ruleset(spark, tmp_path):
    import pytest

    from sagan_spark.rules.bulk import bulk_ruleset

    path = _multi_file_input(tmp_path)
    out = str(tmp_path / "out_rsfp")
    cp.run_resumable(spark, path, out, max_units=1)
    with pytest.raises(ValueError, match="different rule set"):
        cp.run_resumable(spark, path, out, ruleset=bulk_ruleset())
