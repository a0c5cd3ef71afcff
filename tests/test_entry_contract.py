"""Driver-contract emulation: every queries() entry runs, and every
oracle_sql() entry matches DuckDB on row count + column names + an
order-insensitive value comparison (the driver's correctness gate,
CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import glob
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
        pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = _duck(sf_dir)
    yield con
    con.close()


def test_registry_within_driver_window():
    """The driver records at most the FIRST 50 queries() entries (observed
    r01/r02): stay at ≤50 with the pipeline-level entries first, and never
    ship an oracle for a key the driver won't run."""
    q = entrymod.queries()
    assert len(q) <= 50, f"{len(q)} entries — driver records only the first 50"
    assert set(entrymod.oracle_sql()).issubset(q.keys())
    assert list(q)[:2] == ["pipeline_sink_counts", "parse_tokens_rule"]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert df.schema is not None
    assert len(rows) >= 0


def test_every_query_runs(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn = entrymod.queries()[name]
    got = _normalize(fn(spark, sf_dir).toPandas())
    want = _normalize(duck.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), f"{name}: column names differ"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    if not got.equals(want):
        diff = (got != want).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch\nspark:\n{got[diff].head(10)}\nduckdb:\n{want[diff].head(10)}"
        )
