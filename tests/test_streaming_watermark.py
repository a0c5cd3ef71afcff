"""§2.7 watermark + windowed streaming aggregation.

Two contracts:
1. event-time-ordered delivery → every emitted window equals the batch
   aggregation exactly (the streamed result is a prefix: trailing windows
   stay open without further input).
2. out-of-order delivery → rows behind the watermark are dropped: emitted
   counts never exceed batch counts, and at least one window is short —
   the documented late-data semantics (SURVEY §2.7).
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sagan_spark.datagen.transcripts import write_transcripts
from sagan_spark.streaming.pipeline import TRANSCRIPT_SCHEMA


def _run_stream(spark, src: str, tmp_path, name: str) -> dict:
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # watermarks require TIMESTAMP (tz) event time; session tz is UTC so
    # the cast is value-preserving
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "role")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket"), "role", "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"{name}_ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return {(r.bucket, r.role): r.n for r in spark.sql(f"select * from {name}").collect()}


def _batch_counts(spark, src: str) -> dict:
    batch = spark.read.parquet(src).withColumn("ts", F.col("ts").cast("timestamp"))
    df = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "role")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket"), "role", "n")
    )
    return {(r.bucket, r.role): r.n for r in df.collect()}


@pytest.fixture(scope="module")
def base_pdf(tmp_path_factory) -> pd.DataFrame:
    p = str(tmp_path_factory.mktemp("wm") / "base")
    write_transcripts(p, n_convs=80, seed=21, chunk_convs=80)
    return pd.concat(
        [pd.read_parquet(f) for f in sorted(glob.glob(os.path.join(p, "*.parquet")))],
        ignore_index=True,
    )


def test_ordered_delivery_matches_batch(spark, base_pdf, tmp_path):
    src = str(tmp_path / "ordered")
    os.makedirs(src)
    pdf = base_pdf.sort_values("ts").reset_index(drop=True)
    for i, chunk in enumerate(
        pdf.iloc[j : j + len(pdf) // 4 + 1] for j in range(0, len(pdf), len(pdf) // 4 + 1)
    ):
        chunk.to_parquet(os.path.join(src, f"t-{i:03d}.parquet"), index=False)
    got = _run_stream(spark, src, tmp_path, "wm_ordered")
    want = _batch_counts(spark, src)
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert want.get(k) == v, k
    assert len(got) >= 0.8 * len(want)


def test_out_of_order_delivery_drops_late_rows(spark, base_pdf, tmp_path):
    src = str(tmp_path / "unordered")
    os.makedirs(src)
    # conv-chunked files: every file spans the full time range → file k+1
    # carries rows far behind the watermark set by file k
    for i, chunk in enumerate(
        base_pdf.iloc[j : j + len(base_pdf) // 4 + 1]
        for j in range(0, len(base_pdf), len(base_pdf) // 4 + 1)
    ):
        chunk.to_parquet(os.path.join(src, f"c-{i:03d}.parquet"), index=False)
    got = _run_stream(spark, src, tmp_path, "wm_unordered")
    want = _batch_counts(spark, src)
    assert got
    short = 0
    for k, v in got.items():
        assert v <= want.get(k, 0), k  # never overcount
        if v < want[k]:
            short += 1
    assert short > 0, "expected at least one window shortened by late-row drops"
