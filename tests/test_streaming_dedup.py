"""Streaming incremental dedup (streaming/dedup) — contracts:

- stream union (cross + within pairs over all micro-batches) ≡ the
  one-shot batch pair set minus corpus-internal pairs, as unordered pairs;
- the index after the stream == signatures of corpus + every batch;
- a replayed micro-batch (foreachBatch re-execution) changes nothing;
- param mismatches and missing bootstraps are refused loudly;
- compaction is row-identical and the compacted root keeps serving;
- an empty bootstrap works (index grows from nothing).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sagan_spark.ops import dedup_index as DI
from sagan_spark.streaming import dedup as SD

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def doc_pdf():
    pdf = pd.read_parquet(DOCS, columns=["doc_id", "text"])
    return pdf.sort_values("doc_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def splits(doc_pdf):
    """Corpus = first half by id; two stream files split the second half —
    ids ordered by arrival, so unordered-pair equality with the one-shot
    run is exact."""
    n = len(doc_pdf)
    corpus = doc_pdf.iloc[: n // 2]
    b0 = doc_pdf.iloc[n // 2 : 3 * n // 4]
    b1 = doc_pdf.iloc[3 * n // 4 :]
    return corpus, b0, b1


def _unordered(df):
    return {
        (min(r["a"], r["b"]), max(r["a"], r["b"]), r["est_jaccard"])
        for r in df.collect()
    }


def test_stream_dedup_end_to_end(spark, splits, tmp_path):
    corpus_pdf, b0, b1 = splits
    idx = str(tmp_path / "idx")
    pairs = str(tmp_path / "pairs")
    ck = str(tmp_path / "ck")
    sdir = str(tmp_path / "in")
    os.makedirs(sdir)
    b0.to_parquet(os.path.join(sdir, "docs-000.parquet"), index=False)
    b1.to_parquet(os.path.join(sdir, "docs-001.parquet"), index=False)

    corpus = spark.createDataFrame(corpus_pdf)
    SD.init_dedup_stream_index(corpus, idx, num_hashes=8)
    q = SD.run_dedup_stream(
        spark, sdir, idx, pairs, ck,
        num_hashes=8, max_bucket=None, max_files_per_trigger=1, drain=True,
    )
    q.awaitTermination()

    got = _unordered(spark.read.parquet(pairs).drop("batch"))

    all_docs = spark.read.parquet(DOCS).select("doc_id", "text")
    all_sig = DI.build_dedup_index(all_docs, num_hashes=8)
    one_shot = DI.candidates_from_sigs(
        all_sig, all_sig, max_bucket=None
    ).where(F.col("a") < F.col("b"))
    cutoff = int(corpus_pdf["doc_id"].max())
    want = {
        t for t in _unordered(one_shot) if not (t[0] <= cutoff and t[1] <= cutoff)
    }
    assert got == want
    assert len(got) > 0, "no cross/within dups in fixture — weak test"

    # index now holds corpus + both batches, identical to signing everything
    stored = SD.read_stream_index(spark, idx, num_hashes=8)
    assert sorted(r["batch"] for r in stored.select("batch").distinct().collect()) == [-1, 0, 1]
    a = {(r["doc_id"], tuple(r["sig"])) for r in stored.drop("batch").collect()}
    b = {(r["doc_id"], tuple(r["sig"])) for r in all_sig.collect()}
    assert a == b

    # compaction: row-identical signatures under a single batch dir,
    # manifest copied, and the compacted root still serves reads
    dst = str(tmp_path / "idx_compact")
    SD.compact_dedup_stream_index(spark, idx, dst, num_files=2)
    c = {
        (r["doc_id"], tuple(r["sig"]))
        for r in SD.read_stream_index(spark, dst, num_hashes=8).drop("batch").collect()
    }
    assert c == b


def test_replayed_batch_is_idempotent(spark, splits, tmp_path):
    corpus_pdf, b0, _ = splits
    idx = str(tmp_path / "idx")
    pairs = str(tmp_path / "pairs")
    SD.init_dedup_stream_index(spark.createDataFrame(corpus_pdf), idx, num_hashes=8)
    fn = SD.make_dedup_batch_fn(idx, pairs, num_hashes=8, max_bucket=None)
    batch = spark.createDataFrame(b0)
    fn(batch, 0)
    first_pairs = _unordered(spark.read.parquet(pairs).drop("batch"))
    first_idx = {
        (r["doc_id"], tuple(r["sig"]), r["batch"])
        for r in SD.read_stream_index(spark, idx, num_hashes=8).collect()
    }
    fn(batch, 0)  # foreachBatch replay after a crash before checkpoint commit
    assert _unordered(spark.read.parquet(pairs).drop("batch")) == first_pairs
    assert {
        (r["doc_id"], tuple(r["sig"]), r["batch"])
        for r in SD.read_stream_index(spark, idx, num_hashes=8).collect()
    } == first_idx


def test_guards(spark, splits, tmp_path):
    corpus_pdf, _, _ = splits
    idx = str(tmp_path / "idx")
    with pytest.raises(FileNotFoundError, match="manifest"):
        SD.run_dedup_stream(
            spark, str(tmp_path / "in"), idx, str(tmp_path / "p"), str(tmp_path / "ck")
        )
    SD.init_dedup_stream_index(spark.createDataFrame(corpus_pdf), idx, num_hashes=8)
    with pytest.raises(ValueError, match="mixed hash spaces"):
        SD.run_dedup_stream(
            spark, str(tmp_path / "in"), idx, str(tmp_path / "p"),
            str(tmp_path / "ck"), num_hashes=4,
        )
    with pytest.raises(ValueError, match="AvailableNow"):
        SD.run_dedup_stream(
            spark, str(tmp_path / "in"), idx, str(tmp_path / "p"),
            str(tmp_path / "ck"), num_hashes=8, drain=True,
            trigger_processing_time="1 second",
        )


def test_empty_bootstrap_grows(spark, splits, tmp_path):
    _, b0, _ = splits
    idx = str(tmp_path / "idx")
    pairs = str(tmp_path / "pairs")
    empty = spark.createDataFrame([], "doc_id long, text string")
    SD.init_dedup_stream_index(empty, idx, num_hashes=8)
    assert SD.read_stream_index(spark, idx, num_hashes=8).count() == 0
    fn = SD.make_dedup_batch_fn(idx, pairs, num_hashes=8, max_bucket=None)
    fn(spark.createDataFrame(b0), 0)
    stored = SD.read_stream_index(spark, idx, num_hashes=8)
    assert stored.where(F.col("batch") == 0).count() > 0
    # pairs exist (within-batch only; cross side was empty)
    got = spark.read.parquet(pairs)
    assert got.where(F.col("a") >= F.col("b")).count() == 0


def test_stream_dedup_capped_keeps_pre_hot_pairs(spark, tmp_path):
    """Capped semantics (INTENTIONAL divergence from one-shot): the cap
    tests combined bucket membership as of each batch, so pairs admitted
    BEFORE a band bucket went hot stay found — a later boilerplate flood
    cannot retroactively un-find earlier duplicates — while a one-shot
    run with the same cap over the final corpus drops the whole bucket.
    Never-hot buckets agree between the two."""
    hot = "the same boilerplate sentence repeated across many documents"
    cold = "an entirely different rare sentence shared by exactly two docs"
    corpus_rows = [(1, hot), (2, hot), (10, cold)]
    b0_rows = [(3, hot), (11, cold)]          # bucket sizes still under cap
    b1_rows = [(4 + i, hot) for i in range(6)]  # floods the hot bucket
    cap = 8

    idx = str(tmp_path / "idx")
    pairs = str(tmp_path / "pairs")
    ck = str(tmp_path / "ck")
    sdir = str(tmp_path / "in")
    os.makedirs(sdir)
    pd.DataFrame(b0_rows, columns=["doc_id", "text"]).to_parquet(
        os.path.join(sdir, "docs-000.parquet"), index=False
    )
    pd.DataFrame(b1_rows, columns=["doc_id", "text"]).to_parquet(
        os.path.join(sdir, "docs-001.parquet"), index=False
    )

    corpus = spark.createDataFrame(corpus_rows, "doc_id: long, text: string")
    SD.init_dedup_stream_index(corpus, idx, num_hashes=8)
    q = SD.run_dedup_stream(
        spark, sdir, idx, pairs, ck,
        num_hashes=8, max_bucket=cap, max_files_per_trigger=1, drain=True,
    )
    q.awaitTermination()
    got = {
        (min(r["a"], r["b"]), max(r["a"], r["b"]))
        for r in spark.read.parquet(pairs).collect()
    }

    # batch 0 ran while the hot bucket held corpus 2 + delta 1 ≤ cap:
    # doc 3's pairs against 1 and 2 were admitted and STAY; the cold pair
    # (10, 11) is never hot. batch 1's flood exceeds the cap on both the
    # cross join (3 corpus + 6 delta) and the halved within-batch join
    # (6 + 6), so no batch-1 doc pairs with anything.
    assert got == {(1, 3), (2, 3), (10, 11)}

    # the same cap over the FINAL corpus one-shot drops the WHOLE hot
    # bucket (9 members on each side of the self-join — even the original
    # corpus-internal (1, 2)) but keeps the cold pair; the stream's
    # divergence is exactly its pre-hot admissions.
    all_docs = corpus.unionByName(
        spark.createDataFrame(b0_rows + b1_rows, "doc_id: long, text: string")
    )
    sig = DI.build_dedup_index(all_docs, num_hashes=8)
    one_shot = {
        (r["a"], r["b"])
        for r in DI.candidates_from_sigs(sig, sig, max_bucket=cap)
        .where(F.col("a") < F.col("b"))
        .collect()
    }
    assert one_shot == {(10, 11)}
    assert got - one_shot == {(1, 3), (2, 3)}  # kept pre-hot admissions
