"""Persistent incremental MinHash dedup index.

The batch dedup chain (ops/dedup.py) recomputes shingles + signatures from
raw text on every run — right for a one-shot corpus pass, wrong for the
production cadence where a ~0.1% daily delta must be deduped against a
10^9-doc corpus: re-shingling 100 TB of text to admit 100 GB of new
documents is the scale-killer. This module materializes the MinHash
signatures ONCE as a queryable index (the exact construction of
ops/dedup.minhash_signature — portable md5 hashes, so SQL oracles and a
rebuild-from-scratch agree bit-for-bit) and serves incremental batches
against it:

- build/write/append/compact: the ANN-index lifecycle (ops/similarity
  write_lsh_index family), with a params MANIFEST (shingle width, hash
  count) written LAST via fsutil's atomic rename — a crashed write leaves
  no valid-looking index, and a query/append with mismatched params is
  refused loudly instead of silently producing disjoint hash spaces.
- dedup_index_candidates: banded LSH join of the delta against the stored
  signatures. Band keys are DERIVED from the stored sig (a few string
  slices — negligible next to the shingling they replace), so the index
  stores one row per doc regardless of banding, and the same index serves
  any (bands, rows_per_band) split of its hash count.
- est_jaccard comes from the signatures themselves (the standard MinHash
  estimate: fraction of agreeing components), so candidate pairs are
  scored WITHOUT touching corpus text — the index alone answers
  "is this new doc a near-dup of anything we have".

100 TB shape: the delta-vs-corpus join shuffles INDEX rows (~150 B/doc —
~150 GB for 10^9 docs), never documents; per-band bucket caps bound the
degenerate-bucket blow-up exactly like ops/dedup.lsh_candidate_pairs,
computed as a window over the join's own shuffle key. For the repeated
daily-delta cadence, write_dedup_index_table stores the BANDED form as a
Spark bucketed table on the band key: the corpus side of every delta join
then arrives pre-partitioned and only the delta shuffles (plan-asserted in
tests) — the same planner mechanics as the engine's conv_id-bucketed
zero-exchange scan (docs/SCALE.md).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsutil
from .dedup import minhash_signature, shingles

MANIFEST_NAME = "_dedup_index.json"
INDEX_VERSION = 1


def sig_est_jaccard(a: Column, b: Column) -> Column:
    """Standard MinHash Jaccard estimate: fraction of agreeing signature
    components. Unbiased with variance 1/num_hashes — the score that lets
    an index answer near-dup queries without any text."""
    agree = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return F.round(agree / F.size(a), 6)


def band_key(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Array of ``bands`` LSH band keys from a signature. The band index is
    EMBEDDED in the key ("i:h|h"), so banding joins on ONE column — which a
    bucketed index table can pre-partition on (a two-column (band_idx,
    band_hash) join could not use single-column bucketing)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.concat(
            b.cast("string"),
            F.lit(":"),
            F.concat_ws("|", F.slice(sig, b * rows_per_band + 1, rows_per_band)),
        ),
    )


def build_dedup_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """(id, sig) — the index rows for a document batch. Exactly
    ops/dedup's shingles→minhash_signature, so index-served results are
    bit-identical to a from-scratch run (tested)."""
    return minhash_signature(shingles(df, text_col, id_col, w), id_col, num_hashes)


def _manifest_path(path: str) -> str:
    return path.rstrip("/") + "/" + MANIFEST_NAME


def _write_manifest(spark: SparkSession, path: str, w: int, num_hashes: int, id_col: str) -> None:
    fsutil.fs_write_text(
        spark,
        _manifest_path(path),
        json.dumps(
            {"version": INDEX_VERSION, "w": w, "num_hashes": num_hashes, "id_col": id_col}
        ),
    )


def read_manifest(spark: SparkSession, path: str) -> dict:
    """Raises FileNotFoundError for a missing/incomplete index (the
    manifest is written last — data without it is a crashed write)."""
    if not fsutil.fs_exists(spark, _manifest_path(path)):
        raise FileNotFoundError(
            f"no dedup index manifest at {path} — not an index, or an "
            "interrupted write_dedup_index (re-run the write)"
        )
    return json.loads(fsutil.fs_read_text(spark, _manifest_path(path)))


def _check_params(m: dict, w: int, num_hashes: int, path: str) -> None:
    if (m["w"], m["num_hashes"]) != (w, num_hashes):
        raise ValueError(
            f"dedup index at {path} was built with w={m['w']}, "
            f"num_hashes={m['num_hashes']}; refusing w={w}, "
            f"num_hashes={num_hashes} — mixed hash spaces would silently "
            "miss every cross-batch duplicate"
        )


def write_dedup_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    num_hashes: int = 8,
) -> None:
    """Materialize signatures for a corpus: parquet rows (id, sig), then
    the params manifest (last — see module docstring)."""
    spark = docs.sparkSession
    build_dedup_index(docs, text_col, id_col, w, num_hashes).write.mode(
        "overwrite"
    ).parquet(path)
    _write_manifest(spark, path, w, num_hashes, id_col)


def append_to_dedup_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    w: int = 3,
    num_hashes: int = 8,
) -> None:
    """Incremental maintenance: sign ONLY the new docs and append. The
    hash construction is a pure function of (w, num_hashes) — checked
    against the manifest — so append ≡ rebuild exactly (tested)."""
    spark = docs.sparkSession
    m = read_manifest(spark, path)
    _check_params(m, w, num_hashes, path)
    build_dedup_index(docs, text_col, m["id_col"], w, num_hashes).write.mode(
        "append"
    ).parquet(path)


def read_dedup_index(
    spark: SparkSession, path: str, w: int = 3, num_hashes: int = 8
) -> DataFrame:
    """The (id, sig) rows, after verifying the manifest matches the
    caller's expected params (a query hashed differently than the index
    finds nothing, silently — hence the loud check)."""
    m = read_manifest(spark, path)
    _check_params(m, w, num_hashes, path)
    return spark.read.parquet(path)


def compact_dedup_index(
    spark: SparkSession, src: str, dst: str, num_files: int = 32
) -> None:
    """Rewrite an appended-to index with ``num_files`` files (daily appends
    fragment the layout; scan planning degrades with file count). Writes to
    ``dst`` — compact-then-swap is the caller's atomic cutover, as with
    compact_lsh_index. Row-identical to the source (tested)."""
    m = read_manifest(spark, src)
    spark.read.parquet(src).repartition(num_files).write.mode("overwrite").parquet(dst)
    _write_manifest(spark, dst, m["w"], m["num_hashes"], m["id_col"])


def _banded(sig_df: DataFrame, id_col: str, bands: int, rows_per_band: int) -> DataFrame:
    return sig_df.select(
        F.col(id_col), F.col("sig"), F.explode(band_key(F.col("sig"), bands, rows_per_band)).alias("_band")
    )


def dedup_index_candidates(
    index: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = 1000,
    min_est: float | None = None,
) -> DataFrame:
    """Near-dup candidates of a NEW batch against the indexed corpus:
    (a = corpus id, b = new id, est_jaccard), distinct per pair, scored by
    sig_est_jaccard — corpus text is never read. Pairs where the same id
    appears on both sides (re-ingestion) are excluded.

    ``max_bucket`` drops degenerate band buckets whose COMBINED
    (corpus + delta) membership exceeds the cap — same semantics and same
    window-over-the-join's-own-shuffle-key implementation as
    ops/dedup.lsh_candidate_pairs; use dedup_index_bucket_stats to surface
    what a cap drops. ``min_est`` filters the estimate (e.g. 0.5 for
    "probable near-dup")."""
    return candidates_from_sigs(
        index,
        build_dedup_index(new_docs, text_col, id_col, w, num_hashes),
        id_col=id_col,
        bands=bands,
        rows_per_band=rows_per_band,
        max_bucket=max_bucket,
        min_est=min_est,
    )


def candidates_from_sigs(
    left_sig: DataFrame,
    right_sig: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = 1000,
    min_est: float | None = None,
) -> DataFrame:
    """Candidate pairs between two already-signed sets: (a = left id,
    b = right id, est_jaccard), a ≠ b. The signature-level core of
    dedup_index_candidates; streaming dedup signs each micro-batch ONCE
    and reuses the signatures for both the index join and the
    within-batch self-join (filter a < b on left == right)."""
    from pyspark.sql import Window

    left = _banded(left_sig, id_col, bands, rows_per_band).alias("l")
    right = _banded(right_sig, id_col, bands, rows_per_band).alias("r")
    if max_bucket is not None:
        win = Window.partitionBy("_band")
        left = left.withColumn("_ln", F.count("*").over(win)).alias("l")
        right = right.withColumn("_rn", F.count("*").over(win)).alias("r")
    joined = left.join(
        right,
        (F.col("l._band") == F.col("r._band"))
        & (F.col(f"l.{id_col}") != F.col(f"r.{id_col}")),
    )
    if max_bucket is not None:
        joined = joined.where(F.col("_ln") + F.col("_rn") <= max_bucket)
    est = sig_est_jaccard(F.col("l.sig"), F.col("r.sig"))
    out = joined.select(
        F.col(f"l.{id_col}").alias("a"),
        F.col(f"r.{id_col}").alias("b"),
        est.alias("est_jaccard"),
    ).distinct()
    if min_est is not None:
        out = out.where(F.col("est_jaccard") >= F.lit(float(min_est)))
    return out


def dedup_index_bucket_stats(
    index: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """'No silent caps' companion: one row with the joint (corpus + delta)
    bucket count, over-cap bucket count, and ids touching a dropped
    bucket, for the exact buckets dedup_index_candidates would join."""
    both = _banded(index, id_col, bands, rows_per_band).unionByName(
        _banded(
            build_dedup_index(new_docs, text_col, id_col, w, num_hashes),
            id_col,
            bands,
            rows_per_band,
        )
    )
    cap = F.lit(max_bucket if max_bucket is not None else (1 << 62))
    per = both.groupBy("_band").agg(
        F.count("*").alias("n"), F.countDistinct(id_col).alias("docs")
    )
    return per.agg(
        F.count("*").alias("buckets"),
        F.sum(F.when(F.col("n") > cap, 1).otherwise(0)).cast("long").alias("dropped_buckets"),
        F.sum(F.when(F.col("n") > cap, F.col("docs")).otherwise(0))
        .cast("long")
        .alias("docs_in_dropped"),
    )


def write_dedup_index_table(
    docs: DataFrame,
    table: str,
    nbuckets: int = 8,
    mode: str = "overwrite",
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
) -> None:
    """The repeated-delta scale layout: the BANDED index (id, sig, _band)
    as a Spark bucketed table, bucketed AND sorted by the band key. Every
    subsequent delta join reads the corpus side pre-partitioned on the
    join key — only the delta shuffles (plan-asserted in
    tests/test_dedup_index.py), the same exchange-elision mechanics as the
    engine's conv_id-bucketed scan. ``mode="append"`` is the daily-delta
    maintenance path (Spark appends per-bucket files; the bucket spec is
    preserved). Unlike the path-based index there is no manifest: the
    catalog owns the table, and a params mismatch is caller error — keep
    (w, num_hashes, bands, rows_per_band) with the table name."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    banded = _banded(
        build_dedup_index(docs, text_col, id_col, w, num_hashes),
        id_col,
        bands,
        rows_per_band,
    )
    (
        banded.write.bucketBy(nbuckets, "_band")
        .sortBy("_band")
        .mode(mode)
        .saveAsTable(table)
    )


def _table_num_buckets(spark: SparkSession, table: str) -> int | None:
    """Bucket count of ``table`` via the public DESCRIBE FORMATTED
    surface (no planner internals); None when not discoverable — callers
    then leave the exchange placement to the planner (correct, one
    avoidable delta re-shuffle)."""
    try:
        row = (
            spark.sql(f"DESCRIBE FORMATTED {table}")
            .where(F.col("col_name") == "Num Buckets")
            .first()
        )
        return int(row["data_type"]) if row is not None else None
    except Exception:
        return None


def dedup_index_table_candidates(
    spark: SparkSession,
    table: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = 1000,
    min_est: float | None = None,
) -> DataFrame:
    """dedup_index_candidates over the bucketed banded table: identical
    output (tested), corpus side exchange-free. The delta is banded and
    shuffled into the table's bucket partitioning; Spark elides the
    corpus-side Exchange because the scan's HashPartitioning(_band)
    already satisfies the join's distribution.

    ``max_bucket`` (r7 — previously this path alone was uncapped, the one
    quadratic join on a designated 100-TB path): same semantics as
    candidates_from_sigs — pairs whose combined (corpus + delta) band
    membership exceeds the cap are dropped. Each side's membership count
    is a window over its OWN band key: on the corpus side the window's
    required hash distribution is the bucketed scan's, so the exchange
    elision is preserved (plan-asserted — still exactly one _band
    exchange, the delta's), and its sort feeds the join's. Use
    dedup_index_table_bucket_stats to surface what a cap drops."""
    from pyspark.sql import Window

    left = spark.table(table).alias("l")
    right = _banded(
        build_dedup_index(new_docs, text_col, id_col, w, num_hashes),
        id_col,
        bands,
        rows_per_band,
    ).alias("r")
    if max_bucket is not None:
        win = Window.partitionBy("_band")
        left = left.withColumn("_ln", F.count("*").over(win)).alias("l")
        # pre-shuffle the delta into the TABLE'S bucket count before its
        # window: the window would otherwise exchange to
        # spark.sql.shuffle.partitions and the join would re-exchange to
        # the bucket count — two delta shuffles instead of one
        nbuckets = _table_num_buckets(spark, table)
        if nbuckets is not None:
            right = right.repartition(nbuckets, "_band").alias("r")
        right = right.withColumn("_rn", F.count("*").over(win)).alias("r")
    joined = left.join(
        right,
        (F.col("l._band") == F.col("r._band"))
        & (F.col(f"l.{id_col}") != F.col(f"r.{id_col}")),
    )
    if max_bucket is not None:
        joined = joined.where(F.col("_ln") + F.col("_rn") <= max_bucket)
    est = sig_est_jaccard(F.col("l.sig"), F.col("r.sig"))
    out = joined.select(
        F.col(f"l.{id_col}").alias("a"),
        F.col(f"r.{id_col}").alias("b"),
        est.alias("est_jaccard"),
    ).distinct()
    if min_est is not None:
        out = out.where(F.col("est_jaccard") >= F.lit(float(min_est)))
    return out


def dedup_index_table_bucket_stats(
    spark: SparkSession,
    table: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """'No silent caps' companion for the bucketed-table path: one row
    with the joint (table + delta) bucket count, over-cap bucket count,
    and ids touching a dropped bucket — the table twin of
    dedup_index_bucket_stats, using the table's stored _band directly."""
    both = spark.table(table).select(id_col, "_band").unionByName(
        _banded(
            build_dedup_index(new_docs, text_col, id_col, w, num_hashes),
            id_col,
            bands,
            rows_per_band,
        ).select(id_col, "_band")
    )
    cap = F.lit(max_bucket if max_bucket is not None else (1 << 62))
    per = both.groupBy("_band").agg(
        F.count("*").alias("n"), F.countDistinct(id_col).alias("docs")
    )
    return per.agg(
        F.count("*").alias("buckets"),
        F.sum(F.when(F.col("n") > cap, 1).otherwise(0)).cast("long").alias("dropped_buckets"),
        F.sum(F.when(F.col("n") > cap, F.col("docs")).otherwise(0))
        .cast("long")
        .alias("docs_in_dropped"),
    )
