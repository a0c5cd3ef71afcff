"""Persistent incremental MinHash dedup index (ops/dedup_index).

Contracts pinned here:
- index-served candidates ≡ from-scratch LSH candidates restricted to
  corpus×delta pairs (the index is a cache, never a semantic change);
- append ≡ rebuild exactly (pure-function hash construction);
- param-mismatch appends/reads are refused loudly (manifest guard);
- a crashed write (data, no manifest) is not a readable index;
- est_jaccard matches the direct signature-agreement computation;
- compaction is row-identical;
- the bucketed-table variant returns identical candidates with ZERO
  corpus-side Exchange in the join plan (the repeated-delta scale shape).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sagan_spark.ops import dedup as D
from sagan_spark.ops import dedup_index as DI

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).select("doc_id", "text")


@pytest.fixture(scope="module")
def corpus(docs):
    return docs.where(F.col("doc_id") % 2 == 0)


@pytest.fixture(scope="module")
def delta(docs):
    return docs.where(F.col("doc_id") % 2 == 1)


@pytest.fixture(scope="module")
def index_path(spark, corpus, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("didx") / "idx")
    DI.write_dedup_index(corpus, p, num_hashes=8)
    return p


def _pairs_set(df):
    return {(r["a"], r["b"], r["est_jaccard"]) for r in df.collect()}


def test_index_candidates_match_from_scratch(spark, docs, corpus, delta, index_path):
    """Index-served corpus×delta candidates == lsh_candidate_pairs on the
    full doc set, restricted to even/odd cross pairs, with est_jaccard
    recomputed from freshly built signatures."""
    idx = DI.read_dedup_index(spark, index_path, num_hashes=8)
    got = DI.dedup_index_candidates(idx, delta, num_hashes=8, max_bucket=None)

    sig = D.minhash_signature(D.shingles(docs), num_hashes=8)
    all_pairs = D.lsh_candidate_pairs(sig, bands=4, rows_per_band=2, max_bucket=None)
    sa = sig.select(F.col("doc_id").alias("a"), F.col("sig").alias("siga"))
    sb = sig.select(F.col("doc_id").alias("b"), F.col("sig").alias("sigb"))
    # lsh_candidate_pairs emits a<b within one set; the index emits
    # (corpus, delta) ordered pairs — normalize to (even, odd)
    cross = (
        all_pairs.where((F.col("a") % 2) != (F.col("b") % 2))
        .select(
            F.when(F.col("a") % 2 == 0, F.col("a")).otherwise(F.col("b")).alias("a"),
            F.when(F.col("a") % 2 == 0, F.col("b")).otherwise(F.col("a")).alias("b"),
        )
        .join(sa, on="a")
        .join(sb, on="b")
        .select("a", "b", DI.sig_est_jaccard(F.col("siga"), F.col("sigb")).alias("est_jaccard"))
    )
    assert _pairs_set(got) == _pairs_set(cross)
    assert got.count() > 0, "fixture produced no cross near-dups — weak test"


def test_est_jaccard_direct(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c", "d"], ["a", "x", "c", "y"])], "s1 array<string>, s2 array<string>"
    )
    assert df.select(DI.sig_est_jaccard("s1", "s2").alias("e")).first()["e"] == 0.5


def test_append_equals_rebuild(spark, docs, corpus, tmp_path):
    """Write evens ≡ (write doc_id%4==0) + (append doc_id%4==2)."""
    inc = str(tmp_path / "inc")
    DI.write_dedup_index(corpus.where(F.col("doc_id") % 4 == 0), inc, num_hashes=8)
    DI.append_to_dedup_index(corpus.where(F.col("doc_id") % 4 == 2), inc, num_hashes=8)
    full = str(tmp_path / "full")
    DI.write_dedup_index(corpus, full, num_hashes=8)
    a = {tuple([r["doc_id"], tuple(r["sig"])]) for r in spark.read.parquet(inc).collect()}
    b = {tuple([r["doc_id"], tuple(r["sig"])]) for r in spark.read.parquet(full).collect()}
    assert a == b


def test_param_mismatch_refused(spark, corpus, delta, index_path):
    with pytest.raises(ValueError, match="num_hashes=8"):
        DI.append_to_dedup_index(delta, index_path, num_hashes=4)
    with pytest.raises(ValueError, match="mixed hash spaces"):
        DI.read_dedup_index(spark, index_path, num_hashes=4)


def test_crashed_write_not_readable(spark, corpus, tmp_path):
    """Data files without the manifest (crash before the last step) must
    not read back as a valid index."""
    p = str(tmp_path / "crashed")
    DI.build_dedup_index(corpus).write.parquet(p)
    with pytest.raises(FileNotFoundError, match="interrupted"):
        DI.read_dedup_index(spark, p)


def test_compact_row_identical(spark, corpus, index_path, tmp_path):
    dst = str(tmp_path / "compacted")
    DI.compact_dedup_index(spark, index_path, dst, num_files=2)
    a = {tuple([r["doc_id"], tuple(r["sig"])]) for r in spark.read.parquet(index_path).collect()}
    b = {tuple([r["doc_id"], tuple(r["sig"])]) for r in spark.read.parquet(dst).collect()}
    assert a == b
    files = [f for f in __import__("os").listdir(dst) if f.endswith(".parquet")]
    assert len(files) <= 2
    # manifest travels with the compacted copy
    DI.read_dedup_index(spark, dst, num_hashes=8)


def test_bucket_cap_consistent(spark):
    """The cap drops a degenerate joint bucket: 3 identical corpus docs +
    1 identical delta doc share every band (combined bucket size 4), so
    cap=3 eliminates all cross pairs; the stats row accounts for every
    dropped bucket (no silent caps)."""
    boiler = "the same boilerplate text repeated again and again for caps"
    rows = [(i, boiler) for i in (0, 2, 4)] + [(6, "something entirely different here ok")]
    corp = spark.createDataFrame(rows, "doc_id long, text string")
    dlt = spark.createDataFrame([(1, boiler)], "doc_id long, text string")
    idx = DI.build_dedup_index(corp, num_hashes=8)
    uncapped = DI.dedup_index_candidates(idx, dlt, num_hashes=8, max_bucket=None)
    capped = DI.dedup_index_candidates(idx, dlt, num_hashes=8, max_bucket=3)
    stats = DI.dedup_index_bucket_stats(idx, dlt, num_hashes=8, max_bucket=3).first()
    assert uncapped.count() == 3  # each boilerplate corpus doc pairs the delta doc
    assert capped.count() == 0
    assert stats["dropped_buckets"] == 4  # all 4 bands of the boilerplate bucket
    # per-bucket distinct docs, summed over dropped buckets (the
    # lsh_bucket_stats convention): 4 docs in each of the 4 bands
    assert stats["docs_in_dropped"] == 16
    assert _pairs_set(capped) <= _pairs_set(uncapped)


def test_bucketed_table_cap_matches_path_index(spark):
    """r7: the bucketed-table join gets the same max_bucket cap as the
    path index (it was the one uncapped join on a designated 100-TB
    path). Capped table-path candidates ≡ capped path-index candidates at
    equal params on a forced-hot bucket, the at-cap family still pairs,
    and the table stats companion accounts for the drops."""
    boiler = "the same boilerplate text repeated again and again for caps"
    rare = "rare near duplicate sentence about exchange reuse"
    rows = [(i, boiler) for i in (0, 2, 4)] + [(10, rare)]
    corp = spark.createDataFrame(rows, "doc_id long, text string")
    dlt = spark.createDataFrame(
        [(1, boiler), (11, rare)], "doc_id long, text string"
    )
    spark.sql("DROP TABLE IF EXISTS didx_cap_test")
    try:
        DI.write_dedup_index_table(corp, "didx_cap_test", nbuckets=2, num_hashes=8)
        idx = DI.build_dedup_index(corp, num_hashes=8)
        for cap in (None, 3):
            got = DI.dedup_index_table_candidates(
                spark, "didx_cap_test", dlt, num_hashes=8, max_bucket=cap
            )
            want = DI.dedup_index_candidates(idx, dlt, num_hashes=8, max_bucket=cap)
            assert _pairs_set(got) == _pairs_set(want), cap
        capped = DI.dedup_index_table_candidates(
            spark, "didx_cap_test", dlt, num_hashes=8, max_bucket=3
        )
        pairs = {(r["a"], r["b"]) for r in capped.collect()}
        # boilerplate bucket (combined size 4 > 3) dropped; the rare
        # 2-doc family (combined size 2 ≤ 3) survives
        assert pairs == {(10, 11)}
        stats = DI.dedup_index_table_bucket_stats(
            spark, "didx_cap_test", dlt, num_hashes=8, max_bucket=3
        ).first()
        assert stats["dropped_buckets"] == 4  # all 4 bands of the boilerplate
        assert stats["docs_in_dropped"] == 16
        # the capped plan must keep the scale shape: corpus side (window
        # included) exchange-free, exactly one _band exchange (the delta's)
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            smj = DI.dedup_index_table_candidates(
                spark, "didx_cap_test", dlt, num_hashes=8, max_bucket=3
            )
            smj.collect()
            plan = smj._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        plan = plan.split("== Initial Plan ==")[0]
        assert "Bucketed: true" in plan, plan
        assert plan.count("Exchange hashpartitioning(_band") == 1, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS didx_cap_test")


def test_min_est_filters(spark, delta, index_path):
    idx = DI.read_dedup_index(spark, index_path, num_hashes=8)
    allp = DI.dedup_index_candidates(idx, delta, num_hashes=8, max_bucket=None)
    hi = DI.dedup_index_candidates(idx, delta, num_hashes=8, max_bucket=None, min_est=0.99)
    assert hi.count() <= allp.count()
    assert hi.where(F.col("est_jaccard") < 0.99).count() == 0


def test_bucketed_table_variant(spark, corpus, delta):
    """Same candidates as the path index; corpus side exchange-free —
    the only Exchange on the banded join's corpus input would be
    hashpartitioning(_band...); the bucketed scan must elide it."""
    spark.sql("DROP TABLE IF EXISTS didx_tbl_test")
    try:
        DI.write_dedup_index_table(
            corpus.where(F.col("doc_id") % 4 == 0), "didx_tbl_test", nbuckets=4, num_hashes=8
        )
        DI.write_dedup_index_table(
            corpus.where(F.col("doc_id") % 4 == 2),
            "didx_tbl_test",
            nbuckets=4,
            mode="append",
            num_hashes=8,
        )
        got = DI.dedup_index_table_candidates(
            spark, "didx_tbl_test", delta, num_hashes=8
        )
        idx = DI.build_dedup_index(corpus, num_hashes=8)
        want = DI.dedup_index_candidates(idx, delta, num_hashes=8, max_bucket=None)
        assert _pairs_set(got) == _pairs_set(want)
        # Plan shape at the size where it matters: with a test-sized delta
        # AQE (rightly) broadcasts it — zero exchanges anywhere. Disable
        # broadcast to force the production shuffle join and pin that the
        # corpus side STILL never shuffles: exactly one _band exchange
        # (the delta's), against a Bucketed: true corpus scan.
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            smj = DI.dedup_index_table_candidates(
                spark, "didx_tbl_test", delta, num_hashes=8
            )
            smj.collect()  # AQE finalizes the executed plan
            plan = smj._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        # the AQE dump appends the pre-adaptive "Initial Plan" — count
        # exchanges only in the final executed section
        plan = plan.split("== Initial Plan ==")[0]
        assert "Bucketed: true" in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert plan.count("Exchange hashpartitioning(_band") == 1, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS didx_tbl_test")


def test_table_mode_validated(spark, corpus):
    with pytest.raises(ValueError, match="overwrite|append"):
        DI.write_dedup_index_table(corpus, "didx_bad", mode="replace")
