"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full Sagan-style parse→enrich→correlate→
route pipeline run over a transcript view synthesized from the sf0.001
``events`` table (the S2 JSON-lines input-mapping operator feeding E1).

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data ops (dedup / similarity / text
analysis / multimodal). Every aggregate/computed column is aliased
identically in the Spark code and the SQL so the driver's sorted-column
value-hash comparison lines up.

Cross-engine notes (Spark vs DuckDB): float aggregates are rounded
(summation order differs in the last ulp); DuckDB integer sums are cast
to BIGINT (it widens to HUGEINT); time buckets are emitted as formatted
strings; regexes stick to the common Java/RE2 subset.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sagan_spark.ops import dedup as D
from sagan_spark.ops import multimodal as MM
from sagan_spark.ops import similarity as SIM
from sagan_spark.ops import text as T

# ANN LSH parameters shared by the Spark query and its SQL oracle (the
# seeded hyperplanes are inlined into the oracle as double literals)
ANN_NBITS = 16
ANN_RADIUS = 6


def _t(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    spread: bool = False,
    spread_min_bytes: int | None = None,
) -> DataFrame:
    """Read one sf table. ``spread=True`` applies the guide's
    unsplittable-input fix: the sf tables are single-file parquet with
    1-6 row groups, so a bare scan — and every narrow stage on top of it
    (regex batteries, JSON extraction, per-row vector math) — runs in
    1-6 tasks regardless of cores (parquet splits at row-group
    granularity). Queries whose pre-exchange per-row work is heavy opt in
    and get a repartition right after the read; queries whose first
    exchange arrives cheaply (plain aggregates, window functions) keep
    the bare scan — for them the extra shuffle only adds cost (measured
    both ways at sf0.1/sf1.0, see OPTIMIZATION_r07.md). The repartition
    only fires when the scan has fewer splits than cores, so at
    production scale (thousands of splits) it is a no-op.

    ``spread_min_bytes``: call sites whose per-row work sits near the
    spread break-even additionally gate on the optimizer-estimated input
    size (the events JSON legs: repartition wins 1.6× at 10× table size
    but loses ~0.2s at sf0.1 — measured both ways); None keeps the
    unconditional behavior for sites that win at every size."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if spread:
        p = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < p:
            if spread_min_bytes is not None:
                from sagan_spark.ops.dedup import _est_size_bytes

                sz = _est_size_bytes(df)
                if sz is not None and sz < spread_min_bytes:
                    return df
            df = df.repartition(p)
    return df


def events_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S3: JSON-lines input + field mapping ([PUB src/input-json.c]) —
    map the events table onto the transcript input contract.

    spread=True (size-gated): the JSON k-extraction is heavy per-row work
    that runs BEFORE the turn-index window's exchange — on the
    single-row-group events file that serializes onto one core (measured
    at 10× table size: spread 2.1s vs 3.3s unspread; at sf0.1 the
    repartition loses ~0.2s, hence the byte gate).

    r7 plan shape: ``k`` is parsed from props ONCE in a projection below
    the window and ``props`` is dropped there — the old shape evaluated
    get_json_object up to four times per row (each use inside a when()
    branch defeats subexpression elimination) and shipped the whole JSON
    string through the window exchange. Output rows identical
    (exceptAll-checked both ways at both scales)."""
    ev = _t(spark, sf_dir, "events", spread=True, spread_min_bytes=4 << 20)
    ev = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("_k"),
    )
    role = (
        F.when(F.col("event_type") == "view", "user")
        .when(F.col("event_type") == "click", "tool")
        .when(F.col("event_type") == "purchase", "system")
        .when(F.col("event_type") == "signup", "assistant")
        .otherwise("assistant")
    )
    tool = (
        F.when(F.col("event_type") == "click", "browser")
        .when(F.col("event_type") == "error", "bash")
        .otherwise("none")
    )
    k = F.col("_k")
    text = F.concat(
        F.lit("event "),
        F.col("event_type"),
        F.lit(" code="),
        (k * 6).cast("string"),
        F.when(F.col("event_type") == "error", F.lit(" an error occurred: tool timeout")).otherwise(
            F.lit("")
        ),
        # click events carry a parseable endpoint (P10/P11 token rules)
        F.when(
            F.col("event_type") == "click",
            F.concat(
                F.lit(" connection from 10.0."),
                F.pmod(k, F.lit(256)).cast("string"),
                F.lit("."),
                F.pmod(F.col("user_id"), F.lit(256)).cast("string"),
                F.lit(" port "),
                (F.lit(1024) + k).cast("string"),
                F.lit(" proto tcp"),
            ),
        ).otherwise(F.lit("")),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.concat(F.lit("conv"), F.lpad(F.col("user_id").cast("string"), 8, "0")).alias(
                "conv_id"
            ),
            (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
            role.alias("role"),
            text.alias("text"),
            tool.alias("tool"),
            F.col("ts").cast("timestamp_ntz").alias("ts"),
        )
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sagan_spark.engine.pipeline import build_alerts

    tx = events_as_transcripts(spark, "/root/testdata/sf0.001")
    alerts = build_alerts(spark, tx)
    return alerts.select(
        "conv_id", "turn_idx", "role", "tool", "ts", "sid", "msg", "rule_class", "sink", "text"
    )


# ---------------------------------------------------------------------------
# queries(): (spark, sf_dir) -> DataFrame, one per SURVEY §2 operator row
# ---------------------------------------------------------------------------


def q_content_filter(spark, sf):  # P3 content
    d = _t(spark, sf, "documents")
    return (
        d.where(F.col("text").contains("slow"))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )


def q_content_nocase(spark, sf):  # P4 nocase
    d = _t(spark, sf, "documents")
    return (
        d.where(F.lower(F.col("text")).contains("fast"))
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )


def q_content_offset_depth(spark, sf):  # P5 offset/depth region
    d = _t(spark, sf, "documents")
    return (
        d.where(F.substring("text", 1, 50).contains("data"))
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )


def q_content_negated(spark, sf):  # P7 !content
    d = _t(spark, sf, "documents")
    return (
        d.where(~F.col("text").contains("join"))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )


def q_pcre_match(spark, sf):  # P8 pcre
    d = _t(spark, sf, "documents")
    return (
        d.where(F.col("text").rlike("(join|window) .*agg"))
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )


def q_meta_content(spark, sf):  # P9 meta_content alternation
    d = _t(spark, sf, "documents")
    return (
        d.where(F.col("text").rlike("(scan|filter|shuffle)"))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )


def q_grok_extract(spark, sf):  # P13 named-group extraction
    e = _t(spark, sf, "events", spread=True, spread_min_bytes=4 << 20)
    return (
        e.select(F.regexp_extract("props", '"k": ([0-9]+)', 1).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )


def q_parse_tokens_numeric(spark, sf):  # P10-P12 positional extraction family
    d = _t(spark, sf, "documents", spread=True)
    return d.select(
        F.sum(F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0))).cast("long").alias(
            "numeric_tokens"
        ),
        F.count("*").alias("docs"),
    )


def q_alert_time(spark, sf):  # P15 aetas hour gate
    e = _t(spark, sf, "events")
    return (
        e.where(F.hour("ts").between(8, 18))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


def q_geoip_join(spark, sf):  # J1 broadcast dim join chain
    c, n, r = (_t(spark, sf, x) for x in ("customer", "nation", "region"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n"), F.round(F.avg("c_acctbal"), 4).alias("avg_bal"))
    )


def q_cidr_range_join(spark, sf):  # J2 range join — bucketed equi-join form
    # (BroadcastHashJoin on a derived bucket key, not per-row BNLJ: at
    # 100 TB the nested-loop's row×range cost dominates; see
    # engine/enrich.bucketed_range_join)
    from sagan_spark.engine.enrich import bucketed_range_join

    li = _t(spark, sf, "lineitem")
    rng = spark.createDataFrame(
        [(0.0, 10.0, "low"), (10.0, 25.0, "mid"), (25.0, 60.0, "high")],
        "lo double, hi double, tag string",
    )
    return (
        bucketed_range_join(li, rng, "l_quantity", bucket_width=5.0)
        .groupBy("tag")
        .agg(F.count("*").alias("n"))
    )


def q_intel_semi_join(spark, sf):  # J4 left-semi indicator match
    o = _t(spark, sf, "orders")
    rich = _t(spark, sf, "customer").where(F.col("c_acctbal") > 9000).select("c_custkey")
    return (
        o.join(rich, o.o_custkey == rich.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


def q_anti_join(spark, sf):  # isnotset analogue: left-anti (non-vacuous:
    # "customers with no OPEN order" — every customer has SOME order, so the
    # round-1 all-orders variant proved nothing on 0 rows)
    c = _t(spark, sf, "customer")
    o = (
        _t(spark, sf, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select("o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )


def q_asof_flexbit(spark, sf):  # J5/C3 as-of lookup via window
    e = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_signup = F.last(
        F.when(F.col("event_type") == "signup", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        e.withColumn("prev_signup", last_signup)
        .where((F.col("event_type") == "purchase") & F.col("prev_signup").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )


def q_after_sliding(spark, sf):  # C1 sliding-window variant (SQL-checkable)
    # window/threshold sized so sf0.01 produces rows (cnt>3/600s was vacuous)
    e = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-1800, 0)
    )
    return (
        e.withColumn("cnt", F.count(F.lit(1)).over(w))
        .where(F.col("cnt") > 2)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )


def q_threshold_limit(spark, sf):  # C2 limit-style: first 2 per (user, day)
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id", F.date_format("ts", "yyyy-MM-dd")).orderBy(
        "ts", "event_id"
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


def q_track_clients(spark, sf):  # C6 gone-silent detection
    e = _t(spark, sf, "events")
    horizon = e.select(F.max("ts").alias("m"))
    return (
        e.groupBy("user_id")
        .agg(F.max("ts").alias("last_seen"))
        .join(F.broadcast(horizon))
        .where(F.col("last_seen") < F.col("m") - F.expr("INTERVAL 7 DAYS"))
        .select(F.count("*").alias("silent_users"))
    )


def q_hit_counters(spark, sf):  # A1 per-rule counters
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(F.count("*").alias("n"))


def q_sink_rollup(spark, sf):  # A2 rollup counts
    e = _t(spark, sf, "events")
    return e.rollup("event_type").agg(F.count("*").alias("n"))


def q_interval_stats(spark, sf):  # A3 tumbling interval stats
    e = _t(spark, sf, "events")
    return (
        e.groupBy(F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("bucket"))
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


def q_distinct_clients(spark, sf):  # A4 distinct tracking (exact for oracle)
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(F.countDistinct("user_id").alias("users"))


def q_topk(spark, sf):  # top-k report
    p = _t(spark, sf, "part")
    return (
        p.orderBy(F.desc("p_retailprice"), "p_partkey")
        .select("p_partkey", "p_name", "p_retailprice")
        .limit(10)
    )


def q_union_merge(spark, sf):  # per-rule alert stream merge
    e = _t(spark, sf, "events")
    a = e.where(F.col("event_type") == "error").select("event_id")
    b = e.where(F.col("value") > 90).select("event_id")
    return a.unionByName(b).distinct().select(F.count("*").alias("n"))


def q_json_extract(spark, sf):  # S2 JSON field mapping
    e = _t(spark, sf, "events", spread=True, spread_min_bytes=4 << 20)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(F.round(F.avg(k), 4).alias("avg_k"), F.sum(k).cast("long").alias("sum_k"))
    )


def q_session_windows(spark, sf):  # §2.7 session_window sessionization
    e = _t(spark, sf, "events")
    sw = e.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
        F.count("*").alias("events_in_session")
    )
    return sw.groupBy("user_id").agg(
        F.count("*").alias("sessions"),
        F.sum("events_in_session").cast("long").alias("events"),
    )


def q_tpch_q1(spark, sf):  # pricing summary (agg coverage)
    li = _t(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_tpch_q5ish(spark, sf):  # multi-join revenue per nation
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    n = _t(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# ---- training-data ops ----------------------------------------------------


def q_dedup_exact(spark, sf):
    d = _t(spark, sf, "documents")
    return D.exact_dedup(d).select(F.count("*").alias("groups"), F.sum("doc_id").cast("long").alias("survivor_id_sum"))


def q_doc_fingerprint(spark, sf):  # normalized + rolling (order-sensitive)
    # fingerprints in one entry (former rolling_fingerprint merged — see
    # q_token_count note on the driver's 50-row window)
    d = _t(spark, sf, "documents", spread=True)
    return d.select(
        T.fingerprint(F.col("text")).alias("fp"),
        T.rolling_fingerprint(F.col("text")).alias("rfp"),
    ).select(
        F.countDistinct("fp").alias("distinct_fp"),
        F.countDistinct("rfp").alias("distinct_rfp"),
        F.sum("rfp").cast("long").alias("rfp_sum"),
    )


def q_token_count(spark, sf):  # whitespace + BPE-ish tokenization, one row set
    # (merged with the former token_count_bpe entry: the driver records at
    # most 50 CORRECTNESS rows, so related operators share an entry — both
    # token counters stay independently exercised and oracle-checked here)
    d = _t(spark, sf, "documents", spread=True)
    return d.groupBy("lang").agg(
        F.sum(T.token_count(F.col("text"))).cast("long").alias("tokens"),
        F.sum(T.token_count_bpe(F.col("text"))).cast("long").alias("tokens_bpe"),
        F.count("*").alias("docs"),
    )


def q_quality_battery(spark, sf):  # length/punct/stopword quality ratios
    # + the scalar quality_score (former quality_score entry, merged — see
    # q_token_count note on the driver's 50-row window)
    d = _t(spark, sf, "documents", spread=True)
    return d.groupBy("source").agg(
        F.round(F.avg(T.alpha_ratio(F.col("text"))), 4).alias("avg_alpha"),
        F.round(F.avg(T.punct_ratio(F.col("text"))), 4).alias("avg_punct"),
        F.round(F.avg(T.stopword_ratio(F.col("text"))), 4).alias("avg_stop"),
        F.round(F.avg(T.quality_score(F.col("text"))), 4).alias("avg_quality"),
    )


def q_lang_id(spark, sf):
    d = _t(spark, sf, "documents", spread=True)
    return d.groupBy(T.lang_guess(F.col("text")).alias("predicted")).agg(
        F.count("*").alias("n")
    )


def q_minhash_signature(spark, sf):
    d = _t(spark, sf, "documents")
    sig = D.minhash_signature(D.shingles(d), num_hashes=4)
    return sig.select(
        F.countDistinct(F.element_at("sig", 1)).alias("distinct_h0"),
        F.count("*").alias("docs"),
    )


def q_minhash_lsh_dups(spark, sf):
    # Two related operators share this entry (50-entry driver window):
    # uncapped candidate-pair count + the cap observability row.
    # max_bucket=None EXPLICITLY on the pair count: the DuckDB oracle
    # computes uncapped band-bucket pairs, so inheriting the capped
    # default would silently break query↔oracle parity at any sf where a
    # bucket exceeds the cap; capped behavior is oracle-checked by the
    # bucket-stats columns (cap=2 so sf0.01's max bucket of 3 actually
    # drops something — non-vacuous).
    d = _t(spark, sf, "documents")
    sig = D.minhash_signature(D.shingles(d), num_hashes=8)
    pairs = D.lsh_candidate_pairs(sig, bands=4, rows_per_band=2, max_bucket=None)
    stats = D.lsh_bucket_stats(sig, bands=4, rows_per_band=2, max_bucket=2)
    return pairs.select(F.count("*").alias("candidate_pairs")).crossJoin(stats)


def q_ngram_jaccard(spark, sf):
    d = _t(spark, sf, "documents").where(F.col("doc_id") < 200)
    sh = D.shingles(d)
    sig = D.minhash_signature(sh, num_hashes=8)
    pairs = D.lsh_candidate_pairs(sig, bands=4, rows_per_band=2, max_bucket=None)
    jac = D.ngram_jaccard(sh, pairs)
    return jac.select(
        F.count("*").alias("pairs"),
        F.coalesce(F.round(F.sum("jaccard"), 2), F.lit(0.0)).alias("jaccard_sum"),
    )


def q_embedding_near_dups(spark, sf):  # embedding-cosine near-dup dedup
    emb = _t(spark, sf, "embeddings", spread=True)
    pairs = D.embedding_near_dups(emb, threshold=0.25, nbits=8)
    return pairs.select(
        F.count("*").alias("pairs"),
        F.coalesce(F.round(F.sum("cos"), 2), F.lit(0.0)).alias("cos_sum"),
    )


def q_simhash_portable(spark, sf):
    # no spread= here: the simhash kernel spreads its own input (and the
    # query-level repartition would only add a second exchange)
    d = _t(spark, sf, "documents")
    return D.simhash_portable(d, bits=16).select(
        F.countDistinct("simhash").alias("distinct_hashes"),
        F.sum("simhash").cast("long").alias("hash_sum"),
        F.count("*").alias("docs"),
    )


def q_ann_threshold(spark, sf):
    # ann legs deliberately do NOT spread (r7, measured both scales): the
    # per-row work (a cosine / a few sig dots over 2k-20k vectors) is too
    # small to repay the repartition — sf0.1 A/B: brute 0.17 bare vs 0.22
    # spread, norms 0.13 vs 0.21, lsh/ivf a wash; sf1.0 was window noise
    # either way. embedding_near_dups keeps spread (bucket join + full
    # pair cosines — measured 2.7x at sf0.1, 12x at sf1.0).
    emb = _t(spark, sf, "embeddings")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    sim = SIM.cosine(F.col("embedding"), SIM._qlit(q))
    return (
        emb.where(F.col("vec_id") != 0)
        .groupBy("label")
        .agg(F.sum(F.when(sim > 0.2, 1).otherwise(0)).cast("long").alias("close_vecs"))
    )


def q_ann_brute_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    return SIM.brute_topk(emb.where(F.col("vec_id") != 0), q, k=10)


def q_ann_lsh_topk(spark, sf):  # scale path; oracle inlines the seeded planes
    emb = _t(spark, sf, "embeddings")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    return SIM.lsh_bucketed_topk(
        emb.where(F.col("vec_id") != 0), q, k=10, nbits=ANN_NBITS, radius=ANN_RADIUS
    )


def _scratch_dir(sf: str, name: str) -> str:
    """Deterministic per-(uid, sf) scratch path for written-index entries:
    overwrite-mode writers reuse ONE directory across driver runs instead
    of leaking a fresh mkdtemp per invocation. The per-uid mode-0700
    parent keeps the otherwise world-predictable /tmp name unsquattable
    and two users' concurrent runs disjoint (two drivers of the SAME uid
    on the same sf remain a documented serialize-yourself constraint, as
    with any shared index path)."""
    import re
    import tempfile

    sf_tag = re.sub(r"[^A-Za-z0-9._-]", "_", sf.rstrip("/").rsplit("/", 1)[-1])
    parent = os.path.join(tempfile.gettempdir(), f"sagan_scratch_u{os.getuid()}")
    os.makedirs(parent, mode=0o700, exist_ok=True)
    if os.path.islink(parent) or os.stat(parent).st_uid != os.getuid():
        raise RuntimeError(f"scratch dir {parent} squatted (symlink/foreign owner)")
    os.chmod(parent, 0o700)  # exist_ok=True skips mode on a pre-existing dir
    return os.path.join(parent, f"{name}_{sf_tag}", "idx")


def q_ann_lsh_index_topk(spark, sf):  # repeated-query scale path: the
    # signature is MATERIALIZED once into a written, partitioned index and
    # the query is a probe-enumeration IN filter — no per-query signature
    # scan. The index is built here via write + APPEND (half the corpus
    # each) so the driver's correctness gate also covers incremental index
    # maintenance: append ≡ rebuild exactly (hyperplanes are a pure
    # function of (dim, nbits) — equality-tested in tests/test_ops.py),
    # so the same SQL oracle applies. nbits=8 keeps the probe ball a
    # meaningful fraction of the small test corpus; plan pruning
    # (PartitionFilters + In(_sig) pushdown) is asserted in tests.
    emb = _t(spark, sf, "embeddings")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    rest = emb.where(F.col("vec_id") != 0)
    path = _scratch_dir(sf, "lsh_idx_nb8")
    SIM.write_lsh_index(rest.where(F.col("vec_id") % 2 == 0), path, dim=len(q), nbits=8)
    SIM.append_to_lsh_index(rest.where(F.col("vec_id") % 2 == 1), path, dim=len(q), nbits=8)
    return SIM.lsh_index_topk(spark.read.parquet(path), q, k=10, nbits=8, radius=2)


def q_ann_ivf_topk(spark, sf):  # centroid sample is md5-portable → SQL oracle
    emb = _t(spark, sf, "embeddings")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    return SIM.ivf_topk(
        emb.where(F.col("vec_id") != 0), q, k=10, ncentroids=8, nprobe=2
    )


def q_embedding_norms(spark, sf):
    emb = _t(spark, sf, "embeddings")
    return emb.groupBy("label").agg(
        F.round(F.avg(SIM.norm(F.col("embedding"))), 4).alias("avg_norm"),
        F.count("*").alias("n"),
    )


def q_multimodal_stats(spark, sf):
    d = _t(spark, sf, "documents")
    return MM.media_stats(MM.synthesize_media(d))


def q_multimodal_features(spark, sf):  # mapInPandas feature stage.
    # Image width/height come from REAL byte-level PNG header parsing
    # (ops/multimodal.parse_image_header) and are oracle-checked against
    # the datagen formula — the parse must read the exact IHDR bytes to go
    # green; audio/video dimensions are the documented stub. Checksums are
    # checked as distinct-counts (DuckDB md5 can't take BLOBs, but distinct
    # md5(payload) == distinct payload-hex).
    d = _t(spark, sf, "documents")
    feats = MM.extract_features(MM.synthesize_media(d))
    return feats.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").cast("long").alias("bytes_sum"),
        F.countDistinct("checksum").alias("distinct_checksums"),
        F.sum("width").cast("long").alias("width_sum"),
        F.sum("height").cast("long").alias("height_sum"),
    )


# stateless canonical sids whose predicates are expressible over the mapped
# events in ANSI SQL (1000009 needs crc32, which DuckDB lacks; stateful
# sids 1000010-13 need ordered replay — both stay covered by the pytest
# differential suite and entry()).
_SQLABLE_SIDS = (1000001, 1000005, 1000007, 1000014)


def q_multimodal_frames(spark, sf):  # 1→k frame-sampling explosion
    d = _t(spark, sf, "documents")
    frames = MM.sample_frames(MM.synthesize_media(d), n_frames=4)
    return frames.groupBy("frame_idx").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").cast("long").alias("bytes_sum"),
    )


def q_multimodal_resize(spark, sf):  # pure-Column payload rewrite
    d = _t(spark, sf, "documents")
    resized = MM.resize_media(MM.synthesize_media(d), max_bytes=64)
    return resized.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").cast("long").alias("bytes_sum"),
        F.countDistinct(F.md5("payload")).alias("distinct_payloads"),
    )


def q_pipeline_sink_counts(spark, sf):  # E1 on mapped events, oracle-checked
    from sagan_spark.engine.pipeline import build_alerts
    from sagan_spark.rules.canonical import CANONICAL
    from sagan_spark.rules.model import RuleSet

    subset = RuleSet(tuple(r for r in CANONICAL.rules if r.sid in _SQLABLE_SIDS))
    tx = events_as_transcripts(spark, sf)
    alerts = build_alerts(spark, tx, ruleset=subset)
    return alerts.groupBy("sid").agg(F.count("*").alias("n"))


def q_parse_tokens_rule(spark, sf):  # P10/P11 rule keywords end-to-end:
    # parse_src_ip/parse_port/parse_proto extract into the alert map
    from sagan_spark.engine.pipeline import build_alerts
    from sagan_spark.rules.canonical import CANONICAL
    from sagan_spark.rules.model import RuleSet

    subset = RuleSet(tuple(r for r in CANONICAL.rules if r.sid == 1000014))
    tx = events_as_transcripts(spark, sf)
    alerts = build_alerts(spark, tx, ruleset=subset)
    return alerts.select(
        F.col("extracted")["src_ip"].alias("src_ip"),
        F.col("extracted")["port"].cast("int").alias("port"),
        F.col("extracted")["proto"].alias("proto"),
    ).groupBy("proto").agg(
        F.count("*").alias("n"),
        F.countDistinct("src_ip").alias("distinct_ips"),
        F.max("port").alias("max_port"),
    )


def q_dedup_index_incremental(spark, sf):
    # Persistent incremental MinHash dedup index (ops/dedup_index): sign
    # half the corpus, APPEND the other half (manifest-guarded
    # pure-function construction — append ≡ rebuild, tested), then dedup
    # the odd-doc delta against the STORED index. Corpus text is never
    # re-read at query time; est_jaccard comes from the signatures alone.
    # The oracle recomputes everything from scratch — index-served must
    # equal from-scratch exactly.
    from sagan_spark.ops import dedup_index as DIX

    d = _t(spark, sf, "documents")
    corpus = d.where(F.col("doc_id") % 2 == 0)
    delta = d.where(F.col("doc_id") % 2 == 1)
    path = _scratch_dir(sf, "dedup_idx_nh8")
    DIX.write_dedup_index(corpus.where(F.col("doc_id") % 4 == 0), path, num_hashes=8)
    DIX.append_to_dedup_index(corpus.where(F.col("doc_id") % 4 == 2), path, num_hashes=8)
    idx = DIX.read_dedup_index(spark, path, num_hashes=8)
    pairs = DIX.dedup_index_candidates(idx, delta, num_hashes=8, max_bucket=None)
    return pairs.select(
        F.count("*").alias("cross_pairs"),
        F.coalesce(F.round(F.sum("est_jaccard"), 2), F.lit(0.0)).alias("est_sum"),
        F.coalesce(
            F.sum(F.when(F.col("est_jaccard") >= 0.5, 1).otherwise(0)).cast("long"),
            F.lit(0).cast("long"),
        ).alias("probable_dups"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NOTE driver behavior (observed r01/r02): CORRECTNESS_r{N}.json records
    # at most the FIRST 50 entries in dict order (r02 registered 52, the
    # last two were silently absent). The two full-pipeline entries — the
    # flagship E1 signal — therefore come FIRST, and the total is kept at
    # ≤50 by merging closely-related operators into shared entries.
    return {
        "pipeline_sink_counts": q_pipeline_sink_counts,
        "parse_tokens_rule": q_parse_tokens_rule,
        "content_filter": q_content_filter,
        "content_nocase": q_content_nocase,
        "content_offset_depth": q_content_offset_depth,
        "content_negated": q_content_negated,
        "pcre_match": q_pcre_match,
        "meta_content": q_meta_content,
        "grok_extract": q_grok_extract,
        "parse_tokens_numeric": q_parse_tokens_numeric,
        "alert_time": q_alert_time,
        "geoip_join": q_geoip_join,
        "cidr_range_join": q_cidr_range_join,
        "intel_semi_join": q_intel_semi_join,
        "anti_join": q_anti_join,
        "asof_flexbit": q_asof_flexbit,
        "after_sliding": q_after_sliding,
        "threshold_limit": q_threshold_limit,
        "track_clients": q_track_clients,
        "hit_counters": q_hit_counters,
        "sink_rollup": q_sink_rollup,
        "interval_stats": q_interval_stats,
        "distinct_clients": q_distinct_clients,
        "topk": q_topk,
        "union_merge": q_union_merge,
        "json_extract": q_json_extract,
        "session_windows": q_session_windows,
        "tpch_q1": q_tpch_q1,
        "tpch_q5ish": q_tpch_q5ish,
        "dedup_exact": q_dedup_exact,
        "doc_fingerprint": q_doc_fingerprint,
        "token_count": q_token_count,
        "quality_battery": q_quality_battery,
        "lang_id": q_lang_id,
        "minhash_signature": q_minhash_signature,
        "minhash_lsh_dups": q_minhash_lsh_dups,
        "dedup_index_incremental": q_dedup_index_incremental,
        "ngram_jaccard": q_ngram_jaccard,
        "embedding_near_dups": q_embedding_near_dups,
        "simhash_portable": q_simhash_portable,
        "ann_threshold": q_ann_threshold,
        "ann_brute_topk": q_ann_brute_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_lsh_index_topk": q_ann_lsh_index_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embedding_norms": q_embedding_norms,
        "multimodal_stats": q_multimodal_stats,
        "multimodal_features": q_multimodal_features,
        "multimodal_frames": q_multimodal_frames,
        "multimodal_resize": q_multimodal_resize,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pipeline_sink_counts": _MAPPED_TX_SQL + """
            SELECT sid, COUNT(*) AS n FROM (
              SELECT CAST(1000001 AS BIGINT) AS sid FROM tx
               WHERE role = 'assistant' AND contains(text, 'error')
                 AND regexp_matches(text, '(?i)tool\\s+timeout')
              UNION ALL
              SELECT CAST(1000005 AS BIGINT) FROM tx
               WHERE regexp_matches(text, 'code=[0-9]+')
                 AND CAST(regexp_extract(text, 'code=([0-9]+)', 1) AS INTEGER) >= 500
              UNION ALL
              SELECT CAST(1000007 AS BIGINT) FROM tx WHERE role IN ('tool', 'system')
              UNION ALL
              SELECT CAST(1000014 AS BIGINT) FROM tx
               WHERE contains(text, 'connection from')
                 AND regexp_matches(text, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')
                 AND regexp_matches(text, '\\bport[ :]\\d{1,5}\\b')
                 AND regexp_matches(text, '(?i)\\b(?:tcp|udp|icmp)\\b')
            ) GROUP BY sid""",
        "parse_tokens_rule": _MAPPED_TX_SQL + """
            SELECT proto, COUNT(*) AS n,
                   COUNT(DISTINCT src_ip) AS distinct_ips,
                   MAX(port) AS max_port
            FROM (
              SELECT regexp_extract(text, '\\b((?:\\d{1,3}\\.){3}\\d{1,3})\\b', 1)
                       AS src_ip,
                     CAST(regexp_extract(text, '\\bport[ :](\\d{1,5})\\b', 1)
                       AS INTEGER) AS port,
                     lower(regexp_extract(text, '(?i)\\b(tcp|udp|icmp)\\b', 1))
                       AS proto
              FROM tx
              WHERE contains(text, 'connection from')
                AND regexp_matches(text, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')
                AND regexp_matches(text, '\\bport[ :]\\d{1,5}\\b')
                AND regexp_matches(text, '(?i)\\b(?:tcp|udp|icmp)\\b')
            ) GROUP BY proto""",
        "content_filter": """
            SELECT source, COUNT(*) AS n FROM documents
            WHERE contains(text, 'slow') GROUP BY source""",
        "content_nocase": """
            SELECT lang, COUNT(*) AS n FROM documents
            WHERE contains(lower(text), 'fast') GROUP BY lang""",
        "content_offset_depth": """
            SELECT lang, COUNT(*) AS n FROM documents
            WHERE contains(substring(text, 1, 50), 'data') GROUP BY lang""",
        "content_negated": """
            SELECT source, COUNT(*) AS n FROM documents
            WHERE NOT contains(text, 'join') GROUP BY source""",
        "pcre_match": """
            SELECT lang, COUNT(*) AS n FROM documents
            WHERE regexp_matches(text, '(join|window) .*agg') GROUP BY lang""",
        "meta_content": """
            SELECT source, COUNT(*) AS n FROM documents
            WHERE regexp_matches(text, '(scan|filter|shuffle)') GROUP BY source""",
        "grok_extract": """
            SELECT regexp_extract(props, '"k": ([0-9]+)', 1) AS k, COUNT(*) AS n
            FROM events GROUP BY k""",
        "parse_tokens_numeric": """
            SELECT CAST(SUM(len(regexp_extract_all(text, '[0-9]+'))) AS BIGINT)
                     AS numeric_tokens,
                   COUNT(*) AS docs
            FROM documents""",
        "alert_time": """
            SELECT event_type, COUNT(*) AS n FROM events
            WHERE hour(ts) BETWEEN 8 AND 18 GROUP BY event_type""",
        "geoip_join": """
            SELECT r_name, COUNT(*) AS n, ROUND(AVG(c_acctbal), 4) AS avg_bal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name""",
        "cidr_range_join": """
            SELECT tag, COUNT(*) AS n
            FROM lineitem JOIN (VALUES (0.0, 10.0, 'low'), (10.0, 25.0, 'mid'),
                                       (25.0, 60.0, 'high')) AS rng(lo, hi, tag)
              ON l_quantity >= lo AND l_quantity < hi
            GROUP BY tag""",
        "intel_semi_join": """
            SELECT o_orderstatus, COUNT(*) AS n FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
            GROUP BY o_orderstatus""",
        "anti_join": """
            SELECT c_mktsegment, COUNT(*) AS n FROM customer
            WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
            GROUP BY c_mktsegment""",
        "asof_flexbit": """
            SELECT user_id, COUNT(*) AS n FROM (
              SELECT user_id, event_type,
                     last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_signup
              FROM events)
            WHERE event_type = 'purchase' AND prev_signup IS NOT NULL
            GROUP BY user_id""",
        "after_sliding": """
            SELECT user_id, COUNT(*) AS n FROM (
              SELECT user_id,
                     COUNT(*) OVER (PARTITION BY user_id
                                    ORDER BY date_diff('second', TIMESTAMP '1970-01-01', ts)
                                    RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW) AS cnt
              FROM events)
            WHERE cnt > 2 GROUP BY user_id""",
        "threshold_limit": """
            SELECT event_type, COUNT(*) AS n FROM (
              SELECT event_type,
                     row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
                                        ORDER BY ts, event_id) AS rn
              FROM events)
            WHERE rn <= 2 GROUP BY event_type""",
        "track_clients": """
            SELECT COUNT(*) AS silent_users FROM (
              SELECT user_id, MAX(ts) AS last_seen FROM events GROUP BY user_id)
            WHERE last_seen < (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY""",
        "hit_counters": """
            SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type""",
        "sink_rollup": """
            SELECT event_type, COUNT(*) AS n FROM events GROUP BY ROLLUP(event_type)""",
        "interval_stats": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS bucket,
                   COUNT(*) AS n, ROUND(AVG(value), 4) AS avg_value
            FROM events GROUP BY bucket""",
        "distinct_clients": """
            SELECT event_type, COUNT(DISTINCT user_id) AS users
            FROM events GROUP BY event_type""",
        "topk": """
            SELECT p_partkey, p_name, p_retailprice FROM part
            ORDER BY p_retailprice DESC, p_partkey LIMIT 10""",
        "union_merge": """
            SELECT COUNT(*) AS n FROM (
              SELECT event_id FROM events WHERE event_type = 'error'
              UNION
              SELECT event_id FROM events WHERE value > 90)""",
        "json_extract": """
            SELECT event_type,
                   ROUND(AVG(CAST(props->>'$.k' AS INTEGER)), 4) AS avg_k,
                   CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k
            FROM events GROUP BY event_type""",
        "session_windows": """
            WITH gaps AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) >= INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_session
              FROM events),
            sess AS (
              SELECT user_id,
                     SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
              FROM gaps)
            SELECT user_id, COUNT(DISTINCT session_id) AS sessions,
                   CAST(COUNT(*) AS BIGINT) AS events
            FROM sess GROUP BY user_id""",
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_discount), 6) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus""",
        "tpch_q5ish": """
            SELECT n_name,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name""",
        "dedup_exact": """
            SELECT COUNT(*) AS groups,
                   CAST(SUM(doc_id) AS BIGINT) AS survivor_id_sum FROM (
              SELECT md5(text) AS fp, MIN(doc_id) AS doc_id
              FROM documents GROUP BY md5(text))""",
        "doc_fingerprint": """
            WITH h AS (
              SELECT substring(md5(lower(trim(text))), 1, 16) AS fp,
                     list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                         list_transform(
                           list_filter(string_split(lower(text), ' '),
                                       x -> length(x) > 0),
                           t -> CAST(CAST(('0x' || substring(md5(t), 1, 8))
                                AS UBIGINT) AS BIGINT))),
                       (a, b) -> (a * 31 + b) % 2147483647) AS rfp
              FROM documents)
            SELECT COUNT(DISTINCT fp) AS distinct_fp,
                   COUNT(DISTINCT rfp) AS distinct_rfp,
                   CAST(SUM(rfp) AS BIGINT) AS rfp_sum
            FROM h""",
        "token_count": """
            SELECT lang,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens,
                   CAST(SUM(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT)
                     AS tokens_bpe,
                   COUNT(*) AS docs
            FROM documents GROUP BY lang""",
        "quality_battery": """
            SELECT source,
                   ROUND(AVG(ROUND((length(text) -
                         length(regexp_replace(text, '[A-Za-z]', '', 'g')))
                         / greatest(length(text), 1), 4)), 4) AS avg_alpha,
                   ROUND(AVG(ROUND((length(text) -
                         length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
                         / greatest(length(text), 1), 4)), 4) AS avg_punct,
                   ROUND(AVG(ROUND(
                     len(list_filter(
                       list_filter(string_split(lower(text), ' '),
                                   x -> length(x) > 0),
                       t -> t IN ('the','and','of','to','a','in','is'))) * 1.0
                     / greatest(len(list_filter(string_split(lower(text), ' '),
                                   x -> length(x) > 0)), 1), 4)), 4) AS avg_stop,
                   ROUND(AVG(ROUND((length(text) - length(replace(text, ' ', '')))
                         / greatest(length(text), 1), 4)), 4) AS avg_quality
            FROM documents GROUP BY source""",
        "lang_id": """
            SELECT CASE
                     WHEN contains(' ' || lower(text) || ' ', ' the ')
                       OR contains(' ' || lower(text) || ' ', ' and ') THEN 'en'
                     WHEN contains(' ' || lower(text) || ' ', ' der ')
                       OR contains(' ' || lower(text) || ' ', ' und ') THEN 'de'
                     ELSE 'unknown' END AS predicted,
                   COUNT(*) AS n
            FROM documents GROUP BY predicted""",
        "minhash_signature": """
            WITH toks AS (
              SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, unnest(
                (list_transform(t, (x, i) -> array_to_string(t[i : i + 2], ' ')))
                  [1 : greatest(len(t) - 2, 1)]) AS shingle
              FROM toks)
            SELECT COUNT(DISTINCT h0) AS distinct_h0, COUNT(*) AS docs FROM (
              SELECT doc_id, MIN(substring(md5('0:' || shingle), 1, 16)) AS h0
              FROM sh WHERE length(shingle) > 0 GROUP BY doc_id)""",
        "ann_threshold": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT label,
                   CAST(SUM(CASE WHEN list_cosine_similarity(embedding, qv) > 0.2
                            THEN 1 ELSE 0 END) AS BIGINT) AS close_vecs
            FROM embeddings, q WHERE vec_id != 0 GROUP BY label""",
        "ann_brute_topk": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   ROUND(list_cosine_similarity(embedding, qv), 6) AS sim
            FROM embeddings, q WHERE vec_id != 0
            ORDER BY sim DESC, vec_id LIMIT 10""",
        "embedding_norms": """
            SELECT label,
                   ROUND(AVG(sqrt(list_sum(list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm,
                   COUNT(*) AS n
            FROM embeddings GROUP BY label""",
        "multimodal_stats": """
            -- image payloads carry the 33-byte synthetic PNG header
            SELECT kind, COUNT(*) AS n,
                   CAST(SUM(nb) AS BIGINT) AS total_bytes,
                   ROUND(AVG(nb), 4) AS avg_bytes
            FROM (SELECT octet_length(encode(text))
                           + CASE WHEN doc_id % 3 = 0 THEN 33 ELSE 0 END AS nb,
                         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                              ELSE 'video' END AS kind
                  FROM documents)
            GROUP BY kind""",
        "simhash_portable": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents),
            h AS (
              SELECT doc_id,
                     CAST(('0x' || substring(md5(tok), 1, 8)) AS UBIGINT) AS h
              FROM toks WHERE length(tok) > 0),
            bs AS (
              SELECT doc_id, COUNT(*) AS n,
                     {bitsums}
              FROM h GROUP BY doc_id)
            SELECT COUNT(DISTINCT sim) AS distinct_hashes,
                   CAST(SUM(sim) AS BIGINT) AS hash_sum,
                   COUNT(*) AS docs
            FROM (SELECT doc_id, {simexpr} AS sim FROM bs)""".format(
            bitsums=",\n                     ".join(
                f"SUM((h >> {b}) & 1) AS b{b}" for b in range(16)
            ),
            simexpr=" + ".join(
                f"(CASE WHEN b{b} * 2 > n THEN {1 << b} ELSE 0 END)" for b in range(16)
            ),
        ),
        "minhash_lsh_dups": """
            WITH toks AS (
              SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, unnest(
                (list_transform(t, (x, i) -> array_to_string(t[i : i + 2], ' ')))
                  [1 : greatest(len(t) - 2, 1)]) AS shingle
              FROM toks),
            sh2 AS (SELECT * FROM sh WHERE length(shingle) > 0),
            sig AS (
              SELECT doc_id,
                     {mins}
              FROM sh2 GROUP BY doc_id),
            bands AS (
              SELECT doc_id, 0 AS band_idx, h0 || '|' || h1 AS band_hash FROM sig
              UNION ALL SELECT doc_id, 1, h2 || '|' || h3 FROM sig
              UNION ALL SELECT doc_id, 2, h4 || '|' || h5 FROM sig
              UNION ALL SELECT doc_id, 3, h6 || '|' || h7 FROM sig),
            pairs AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
               AND l.doc_id < r.doc_id),
            per AS (
              SELECT band_idx, band_hash, COUNT(*) AS bn,
                     COUNT(DISTINCT doc_id) AS docs
              FROM bands GROUP BY band_idx, band_hash)
            SELECT (SELECT COUNT(*) FROM pairs) AS candidate_pairs,
                   CAST(COUNT(*) AS BIGINT) AS buckets,
                   CAST(SUM(CASE WHEN bn > 2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS dropped_buckets,
                   CAST(SUM(CASE WHEN bn > 2 THEN docs ELSE 0 END) AS BIGINT)
                     AS docs_in_dropped
            FROM per""".format(
            mins=",\n                     ".join(
                f"MIN(substring(md5('{i}:' || shingle), 1, 16)) AS h{i}" for i in range(8)
            )
        ),
        "ngram_jaccard": """
            WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
            toks AS (
              SELECT doc_id, string_split(lower(text), ' ') AS t FROM docs),
            sh AS (
              SELECT DISTINCT doc_id, unnest(
                (list_transform(t, (x, i) -> array_to_string(t[i : i + 2], ' ')))
                  [1 : greatest(len(t) - 2, 1)]) AS shingle
              FROM toks),
            sh2 AS (SELECT * FROM sh WHERE length(shingle) > 0),
            sig AS (
              SELECT doc_id,
                     {mins}
              FROM sh2 GROUP BY doc_id),
            bands AS (
              SELECT doc_id, 0 AS band_idx, h0 || '|' || h1 AS band_hash FROM sig
              UNION ALL SELECT doc_id, 1, h2 || '|' || h3 FROM sig
              UNION ALL SELECT doc_id, 2, h4 || '|' || h5 FROM sig
              UNION ALL SELECT doc_id, 3, h6 || '|' || h7 FROM sig),
            pairs AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
               AND l.doc_id < r.doc_id),
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh2 GROUP BY doc_id),
            inter AS (
              SELECT p.a, p.b, COUNT(*) AS i
              FROM pairs p
              JOIN sh2 sa ON sa.doc_id = p.a
              JOIN sh2 sb ON sb.doc_id = p.b AND sb.shingle = sa.shingle
              GROUP BY p.a, p.b)
            SELECT COUNT(*) AS pairs,
                   COALESCE(ROUND(SUM(ROUND(i / (za.sz + zb.sz - i), 4)), 2), 0.0)
                     AS jaccard_sum
            FROM inter
            JOIN sizes za ON za.doc_id = a
            JOIN sizes zb ON zb.doc_id = b""".format(
            mins=",\n                     ".join(
                f"MIN(substring(md5('{i}:' || shingle), 1, 16)) AS h{i}" for i in range(8)
            )
        ),
        "multimodal_features": """
            -- payload_hex rebuilds the engine's exact payload bytes (PNG
            -- header + text for images) as a hex string: DuckDB md5 can't
            -- take BLOBs, but COUNT(DISTINCT payload) == COUNT(DISTINCT
            -- md5(payload)); image width/height re-derive the datagen
            -- formula the engine must recover by PARSING the IHDR bytes,
            -- audio/video use the documented stub formula over length
            SELECT kind, COUNT(*) AS n,
                   CAST(SUM(nb) AS BIGINT) AS bytes_sum,
                   COUNT(DISTINCT payload_hex) AS distinct_checksums,
                   CAST(SUM(CASE WHEN kind = 'image' THEN (doc_id % 512) + 16
                            ELSE (nb % 640) + 1 END) AS BIGINT) AS width_sum,
                   CAST(SUM(CASE WHEN kind = 'image' THEN (doc_id % 384) + 16
                            ELSE (nb % 480) + 1 END) AS BIGINT) AS height_sum
            FROM (SELECT doc_id,
                         octet_length(encode(text))
                           + CASE WHEN doc_id % 3 = 0 THEN 33 ELSE 0 END AS nb,
                         CASE WHEN doc_id % 3 = 0
                              THEN {hdr} || hex(encode(text))
                              ELSE hex(encode(text)) END AS payload_hex,
                         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                              ELSE 'video' END AS kind
                  FROM documents)
            GROUP BY kind""".format(hdr=_PNG_HDR_HEX_SQL),
        "multimodal_frames": """
            WITH v AS (
              SELECT octet_length(encode(text)) AS L
              FROM documents WHERE doc_id % 3 = 2),
            f AS (SELECT L, UNNEST([0, 1, 2, 3]) AS frame_idx FROM v)
            SELECT frame_idx, COUNT(*) AS n,
                   CAST(SUM(CASE WHEN L > frame_idx
                            THEN (L - frame_idx + 3) // 4 ELSE 0 END) AS BIGINT)
                     AS bytes_sum
            FROM f GROUP BY frame_idx""",
        "multimodal_resize": """
            -- DuckDB can't slice BLOBs, so byte truncation is expressed on
            -- the payload's HEX string (2 hex chars per byte: 64 bytes =
            -- 128 chars); distinct truncated payloads == distinct md5s
            SELECT kind, COUNT(*) AS n,
                   CAST(SUM(least(nb, 64)) AS BIGINT) AS bytes_sum,
                   COUNT(DISTINCT substring(payload_hex, 1, 128))
                     AS distinct_payloads
            FROM (SELECT octet_length(encode(text))
                           + CASE WHEN doc_id % 3 = 0 THEN 33 ELSE 0 END AS nb,
                         CASE WHEN doc_id % 3 = 0
                              THEN {hdr} || hex(encode(text))
                              ELSE hex(encode(text)) END AS payload_hex,
                         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                              ELSE 'video' END AS kind
                  FROM documents)
            GROUP BY kind""".format(hdr=_PNG_HDR_HEX_SQL),
        "dedup_index_incremental": """
            -- from-scratch recomputation of the INDEX-served incremental
            -- dedup result: even doc_ids are the stored corpus, odd the
            -- delta; est_jaccard = fraction of agreeing minhash components
            WITH toks AS (
              SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, unnest(
                (list_transform(t, (x, i) -> array_to_string(t[i : i + 2], ' ')))
                  [1 : greatest(len(t) - 2, 1)]) AS shingle
              FROM toks),
            sh2 AS (SELECT * FROM sh WHERE length(shingle) > 0),
            sig AS (
              SELECT doc_id,
                     {mins}
              FROM sh2 GROUP BY doc_id),
            bands AS (
              SELECT doc_id, '0:' || h0 || '|' || h1 AS band FROM sig
              UNION ALL SELECT doc_id, '1:' || h2 || '|' || h3 FROM sig
              UNION ALL SELECT doc_id, '2:' || h4 || '|' || h5 FROM sig
              UNION ALL SELECT doc_id, '3:' || h6 || '|' || h7 FROM sig),
            pairs AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r ON l.band = r.band
              WHERE l.doc_id % 2 = 0 AND r.doc_id % 2 = 1),
            est AS (
              SELECT p.a, p.b, ROUND(({agree}) / 8.0, 6) AS ej
              FROM pairs p
              JOIN sig sa ON sa.doc_id = p.a
              JOIN sig sb ON sb.doc_id = p.b)
            SELECT COUNT(*) AS cross_pairs,
                   COALESCE(ROUND(SUM(ej), 2), 0.0) AS est_sum,
                   CAST(COALESCE(SUM(CASE WHEN ej >= 0.5 THEN 1 ELSE 0 END), 0)
                     AS BIGINT) AS probable_dups
            FROM est""".format(
            mins=",\n                     ".join(
                f"MIN(substring(md5('{i}:' || shingle), 1, 16)) AS h{i}" for i in range(8)
            ),
            agree=" + ".join(
                f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)" for i in range(8)
            ),
        ),
        "ann_lsh_topk": _ann_lsh_sql(),
        "ann_lsh_index_topk": _ann_lsh_sql(nbits=8, radius=2),
        "embedding_near_dups": _emb_neardup_sql(),
        "ann_ivf_topk": """
            WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id != 0),
            q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            cents AS (
              SELECT vec_id AS cid, embedding AS cvec FROM e
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
            assigned AS (
              SELECT e.vec_id, e.embedding,
                     (SELECT c.cid FROM cents c
                      ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC,
                               c.cid DESC LIMIT 1) AS cell
              FROM e),
            probe AS (
              SELECT c.cid FROM cents c, q
              ORDER BY list_cosine_similarity(q.qv, c.cvec) DESC, c.cid DESC
              LIMIT 2)
            SELECT vec_id,
                   ROUND(list_cosine_similarity(embedding, qv), 6) AS sim
            FROM assigned, q WHERE cell IN (SELECT cid FROM probe)
            ORDER BY sim DESC, vec_id LIMIT 10""",
        # no oracle (rows-only): none — every queries() entry above has a
        # DuckDB oracle.
    }


# The synthetic PNG header (ops/multimodal.png_header) re-expressed as a
# DuckDB hex-string expression over doc_id — shared by the multimodal
# oracles that must rebuild the engine's exact payload bytes.
_PNG_HDR_HEX_SQL = (
    "'89504E470D0A1A0A0000000D49484452' || "
    "lpad(to_hex((doc_id % 512) + 16), 8, '0') || "
    "lpad(to_hex((doc_id % 384) + 16), 8, '0') || "
    "'080600000000000000'"
)


# The S2 field-mapped transcript view (events_as_transcripts) re-expressed
# in DuckDB SQL — shared prefix of the pipeline oracles.
_MAPPED_TX_SQL = """
            WITH tx AS (
              SELECT CASE event_type WHEN 'view' THEN 'user'
                          WHEN 'click' THEN 'tool'
                          WHEN 'purchase' THEN 'system'
                          ELSE 'assistant' END AS role,
                     'event ' || event_type || ' code=' ||
                       CAST(CAST(props->>'$.k' AS INTEGER) * 6 AS VARCHAR) ||
                       CASE WHEN event_type = 'error'
                            THEN ' an error occurred: tool timeout'
                            ELSE '' END ||
                       CASE WHEN event_type = 'click'
                            THEN ' connection from 10.0.' ||
                                 CAST(CAST(props->>'$.k' AS INTEGER) % 256 AS VARCHAR)
                                 || '.' || CAST(user_id % 256 AS VARCHAR) ||
                                 ' port ' ||
                                 CAST(1024 + CAST(props->>'$.k' AS INTEGER) AS VARCHAR)
                                 || ' proto tcp'
                            ELSE '' END AS text
              FROM events)
"""


def _emb_neardup_sql() -> str:
    """Embedding near-dup oracle: identical hyperplane signatures (inlined
    literals), bucket self-join, exact-cosine threshold — re-derived in SQL."""
    from sagan_spark.ops.similarity import _hyperplanes

    planes = _hyperplanes(64, 8)
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(embedding, "
        f"[{', '.join(repr(float(x)) for x in p)}]) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
            WITH sigs AS (
              SELECT vec_id, embedding, CAST({bits} AS BIGINT) AS sig
              FROM embeddings)
            SELECT COUNT(*) AS pairs,
                   COALESCE(ROUND(SUM(ROUND(cos, 6)), 2), 0.0) AS cos_sum
            FROM (
              SELECT list_cosine_similarity(l.embedding, r.embedding) AS cos
              FROM sigs l JOIN sigs r
                ON l.sig = r.sig AND l.vec_id < r.vec_id)
            WHERE cos >= 0.25"""


def _ann_lsh_sql(nbits: int = ANN_NBITS, radius: int = ANN_RADIUS) -> str:
    """LSH ANN oracle: the seeded hyperplanes inlined as double literals;
    signature/probe/re-rank re-derived entirely in SQL (same algorithm,
    independent engine). The same SQL oracles BOTH query forms — the
    one-shot sweep and the precomputed index — because the index's probe
    IN-set is by construction {s : hamming(s, qsig) <= radius}."""
    import numpy as np  # noqa: F401  (via _hyperplanes)

    from sagan_spark.ops.similarity import _hyperplanes

    planes = _hyperplanes(64, nbits)

    def plane_lit(p) -> str:
        return "[" + ", ".join(repr(float(x)) for x in p) + "]"

    sig_bits = " + ".join(
        f"(CASE WHEN list_dot_product(embedding, {plane_lit(p)}) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    qsig_bits = " + ".join(
        f"(CASE WHEN list_dot_product(qv, {plane_lit(p)}) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            qs AS (SELECT CAST({qsig_bits} AS BIGINT) AS qsig FROM q),
            sigs AS (
              SELECT vec_id, embedding,
                     CAST({sig_bits} AS BIGINT) AS sig
              FROM embeddings WHERE vec_id != 0)
            SELECT vec_id,
                   ROUND(list_cosine_similarity(embedding, qv), 6) AS sim
            FROM sigs, q, qs
            WHERE bit_count(xor(sig, qsig)) <= {radius}
            ORDER BY sim DESC, vec_id LIMIT 10"""
