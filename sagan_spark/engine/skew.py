"""Skew handling utilities — hot-conversation salting (SURVEY §4.2).

The transcript workload is Zipf-skewed: ~1% of conversations carry 5k-50k
turns (datagen contract, FIXTURES.md §1). Two distinct cases:

1. STATELESS stages (match, enrich, per-sink writes): safe to salt — add
   ``salt = pmod(xxhash64(turn_idx), k)`` to the partition key so one hot
   conversation spreads over k tasks. `salted_repartition` below.

2. STATEFUL correlation: state is order-dependent per conversation, so a
   conversation must NOT be split (SURVEY §7.4.5). Mitigations, in order:
   only *matched* rows replay (bounded ≪ turns); AQE skew-join splitting
   for the join-shaped stages; and `hot_convs` detection so operators can
   route extreme conversations to a dedicated chunked path if a rule set
   ever makes replay itself the bottleneck.

These are utilities, not defaults: the canonical pipeline needs none of
them at bench scale (measured), but a 100 TB deployment tunes with them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, key: str, salt_buckets: int = 16, num_partitions: int | None = None) -> DataFrame:
    """Repartition by (key, salt) for stateless stages. The salt derives
    from turn_idx (stable, no rand()) so reruns are deterministic."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64("turn_idx"), F.lit(salt_buckets)))
    if num_partitions:
        out = salted.repartition(num_partitions, key, "_salt")
    else:
        out = salted.repartition(key, "_salt")
    return out.drop("_salt")


def hot_convs(df: DataFrame, threshold_turns: int = 5000) -> DataFrame:
    """Detect heavy conversations (one narrow agg; at scale run it on a
    sample or maintain it as a side table from the lineage manifest).
    Returns (conv_id, n_turns)."""
    return (
        df.groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"))
        .where(F.col("n_turns") >= threshold_turns)
    )


def conv_size_histogram(df: DataFrame) -> DataFrame:
    """log10-bucketed conversation-size histogram — the skew report the
    lineage/metrics layer records per run."""
    sizes = df.groupBy("conv_id").agg(F.count("*").alias("n"))
    bucket = F.floor(F.log10("n"))
    return (
        sizes.groupBy(bucket.alias("log10_turns"))
        .agg(F.count("*").alias("convs"), F.sum("n").alias("turns"))
        .orderBy("log10_turns")
    )
