"""Enrichment joins — Sagan's GeoIP/CIDR/intel lookups as broadcast joins.

SURVEY.md §2.3: J1 (role_dim ↔ GeoIP [PUB src/geoip2.c]), J2 (risk_ranges ↔
blacklist CIDR [PUB src/processors/blacklist.c], a non-equi broadcast range
join), J4 (tool_dim ↔ Zeek intel [PUB src/processors/zeek-intel.c]).

Join shape at scale: the fact side (alerts) is arbitrarily large; every dim
is tiny → `F.broadcast` is explicit on every join, so the plan is pure
map-side BroadcastHashJoin / BroadcastNestedLoopJoin(range) with ZERO
shuffle. Filtering enrich conditions is normally constant-folded into the
match stage (engine/match.py); when folding is disabled the conditions are
applied here as compiled Column predicates per sid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..rules.model import EnrichCond, RuleSet


def attach_dims(
    alerts: DataFrame,
    role_dim: DataFrame,
    tool_dim: DataFrame,
    risk_ranges: DataFrame,
    bluedot_dim: DataFrame | None = None,
) -> DataFrame:
    """Attach enrichment attributes (origin/trust_level, category/
    blacklisted, risk_tag, and J3 bd_category/bd_score when a Bluedot
    reputation snapshot is supplied). Left joins — never filtering — and
    all broadcast. ``risk_key`` was computed JVM-side in the match stage."""
    out = alerts.join(F.broadcast(role_dim), on="role", how="left")
    out = out.join(F.broadcast(tool_dim), on="tool", how="left")
    if bluedot_dim is not None:
        out = out.join(F.broadcast(bluedot_dim), on="tool", how="left")
    rr = risk_ranges.select("lo", "hi", "risk_tag")
    out = out.join(
        F.broadcast(rr),
        on=(F.col("risk_key") >= F.col("lo")) & (F.col("risk_key") <= F.col("hi")),
        how="left",
    ).drop("lo", "hi")
    return out


def bucketed_range_join(
    fact: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Range join as a broadcast EQUI-join on a derived bucket key.

    BroadcastNestedLoopJoin evaluates every (row, range) pair — fine for a
    handful of ranges on alert-sized inputs, but at 100 TB fact scans its
    per-row-per-range cost dominates. Instead: expand each [lo, hi) range
    to the integer buckets it overlaps (ranges are few and static, so the
    expansion is tiny and driver-side-free — a JVM explode), broadcast
    that, hash-join on bucket(value) and re-check the bounds. Same
    semantics, hash-join speed; bucket_width should be ≤ the typical range
    width so ranges expand to O(width/bucket_width) buckets each.
    Measured at sf0.1 on the lineitem quantity-band query (min-of-3 —
    single runs on this VM swing ±20-100%): 5.4s (BNLJ) → ~1.9s
    (BroadcastHashJoin); the one driver-recorded 6.7s was a noise window.
    """
    b = F.lit(float(bucket_width))
    expanded = ranges.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b).cast("long"),
                # hi is exclusive: the bucket containing hi is still needed
                # for values in [bucket_start, hi)
                F.floor(F.col(hi_col) / b).cast("long"),
            )
        ).alias("_bucket"),
    )
    keyed = fact.withColumn("_bucket", F.floor(F.col(value_col) / b).cast("long"))
    out = keyed.join(
        F.broadcast(expanded),
        (keyed["_bucket"] == expanded["_bucket"])
        & (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) < F.col(hi_col)),
        how,
    )
    return out.drop("_bucket")


def _cond_expr(ec: EnrichCond) -> Column:
    col = F.col(ec.fieldname)
    if ec.op == "is":
        return col.isin(list(ec.values))
    if ec.op == "isnot":
        return ~col.isin(list(ec.values)) & col.isNotNull()
    if ec.op == "range_tag_is":
        return F.col("risk_tag").isin(list(ec.values))
    if ec.op == "in_any_range":
        return F.col("risk_tag").isNotNull()
    raise ValueError(f"unknown enrich op {ec.op}")


def apply_enrich_filters(alerts: DataFrame, ruleset: RuleSet) -> DataFrame:
    """Per-sid enrich-condition filter (only needed when the match stage ran
    with fold_dims=False). One `when` chain, whole-stage-codegen friendly."""
    expr = F.lit(True)
    for rule in ruleset.rules:
        if not rule.enrich:
            continue
        cond = F.lit(True)
        for ec in rule.enrich:
            cond = cond & _cond_expr(ec)
        expr = F.when(F.col("sid") == rule.sid, cond).otherwise(expr)
    return alerts.filter(expr)
