"""End-to-end batch pipeline: parse → match → enrich → correlate → route.

The Spark re-expression of Sagan's per-event loop (SURVEY §3.2 E1). Plan
shape (verified by tests/test_plan.py):

  parquet/Iceberg scan (ReadSchema pruned to the 6 transcript columns)
    → ArrowEvalPython [vectorized match, ONE pass]     ← JVM↔Py boundary
    → BroadcastHashJoin ×2 + BroadcastNestedLoopJoin   (attach dims)
    → persist                                          (fan-out barrier)
    → stateless alerts ───────────────┐
    → stateful alerts → Exchange hashpartition(conv_id)
        → FlatMapGroupsInPandas replay ┴→ union → route → sinks + counts

The persist is deliberate: correlation, four sink writes and two count
aggregations all reuse the matched+enriched alerts; without it every
branch would rescan the 100 TB input and rerun the match UDF.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

from ..datagen import dims as dimsmod
from ..rules.canonical import CANONICAL
from ..rules.model import RuleSet
from . import correlate, enrich, match, route
from .. import io as iomod


@dataclass
class PipelineResult:
    alerts: DataFrame  # routed alert rows (persisted)
    sink_counts: dict[str, int] = field(default_factory=dict)
    sid_counts: dict[int, int] = field(default_factory=dict)
    input_rows: int | None = None

    def unpersist(self) -> None:
        self.alerts.unpersist()


def build_alerts(
    spark: SparkSession,
    input_df: DataFrame,
    ruleset: RuleSet = CANONICAL,
    fold_dims: bool = True,
) -> DataFrame:
    """The lazy alert DataFrame (no action triggered)."""
    from ..packaging import ensure_shipped

    ensure_shipped(spark)
    matched = match.run_match(input_df, ruleset, fold_dims=fold_dims)
    enriched = enrich.attach_dims(
        matched,
        dimsmod.role_dim(spark),
        dimsmod.tool_dim(spark),
        dimsmod.risk_ranges(spark),
    )
    if not fold_dims:
        enriched = enrich.apply_enrich_filters(enriched, ruleset)
    correlated = correlate.run_correlate(enriched, ruleset)
    return route.attach_rule_meta(correlated, ruleset)


def run(
    spark: SparkSession,
    input_path: str,
    ruleset: RuleSet = CANONICAL,
    out_dir: str | None = None,
    fold_dims: bool = True,
    count_input: bool = False,
) -> PipelineResult:
    df = iomod.read_table(spark, input_path, columns=iomod.TRANSCRIPT_COLUMNS)
    alerts = build_alerts(spark, df, ruleset, fold_dims=fold_dims)
    alerts = alerts.persist(StorageLevel.MEMORY_AND_DISK)

    res = PipelineResult(alerts=alerts)
    res.sink_counts = {r["sink"]: r["n"] for r in route.sink_counts(alerts).collect()}
    res.sid_counts = {r["sid"]: r["n"] for r in route.sid_counts(alerts).collect()}
    if count_input:
        res.input_rows = df.count()
    if out_dir is not None:
        route.write_sinks(alerts, out_dir)
    return res
