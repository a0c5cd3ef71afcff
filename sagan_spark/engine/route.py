"""Routing + sinks — Sagan's output-plugin fan-out (SURVEY §2.1 S4-S7, A2).

Each alert row gets (msg, rule_class, sink, rev, priority) from a broadcast
rule dim, then fans out per sink:
- fast / syslog: byte-stable text lines built with `format_string`
  (never Python str() of timestamps — SURVEY §7.4.3).
- eve: newline-delimited JSON via `to_json(struct(...))` with a fixed
  field order ([PUB src/output-plugins/eve.c] analogue).
- unified2: Parquet with the identical row set (binary format stand-in,
  judged on count equality — SURVEY §2.1 S6 ◐).

Write shape at scale: one `partitionBy("sink")` write = a single pass;
within each sink files are sorted by (conv_id, turn_idx) via
repartition+sortWithinPartitions so equality checks and downstream
consumers get stable per-file order without a global sort.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..rules.model import RuleSet

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_ISO = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def rule_dim(spark: SparkSession, ruleset: RuleSet) -> DataFrame:
    rows = [
        (r.sid, r.rev, r.msg, r.rule_class, r.priority, r.sink, r.noalert)
        for r in ruleset.rules
    ]
    return spark.createDataFrame(
        rows, "sid long, rev int, msg string, rule_class string, priority int, sink string, noalert boolean"
    )


def attach_rule_meta(alerts: DataFrame, ruleset: RuleSet) -> DataFrame:
    """Attach rule metadata and drop noalert (state-only) rows.

    The rule dim is a compile-time constant, so instead of a broadcast
    join we fold it into literal-map lookups (`element_at(create_map)`)
    — O(1) per row inside whole-stage codegen, zero exchange. The
    join-based variant (`rule_dim` above) remains for external rule
    catalogs that aren't compile-time constants.
    """
    noalert_sids = [r.sid for r in ruleset.rules if r.noalert]
    out = alerts
    if noalert_sids:
        out = out.filter(~F.col("sid").isin(noalert_sids))

    def lit_map(fn) -> F.Column:
        entries: list[F.Column] = []
        for r in ruleset.rules:
            if r.noalert:
                continue
            entries += [F.lit(r.sid), F.lit(fn(r))]
        return F.element_at(F.create_map(*entries), F.col("sid"))

    return out.withColumns(
        {
            "rev": lit_map(lambda r: r.rev).cast("int"),
            "msg": lit_map(lambda r: r.msg),
            "rule_class": lit_map(lambda r: r.rule_class),
            "priority": lit_map(lambda r: r.priority).cast("int"),
            "sink": lit_map(lambda r: r.sink),
        }
    )


def _nn(name: str) -> F.Column:
    """Sink fields render null role/tool as '-' (format_string would print
    'null' and to_json would drop the key — both diverge from the oracle's
    formatting). The transcript contract makes conv_id/turn_idx/ts/text
    non-null for routed rows; role/tool may legitimately be null."""
    return F.coalesce(F.col(name), F.lit("-"))


def fast_line() -> F.Column:
    return F.format_string(
        "%s  [**] [1:%d:%d] %s [**] [Classification: %s] [Priority: %d] %s:%d %s %s - %s",
        F.date_format("ts", TS_FMT),
        F.col("sid"),
        F.col("rev"),
        F.col("msg"),
        F.col("rule_class"),
        F.col("priority"),
        F.col("conv_id"),
        F.col("turn_idx"),
        _nn("role"),
        _nn("tool"),
        F.col("text"),
    )


def eve_json() -> F.Column:
    return F.to_json(
        F.struct(
            F.date_format("ts", TS_FMT_ISO).alias("timestamp"),
            F.col("sid"),
            F.col("rev"),
            F.col("msg"),
            F.col("rule_class").alias("classification"),
            F.col("priority"),
            F.col("conv_id"),
            F.col("turn_idx"),
            _nn("role").alias("role"),
            _nn("tool").alias("tool"),
            F.col("text"),
        )
    )


def syslog_line() -> F.Column:
    return F.format_string(
        "<%d>%s %s sagan[%d]: %s: %s",
        F.col("priority") + F.lit(8 * 13),  # facility 13 (log audit) * 8 + severity
        F.date_format("ts", TS_FMT_ISO),
        F.col("conv_id"),
        F.col("sid"),
        F.col("msg"),
        F.col("text"),
    )


SINK_FORMATTERS = {"fast": fast_line, "eve": eve_json, "syslog": syslog_line}


def sink_lines(alerts: DataFrame, sink: str) -> DataFrame:
    """Formatted output lines for one text sink, with sort keys attached."""
    fmt = SINK_FORMATTERS[sink]
    return alerts.filter(F.col("sink") == sink).select(
        "conv_id", "turn_idx", "sid", fmt().alias("line")
    )


def sink_counts(alerts: DataFrame) -> DataFrame:
    """A2: the per-sink aggregate count-equality target (BASELINE.json:2)."""
    return alerts.groupBy("sink").count().withColumnRenamed("count", "n")


def sid_counts(alerts: DataFrame) -> DataFrame:
    """A1: per-rule hit counters ([PUB src/stats.c])."""
    return alerts.groupBy("sid").count().withColumnRenamed("count", "n")


def write_sinks(alerts: DataFrame, out_dir: str) -> None:
    """Fan-out write. Text sinks get sorted text files; unified2 gets
    Parquet. One job per sink keeps formats heterogeneous without a custom
    datasource; each is a single narrow pass over the (persisted) alerts."""
    for sink in ("fast", "eve", "syslog"):
        (
            sink_lines(alerts, sink)
            .repartition("conv_id")
            .sortWithinPartitions("conv_id", "turn_idx", "sid")
            .select("line")
            .write.mode("overwrite")
            .text(os.path.join(out_dir, sink))
        )
    (
        alerts.filter(F.col("sink") == "unified2")
        .repartition("conv_id")
        .sortWithinPartitions("conv_id", "turn_idx", "sid")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "unified2"))
    )
