"""Routing + sinks — Sagan's output-plugin fan-out (SURVEY §2.1 S4-S7, A2).

Each alert row gets (msg, rule_class, sink, rev, priority) from a broadcast
rule dim, then fans out per sink:
- fast / syslog: byte-stable text lines built with `format_string`
  (never Python str() of timestamps — SURVEY §7.4.3).
- eve: newline-delimited JSON via `to_json(struct(...))` with a fixed
  field order ([PUB src/output-plugins/eve.c] analogue).
- unified2: Parquet row set in write_sinks (queryable form) PLUS a real
  length-prefixed binary record stream (write_unified2_binary — type/len
  framing per the public unified2 spec, big-endian u32 fields, serialized
  entirely JVM-side).
- external program (S8): pipe_to_program streams formatted lines into a
  subprocess per partition.

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


# Above this rule count attach_rule_meta switches from literal maps to a
# broadcast join: five create_map literals × N rules embed ~10N entries in
# the plan, and past a few hundred rules plan construction/codegen cost
# grows with N on EVERY query while the broadcast join's cost stays flat
# (measured at 57 vs 1,044 rules — see BENCH/TUNING.md "rule-meta switch").
LITERAL_MAP_MAX_RULES = 500


def attach_rule_meta(
    alerts: DataFrame,
    ruleset: RuleSet,
    max_literal_rules: int = LITERAL_MAP_MAX_RULES,
) -> DataFrame:
    """Attach rule metadata and drop noalert (state-only) rows.

    The rule dim is a compile-time constant, so for ordinary rule-set
    sizes we fold it into literal-map lookups (`element_at(create_map)`)
    — O(1) per row inside whole-stage codegen, zero exchange. Past
    ``max_literal_rules`` rules the embedded-literal plan itself becomes
    the cost (Sagan-realistic catalogs run thousands of rules), so large
    rule sets take a broadcast hash join against `rule_dim` instead —
    still no shuffle of the fact side, one tiny broadcast. Both paths
    yield identical rows AND column order (equality-tested)."""
    noalert_sids = [r.sid for r in ruleset.rules if r.noalert]
    out = alerts
    if noalert_sids:
        out = out.filter(~F.col("sid").isin(noalert_sids))
    live = [r for r in ruleset.rules if not r.noalert]

    if len(live) > max_literal_rules:
        dim = rule_dim(alerts.sparkSession, ruleset).drop("noalert")
        joined = out.join(F.broadcast(dim), "sid", "left")
        # restore the literal path's column order (join moves sid first)
        return joined.select(
            *out.columns, "rev", "msg", "rule_class", "priority", "sink"
        )

    def lit_map(fn) -> F.Column:
        entries: list[F.Column] = []
        for r in live:
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


def _u32(col: F.Column) -> F.Column:
    """Big-endian uint32 bytes from an integer Column (hex → lpad → unhex),
    pure JVM expression — no Python in the serializer."""
    return F.unhex(F.lpad(F.hex(col.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))), 8, "0"))


def unified2_record() -> F.Column:
    """S6: binary unified2-style framing ([PUB Snort unified2 spec]:
    4-byte record type + 4-byte length header, big-endian u32 body fields).
    Body transposes the IDS-event fields onto the transcript payload:

        event_id(crc32 conv), turn_idx, ts_sec, ts_usec,
        generator_id(=1), sid, rev, priority

    Field-for-field byte compatibility with Snort consumers isn't claimed
    (no IP tuple in this payload); the framing, endianness and record
    discipline are real, so a length-prefixed reader walks the file."""
    body = F.concat(
        _u32(F.crc32(F.encode(F.col("conv_id"), "utf-8"))),
        _u32(F.col("turn_idx")),
        _u32(F.unix_timestamp(F.col("ts").cast("timestamp"))),
        _u32(F.date_format("ts", "SSSSSS").cast("long")),
        _u32(F.lit(1)),
        _u32(F.col("sid")),
        _u32(F.col("rev")),
        _u32(F.col("priority")),
    )
    return F.concat(_u32(F.lit(7)), _u32(F.length(body)), body)


def _executor_fs_ok(out_dir: str) -> bool:
    """Can ``pyarrow.fs`` open this location (the only FS layer available
    on Python executors, which have no JVM gateway)? Local paths and
    ``file://``/``s3://`` yes; ``hdfs://`` only when libhdfs is loadable —
    probed HERE on the driver (same wheel, same environment class) so the
    staged fallback is chosen up front instead of failing task-side."""
    import pyarrow.fs as pafs

    if "://" not in out_dir or out_dir.startswith("file:/"):
        return True
    try:
        pafs.FileSystem.from_uri(out_dir)
        return True
    except Exception:
        return False


def write_unified2_binary(
    alerts: DataFrame, out_dir: str, staging_dir: str | None = None
) -> None:
    """Write the unified2 sink as length-prefixed binary record files, one
    file per conv_id-hash partition (Sagan spools unified2 to local files
    the same way; on a cluster, point out_dir at shared storage).

    The per-partition write runs on EXECUTORS, where there is no JVM
    gateway for the Hadoop FileSystem API — portability comes from
    ``pyarrow.fs`` instead: ``file://`` and bare paths via
    LocalFileSystem, ``s3://`` via pyarrow's bundled S3 support (same
    library the Arrow parquet path already ships).

    Schemes pyarrow cannot open (``hdfs://`` without libhdfs on the
    executors) take the STAGED path: executors write the same part files
    to ``staging_dir`` — any pyarrow-reachable shared location (NFS
    ``file://``, ``s3://``) — and the driver then promotes each staged
    file to ``out_dir`` through the JVM Hadoop FileSystem (full scheme
    support, atomic temp+rename per file via fsutil) and deletes the
    staging tree. Alert-sink volume is ≪1% of input, so the driver-side
    promotion copy is bounded; the direct path remains zero-copy."""
    spark = alerts.sparkSession
    recs = (
        alerts.filter(F.col("sink") == "unified2")
        .repartition("conv_id")
        .sortWithinPartitions("conv_id", "turn_idx", "sid")
        .select(unified2_record().alias("rec"))
    )
    direct = _executor_fs_ok(out_dir)
    if not direct and staging_dir is None:
        raise ValueError(
            f"unified2 out_dir {out_dir!r} is not reachable from Python "
            "executors (pyarrow.fs cannot open the scheme — e.g. hdfs:// "
            "without libhdfs); pass staging_dir= pointing at a shared "
            "pyarrow-reachable location (file:// NFS mount, s3://) and the "
            "driver will promote the staged files."
        )
    target = out_dir if direct else staging_dir

    def dump(rows) -> None:
        import pyarrow.fs as pafs
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf = b"".join(r.rec for r in rows)
        if buf:
            if "://" in target or target.startswith("file:/"):
                fs, base = pafs.FileSystem.from_uri(target)
            else:
                fs, base = pafs.LocalFileSystem(), target
            fs.create_dir(base, recursive=True)  # idempotent across tasks
            with fs.open_output_stream(f"{base.rstrip('/')}/part-{pid:05d}.u2") as f:
                f.write(buf)

    recs.foreachPartition(dump)
    if not direct:
        from .. import fsutil

        try:
            staged = fsutil.fs_list_files(spark, staging_dir, suffix=".u2")
        except FileNotFoundError:
            staged = []  # zero unified2 alerts → nothing was staged
        for uri in staged:
            name = uri.rstrip("/").rsplit("/", 1)[-1]
            fsutil.fs_write_bytes(
                spark,
                out_dir.rstrip("/") + "/" + name,
                fsutil.fs_read_bytes(spark, uri),
            )
        fsutil.fs_delete(spark, staging_dir)


def pipe_to_program(alerts: DataFrame, sink: str, argv: list[str]) -> int:
    """S8: external-program sink ([PUB src/output-plugins/external.c]) —
    stream a sink's formatted lines to a subprocess on each executor, one
    process per partition (the per-partition imperative case where an RDD
    is the right tool). Returns the number of lines piped; raises if any
    program exits non-zero."""
    lines = sink_lines(alerts, sink).sortWithinPartitions("conv_id", "turn_idx", "sid")

    def feed(rows):
        import subprocess

        proc = subprocess.Popen(argv, stdin=subprocess.PIPE, text=True)
        n = 0
        try:
            for r in rows:
                proc.stdin.write(r.line + "\n")
                n += 1
            proc.stdin.close()
        except BrokenPipeError:  # program died mid-stream → surface via rc
            pass
        rc = proc.wait()
        if rc != 0:
            raise RuntimeError(f"external sink {argv!r} exited {rc}")
        yield n

    return int(lines.rdd.mapPartitions(feed).sum())


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
